"""Query corpus: one module per feature area, mirroring the reference's SQL
corpus organization (``kylin-it/src/test/resources/query/`` — sql_join,
sql_window, sql_grouping, sql_percentile, sql_intersect_count, ...).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
(the PySpark implementation of the operator surface) and ``ORACLES:
dict[name, sql]`` (DuckDB-equivalent ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from kylin_on_parquet_v2_spark.corpus import (
        advanced,
        arrays_subq,
        cube_routed,
        functions_conformance,
        functions_date,
        functions_misc,
        functions_more,
        functions_string,
        grouping,
        joins_more,
        measures,
        pipeline,
        setops,
        sources_corpus,
        ssb,
        streaming_corpus,
        subquery,
        tpch,
        windows,
    )

    return [
        tpch,
        cube_routed,
        ssb,
        windows,
        grouping,
        setops,
        subquery,
        joins_more,
        functions_string,
        functions_date,
        functions_misc,
        functions_more,
        functions_conformance,
        sources_corpus,
        measures,
        advanced,
        arrays_subq,
        pipeline,
        streaming_corpus,
    ]


# The driver's correctness harness checks the FIRST 50 ``queries()`` entries
# only. Rotate the window each round so every contract query eventually gets
# a driver check; the r01-r10 union already covers every pre-r11 query, and
# the in-repo parity suite re-verifies every oracle each round regardless.
_PRIORITY = [
    # --- r13 driver window: NEW r13 queries first (Java-time quoted
    # --- date_format fold; IVF index restatement), then every query the
    # --- r13 commits touched (the connected-components family — the
    # --- alternating star contraction replaced min-label propagation, so
    # --- every clusters/dedup_filter consumer re-verifies under a driver
    # --- check; the self-check queries whose contracts changed —
    # --- percentile window widened to +/-0.002 with returned flags, IVF
    # --- topk now runs restate repair on the query path; the segment
    # --- refresh family over the adopted-ledger uncommit; datefmt +
    # --- bloom-options code paths), then the never-recently-checked tail
    # --- (the TPC-H/text/similarity block the r11/r12 rotations pushed
    # --- below the window — last driver-checked in r9/r10). Below the
    # --- 50-entry window: the r12 window block, the r11/r10/r9 blocks,
    # --- and the remainder — all still re-verified every round by the
    # --- in-repo parity suite (tests/test_entry_oracle_parity.py: every
    # --- oracle, sf0.001).
    "cube_routed_datefmt_quoted",
    "similarity_ann_ivf_restated",
    "dedup_clusters",
    "dedup_incremental_refresh",
    "multimodal_asset_dedup",
    "pipeline_end_to_end",
    "dedup_filtered_corpus",
    "dedup_best_kept_corpus",
    "streaming_dedup",
    "percentile_approx_sketch",
    "hll_approx_distinct",
    "similarity_ann_ivf_indexed",
    "cube_routed_segment_refresh",
    "cube_routed_bucket_refresh",
    "cube_routed_datefmt_rewrite",
    "cube_routed_bloom_probe",
    # --- never-recently-checked tail (displaced since r9/r10)
    "q10_returned_items",
    "q19_discounted_revenue",
    "q4_order_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q22_missed_opportunity",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_supplier_relationship",
    "q20_potential_promotion",
    "q21_suppliers_waiting",
    "cube_routed_island_ratio",
    "streaming_window_counts",
    "streaming_segment_ingest",
    "streaming_hybrid_union",
    "streaming_stateful_totals",
    "text_quality_features",
    "text_language_id",
    "text_fingerprint",
    "text_token_stats",
    "multimodal_metadata",
    "similarity_ann_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "similarity_bruteforce_topk",
    "similarity_neardup_pairs",
    "similarity_neardup_exact",
    "similarity_ann_ivf",
    "dedup_exact",
    "date_month_arithmetic",
    "dynamic_params",
    "except_all_pairs",
    "intersect_all_pairs",
    # --- end of the 50-entry r13 window; the r12 window block follows so
    # --- recently-verified queries stay near the top of the full ordering
    "cube_routed_hour_rewrite",
    "cube_routed_between_rewrite",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "cube_routed_trunc_rewrite",
    "cube_routed_extract_rewrite",
    "cube_routed_ts_range_rewrite",
    "search_bm25",
    "text_perplexity",
    "text_tfidf_keywords",
    "sample_split_leakage_safe",
    "intersect_value_parts",
    "intersect_count_or_cohort",
    "cube_routed_intersect_rollup",
    "intersect_count_retention",
    "intersect_count_funnel",
    "cube_routed_bitmap_distinct",
    "cube_routed_hybrid",
    "cube_routed_hybrid_distinct",
    "cube_routed_hybrid_funnel",
    "cube_routed_hybrid_rollup",
    "cube_routed_hybrid_percentile",
    "hybrid_compacted_tail",
    "cube_routed_time_derived",
    "streaming_time_derived",
    "multimodal_perceptual_dedup",
    "cube_routed_bucketed",
    "q7_volume_shipping",
    "q18_large_orders",
    "sample_stratified",
    "cube_routed_q1",
    "unpivot_metrics",
    "mass_in_filter",
    "array_functions",
    "multi_distinct",
    "pivot_event_types",
    "sessionize_events",
    "string_encode_funcs",
    "subquery_sql_text",
    "udf_pandas_vectorized",
    "cube_routed_month_series",
    "cube_routed_derived_dim",
    "cube_routed_topn_rewrite",
    "cube_routed_topn_measure",
    "cube_routed_window_rank",
    "cube_routed_cte",
    "cube_routed_join_contexts",
    "cube_routed_union_contexts",
    "cube_routed_agg_over_union",
    "corpus_bpe_encode",
    "text_vocab_coverage",
    "dedup_containment",
    "sample_quota",
    "streaming_decontam_gate",
    "semantic_dedup_given",
    "semantic_dedup_kmeans",
    "cube_routed_quality_quantile",
    "cube_routed_profile_stats",
    "cube_routed_segment_prune",
    "cube_routed_dim_minmax",
    "corpus_bpe_pairs",
    "decontam_filter_shuffled",
    "decontam_chargram_report",
    "dedup_passages",
    "corpus_top_ngrams",
    "corpus_profile_stats",
    "decontam_report",
    "decontam_filter",
    "decontam_by_source",
    "similarity_ann_ivf_trained",
    "cube_routed_having",
    "cube_routed_having_hidden",
    "cube_routed_window_share",
    "cube_routed_window_lag",
    "streaming_stream_join",
    "cube_routed_q1_revenue",
    "cube_routed_rollup",
    "cube_routed_snowflake",
    "cube_routed_filter_dim",
    "cube_routed_global",
    "pack_token_budget",
    "q12_priority_lines",
    "lateral_explode_tokens",
    "scalar_conformance_string",
    "scalar_conformance_datetime",
    "scalar_conformance_nullary",
    "cube_routed_window_islands",
    "cube_routed_grouping_indicator",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "cube_routed_multi_col_distinct",
    "ssb_q1_1",
    "ssb_q1_2",
    "ssb_q1_3",
    "ssb_q2_1",
    "ssb_q2_2",
    "ssb_q2_3",
    "ssb_q3_1",
    "ssb_q3_2",
    "ssb_q3_3",
    "ssb_q3_4",
    "ssb_q4_1",
    "ssb_q4_2",
    "ssb_q4_3",
    "text_quality_quantile",
    "multimodal_decode_features",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "export_training_shards",
    "export_shard_manifest",
    "text_chunk_windows",
    "sample_split_corpus",
    "text_repetition_features",
    "text_redact_pii",
    "sample_domain_mix",
    "q12_shipmode",
    "jdbc_source_agg",
    "csv_source_roundtrip",
    "orc_source_roundtrip",
    "ordered_set_aggs",
    "scalar_conformance_math",
    "percentile_kll_sketch",
    "cube_routed_percentile_sketch",
    "cube_routed_topn_pinned",
    "cube_routed_topn_range",
    "extended_column_first",
    "raw_detail_values",
    "asof_join_events",
    "range_join_binned",
    "ordinal_group_order",
    "window_nth_value",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable] = {}
    for mod in _modules():
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate corpus query names: {overlap}")
        merged.update(mod.QUERIES)
    out: dict[str, Callable] = {}
    for name in _PRIORITY:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
