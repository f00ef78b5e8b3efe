"""Standard model/cube fixtures over the driver testdata.

This is our analogue of the reference's bundled CI metadata
(``examples/test_case_data/localmeta/model_desc/ci_inner_join_model.json`` and
``cube_desc/ci_left_join_cube.json``): one declared star model + cube over the
TPC-H-ish tables in ``/root/testdata/sf*`` (see FIXTURES.md §B), used by tests,
``__spark_entry__`` and the bench.
"""

from __future__ import annotations

from kylin_on_parquet_v2_spark.metadata import (
    AggregationGroup,
    CubeDesc,
    DataModel,
    FunctionDesc,
    JoinDesc,
    JoinTable,
    MeasureDesc,
)

#: lineitem fact star/snowflake: orders, part, supplier (+customer via orders,
#: nation/region via customer — snowflake hops, like the reference's
#: FACT→ORDER→ACCOUNT→COUNTRY depth-3 chain).
#: TPC-H q1's expression measures, declared as model computed columns and
#: materialized in the flat table at build (CreateFlatTable.scala:43-95);
#: the router rewrites matching agg-over-expression calls onto them.
_COMPUTED = {
    "revenue": "l_extendedprice * (1 - l_discount)",
    "charge": "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
}

TPCH_MODEL = DataModel(
    name="tpch_star",
    fact_table="lineitem",
    computed_columns=_COMPUTED,
    lookups=(
        JoinTable("orders", JoinDesc(("l_orderkey",), ("o_orderkey",), "inner")),
        JoinTable("part", JoinDesc(("l_partkey",), ("p_partkey",), "inner")),
        JoinTable("supplier", JoinDesc(("l_suppkey",), ("s_suppkey",), "inner")),
        JoinTable(
            "customer",
            JoinDesc(("o_custkey",), ("c_custkey",), "inner"),
            fk_table="orders",
        ),
        JoinTable(
            "nation",
            JoinDesc(("c_nationkey",), ("n_nationkey",), "inner"),
            fk_table="customer",
        ),
        JoinTable(
            "region",
            JoinDesc(("n_regionkey",), ("r_regionkey",), "inner"),
            fk_table="nation",
        ),
    ),
)

TPCH_CUBE = CubeDesc(
    name="tpch_cube",
    model_name="tpch_star",
    dimensions=(
        "l_returnflag",
        "l_linestatus",
        "o_orderpriority",
        "o_orderstatus",
        "p_brand",
        "n_name",
        "r_name",
    ),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        # COUNT(col) measures back AVG decomposition: AVG = SUM(col)/COUNT(col)
        # (COUNT(*) would miscount NULLs — see plan_route).
        MeasureDesc("count_qty", FunctionDesc("COUNT", "l_quantity")),
        MeasureDesc("count_price", FunctionDesc("COUNT", "l_extendedprice")),
        MeasureDesc("sum_qty", FunctionDesc("SUM", "l_quantity")),
        MeasureDesc("sum_base_price", FunctionDesc("SUM", "l_extendedprice")),
        MeasureDesc("sum_discount", FunctionDesc("SUM", "l_discount")),
        MeasureDesc("min_price", FunctionDesc("MIN", "l_extendedprice")),
        MeasureDesc("max_price", FunctionDesc("MAX", "l_extendedprice")),
        MeasureDesc("hll_suppkey", FunctionDesc("COUNT_DISTINCT", "l_suppkey", "hllc(12)")),
        # precise re-aggregatable distinct on a non-dimension column: global
        # dictionary + word-bag bitmap (PreciseCountDistinct parity); exact,
        # so served by default (unlike the opt-in hll sketch above)
        MeasureDesc("bm_partkey", FunctionDesc("COUNT_DISTINCT", "l_partkey", "bitmap")),
        # stored TopN: exact per-layout top-50 suppliers by quantity — serves
        # `group by l_suppkey order by sum(l_quantity) desc limit k<=50`
        # without l_suppkey being a dimension (TopNUDAF/TopNMeasureType parity)
        MeasureDesc(
            "topn_suppkey_qty",
            FunctionDesc("TOP_N", "l_quantity", "topn(50)", extra_params=("l_suppkey",)),
        ),
        # mergeable percentile sketch: fixed-bin histogram over the declared
        # domain (l_quantity is 1..50); accuracy = bin width 0.5. The
        # deterministic replacement for the reference's t-digest
        # (PercentileMeasureType) — re-aggregates exactly (bin-wise sum).
        MeasureDesc(
            "hist_qty", FunctionDesc("PERCENTILE_APPROX", "l_quantity", "hist(100,0,50)")
        ),
        # expression measures over model computed columns
        MeasureDesc("sum_revenue", FunctionDesc("SUM", "revenue")),
        MeasureDesc("count_revenue", FunctionDesc("COUNT", "revenue")),
        MeasureDesc("sum_charge", FunctionDesc("SUM", "charge")),
    ),
    aggregation_groups=(
        AggregationGroup(
            includes=(
                "l_returnflag",
                "l_linestatus",
                "o_orderpriority",
                "o_orderstatus",
                "p_brand",
                "n_name",
                "r_name",
            ),
            # region > nation is a natural hierarchy: no cuboid keeps n_name
            # without r_name's ancestor slot being free — prunes the lattice.
            hierarchies=(("r_name", "n_name"),),
            # deep combinations re-aggregate from the base cuboid instead of
            # being materialized (max-combination safeguard) — ~1/3 fewer
            # layouts with no routing-correctness impact.
            max_combination=3,
        ),
    ),
    shard_by="p_brand",
)

#: Same star, declared with a partition column: cuboid layouts are written
#: as month-segment partition dirs (reference: segment per TSRange,
#: PathManager segment=... dirs) and date filters prune whole segments.
TPCH_MODEL_SEG = DataModel(
    name="tpch_star_seg",
    fact_table="lineitem",
    lookups=TPCH_MODEL.lookups,
    computed_columns=_COMPUTED,
    partition_column="l_shipdate",
)

#: Behavior-analysis cube over the events stream table: one dimension
#: (event_type) + a precise bitmap distinct on user_id. This is the layout
#: INTERSECT_COUNT retention/funnel queries route onto — per-cohort word
#: bags bit_and-ed together (reference sql_intersect_count corpus +
#: IntersectBitmapCounter.scala).
EVENTS_MODEL = DataModel(name="events_star", fact_table="events")

EVENTS_CUBE = CubeDesc(
    name="events_cube",
    model_name="events_star",
    dimensions=("event_type",),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        MeasureDesc("bm_user", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")),
    ),
)

#: Day-segmented events cube — the BATCH half of the hybrid realization
#: (reference HybridInstance): built only through the historical boundary;
#: the realtime streaming store owns everything after it. Measures must
#: merge exactly across the batch/realtime split: the additive family
#: (SUM/MIN/MAX/COUNT, AVG by decomposition) plus — round 6 — the
#: MERGEABLE-DISTINCT family: the dictionary-id word-bag bitmap, whose
#: bit_or merge is idempotent, so distinct/INTERSECT_COUNT serve across
#: the boundary too (reference realtime cubes encode at ingest:
#: stream-core RecordsAggregator + NGlobalDictionaryV2).
EVENTS_MODEL_SEG = DataModel(
    name="events_stream", fact_table="events", partition_column="ts"
)

EVENTS_CUBE_SEG = CubeDesc(
    name="events_cube_seg",
    model_name="events_stream",
    dimensions=("event_type",),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        MeasureDesc("sum_value", FunctionDesc("SUM", "value")),
        # COUNT(value) completes the AVG(value) -> SUM/COUNT decomposition
        # pair, so AVG serves across the hybrid batch/realtime split too
        MeasureDesc("count_value", FunctionDesc("COUNT", "value")),
        MeasureDesc("min_value", FunctionDesc("MIN", "value")),
        MeasureDesc("max_value", FunctionDesc("MAX", "value")),
        MeasureDesc("bm_user", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")),
        # mergeable histogram percentile: bin-wise-sum state is additive, so
        # it serves ACROSS the batch/realtime split (values past the declared
        # bounds clamp into the edge bins on both build and oracle sides)
        MeasureDesc(
            "hist_value", FunctionDesc("PERCENTILE_APPROX", "value", "hist(128,0,512)")
        ),
    ),
    segment_granularity="day",
)

TPCH_CUBE_SEG = CubeDesc(
    name="tpch_cube_seg",
    model_name="tpch_star_seg",
    dimensions=(
        "l_shipdate",
        "l_returnflag",
        "l_linestatus",
        # FK dim hosting derived customer/nation attributes: the router
        # recovers e.g. n_name by joining the lookup back on c_nationkey
        # (DerivedProcess parity) instead of storing it in the cube.
        "c_nationkey",
    ),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        MeasureDesc("sum_qty", FunctionDesc("SUM", "l_quantity")),
        MeasureDesc("count_qty", FunctionDesc("COUNT", "l_quantity")),
        MeasureDesc("sum_price", FunctionDesc("SUM", "l_extendedprice")),
        MeasureDesc("count_price", FunctionDesc("COUNT", "l_extendedprice")),
        MeasureDesc("sum_disc", FunctionDesc("SUM", "l_discount")),
        MeasureDesc("count_disc", FunctionDesc("COUNT", "l_discount")),
        # full TPC-H q1 from the segmented cube: expression measures
        MeasureDesc("sum_revenue", FunctionDesc("SUM", "revenue")),
        MeasureDesc("sum_charge", FunctionDesc("SUM", "charge")),
        # stored TopN on a SEGMENTED cube: legal because l_shipdate (the
        # partition column) is a dimension — lists are keyed per day, so
        # they never merge across segments (exactness contract), and a
        # date-pinned top-k takes the stored-list route
        # (TopNMeasureType.java:261-330 storage-partition capability)
        MeasureDesc(
            "topn_supp_qty",
            FunctionDesc("TOP_N", "l_quantity", "topn(50)", extra_params=("l_suppkey",)),
        ),
    ),
    segment_granularity="month",
)
