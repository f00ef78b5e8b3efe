"""Regression tests for the round-9 advisor findings.

#1 (medium): route-memo staleness must be ENFORCED, not documented — a
caller driving cube/merge.py directly (outside OlapEngine.refresh_cube)
must not be able to replay a stale segment_reject that silently drops a
merged segment's rows (covered in test_route_memo.py::test_memo_survives_
direct_merge_without_manual_clear).
#2 (low): the map-side probe must walk the plan tree with an allowlist —
no substring false-positives on column names, unknown node kinds fail
closed, subquery filters fail too.
#3 (low): the streaming gate keeps the non-empty replay path atomic
(write-first; delete only on an observed-zero write) — covered by
test_advice_r8/r9 gate tests staying green on the new order.
#4 (low): the docs-quality histogram domain is asserted at build time.
#5 (low): scale_curve.py --ops arg validation (exercised in CI by hand).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_map_side_probe_keyword_column_name_not_false_positive(spark):
    """A column literally named 'JoinDate' used to trip the 'Join' substring
    blocker; the tree walk must pass it (scan+project is map-side)."""
    from kylin_on_parquet_v2_spark.pipeline.similarity import _map_side_only

    df = spark.range(50).selectExpr("id as JoinDate", "id as SortKey")
    assert _map_side_only(df.select("JoinDate", "SortKey"))


def test_map_side_probe_fails_closed_on_unlisted_nodes(spark):
    """Per-partition Python evaluation (mapInPandas, scalar pandas_udf)
    stays map-side — no hidden distribution requirement — while GROUPED
    applyInPandas (FlatMapGroupsInPandas needs a ClusteredDistribution =>
    physical Exchange) must fail the probe even though no shuffle node
    appears in the LOGICAL plan."""
    from pyspark.sql.functions import pandas_udf

    from kylin_on_parquet_v2_spark.pipeline.similarity import _map_side_only

    df = spark.range(20).selectExpr("id as vec_id")

    def passthrough(batches):
        yield from batches

    assert _map_side_only(df.mapInPandas(passthrough, "vec_id long"))

    @pandas_udf("long")
    def twice(s):
        return s * 2

    assert _map_side_only(df.select(twice("vec_id").alias("v")))
    grouped = df.groupBy("vec_id").applyInPandas(
        lambda pdf: pdf, "vec_id long"
    )
    assert not _map_side_only(grouped)


def test_map_side_probe_blocks_scalar_subquery_filters(spark):
    """A scalar subquery in a filter runs as its own job when the plan
    finalizes — the probe must treat it as not map-side."""
    from kylin_on_parquet_v2_spark.pipeline.similarity import _map_side_only

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    docs.createOrReplaceTempView("__probe_docs")
    sq = spark.sql(
        "select doc_id from __probe_docs "
        "where n_chars > (select avg(n_chars) from __probe_docs)"
    )
    assert not _map_side_only(sq)
    assert _map_side_only(docs.filter("n_chars > 10").select("doc_id"))


def test_ntok_hist_domain_violation_fails_loudly(spark, tmp_path):
    """An n_tokens value outside the declared [0, 111] histogram domain
    must raise at cube-build time instead of silently clamping into the
    edge bin and skewing sketch-served quantiles."""
    import pytest

    from kylin_on_parquet_v2_spark.corpus import pipeline as P
    from kylin_on_parquet_v2_spark.session import SOURCE_TABLES

    fixture = tmp_path / "sf_domain_violation"
    fixture.mkdir()
    for t in SOURCE_TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t == "documents":
            docs = spark.read.parquet(src).limit(20)
            # one doc with 200 whitespace tokens — far out of domain
            doctored = docs.withColumn(
                "text",
                F.when(
                    F.col("doc_id") == docs.select(F.min("doc_id")).first()[0],
                    F.array_join(F.array_repeat(F.lit("tok"), 200), " "),
                ).otherwise(F.col("text")),
            )
            doctored.write.parquet(str(fixture / "documents.parquet"))
        else:
            os.symlink(src, str(fixture / f"{t}.parquet"))
    with pytest.raises(ValueError, match="histogram domain"):
        P._docs_quality_engine(spark, str(fixture))
