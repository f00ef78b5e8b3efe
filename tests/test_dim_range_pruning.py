"""Dimension-range segment pruning (reference SegmentPruner.check +
DimensionRangeInfo / CubeSegment.dimensionRangeInfoMap, recorded by
UpdateCubeInfoAfterBuildStep): a filter on ANY dimension — not just the
partition column — prunes segments whose recorded [min, max] provably
cannot satisfy it. The reference ships a dedicated SSB cube descriptor for
this (cube_desc/ssb_cube_with_dimention_range.json)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from tests.conftest import SF_SMOKE

#: o_month is perfectly segment-correlated (month-granularity segments hold
#: exactly one month value), o_bucket is a coarse int with partial overlap,
#: o_orderpriority is a string dim present in every segment (never prunable)
_VIEW = """
CREATE OR REPLACE TEMPORARY VIEW orders_m AS
SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice, o_orderdate,
       month(o_orderdate) AS o_month,
       cast(year(o_orderdate) - 1995 as int) AS o_bucket
FROM orders
"""

MODEL = DataModel(
    name="orders_m_star", fact_table="orders_m", partition_column="o_orderdate"
)

CUBE = CubeDesc(
    name="orders_m_cube",
    model_name="orders_m_star",
    dimensions=("o_orderpriority", "o_month", "o_bucket"),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        MeasureDesc("sum_price", FunctionDesc("SUM", "o_totalprice")),
        MeasureDesc("count_price", FunctionDesc("COUNT", "o_totalprice")),
    ),
    segment_granularity="month",
)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("dimrange")))
    e.register_sources(SF_SMOKE)
    spark.sql(_VIEW)
    e.add_model(MODEL)
    e.build_cube(CUBE)
    return e


def test_ranges_recorded_per_segment(eng):
    inst = eng.cubes["orders_m_cube"]
    assert inst.segmented and inst.dim_ranges
    for seg, ranges in inst.dim_ranges.items():
        # month-granularity segments hold exactly one month value
        mn, mx = ranges["o_month"]
        assert mn == mx == int(seg[5:7])
        assert set(ranges) == {"o_orderpriority", "o_month", "o_bucket"}


def test_equality_on_correlated_dim_prunes_other_months(eng, spark):
    import re

    sql = """
        select o_orderpriority, sum(o_totalprice) as total, count(*) as n
        from orders_m where o_month = 3 group by o_orderpriority
    """
    eng.sql(sql, validate=True)  # routed == flat
    route = eng.last_route
    assert route is not None and route.cube == "orders_m_cube"
    inst = eng.cubes["orders_m_cube"]
    n_march = sum(1 for s in inst.dim_ranges if s[5:7] == "03")
    assert len(route.segment_reject) == len(inst.dim_ranges) - n_march
    assert all(s[5:7] != "03" for s in route.segment_reject)
    # and the rejects land as a PARTITION filter (metadata-level dir
    # pruning — whole segment dirs are never listed), not a row filter
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        df = eng.sql(sql)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    m = re.search(r"PartitionFilters: \[(.*?)\], PushedFilters", plan, re.S)
    assert m is not None, plan[:800]
    not_in = m.group(1)[m.group(1).find("NOT") :]
    assert not_in.startswith("NOT"), m.group(1)[:300]
    months = set(re.findall(r"\d{4}-(\d{2})-01", not_in))
    assert months == {f"{i:02d}" for i in range(1, 13)} - {"03"}


def test_range_prune_metric_counts(eng):
    before = eng.metrics["segments_range_pruned"]
    eng.sql("select count(*) as n from orders_m where o_month = 7")
    route = eng.last_route
    assert route is not None and route.segment_reject
    assert (
        eng.metrics["segments_range_pruned"] - before == len(route.segment_reject)
    )


def test_between_and_in_forms_prune(eng):
    eng.sql(
        """
        select sum(o_totalprice) as total from orders_m
        where o_month between 2 and 3
        """,
        validate=True,
    )
    r1 = eng.last_route
    assert r1 is not None and r1.segment_reject
    assert all(s[5:7] not in ("02", "03") for s in r1.segment_reject)
    eng.sql(
        "select count(*) as n from orders_m where o_month in (1, 12)",
        validate=True,
    )
    r2 = eng.last_route
    assert r2 is not None and r2.segment_reject
    assert all(s[5:7] not in ("01", "12") for s in r2.segment_reject)


def test_string_dim_rejects_exactly_the_provably_disjoint(eng):
    """A string dim present in nearly every segment prunes only the
    segments whose recorded [min, max] genuinely excludes the literal
    (e.g. a sparse boundary month) — validate=True proves the answer is
    untouched either way."""
    eng.sql(
        """
        select o_month, count(*) as n from orders_m
        where o_orderpriority = '3-MEDIUM' group by o_month
        """,
        validate=True,
    )
    route = eng.last_route
    assert route is not None
    ranges = eng.cubes["orders_m_cube"].dim_ranges
    expect = [
        seg
        for seg, r in ranges.items()
        if not (r["o_orderpriority"][0] <= "3-MEDIUM" <= r["o_orderpriority"][1])
    ]
    assert sorted(route.segment_reject) == sorted(expect)


def test_unknown_segment_is_always_kept(eng):
    """NOT-IN semantics: a segment with no recorded ranges (e.g. freshly
    appended before the range job lands) can never be rejected."""
    inst = eng.cubes["orders_m_cube"]
    seg = sorted(inst.dim_ranges)[0]
    saved = inst.dim_ranges.pop(seg)
    try:
        eng._route_memo.clear()
        eng.sql(
            "select count(*) as n from orders_m where o_month = 6",
            validate=True,
        )
        route = eng.last_route
        assert route is not None
        assert seg not in route.segment_reject
    finally:
        inst.dim_ranges[seg] = saved
        eng._route_memo.clear()


def test_or_disables_dim_range_pruning(eng):
    eng.sql(
        """
        select count(*) as n from orders_m
        where o_month = 3 or o_month = 4
        """,
        validate=True,
    )
    route = eng.last_route
    if route is not None:  # routed or not, never a reject list under OR
        assert route.segment_reject == []


def test_merge_widens_ranges_and_stops_pruning(eng, spark):
    """After a merge the absorbed dir covers several months — the recomputed
    ranges must widen, and an o_month filter must keep the merged dir."""
    from kylin_on_parquet_v2_spark.cube.merge import merge_segments

    inst = eng.cubes["orders_m_cube"]
    before = eng.sql(
        "select count(*) as n from orders_m where o_month = 2"
    ).collect()[0]["n"]
    segs = sorted(inst.segments(spark))[:3]  # Jan..Mar of the first year
    merged = segs[0]
    merge_segments(spark, inst, segs, merged)
    eng._route_memo.clear()
    eng._cache.clear()
    mn, mx = inst.dim_ranges[merged]["o_month"]
    assert (mn, mx) == (1, 3)
    eng.sql(
        "select count(*) as n from orders_m where o_month = 2", validate=True
    )
    route = eng.last_route
    assert route is not None
    assert merged not in route.segment_reject  # widened range keeps the dir
    after = eng.sql(
        "select count(*) as n from orders_m where o_month = 2"
    ).collect()[0]["n"]
    assert after == before


def test_nan_float_dim_records_no_bounds_and_never_prunes(spark, tmp_path):
    """Spark orders NaN above every double, so max() over a NaN-bearing
    segment returns NaN and every range check would go false — the segment
    would be wrongly pruned even though its NaN rows SATISFY `val > x`
    under Spark semantics. Such segments must record no bounds for the dim."""
    rows = [
        (1, 5.0, "2020-01-05"),
        (2, float("nan"), "2020-01-06"),
        (3, 7.0, "2020-02-05"),
    ]
    spark.createDataFrame(rows, "id long, val double, d string").selectExpr(
        "id", "val", "cast(d as timestamp) as d"
    ).createOrReplaceTempView("nanfact")
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "nan_cubes"))
    eng.add_model(
        DataModel(name="nan_star", fact_table="nanfact", partition_column="d")
    )
    eng.build_cube(
        CubeDesc(
            name="nan_cube",
            model_name="nan_star",
            dimensions=("val",),
            measures=(MeasureDesc("_count", FunctionDesc("COUNT")),),
            segment_granularity="month",
        )
    )
    inst = eng.cubes["nan_cube"]
    assert "val" not in inst.dim_ranges["2020-01-01"]  # NaN present: no bounds
    assert inst.dim_ranges["2020-02-01"]["val"] == [7.0, 7.0]
    eng.sql("select count(*) as n from nanfact where val > 5", validate=True)
    route = eng.last_route
    assert route is not None
    assert "2020-01-01" not in route.segment_reject
