"""Regression tests for round-1 advisor findings (ADVICE.md):

1. AVG must decompose to SUM(col)/COUNT(col) — COUNT(*) understates the
   answer when the AVG column holds NULLs (SQL AVG ignores NULLs).
2. Derived-dimension recovery must honor the model lookup's declared join
   type: a LEFT lookup keeps cuboid rows with orphan / unmatched FKs.
3. A routed query with no aggregate outputs (SELECT DISTINCT) must not call
   GroupedData.agg() with an empty list.
4. Aliased group columns (SELECT col AS c ... GROUP BY col) must project
   correctly on the non-exact path.
5. _fold_segment_filters must only fold top-level AND conjuncts — a
   partition-column comparison inside CASE WHEN must not prune segments.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from kylin_on_parquet_v2_spark.metadata import (
    AggregationGroup,
    CubeDesc,
    DataModel,
    FunctionDesc,
    JoinDesc,
    JoinTable,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.query.router import _fold_segment_filters

NULLS_MODEL = DataModel(
    name="nulls_star",
    fact_table="sales_f",
    lookups=(JoinTable("dim_l", JoinDesc(("fk",), ("pk",), "left")),),
)

NULLS_CUBE = CubeDesc(
    name="nulls_cube",
    model_name="nulls_star",
    dimensions=("d", "fk"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("cnt_v", FunctionDesc("COUNT", "v")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
    ),
    aggregation_groups=(AggregationGroup(includes=("d", "fk")),),
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    # fk=9 has no dim_l row (orphan under the LEFT lookup); v has NULLs.
    spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 1, None),
            ("a", 2, 30.0),
            ("b", 2, None),
            ("b", 3, 5.0),
            ("b", 9, 7.0),
        ],
        "d string, fk int, v double",
    ).createOrReplaceTempView("sales_f")
    spark.createDataFrame(
        [(1, "L1"), (2, "L2"), (3, "L3")], "pk int, label string"
    ).createOrReplaceTempView("dim_l")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("advice_cubes")))
    eng.add_model(NULLS_MODEL)
    eng.build_cube(NULLS_CUBE)
    return eng


def test_avg_ignores_nulls(engine):
    """ADVICE high: routed AVG over a nullable column must divide by
    COUNT(col), matching pushdown exactly despite the NULLs."""
    df = engine.sql("select d, avg(v) as a from sales_f group by d", validate=True)
    assert engine.last_route is not None
    got = {r.d: r.a for r in df.collect()}
    assert got["a"] == pytest.approx(20.0)  # (10+30)/2, not /3
    assert got["b"] == pytest.approx(6.0)  # (5+7)/2, not /3


def test_left_lookup_orphan_rows_kept(engine):
    """ADVICE medium: derived recovery over a LEFT lookup keeps the
    orphan-FK group (label NULL) instead of dropping it."""
    sql = """select label, count(*) as n from sales_f
             left join dim_l on fk = pk group by label"""
    df = engine.sql(sql, validate=True)
    route = engine.last_route
    assert route is not None and [lk.table for lk in route.derived] == ["dim_l"]
    rows = {r.label: r.n for r in df.collect()}
    assert rows[None] == 1  # fk=9 orphan row survives
    assert rows == {"L1": 2, "L2": 2, "L3": 1, None: 1}


def test_distinct_only_route_no_empty_agg(engine):
    """ADVICE medium: SELECT DISTINCT routes through the dedup path instead
    of raising on GroupedData.agg([])."""
    sql = "select distinct label from sales_f left join dim_l on fk = pk"
    df = engine.sql(sql, validate=True)
    assert engine.last_route is not None
    assert {r.label for r in df.collect()} == {"L1", "L2", "L3", None}


def test_aliased_group_column_non_exact(engine):
    """ADVICE medium: SELECT col AS c ... GROUP BY col on the non-exact
    (re-aggregation) path projects via the source column + alias."""
    df = engine.sql("select d as grp, avg(v) as a from sales_f group by d", validate=True)
    assert engine.last_route is not None
    assert df.columns == ["grp", "a"]
    assert {r.grp for r in df.collect()} == {"a", "b"}


def _seg_inst():
    return SimpleNamespace(
        segmented=True,
        model=SimpleNamespace(partition_column="l_shipdate"),
        desc=SimpleNamespace(segment_granularity="day"),
        segment_ranges={},
    )


def _digest(filter_sql):
    return SimpleNamespace(filter_sql=filter_sql)


def test_fold_skips_non_conjunct_comparison():
    """ADVICE low: a partition comparison inside CASE WHEN is not a
    top-level conjunct — folding it would wrongly prune kept rows."""
    sql = "CASE WHEN l_shipdate >= DATE '2020-05-01' THEN 1 ELSE 1 END = 1"
    assert _fold_segment_filters(_digest(sql), _seg_inst()) == []
    sql2 = "if(l_shipdate >= DATE '2020-05-01', 1, 1) = 1"
    assert _fold_segment_filters(_digest(sql2), _seg_inst()) == []


def test_fold_still_handles_real_conjuncts():
    sql = "l_shipdate >= DATE '2020-05-01' AND l_returnflag = 'A'"
    assert _fold_segment_filters(_digest(sql), _seg_inst()) == [
        "__segment__ >= '2020-05-01'"
    ]
    sql2 = "(l_shipdate >= DATE '2020-01-01') AND (l_shipdate < DATE '2020-03-01')"
    assert _fold_segment_filters(_digest(sql2), _seg_inst()) == [
        "__segment__ >= '2020-01-01'",
        "__segment__ <= '2020-03-01'",
    ]
