"""Property-based dual execution for the HYBRID realization: randomized
aggregate queries (additive, AVG, bitmap distinct, dimension distinct,
filters on dims and the partition column, plain GROUP BY and ROLLUP) must
give identical answers served across the batch/realtime split and pushed
down over the full fact view — the CompareLevel.SAME harness applied to the
round-6 hybrid serving matrix."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

_ENGINE = None


def _engine(spark, tmp_dir="/tmp/kylin_hybrid_prop"):
    global _ENGINE
    if _ENGINE is not None:
        return _ENGINE
    rows = []
    for day in (1, 2, 3, 4):
        for u in range(14):
            et = ["view", "click", "purchase"][(u + day) % 3]
            rows.append((et, dt.date(2024, 9, day), u, float((u * day) % 7 + 1)))
    df = spark.createDataFrame(rows, "etype string, d date, user_id long, v double")
    df.createOrReplaceTempView("hp_fact")
    rt_dir = f"{tmp_dir}/rt"
    df.withColumn("__segment__", F.date_format("d", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("__segment__").parquet(rt_dir)
    eng = OlapEngine(spark, storage_dir=f"{tmp_dir}/cubes")
    eng.add_model(DataModel(name="hp_star", fact_table="hp_fact", partition_column="d"))
    eng.build_cube(
        CubeDesc(
            name="hp_cube",
            model_name="hp_star",
            dimensions=("etype", "d"),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
                MeasureDesc("cnt_v", FunctionDesc("COUNT", "v")),
                MeasureDesc("min_v", FunctionDesc("MIN", "v")),
                MeasureDesc("max_v", FunctionDesc("MAX", "v")),
                MeasureDesc(
                    "bm_user", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")
                ),
            ),
            segment_granularity="day",
        ),
        segment_range=(None, "2024-09-02"),
    )
    eng.register_hybrid("hp_cube", rt_dir, ts_col="d")
    _ENGINE = eng
    return eng


MEASURES = [
    "count(*) as n",
    "sum(v) as sv",
    "min(v) as mn",
    "max(v) as mx",
    "avg(v) as av",
    "count(distinct user_id) as ndu",
    "count(distinct etype) as nde",
    "count(distinct d) as ndd",
]
FILTERS = [
    None,
    "etype = 'view'",
    "etype in ('click', 'purchase')",
    "d >= date '2024-09-02'",
    "d <= date '2024-09-03'",
    "d >= date '2024-09-01' and d <= date '2024-09-03'",
    "etype <> 'view' and d > date '2024-09-02'",
]


@st.composite
def hybrid_query(draw):
    group = draw(
        st.lists(st.sampled_from(["etype", "d"]), min_size=0, max_size=2, unique=True)
    )
    # distinct-on-a-grouped-dim is degenerate but legal; keep it in
    measures = draw(
        st.lists(st.sampled_from(MEASURES), min_size=1, max_size=4, unique=True)
    )
    filt = draw(st.sampled_from(FILTERS))
    rollup = draw(st.booleans()) and len(group) > 0
    sel = ", ".join(group + measures)
    sql = f"select {sel} from hp_fact"
    if filt:
        sql += f" where {filt}"
    if group:
        kw = "rollup(" + ", ".join(group) + ")" if rollup else ", ".join(group)
        sql += f" group by {kw}"
    return sql


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=hybrid_query())
def test_hybrid_routed_equals_pushdown(spark, sql):
    eng = _engine(spark)
    eng.sql(sql, validate=True)  # raises on any served/pushdown divergence
    route = eng.last_route
    assert route is not None and route.hybrid_tail, f"expected hybrid route: {sql}"
