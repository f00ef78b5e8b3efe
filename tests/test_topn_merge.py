"""Multi-segment stored-TopN merge (round-6 verdict item 6): a date-RANGE /
whole-history top-k is refused by the exact rule (merged truncated lists are
approximate — TopNMeasureType.java:261-330) but served under the engine's
``approx_topn=True`` opt-in by exploding every surviving stored list,
re-summing per rank key, and re-ranking. Declared error bound: estimates
never exceed the truth, and a key's loss is at most the sum of the minimum
stored values of the lists it is missing from."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

N = 5  # stored list size — small so the 12-key universe truncates hard

MODEL = DataModel(name="tm_star", fact_table="tm_fact", partition_column="d")
CUBE = CubeDesc(
    name="tm_cube",
    model_name="tm_star",
    dimensions=("d",),
    measures=(
        MeasureDesc("_count", FunctionDesc("COUNT")),
        MeasureDesc(
            "topn_k", FunctionDesc("TOP_N", "v", f"topn({N})", extra_params=("key",))
        ),
    ),
    segment_granularity="day",
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    rows = []
    # 12 keys; per day each key contributes (key_id * day + offset) so the
    # per-day ranking ORDER CHANGES across days => different keys truncate
    # out of different daily lists
    for day in (1, 2, 3, 4):
        for k in range(12):
            v = float((k * day) % 11 + 1 + k)
            rows.append((f"k{k:02d}", dt.date(2024, 5, day), v))
    spark.createDataFrame(rows, "key string, d date, v double").createOrReplaceTempView(
        "tm_fact"
    )
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("tm_cubes")))
    eng.add_model(MODEL)
    eng.build_cube(CUBE)
    return eng


RANGE_SQL = (
    "select key, sum(v) as s from tm_fact "
    "where d >= date '2024-05-01' and d <= date '2024-05-03' "
    "group by key order by s desc limit 3"
)
ALL_SQL = "select key, sum(v) as s from tm_fact group by key order by s desc limit 3"


def test_range_topn_refused_without_opt_in(engine):
    engine.sql(RANGE_SQL)
    r = engine.last_route
    assert r is None or r.topn is None  # exact refusal is the default


def test_range_topn_served_with_opt_in_and_bounded_error(engine, spark):
    df = engine.sql(RANGE_SQL, approx_topn=True)
    r = engine.last_route
    assert r is not None and r.topn is not None and r.topn_approx, r
    assert r.segment_filters, "range bounds must still prune segment dirs"
    got = {row["key"]: row["s"] for row in df.collect()}
    assert len(got) == 3

    fact = spark.table("tm_fact").filter(
        (F.col("d") >= "2024-05-01") & (F.col("d") <= "2024-05-03")
    )
    true = {
        row["key"]: row["s"]
        for row in fact.groupBy("key").agg(F.sum("v").alias("s")).collect()
    }
    # per-day stored-list minima: the most a key can lose per missing day
    daily = fact.groupBy("d", "key").agg(F.sum("v").alias("s")).collect()
    from collections import defaultdict

    per_day = defaultdict(list)
    for row in daily:
        per_day[row["d"]].append((row["s"], row["key"]))
    day_min = {
        d: sorted(vals, key=lambda t: (-t[0], t[1]))[:N][-1][0]
        for d, vals in per_day.items()
    }
    bound = sum(day_min.values())
    for k, est in got.items():
        assert est <= true[k] + 1e-9, (k, est, true[k])  # never overestimates
        assert true[k] - est <= bound + 1e-9, (k, est, true[k], bound)


def test_whole_history_topn_served(engine, spark):
    df = engine.sql(ALL_SQL, approx_topn=True)
    r = engine.last_route
    assert r is not None and r.topn is not None and r.topn_approx, r
    assert len(df.collect()) == 3


def test_merge_exact_when_lists_cover_universe(spark, tmp_path_factory):
    """With n >= key cardinality nothing truncates: the merged answer must
    EQUAL the exact aggregation — the approximation is only ever the
    declared truncation loss."""
    rows = [
        (f"k{k}", dt.date(2024, 6, day), float(k + day))
        for day in (1, 2)
        for k in range(4)
    ]
    spark.createDataFrame(rows, "key string, d date, v double").createOrReplaceTempView(
        "tm_fact_small"
    )
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("tm_small")))
    eng.add_model(DataModel(name="tms_star", fact_table="tm_fact_small", partition_column="d"))
    eng.build_cube(
        CubeDesc(
            name="tms_cube",
            model_name="tms_star",
            dimensions=("d",),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc(
                    "topn_k", FunctionDesc("TOP_N", "v", "topn(50)", extra_params=("key",))
                ),
            ),
            segment_granularity="day",
        )
    )
    sql = "select key, sum(v) as s from tm_fact_small group by key order by s desc limit 4"
    got = [(r["key"], r["s"]) for r in eng.sql(sql, approx_topn=True).collect()]
    assert eng.last_route is not None and eng.last_route.topn_approx
    exp = [(r["key"], r["s"]) for r in eng.pushdown(sql).collect()]
    assert got == exp


def test_pinned_segment_stays_exact_route(engine):
    """A single-day equality keeps the EXACT pinned route (not the approx
    merge), with or without the opt-in."""
    sql = (
        "select key, sum(v) as s from tm_fact where d = date '2024-05-02' "
        "group by key order by s desc limit 3"
    )
    engine.sql(sql, approx_topn=True)
    r = engine.last_route
    assert r is not None and r.topn is not None and not r.topn_approx, r


@pytest.fixture(scope="module")
def hybrid_topn_engine(spark, tmp_path_factory):
    """Hybrid cube with a stored TopN measure: batch owns days 1-2, the
    realtime store has all 4 days."""
    from pyspark.sql import functions as SF

    rows = []
    for day in (1, 2, 3, 4):
        for k in range(12):
            v = float((k * day) % 11 + 1 + k)
            rows.append((f"k{k:02d}", dt.date(2024, 8, day), v))
    fact = spark.createDataFrame(rows, "key string, d date, v double")
    fact.createOrReplaceTempView("ht_fact")
    rt_dir = str(tmp_path_factory.mktemp("ht_rt"))
    fact.withColumn("__segment__", SF.date_format("d", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("__segment__").parquet(rt_dir)

    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("ht_cubes")))
    eng.add_model(DataModel(name="ht_star", fact_table="ht_fact", partition_column="d"))
    eng.build_cube(
        CubeDesc(
            name="ht_cube",
            model_name="ht_star",
            dimensions=("d",),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc(
                    "topn_k",
                    FunctionDesc("TOP_N", "v", f"topn({N})", extra_params=("key",)),
                ),
            ),
            segment_granularity="day",
        ),
        segment_range=(None, "2024-08-02"),
    )
    eng.register_hybrid("ht_cube", rt_dir, ts_col="d")
    return eng


def test_hybrid_topn_pinned_pre_boundary_exact(hybrid_topn_engine):
    """A day fully inside batch coverage: the tail prunes to nothing and
    the stored list alone answers — exact."""
    sql = (
        "select key, sum(v) as s from ht_fact where d = date '2024-08-01' "
        "group by key order by s desc limit 3"
    )
    df = hybrid_topn_engine.sql(sql)
    r = hybrid_topn_engine.last_route
    assert r is not None and r.topn is not None and r.hybrid_tail, r
    got = [(row["key"], row["s"]) for row in df.collect()]
    exp = [(row["key"], row["s"]) for row in hybrid_topn_engine.pushdown(sql).collect()]
    assert got == exp


def test_hybrid_topn_pinned_post_boundary_exact(hybrid_topn_engine):
    """A day AFTER batch coverage: the batch side contributes no list and
    the tail computes exact per-key sums — exact top-k from realtime."""
    sql = (
        "select key, sum(v) as s from ht_fact where d = date '2024-08-04' "
        "group by key order by s desc limit 3"
    )
    df = hybrid_topn_engine.sql(sql)
    r = hybrid_topn_engine.last_route
    assert r is not None and r.topn is not None and r.hybrid_tail, r
    got = [(row["key"], row["s"]) for row in df.collect()]
    exp = [(row["key"], row["s"]) for row in hybrid_topn_engine.pushdown(sql).collect()]
    assert got == exp


def test_hybrid_topn_history_requires_opt_in_and_is_bounded(hybrid_topn_engine, spark):
    sql = "select key, sum(v) as s from ht_fact group by key order by s desc limit 3"
    hybrid_topn_engine.sql(sql)
    r = hybrid_topn_engine.last_route
    assert r is None or r.topn is None  # exact refusal without opt-in

    df = hybrid_topn_engine.sql(sql, approx_topn=True)
    r = hybrid_topn_engine.last_route
    assert r is not None and r.topn is not None and r.topn_approx and r.hybrid_tail, r
    got = {row["key"]: row["s"] for row in df.collect()}
    true = {
        row["key"]: row["s"]
        for row in spark.table("ht_fact").groupBy("key").agg(F.sum("v").alias("s")).collect()
    }
    # batch lists truncate only on days 1-2; the tail (days 3-4) is exact,
    # so the loss is bounded by the two batch lists' minima
    daily = (
        spark.table("ht_fact")
        .filter(F.col("d") <= "2024-08-02")
        .groupBy("d", "key")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    from collections import defaultdict

    per_day = defaultdict(list)
    for row in daily:
        per_day[row["d"]].append((row["s"], row["key"]))
    bound = sum(
        sorted(vals, key=lambda t: (-t[0], t[1]))[:N][-1][0]
        for vals in per_day.values()
    )
    for k, est in got.items():
        assert est <= true[k] + 1e-9
        assert true[k] - est <= bound + 1e-9, (k, est, true[k], bound)
