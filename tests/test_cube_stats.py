"""Pre-build cuboid statistics tests (CubeStatsReader / FactDistinctColumns
statistics-step parity): per-cuboid HLL estimates from the flat table must
track exact group counts, beat the NDV-product bound on correlated dims,
and feed a phase-1 plan whose pruned cube still answers the workload."""

from __future__ import annotations

import pytest

from kylin_on_parquet_v2_spark.cube.cuboid import CuboidScheduler
from kylin_on_parquet_v2_spark.cube.planner import estimate_cuboid_rows
from kylin_on_parquet_v2_spark.cube.stats import (
    MAX_STATS_CUBOIDS,
    estimate_cuboid_stats,
)
from kylin_on_parquet_v2_spark.metadata import CubeDesc, DataModel, FunctionDesc, MeasureDesc
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

STATS_CUBE = CubeDesc(
    name="stats_cube",
    model_name="stats_star",
    dimensions=("a", "b", "c"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
    ),
)


@pytest.fixture(scope="module")
def fact(spark):
    # b is a FUNCTION of a (b = a % 5 twice over): ndv(a)=20, ndv(b)=10,
    # but ndv(a,b)=20 — the correlated case where the NDV-product bound
    # (200) overestimates 10x and the HLL tuple sketch stays exact-ish
    rows = [(i % 20, (i % 20) % 10, i % 7, float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, "a int, b int, c int, v double")
    df.createOrReplaceTempView("stats_fact")
    return df


def _exact(df, dims):
    return df.select(*dims).distinct().count()


def test_estimates_track_exact_group_counts(spark, fact):
    sched = CuboidScheduler(STATS_CUBE)
    est = estimate_cuboid_stats(fact, sched, rsd=0.02)
    assert set(est) == set(sched.cuboids)
    for cid, c in sched.cuboids.items():
        if not c.dims:
            assert est[cid] == 1
            continue
        exact = _exact(fact, c.dims)
        assert abs(est[cid] - exact) <= max(2, 0.05 * exact), (c.dims, est[cid], exact)


def test_hll_beats_ndv_product_on_correlated_dims(spark, fact):
    sched = CuboidScheduler(STATS_CUBE)
    ids = {c.dims: i for i, c in sched.cuboids.items()}
    est = estimate_cuboid_stats(fact, sched, rsd=0.02)
    ndv = {"a": 20, "b": 10, "c": 7}
    product_bound = estimate_cuboid_rows(("a", "b"), 5000, ndv)  # = 200
    exact_ab = _exact(fact, ("a", "b"))  # = 20
    assert product_bound >= 10 * exact_ab
    # the sketch sees the correlation the product cannot
    assert abs(est[ids[("a", "b")]] - exact_ab) <= 2


def test_lattice_cap_refuses_huge_aggregate(spark, fact):
    wide = CubeDesc(
        name="wide",
        model_name="stats_star",
        dimensions=tuple(f"d{i}" for i in range(13)),  # 2^13 = 8192 cuboids
        measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
    )
    sched = CuboidScheduler(wide)
    assert len(sched.cuboids) > MAX_STATS_CUBOIDS
    with pytest.raises(ValueError, match="MAX_STATS_CUBOIDS"):
        estimate_cuboid_stats(fact, sched, rsd=0.05)


def test_plan_cube_prebuild_end_to_end(spark, fact, tmp_path):
    """Phase-1 planning: estimate -> BPUS -> pruned build. The hot (a)
    query must get its own cuboid, the pruned cube must still answer the
    whole workload with values identical to pushdown, and the planning
    pass must not have written any layout."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "stats_cubes"))
    eng.add_model(DataModel(name="stats_star", fact_table="stats_fact"))

    planned = eng.plan_cube(
        STATS_CUBE,
        workload={("a",): 100, ("a", "b", "c"): 1},
        max_cuboids=1,
    )
    sched = CuboidScheduler(STATS_CUBE)
    ids = {c.dims: i for i, c in sched.cuboids.items()}
    assert ids[("a",)] in planned.cuboid_ids
    # planning alone builds nothing
    assert not (tmp_path / "stats_cubes" / "stats_cube").exists()

    eng.build_cube(planned)
    pruned_sched = eng.cubes["stats_cube"].scheduler
    assert set(pruned_sched.cuboids) == {ids[("a",)], ids[("a", "b", "c")], 0}

    df = eng.sql(
        "select a, sum(v) as sv, count(*) as n from stats_fact group by a order by a",
        validate=True,
    )
    route = eng.last_route
    assert route is not None and route.cuboid.dims == ("a",)
    assert df.count() == 20


def test_chunked_passes_identical_to_single_pass(spark, monkeypatch):
    """>64-cuboid lattice (7 dims => 127 sketches): the chunked (<=64 per
    Aggregate, codegen-safe) passes must produce BIT-IDENTICAL estimates
    to one giant aggregate — HLL++ is deterministic and each sketch is an
    independent column, so chunk boundaries cannot change results."""
    from kylin_on_parquet_v2_spark.cube import stats as S

    dims = tuple("abcdefg")
    cube = CubeDesc(
        name="wide_stats_cube",
        model_name="stats_star",
        dimensions=dims,
        measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
    )
    sched = CuboidScheduler(cube)
    assert len(sched.cuboids) == 128  # 2^7 incl. the 0-dim grand total
    df = spark.range(3000).selectExpr(
        *[f"cast(id % {p} as int) as {d}" for d, p in zip(dims, (2, 3, 5, 7, 11, 13, 17))]
    )
    chunked = estimate_cuboid_stats(df, sched, rsd=0.05)
    monkeypatch.setattr(S, "STATS_CHUNK", 10_000)  # force one giant pass
    single = estimate_cuboid_stats(df, sched, rsd=0.05)
    assert chunked == single
    assert len(chunked) == 128 and chunked[0] == 1
