"""Cube planner tests (CuboidRecommender/BPUSCalculator parity): the BPUS
greedy must pick the cuboids a recorded workload actually needs, and a
planner-pruned cube must answer the same workload with identical values."""

from __future__ import annotations

import dataclasses

import pytest

from kylin_on_parquet_v2_spark.cube.cuboid import CuboidScheduler
from kylin_on_parquet_v2_spark.cube.planner import estimate_cuboid_rows, recommend_cuboids
from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE, TPCH_MODEL
from kylin_on_parquet_v2_spark.metadata import CubeDesc, FunctionDesc, MeasureDesc
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from tests.conftest import SF_SMOKE

PLAN_CUBE = CubeDesc(
    name="plan_cube",
    model_name="m",
    dimensions=("a", "b", "c"),
    measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
)


def _sched():
    return CuboidScheduler(PLAN_CUBE)


def _ids(sched):
    return {c.dims: i for i, c in sched.cuboids.items()}


def test_greedy_picks_hot_cheap_cuboid():
    sched = _sched()
    ids = _ids(sched)
    base = ids[("a", "b", "c")]
    rows = {base: 1000, ids[("a",)]: 10, ids[("a", "b")]: 500, ids[("b",)]: 900}
    # workload: (a) is hot; (b) occasionally
    workload = {frozenset({"a"}): 100, frozenset({"b"}): 1}
    picked = recommend_cuboids(sched, workload, rows, max_cuboids=1)
    # base + 0-dim always kept; the single greedy pick must be the hot,
    # tiny (a) cuboid — (a,b) saves less per row, (b) saves almost nothing
    assert ids[("a",)] in picked
    assert ids[("a", "b")] not in picked and ids[("b",)] not in picked


def test_greedy_respects_budget():
    sched = _sched()
    ids = _ids(sched)
    base = ids[("a", "b", "c")]
    rows = {base: 1000, ids[("a",)]: 400, ids[("b",)]: 90}
    workload = {frozenset({"a"}): 10, frozenset({"b"}): 10}
    # budget: base (1000) + 0-dim (no measured rows -> 0) + 100 more rows
    picked = recommend_cuboids(sched, workload, rows, budget_rows=1100)
    assert ids[("b",)] in picked  # fits
    assert ids[("a",)] not in picked  # 400 rows does not fit


def test_greedy_ignores_uncoverable_and_unsized():
    sched = _sched()
    ids = _ids(sched)
    base = ids[("a", "b", "c")]
    rows = {base: 1000, ids[("a",)]: 10}  # (b,) has no size info
    workload = {frozenset({"z"}): 50, frozenset({"b"}): 50}
    picked = recommend_cuboids(sched, workload, rows)
    # only base + 0-dim + nothing: (b,) unsized, z uncoverable, and the
    # (a,) cuboid serves no recorded query
    assert ids[("a",)] not in picked


def test_estimate_rows_caps_at_base():
    assert estimate_cuboid_rows(["a", "b"], 100, {"a": 50, "b": 50}) == 100
    assert estimate_cuboid_rows(["a"], 100, {"a": 7}) == 7
    assert estimate_cuboid_rows([], 100, {}) == 1


def test_pruned_cube_serves_recorded_workload(spark, tmp_path):
    """End-to-end planner loop: run a workload, recommend, rebuild the cube
    with ONLY the recommended cuboids, and re-answer the workload with
    identical values (validate=True) — fewer layouts, same answers."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "full"))
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL)
    full = eng.build_cube(TPCH_CUBE)

    queries = [
        "select l_returnflag, sum(l_quantity) as s from lineitem group by l_returnflag",
        """select l_returnflag, l_linestatus, count(*) as n
           from lineitem group by l_returnflag, l_linestatus""",
        "select count(*) as n from lineitem",
    ]
    for q in queries:
        eng.sql(q)

    ids = eng.recommend_cuboids(TPCH_CUBE.name)
    assert len(ids) < len(full.scheduler.cuboids), "planner should prune"

    pruned_desc = dataclasses.replace(TPCH_CUBE, cuboid_ids=tuple(ids))
    eng2 = OlapEngine(spark, storage_dir=str(tmp_path / "pruned"))
    eng2.register_sources(SF_SMOKE)
    eng2.add_model(TPCH_MODEL)
    pruned = eng2.build_cube(pruned_desc)
    assert len(pruned.layouts) == len(ids)
    assert len(pruned.layouts) < len(full.layouts)
    for q in queries:
        eng2.sql(q, validate=True)
        assert eng2.last_route is not None, q
