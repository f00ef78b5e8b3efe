"""Crash recovery: resumable full builds, idempotent increment reruns,
READY-segment serving visibility, and merge swap recovery.

Reference parity: the job engine resumes a crashed CubingJob from its last
completed step (core-job ExecutableManager.resumeJob — steps already in
SUCCEED state are skipped), and only READY CubeSegments serve queries
(CubeManager.promoteNewlyBuiltSegments flips state only when the job
commits) — a crashed job's partial output must be invisible and a rerun
must neither redo finished work nor double-count partial work.

Simulation: ``CubeBuilder._write_layout`` (and ``LocalFS.rename`` for the
merge swap) are monkeypatched to raise after N successful calls, landing
the crash between layout commits — exactly the windows the committed-
segment ledger and the swap sentinel have to close.
"""

from __future__ import annotations

import datetime as dt
import os
import threading

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark import fs as FS
from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL, CubeBuilder
from kylin_on_parquet_v2_spark.cube.merge import merge_segments
from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.streaming.hybrid import batch_boundary

CR_MODEL = DataModel(name="cr_star", fact_table="cr_f", partition_column="d")

CR_CUBE = CubeDesc(
    name="cr_cube",
    model_name="cr_star",
    dimensions=("cat", "d"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
        MeasureDesc("bm_u", FunctionDesc("COUNT_DISTINCT", "u", "bitmap")),
    ),
    segment_granularity="day",
)

DAY12 = [
    ("a", dt.date(2024, 1, 1), 10.0, 101),
    ("a", dt.date(2024, 1, 1), 5.0, 102),
    ("b", dt.date(2024, 1, 1), 1.0, 103),
    ("a", dt.date(2024, 1, 2), 2.0, 101),
    ("b", dt.date(2024, 1, 2), 4.0, 104),
]
DAY3 = [
    ("a", dt.date(2024, 1, 3), 7.0, 101),
    ("a", dt.date(2024, 1, 3), 3.0, 105),
    ("b", dt.date(2024, 1, 3), 9.0, 106),
]
SCHEMA = "cat string, d date, v double, u int"


def _register(spark, rows):
    spark.createDataFrame(rows, SCHEMA).createOrReplaceTempView("cr_f")


def _crash_write_after(monkeypatch, n_ok: int):
    """Patch _write_layout to fail every call after the first ``n_ok``."""
    orig = CubeBuilder._write_layout
    lock = threading.Lock()
    state = {"n": 0}

    def crashing(self, *a, **k):
        with lock:
            state["n"] += 1
            if state["n"] > n_ok:
                raise RuntimeError("simulated crash")
        return orig(self, *a, **k)

    monkeypatch.setattr(CubeBuilder, "_write_layout", crashing)
    return orig


def _success_files(cube_dir: str) -> dict[str, float]:
    """parquet files (with mtimes) under layout dirs that carry _SUCCESS."""
    out = {}
    for d in os.listdir(cube_dir):
        if not d.startswith("cuboid="):
            continue
        root = os.path.join(cube_dir, d)
        if not os.path.exists(os.path.join(root, "_SUCCESS")):
            continue
        for r, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    out[p] = os.path.getmtime(p)
    return out


def _dict_map(spark, storage, cube="cr_cube"):
    d = spark.read.parquet(os.path.join(storage, cube, "dict", "u"))
    return {r.value: r.did for r in d.collect()}


def _serve_engine(spark, storage, inst) -> OlapEngine:
    eng = OlapEngine(spark, storage_dir=storage)
    eng.add_model(CR_MODEL)
    eng.cubes[inst.desc.name] = inst
    return eng


def test_full_build_crash_then_resume(spark, tmp_path, monkeypatch):
    _register(spark, DAY12 + DAY3)
    orig = _crash_write_after(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        CubeBuilder(spark, CR_MODEL, CR_CUBE, str(tmp_path)).build()
    cube_dir = os.path.join(str(tmp_path), "cr_cube")
    # no commit happened: no meta, no READY ledger
    assert not os.path.exists(os.path.join(cube_dir, "cube_meta.json"))
    assert not os.path.exists(os.path.join(cube_dir, "_segments"))
    done_before = _success_files(cube_dir)
    assert done_before, "crash simulation produced no completed layout"

    monkeypatch.setattr(CubeBuilder, "_write_layout", orig)
    inst = CubeBuilder(spark, CR_MODEL, CR_CUBE, str(tmp_path)).build(resume=True)

    # resume adopted completed layouts byte-for-byte (no rewrite)
    after = _success_files(cube_dir)
    for p, mtime in done_before.items():
        assert after.get(p) == mtime, f"completed layout rewritten: {p}"
    assert len(inst.layouts) == len(inst.scheduler.cuboids)

    # the finished cube answers correctly, bitmap distinct included
    eng = _serve_engine(spark, str(tmp_path), inst)
    df = eng.sql(
        """select cat, sum(v) as s, count(*) as n, count(distinct u) as nd
           from cr_f group by cat order by cat"""
    )
    assert eng.last_route is not None
    got = {r.cat: (r.s, r.n, r.nd) for r in df.collect()}
    assert got == {"a": (27.0, 5, 3), "b": (14.0, 3, 3)}
    # ledger committed every built segment
    assert inst.committed_segments(spark) == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
    ]


def test_resume_extends_completed_dictionary(spark, tmp_path, monkeypatch):
    """A dictionary finished by the crashed attempt is EXTENDED on resume
    (append-only ids), never rebuilt — the word bags the crashed attempt
    already committed keep their meaning."""
    _register(spark, DAY12 + DAY3)
    orig = _crash_write_after(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="simulated crash"):
        CubeBuilder(spark, CR_MODEL, CR_CUBE, str(tmp_path)).build()
    # the dictionary is written before any layout — it survived the crash
    ids_before = _dict_map(spark, str(tmp_path))
    assert ids_before

    monkeypatch.setattr(CubeBuilder, "_write_layout", orig)
    inst = CubeBuilder(spark, CR_MODEL, CR_CUBE, str(tmp_path)).build(resume=True)

    ids_after = _dict_map(spark, str(tmp_path))
    assert ids_after == ids_before  # same values, same ids (nothing new)
    eng = _serve_engine(spark, str(tmp_path), inst)
    df = eng.sql("select count(distinct u) as nd from cr_f")
    assert eng.last_route is not None
    assert df.collect()[0].nd == 6


def test_increment_crash_stays_invisible_then_rerun_exact(
    spark, tmp_path, monkeypatch
):
    _register(spark, DAY12)
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(CR_MODEL)
    inst = eng.build_cube(CR_CUBE)
    base_path = inst.layouts[max(inst.layouts, key=lambda c: inst.scheduler.cuboids[c].n_dims)]

    _register(spark, DAY12 + DAY3)
    orig = _crash_write_after(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.refresh_cube("cr_cube")
    monkeypatch.setattr(CubeBuilder, "_write_layout", orig)

    # the base layout (first wave) holds a PARTIAL, uncommitted segment dir
    partial = os.path.join(base_path, f"{SEGMENT_COL}=2024-01-03")
    assert os.path.exists(partial)
    assert inst.committed_segments(spark) == ["2024-01-01", "2024-01-02"]
    # ... which serving scans must not see: routed answers = committed days
    df = eng.sql("select sum(v) as s, count(*) as n from cr_f where d < date'2024-01-04'")
    assert eng.last_route is not None
    row = df.collect()[0]
    assert (row.s, row.n) == (22.0, 5)
    # and the hybrid boundary stops at the committed coverage
    assert batch_boundary(inst, spark) == "2024-01-02"

    # rerun: ledger-based change detection still lists the crashed segment
    # (a directory scan would call it covered — the half-built-forever bug)
    built = eng.refresh_cube("cr_cube")
    assert built == ["2024-01-03"]
    # idempotent re-append: the partial dir was replaced, not doubled
    for cid, path in inst.layouts.items():
        assert os.path.exists(os.path.join(path, f"{SEGMENT_COL}=2024-01-03")), (
            f"cuboid {cid} missing the recovered segment"
        )
    df = eng.sql(
        """select cat, sum(v) as s, count(*) as n, count(distinct u) as nd
           from cr_f group by cat order by cat"""
    )
    assert eng.last_route is not None
    got = {r.cat: (r.s, r.n, r.nd) for r in df.collect()}
    assert got == {"a": (27.0, 5, 3), "b": (14.0, 3, 3)}
    assert inst.committed_segments(spark) == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
    ]


def test_merge_crash_mid_swap_recovers(spark, tmp_path, monkeypatch):
    _register(spark, DAY12 + DAY3)
    inst = CubeBuilder(spark, CR_MODEL, CR_CUBE, str(tmp_path)).build()
    eng = _serve_engine(spark, str(tmp_path), inst)
    q = """select cat, sum(v) as s, count(*) as n, count(distinct u) as nd
           from cr_f group by cat order by cat"""
    before = [tuple(r) for r in eng.sql(q).collect()]
    segs = inst.segments(spark)

    # crash between the absorbed-dir deletes and the staged-segment rename
    orig_rename = FS.LocalFS.rename
    state = {"n": 0}

    def crashing_rename(self, src, dst):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("simulated crash")
        return orig_rename(self, src, dst)

    monkeypatch.setattr(FS.LocalFS, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_segments(spark, inst, segs[:2], new_segment=segs[0])
    monkeypatch.setattr(FS.LocalFS, "rename", orig_rename)

    # exactly one layout is stranded mid-swap: absorbed dirs gone, staged
    # bytes + sentinel left behind
    stranded = [
        p
        for p in inst.layouts.values()
        if any(e.startswith("_staging_") for e in os.listdir(p))
    ]
    assert len(stranded) == 1

    # rerun finishes the swap from the staged bytes and merges the rest
    merge_segments(spark, inst, segs[:2], new_segment=segs[0])
    for p in inst.layouts.values():
        leftovers = [e for e in os.listdir(p) if e.startswith("_staging_")]
        assert not leftovers, f"staging remnants in {p}: {leftovers}"
    assert inst.segments(spark) == [segs[0], segs[2]]
    assert inst.committed_segments(spark) == [segs[0], segs[2]]
    eng2 = _serve_engine(spark, str(tmp_path), inst)
    assert [tuple(r) for r in eng2.sql(q).collect()] == before
