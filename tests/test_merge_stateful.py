"""Segment merge job + custom stateful streaming operator."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL, CubeBuilder
from kylin_on_parquet_v2_spark.cube.merge import merge_segments
from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE_SEG, TPCH_MODEL_SEG
from kylin_on_parquet_v2_spark.session import register_views
from kylin_on_parquet_v2_spark.streaming.stateful import running_totals
from tests.conftest import SF_SMOKE


def _cloned_seg_inst(spark, seg_cube_store, tmp_path):
    """Private byte-copy of the session-built segmented cube (r14: each
    merge test paid its own ~25 s 49-layout build to mutate an identical
    instance; merging a byte-identical clone asserts the same invariants)."""
    from kylin_on_parquet_v2_spark.cube.build import CubeInstance
    from tests.conftest import clone_cube_store

    d = clone_cube_store(seg_cube_store, str(tmp_path / "clone"))
    inst = CubeInstance.load(TPCH_CUBE_SEG, TPCH_MODEL_SEG, d, spark)
    assert inst is not None
    return inst


def test_merge_segments_preserves_answers(spark, seg_cube_store, tmp_path):
    register_views(spark, SF_SMOKE)
    inst = _cloned_seg_inst(spark, seg_cube_store, tmp_path)

    base_layout = inst.layouts[inst.scheduler.find_best_match(frozenset()).cuboid_id]
    any_layout = next(iter(inst.layouts.values()))
    segs = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(any_layout)
        if d.startswith(SEGMENT_COL + "=")
    )
    assert len(segs) > 3, segs

    def totals():
        df = spark.read.parquet(inst.layouts[max(inst.layouts)])  # base cuboid
        return (
            df.groupBy("l_returnflag")
            .agg(F.sum("_count").alias("n"), F.round(F.sum("sum_qty"), 2).alias("q"))
            .collect()
        )

    before = {r.l_returnflag: (r.n, r.q) for r in totals()}
    merge_segments(spark, inst, segments=segs[:3], new_segment=segs[0])
    after = {r.l_returnflag: (r.n, r.q) for r in totals()}
    assert before == after

    merged_segs = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(any_layout)
        if d.startswith(SEGMENT_COL + "=")
    )
    assert len(merged_segs) == len(segs) - 2
    del base_layout


def test_merge_writes_size_based_files(spark, seg_cube_store, tmp_path):
    """A large merged segment must NOT be a single coalesce(1) file — the
    write is repartitioned by input bytes / target file size (compaction
    with a bounded file size, never a one-task funnel)."""
    register_views(spark, SF_SMOKE)
    inst = _cloned_seg_inst(spark, seg_cube_store, tmp_path)
    base = inst.layouts[max(inst.layouts)]
    segs = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(base)
        if d.startswith(SEGMENT_COL + "=")
    )

    def totals():
        df = spark.read.parquet(base)
        return {
            r.l_returnflag: (r.n, r.q)
            for r in df.groupBy("l_returnflag")
            .agg(F.sum("_count").alias("n"), F.round(F.sum("sum_qty"), 2).alias("q"))
            .collect()
        }

    before = totals()
    # tiny target => the input bytes demand several output files
    merge_segments(
        spark, inst, segments=segs, new_segment=segs[0], target_file_bytes=4096
    )
    assert totals() == before
    merged_dir = os.path.join(base, f"{SEGMENT_COL}={segs[0]}")
    files = [f for f in os.listdir(merged_dir) if f.endswith(".parquet")]
    assert len(files) > 1, files


def test_auto_merge_fires_at_threshold_and_keeps_answers(spark, seg_cube_store, tmp_path):
    """Round-3 verdict item 8 (CubeDesc.java:180 auto-merge): ingest crosses
    the declared threshold -> merge fires, answers unchanged, segment dirs
    and file count drop, and the newest segment is left un-merged."""
    from dataclasses import replace

    from kylin_on_parquet_v2_spark.cube.merge import maybe_auto_merge
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    from tests.conftest import clone_cube_store

    register_views(spark, SF_SMOKE)
    desc = replace(TPCH_CUBE_SEG, name="tpch_seg_am", auto_merge_segments=4)
    d = clone_cube_store(
        seg_cube_store, str(tmp_path / "clone"), rename=("tpch_cube_seg", "tpch_seg_am")
    )
    eng = OlapEngine(spark, storage_dir=d)
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL_SEG)
    inst = eng.load_cube(desc)

    segs_before = inst.segments(spark)
    assert len(segs_before) >= 4, segs_before
    base = inst.layouts[max(inst.layouts)]

    def n_files():
        return sum(
            1 for root, _d, files in os.walk(base) for f in files if f.endswith(".parquet")
        )

    def totals():
        return {
            r.l_returnflag: (r.n, r.q)
            for r in spark.read.parquet(base)
            .groupBy("l_returnflag")
            .agg(F.sum("_count").alias("n"), F.round(F.sum("sum_qty"), 2).alias("q"))
            .collect()
        }

    before, files_before = totals(), n_files()
    merged = maybe_auto_merge(spark, inst)
    assert merged == segs_before[0]
    segs_after = inst.segments(spark)
    assert segs_after == [segs_before[0], segs_before[-1]]  # newest kept out
    assert totals() == before
    assert n_files() < files_before
    # range bookkeeping: the merged dir declares its absorbed coverage end
    assert inst.segment_ranges[merged] == segs_before[-2]
    # below threshold now -> idempotent no-op
    assert maybe_auto_merge(spark, inst) is None


def test_lower_bound_pruning_sound_after_merge(spark, seg_cube_store, tmp_path):
    """A date lower bound landing INSIDE a merged segment's range must relax
    to the merged dir's start (reference prunes by TSRange overlap) — naive
    folding would prune the merged dir and silently drop in-range rows."""
    from dataclasses import replace

    from kylin_on_parquet_v2_spark.cube.merge import maybe_auto_merge
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    from tests.conftest import clone_cube_store

    register_views(spark, SF_SMOKE)
    desc = replace(TPCH_CUBE_SEG, name="tpch_seg_am2", auto_merge_segments=4)
    d = clone_cube_store(
        seg_cube_store, str(tmp_path / "clone"), rename=("tpch_cube_seg", "tpch_seg_am2")
    )
    eng = OlapEngine(spark, storage_dir=d)
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL_SEG)
    inst = eng.load_cube(desc)
    segs = inst.segments(spark)
    merged = maybe_auto_merge(spark, inst)
    assert merged is not None
    # pick a bound strictly inside the merged range (second absorbed month)
    inside = segs[1]
    sql = f"""select l_returnflag, sum(l_quantity) as s, count(*) as n
              from lineitem
              where l_shipdate >= date '{inside}'
              group by l_returnflag order by l_returnflag"""
    eng.sql(sql, validate=True)  # routed == pushdown proves no dropped rows
    route = eng.last_route
    assert route is not None and route.cube == desc.name, route
    lower = [p for p in route.segment_filters if ">=" in p]
    assert lower and f"'{merged}'" in lower[0], route.segment_filters


def test_stateful_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema_df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "x", 1.0)], ["ts", "event_type", "value"]
    )

    stream = spark.readStream.schema(schema_df.schema).parquet(src)
    out = running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals_test")
        .start()
    )
    try:
        spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 1, 0), "click", 1.0),
                (dt.datetime(2024, 1, 1, 1), "click", 2.0),
                (dt.datetime(2024, 1, 1, 2), "view", 5.0),
            ],
            schema_df.schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 2, 0), "click", 3.0),
            ],
            schema_df.schema,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("running_totals_test").collect()
    # state accumulated across batches: click ends at n=3, sum=6.0
    final = {}
    for r in rows:
        final[r.event_type] = (r.n_total, round(r.sum_value, 2))  # later rows overwrite
    assert final["click"] == (3, 6.0)
    assert final["view"] == (1, 5.0)
