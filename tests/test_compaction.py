"""Realtime fragment compaction (round-9 verdict item 1; reference
``stream-core/.../storage/columnar/FragmentFilesMerger.java:73``, tested in
``FragmentFilesMergerTest.java:58``): merge a streaming store's accumulated
per-micro-batch Parquet files into size-targeted files — write-then-swap,
crash-repairable, concurrent-append safe, replay-idempotence preserving."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.streaming.compaction import (
    compact_fragments,
    maybe_compact,
)
from kylin_on_parquet_v2_spark.streaming.segments import (
    SEGMENT_COL,
    ingest_segments,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def frag_store(spark, tmp_path_factory):
    """A segment store fragmented by 6 micro-batches (6 source files,
    maxFilesPerTrigger=1), each appending its own file set per day dir."""
    base = tmp_path_factory.mktemp("frag")
    src = str(base / "src")
    out = str(base / "segments")
    from kylin_on_parquet_v2_spark.session import register_views

    register_views(spark, SF_SMOKE)
    spark.table("events").repartition(6).write.parquet(src)
    ingest_segments(
        spark, src, out, str(base / "ckpt"), granularity="day",
        max_files_per_trigger=1,
    )
    return out


def _seg_dirs(store):
    return sorted(
        d for d in os.listdir(store) if d.startswith(f"{SEGMENT_COL}=")
    )


def _files(store, seg):
    return sorted(
        f
        for f in os.listdir(os.path.join(store, seg))
        if not f.startswith((".", "_"))
    )


def _totals(spark, store):
    rows = (
        spark.read.parquet(store)
        .groupBy(SEGMENT_COL, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    return sorted(map(tuple, rows))


def test_compaction_reduces_files_and_preserves_rows(spark, frag_store, tmp_path):
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    before_totals = _totals(spark, store)
    segs = _seg_dirs(store)
    assert all(len(_files(store, s)) == 6 for s in segs)  # 6 micro-batches

    report = compact_fragments(spark, store, skip_newest=False)
    assert set(report) == {s.split("=", 1)[1] for s in segs}
    for seg in segs:
        # tiny day dirs -> one size-targeted file each
        assert len(_files(store, seg)) == 1
    assert _totals(spark, store) == before_totals

    # idempotent: a second pass finds nothing above target
    assert compact_fragments(spark, store, skip_newest=False) == {}


def test_skip_newest_leaves_appending_segment_alone(spark, frag_store, tmp_path):
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    segs = _seg_dirs(store)
    report = compact_fragments(spark, store)  # skip_newest=True default
    newest = segs[-1].split("=", 1)[1]
    assert newest not in report
    assert len(_files(store, segs[-1])) == 6  # untouched


def test_maybe_compact_threshold(spark, frag_store, tmp_path):
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    # threshold above the fragment count: no-op
    assert maybe_compact(spark, store, max_fragments=10, skip_newest=False) == {}
    # at/below: compacts, then the store is under threshold -> no-op again
    assert maybe_compact(spark, store, max_fragments=3, skip_newest=False)
    assert maybe_compact(spark, store, max_fragments=3, skip_newest=False) == {}


def test_tail_scan_reads_exactly_the_compacted_files(spark, frag_store, tmp_path):
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    compact_fragments(spark, store, skip_newest=False)
    seg = _seg_dirs(store)[0]
    tail = spark.read.parquet(store).filter(
        F.col(SEGMENT_COL) == seg.split("=", 1)[1]
    )
    tail.collect()
    read_files = {os.path.basename(p) for p in tail.inputFiles()
                  if f"/{seg}/" in p}
    assert read_files == set(_files(store, seg))
    assert len(read_files) == 1


def test_crash_repair_finishes_staged_swap(spark, frag_store, tmp_path):
    """Once the swap sentinel exists the staged bytes are authoritative: a
    rerun after a crash mid-swap must install them, not recompute."""
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    seg = _seg_dirs(store)[0]
    seg_val = seg.split("=", 1)[1]
    part_dir = os.path.join(store, seg)
    staging = os.path.join(store, f"_compacting_{seg}")
    sentinel = staging + ".swapping"
    # stage a compacted rewrite by hand, drop the sentinel, "crash"
    spark.read.parquet(part_dir).repartition(1).write.parquet(staging)
    staged_rows = sorted(map(str, spark.read.parquet(staging).collect()))
    open(sentinel, "w").close()

    report = compact_fragments(spark, store, skip_newest=False)
    assert seg_val not in report  # repair path, not a fresh rewrite
    assert not os.path.exists(sentinel) and not os.path.exists(staging)
    assert len(_files(store, seg)) == 1
    assert sorted(map(str, spark.read.parquet(part_dir).collect())) == staged_rows


def test_concurrent_append_aborts_swap(spark, frag_store, tmp_path):
    """A micro-batch appending between staging and swap must abort the
    swap: compaction never deletes bytes it did not rewrite."""
    import shutil

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    seg = _seg_dirs(store)[0]
    seg_val = seg.split("=", 1)[1]
    part_dir = os.path.join(store, seg)
    before_rows = spark.read.parquet(part_dir).count()
    extra = spark.read.parquet(part_dir).limit(7)

    def racing_append(target_dir):
        if target_dir == part_dir:
            extra.coalesce(1).write.mode("append").parquet(target_dir)

    report = compact_fragments(
        spark, store, skip_newest=False, _pre_swap_hook=racing_append
    )
    assert seg_val not in report  # this dir's swap aborted
    # nothing lost: original rows + the racing append are all present
    assert spark.read.parquet(part_dir).count() == before_rows + 7
    assert not os.path.exists(os.path.join(store, f"_compacting_{seg}"))
    # the next quiet cycle compacts it
    report2 = compact_fragments(spark, store, skip_newest=False)
    assert seg_val in report2
    assert spark.read.parquet(part_dir).count() == before_rows + 7


def test_epoch_store_replay_stays_idempotent_after_compaction(spark, tmp_path):
    """Compacting the decontamination gate's epoch-keyed output must not
    break foreachBatch replay idempotence: a replayed epoch dynamic-
    overwrites its own (compacted) partition dir and the store's rows are
    unchanged."""
    from pyspark.sql import functions as F

    from kylin_on_parquet_v2_spark.pipeline.decontam import streaming_decontaminate

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "clean")
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).limit(60)
    # several source files -> several epochs
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ckpt):
        eval_docs = spark.read.schema(schema).parquet(src).filter(
            F.col("doc_id") % 29 == 0
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q, grams = streaming_decontaminate(
            stream, eval_docs, out_dir, str(tmp_path / ckpt), n=5
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            grams.unpersist()

    run("c1")
    first = sorted(
        map(str, spark.read.parquet(out_dir).drop("__epoch").collect())
    )
    # fragment one epoch dir into 3 files (a bigger gate batch would write
    # several partitions itself), then compact it back
    import shutil

    ep = sorted(d for d in os.listdir(out_dir) if d.startswith("__epoch="))[0]
    p = os.path.join(out_dir, ep)
    refrag = str(tmp_path / "refrag")
    spark.read.parquet(p).repartition(3).write.parquet(refrag)
    shutil.rmtree(p)
    os.rename(refrag, p)
    report = compact_fragments(
        spark, out_dir, partition_col="__epoch", skip_newest=False
    )
    assert ep.split("=", 1)[1] in report
    assert sorted(
        map(str, spark.read.parquet(out_dir).drop("__epoch").collect())
    ) == first
    # worst-case replay: fresh checkpoint, same output dir
    run("c2")
    assert sorted(
        map(str, spark.read.parquet(out_dir).drop("__epoch").collect())
    ) == first


def test_engine_compact_realtime_mid_session_keeps_answers(spark, frag_store, tmp_path):
    """The engine-level maintenance pass (reference: coordinator-scheduled
    FragmentFilesMerger): compacting a REGISTERED hybrid tail between two
    identical queries must leave the answers hash-identical while the store
    drops to the size target."""
    import shutil

    from kylin_on_parquet_v2_spark.datasets import EVENTS_CUBE_SEG, EVENTS_MODEL_SEG
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine
    from kylin_on_parquet_v2_spark.session import register_views

    store = str(tmp_path / "segments")
    shutil.copytree(frag_store, store)
    register_views(spark, SF_SMOKE)
    days = sorted(
        r[0]
        for r in spark.table("events")
        .select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    )
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    eng.add_model(EVENTS_MODEL_SEG)
    eng.build_cube(EVENTS_CUBE_SEG, segment_range=(None, days[len(days) // 2]))
    eng.register_hybrid("events_cube_seg", store)
    sql = (
        "select event_type, count(*) as n, sum(value) as s, avg(value) as a "
        "from events group by event_type order by event_type"
    )

    def run():
        df = eng.sql(sql).select(
            "event_type", "n", F.round("s", 2).alias("s"), F.round("a", 4).alias("a")
        )
        return [tuple(r) for r in df.collect()]

    before = run()
    assert eng.last_route is not None and eng.last_route.hybrid_tail

    report = eng.compact_realtime("events_cube_seg", max_fragments=3)
    assert report  # the fragmented tail had dirs above threshold
    # newest dir skipped (it may still be receiving appends)
    newest = _seg_dirs(store)[-1].split("=", 1)[1]
    assert newest not in report

    after = run()
    assert after == before
    assert eng.last_route is not None and eng.last_route.hybrid_tail


def test_ingest_with_inline_compaction_bounds_fragments(spark, tmp_path):
    """compact_every wires the maintenance pass into the foreachBatch
    callback (single writer => compaction never races an append): a
    6-micro-batch ingest with compact_every=2 keeps every closed day dir
    at a bounded file count, and the store's rows equal the source."""
    from kylin_on_parquet_v2_spark.session import register_views

    register_views(spark, SF_SMOKE)
    src = str(tmp_path / "src")
    out = str(tmp_path / "segments")
    spark.table("events").repartition(6).write.parquet(src)
    ingest_segments(
        spark, src, out, str(tmp_path / "ckpt"), granularity="day",
        max_files_per_trigger=1, compact_every=2, max_fragments=2,
    )
    segs = _seg_dirs(out)
    # every closed (non-newest) dir was compacted on the trigger cadence:
    # at most max_fragments + compact_every file sets ever accumulate
    for seg in segs[:-1]:
        assert len(_files(out, seg)) <= 4, (seg, _files(out, seg))
    # vs 6 fragments everywhere without the trigger (frag_store fixture)
    total = spark.read.parquet(out).count()
    assert total == spark.table("events").count()
