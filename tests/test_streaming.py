"""Streaming semantics tests: segment ingest layout + late-event watermark
policy (reference StreamingSegmentManager late-event accounting :178-181,
348-350 — events within the lateness bound land in their original (older)
window; events beyond the watermark are dropped)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.streaming.segments import (
    SEGMENT_COL,
    ingest_segments,
    windowed_aggregate,
)
from tests.conftest import SF_SMOKE


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_ingest_writes_hive_partitioned_segments(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 11, 5), "view", 2.0),
        (3, dt.datetime(2024, 1, 2, 9, 0), "click", 3.0),
    ]
    _write_events(spark, src, rows)
    ingest_segments(spark, src, out, ckpt, granularity="day")
    seg_dirs = sorted(d for d in os.listdir(out) if d.startswith(SEGMENT_COL))
    assert seg_dirs == [
        f"{SEGMENT_COL}=2024-01-01-00",
        f"{SEGMENT_COL}=2024-01-02-00",
    ]
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning on the segment column reads one dir only
    one = back.filter(F.col(SEGMENT_COL) == "2024-01-01-00")
    assert one.count() == 2


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Offsets + checkpoint (reference CheckPointStore): re-running ingest
    with the same checkpoint must process only NEW files — no duplicates,
    no gaps."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows1 = [(1, dt.datetime(2024, 1, 1, 10), "click", 1.0)]
    rows2 = [(2, dt.datetime(2024, 1, 2, 10), "view", 2.0)]
    df1 = spark.createDataFrame(rows1, ["event_id", "ts", "event_type", "value"])
    schema = df1.schema
    df1.coalesce(1).write.mode("append").parquet(src)
    ingest_segments(spark, src, out, ckpt, granularity="day", schema=schema)
    assert spark.read.parquet(out).count() == 1

    # second run with NO new data: nothing re-processed
    ingest_segments(spark, src, out, ckpt, granularity="day", schema=schema)
    assert spark.read.parquet(out).count() == 1

    # drop one new file: exactly the delta lands
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    ingest_segments(spark, src, out, ckpt, granularity="day", schema=schema)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r.event_id for r in got.collect()} == {1, 2}


def test_nanos_within_1us_of_window_boundary(spark, tmp_path):
    """Adversarial ns->us conversion fixture: an event 1 ns BEFORE an hour
    boundary must land in the earlier window. Float division (`/ 1000`)
    promotes int64 nanos to double, whose 53-bit mantissa rounds
    1704106799999999999 ns up to 1704106800000000.0 us — flipping the event
    into the NEXT window. Integer `div 1000` keeps it exact."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    # 2024-01-01 10:59:59.999999999 UTC and 11:00:00.000000000 UTC, as ns
    before = 1704106799999999999
    at = 1704106800000000000
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([before, at], unit="ns"),
            "event_type": ["click", "click"],
            "value": [1.0, 2.0],
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    assert str(table.schema.field("ts").type) == "timestamp[ns]"
    pq.write_table(table, os.path.join(src, "part-0.parquet"))

    from kylin_on_parquet_v2_spark.streaming.segments import run_windowed_to_memory

    got = run_windowed_to_memory(
        spark, src, "boundary_ns_test", ts_col="ts", window="1 hour"
    )
    by_window = {r.window_start: r.n for r in got.collect()}
    assert by_window == {
        "2024-01-01 10:00:00": 1,  # the -1 ns event stays in the 10:00 window
        "2024-01-01 11:00:00": 1,
    }


def test_hybrid_union_never_double_counts(spark, tmp_path):
    """HybridInstance split semantics (TableScanPlan.scala:58-62): rows the
    batch store absorbed must NOT be re-contributed by the realtime side.
    Batch owns segments <= 01-02; realtime covers ALL segments (full
    overlap on the first two days) plus a newer one; the union must equal
    the realtime row set exactly, not overlap-doubled."""
    from kylin_on_parquet_v2_spark.streaming.segments import hybrid_union

    rt_rows = [
        (1, dt.datetime(2024, 1, 1, 10), "click", 1.0, "2024-01-01-00"),
        (2, dt.datetime(2024, 1, 2, 10), "view", 2.0, "2024-01-02-00"),
        (3, dt.datetime(2024, 1, 3, 10), "click", 3.0, "2024-01-03-00"),
    ]
    schema = f"event_id long, ts timestamp, event_type string, value double, {SEGMENT_COL} string"
    realtime = spark.createDataFrame(rt_rows, schema)
    batch = spark.createDataFrame(rt_rows[:2], schema)  # absorbed older half
    got = hybrid_union(realtime, batch)
    assert got.count() == 3  # 2 batch + 1 realtime-only; overlap excluded
    assert {r.event_id for r in got.collect()} == {1, 2, 3}

    # timestamp fallback when neither side is segment-partitioned
    rt2 = realtime.drop(SEGMENT_COL)
    b2 = batch.drop(SEGMENT_COL)
    got2 = hybrid_union(rt2, b2)
    assert got2.count() == 3

    # empty batch store: realtime passes through whole
    empty = spark.createDataFrame([], schema)
    assert hybrid_union(realtime, empty).count() == 3


def test_watermark_drops_too_late_events(spark, tmp_path):
    """Two micro-batches: batch 2 carries one acceptably-late event (inside
    the 1h watermark -> merged into its original window) and one hopelessly
    late event (beyond the watermark -> dropped from state in update mode)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    name = "late_events_test"

    base = dt.datetime(2024, 1, 1, 0, 0)

    def rows_to_df(rows):
        return spark.createDataFrame(rows, ["ts", "event_type", "value"])

    stream = (
        spark.readStream.schema(rows_to_df([(base, "x", 0.0)]).schema).parquet(src)
    )
    agg = windowed_aggregate(stream, ts_col="ts", window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("update").format("memory").queryName(name).start()
    )
    try:
        # batch 1: events at hours 0 and 10 -> watermark advances to 09:00
        rows_to_df(
            [
                (base, "click", 1.0),
                (base + dt.timedelta(hours=10), "click", 1.0),
            ]
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

        # batch 2: hour 9:30 is within watermark (accepted into its window);
        # hour 0:30 is far beyond it (dropped)
        rows_to_df(
            [
                (base + dt.timedelta(hours=9, minutes=30), "click", 1.0),
                (base + dt.timedelta(minutes=30), "click", 99.0),
            ]
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    updates = spark.table(name).collect()
    by_window = {}
    for r in updates:  # later updates for a window supersede earlier ones
        by_window[r.window_start] = r.n
    assert by_window["2024-01-01 09:00:00"] == 1  # accepted late event
    # the hopelessly late event must NOT have updated the 00:00 window
    assert by_window["2024-01-01 00:00:00"] == 1
    assert all(r.sum_value != 99.0 for r in updates)


def test_streaming_dedup_absorbs_redelivery(spark):
    """The doubled source really delivers 2x rows; streaming dropDuplicates
    on event_id must emit each exactly once (guards against a vacuous
    oracle: if the dup source ever stopped duplicating, this fails)."""
    from kylin_on_parquet_v2_spark.corpus.streaming_corpus import _dup_source_dir
    from kylin_on_parquet_v2_spark.streaming.segments import run_dedup_to_memory

    src = _dup_source_dir(SF_SMOKE)
    raw = spark.read.parquet(src)
    single = spark.read.parquet(SF_SMOKE + "/events.parquet")
    assert raw.count() == 2 * single.count()
    deduped = run_dedup_to_memory(spark, src, query_name="dedup_redelivery_test")
    assert deduped.count() == single.count()


def test_rate_source_ingest_segments(spark, tmp_path):
    """An UNBOUNDED built-in source (rate) through the same ingest path the
    file source uses — the source-agnosticism claim behind the Kafka
    env-block, proven with a source that is genuinely a stream (no files,
    no end): micro-batches keep arriving until the test stops the query,
    and every row lands under its hour-segment dir."""
    import time

    from pyspark.sql import functions as F

    from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL
    from kylin_on_parquet_v2_spark.streaming.segments import ingest_stream

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 7).alias("user_id"),
            (F.col("value") * 1.0).alias("amount"),
        )
    )
    out = str(tmp_path / "seg")
    q = ingest_stream(
        spark, rate, out, str(tmp_path / "ckpt"), ts_col="ts", granularity="hour"
    )
    try:
        deadline = time.time() + 60
        rows = 0
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out).count()
            except Exception:
                rows = 0
            if rows >= 100 and len(q.recentProgress) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows >= 100, rows
    back = spark.read.parquet(out)
    assert SEGMENT_COL in back.columns
    # every row's segment dir equals its own hour-truncated timestamp
    bad = back.filter(
        F.col(SEGMENT_COL)
        != F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd-HH")
    ).count()
    assert bad == 0
