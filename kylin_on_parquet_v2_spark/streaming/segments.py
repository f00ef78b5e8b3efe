"""Streaming segment ingest + windowed aggregation + hybrid queries.

Scale notes: foreachBatch writes are per-micro-batch Parquet appends
partitioned by segment (Hive-style), so downstream queries get segment
pruning for free and the write parallelism follows the source partitioning.
The watermark bounds state: window aggregation state is dropped once the
watermark passes (reference late-event accounting,
StreamingSegmentManager.java:178-181).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SEGMENT_COL = "__segment__"


#: serializes every session-wide conf save/set/restore window in this
#: module: the bench's build phases (and the engine's cube pool) run on
#: plain threads sharing ONE SparkSession, so two concurrent
#: save/restore windows could restore each other's transient value as
#: the "old" one and leave the session misconfigured (r13 advisor).
#: RLock so a stream runner may nest both context managers.
_CONF_LOCK = __import__("threading").RLock()


@contextmanager
def _stream_shuffle(spark: SparkSession, n: int = 8):
    """Pin ``spark.sql.shuffle.partitions`` low for a streaming run.

    The state-store partition count is frozen from this setting at the
    query's FIRST checkpoint and every micro-batch pays one state task per
    partition — a batch-tuned 32 means 32 state stores per stateful op per
    batch, pure overhead at harness data volumes. A production job sizes
    this to key cardinality / executor count before the first start; the
    restore in ``finally`` keeps the session's batch tuning intact.
    Serialized by ``_CONF_LOCK`` — see its note.
    """
    with _CONF_LOCK:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)


@contextmanager
def _no_idle_batches(spark: SparkSession):
    """Disable no-data micro-batches for a stream whose SINK OUTPUT cannot
    depend on them (r14, guide §1 — measured: the zero-row watermark-advance
    batch cost ~40% of streaming_stream_join's wall clock, re-running the
    full state-store plan to emit nothing).

    Safe ONLY for operators that emit eagerly in the data batch — an
    append-mode INNER stream-stream join and streaming dropDuplicates both
    emit a row in the micro-batch that produces it; the idle batch exists
    to advance the watermark and EVICT state, which changes no output row
    (the run's state is discarded at stop()). Windowed append-mode
    aggregations must NOT use this: their finalized windows are emitted BY
    the no-data batch. Output parity with the batch oracle is asserted per
    run by the corpus queries themselves. Serialized by ``_CONF_LOCK``."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    with _CONF_LOCK:
        old = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, old)


def _normalize_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Source parquet may carry TIMESTAMP(NANOS) read as bigint (see
    session.py nanosAsLong) — convert back to a UTC-naive timestamp."""
    field = dict(zip(df.schema.fieldNames(), [f.dataType for f in df.schema.fields]))
    dt = field.get(ts_col)
    if dt is not None and dt.simpleString() == "bigint":
        # Keep LTZ (session tz is pinned to UTC): Spark watermarks reject
        # TIMESTAMP_NTZ event-time columns. INTEGER division ns->us: `/`
        # promotes int64 nanos to double whose 53-bit mantissa rounds
        # timestamps near window boundaries off by ±1 µs (see session.py).
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if dt is not None and dt.simpleString() == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


#: the reference's auto-derived event-time dimension family
#: (core-metadata/.../dimension/TimeDerivedColumnType.java:35-151): streaming
#: table schemas declare these and the ingest parser computes them from the
#: event timestamp (stream-source-kafka TimedJsonStreamParser), so queries
#: group/filter on them like real columns
TIME_DERIVED_FAMILIES = ("second", "minute", "hour", "day", "week", "month", "quarter", "year")


def with_time_derived(
    df: DataFrame,
    ts_col: str = "ts",
    families: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Append the named time-derived columns (``minute_start``,
    ``hour_start``, ``day_start``, ...) computed from ``ts_col`` — pure JVM
    ``date_trunc`` projections, map-side, no shuffle at any scale. Spark and
    DuckDB agree on every family's boundary (week starts Monday in both),
    so the columns replay exactly in an independent engine."""
    for fam in families:
        if fam not in TIME_DERIVED_FAMILIES:
            raise ValueError(f"unknown time-derived family {fam!r}; known: {TIME_DERIVED_FAMILIES}")
        df = df.withColumn(f"{fam}_start", F.date_trunc(fam, F.col(ts_col)))
    return df


def ingest_segments(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    granularity: str = "hour",
    schema: StructType | None = None,
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
    max_fragments: int = 8,
    time_derived: tuple[str, ...] | None = None,
) -> None:
    """Stream a growing directory of Parquet files into segment-partitioned
    Parquet (the reference's real-time ingest path, file source standing in
    for Kafka; the pipeline after readStream is source-agnostic).

    Runs with Trigger.AvailableNow: processes everything present, then stops
    — deterministic for tests; a production deployment drops the trigger.
    ``compact_every``/``max_fragments``: see :func:`ingest_stream`.
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = ingest_stream(
        spark,
        stream,
        out_dir,
        checkpoint_dir,
        ts_col=ts_col,
        granularity=granularity,
        available_now=True,
        compact_every=compact_every,
        max_fragments=max_fragments,
        time_derived=time_derived,
    )
    q.awaitTermination()


def ingest_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    granularity: str = "hour",
    available_now: bool = False,
    compact_every: int | None = None,
    max_fragments: int = 8,
    time_derived: tuple[str, ...] | None = None,
):
    """Source-agnostic half of the ingest path: ANY streaming DataFrame —
    the file source above, Spark's built-in unbounded ``rate`` source
    (tested, `test_rate_source_ingest_segments`), or
    ``sources.readers.read_kafka_stream`` once its connector jar is on the
    classpath — flows through the identical segment-stamp + foreachBatch
    Parquet append. Returns the started StreamingQuery; with
    ``available_now`` the caller is expected to awaitTermination, otherwise
    to stop() it (continuous ingest).

    ``compact_every``: run the fragment-compaction maintenance pass every N
    micro-batches, inline in the foreachBatch callback (reference: the
    coordinator schedules FragmentFilesMerger on the fragment-count
    trigger). Inline is the SAFEST placement — foreachBatch serializes the
    single writer, so compaction never races an append — and it bounds the
    small-files growth of a long-running stream by construction: between
    passes a dir gains at most ``compact_every`` file sets, so the store
    never holds more than ``max_fragments + compact_every`` fragments per
    closed dir. The newest (still-appending) dir is always left alone."""
    from kylin_on_parquet_v2_spark.streaming.compaction import maybe_compact

    stream = _normalize_ts(stream, ts_col)
    if time_derived:
        # TimedJsonStreamParser parity: the derived event-time dims become
        # REAL store columns at ingest, so downstream queries group/filter
        # on minute_start/hour_start/day_start like any other column
        stream = with_time_derived(stream, ts_col, time_derived)
    with_seg = stream.withColumn(
        SEGMENT_COL,
        F.date_format(F.date_trunc(granularity, F.col(ts_col)), "yyyy-MM-dd-HH"),
    )

    def _write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("append").partitionBy(SEGMENT_COL).parquet(out_dir)
        if compact_every and epoch_id % compact_every == compact_every - 1:
            maybe_compact(
                batch.sparkSession, out_dir, max_fragments=max_fragments
            )

    writer = with_seg.writeStream.foreachBatch(_write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event-time tumbling-window aggregation with watermark (the
    incremental in-memory cube of the reference's RecordsAggregator)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            # formatted in the (UTC) session tz: engine-neutral for oracles
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def run_windowed_to_memory(
    spark: SparkSession,
    source_dir: str,
    query_name: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    schema: StructType | None = None,
) -> DataFrame:
    """Drive the windowed aggregation over a finite source to completion
    (complete output mode -> memory sink) and return the result table.

    HARNESS-ONLY: complete-mode + memory sink exist to make a finite
    streaming run oracle-comparable; the production path is the
    append-mode/foreachBatch Parquet writer in :func:`ingest_segments`."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = _normalize_ts(stream, ts_col)
    agg = windowed_aggregate(stream, ts_col=ts_col, window=window)
    with _stream_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(query_name)


def hybrid_union(
    realtime_segments: DataFrame,
    batch_segments: DataFrame,
    ts_col: str = "ts",
    boundary=None,
) -> DataFrame:
    """Real-time + historical union (reference HybridInstance,
    TableScanPlan.scala:58-62): one logical table over both stores.

    The stores OVERLAP by design — batch segments continuously absorb
    streamed data — so the realtime side is bounded to strictly AFTER the
    batch store's coverage end (the reference splits the scan at the last
    batch segment boundary). A blind union would double-count every metric
    over the absorbed range.

    When both sides carry ``__segment__``, the boundary is the batch store's
    max segment value and the split is segment-aligned (a partition-column
    comparison, so the realtime scan prunes whole segment dirs); otherwise
    it falls back to the batch side's max event time.

    ``boundary`` accepts a precomputed split point (segment value or max
    event time, matching whichever column both sides carry) — pass it when
    the batch store's coverage is already known (e.g. a cube's segment
    listing, pure metadata) so repeated calls skip the max() probe job
    (round-4 nit; the ROUTED hybrid path in streaming/hybrid.py always
    derives it from metadata).
    """
    cols = [c for c in batch_segments.columns if c in realtime_segments.columns]
    rt = realtime_segments
    if SEGMENT_COL in cols:
        if boundary is None:
            boundary = batch_segments.agg(F.max(SEGMENT_COL)).first()[0]
        if boundary is not None:
            rt = rt.filter(F.col(SEGMENT_COL) > boundary)
    elif ts_col in cols:
        if boundary is None:
            boundary = batch_segments.agg(F.max(ts_col)).first()[0]
        if boundary is not None:
            rt = rt.filter(F.col(ts_col) > F.lit(boundary))
    return rt.select(*cols).unionByName(batch_segments.select(*cols))


def run_dedup_to_memory(
    spark: SparkSession,
    source_dir: str,
    query_name: str,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming ingestion dedup: dropDuplicates keyed on the event id, the
    standard guard against at-least-once redelivery (a Kafka consumer that
    re-reads a partition after a failure re-emits rows; the reference's
    realtime receivers face the same redelivery window).

    Stateful dedup keeps one state entry per key; the watermark bounds how
    long state lives — a duplicate arriving with event time older than the
    watermark horizon is already outside the redelivery window by contract.
    At 100 TB the state store is the scale limit, so key state must expire:
    keep the watermark tight (redelivery happens in seconds, not days).

    HARNESS-ONLY driver: finite source -> append-mode memory sink, so the
    deduped detail rows are batch-queryable for the oracle comparison; the
    production path writes through foreachBatch like ingest_segments.
    """
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    stream = _normalize_ts(stream, ts_col)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicates(list(key_cols))
    # dropDuplicates emits each first-seen row in ITS data batch; the idle
    # watermark batch only evicts state (see _no_idle_batches)
    with _stream_shuffle(spark), _no_idle_batches(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(query_name)


def run_stream_join_to_memory(
    spark: SparkSession,
    source_dir: str,
    query_name: str,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: match each
    ``left_type`` event to the same user's ``right_type`` events occurring
    within ``within`` AFTER it (the click->purchase attribution shape).

    Beyond the reference: its realtime layer has no joins at all
    (stream-core aggregates single streams) — Structured Streaming's
    state-store join provides this natively. Both sides carry watermarks
    and the join condition bounds right's event time to
    [left.ts, left.ts + within], which is what lets the state store expire
    rows: without the time bound the state would grow forever, the scale
    limit of any stream-stream join.

    HARNESS-ONLY driver: finite source -> append memory sink; the oracle
    is the identical batch join over the same file.
    """
    schema = spark.read.parquet(source_dir).schema
    stream = _normalize_ts(
        spark.readStream.schema(schema).parquet(source_dir), ts_col
    )
    left = (
        stream.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col(ts_col).alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        stream.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col(ts_col).alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + interval {within}"
        ),
        "inner",
    )
    # an append-mode INNER stream-stream join emits every matched pair in
    # the data batch that completes it; the zero-row watermark batch that
    # followed re-ran the whole state-store plan to emit nothing — ~40% of
    # the query's measured wall clock (see _no_idle_batches)
    with _stream_shuffle(spark), _no_idle_batches(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(query_name)
