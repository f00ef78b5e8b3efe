"""Real-time subsystem: Structured Streaming ingest into time segments.

Reference parity (SURVEY.md §2.9, ``stream-core``):
- Kafka consume w/ offsets+checkpoint -> Structured Streaming source +
  checkpointLocation (file source used in tests; Kafka needs its connector
  jar — gated in :mod:`kylin_on_parquet_v2_spark.sources`).
- Event-time tumbling segment windows (StreamingSegmentManager.java:166-186,
  truncateTime :666) -> ``F.window`` / ``date_trunc`` segment column.
- Columnar fragment store -> Parquet micro-batch append via foreachBatch.
- Late events within watermark accepted into their (older) segment; beyond
  watermark dropped (the reference's immutable-after-window policy).
- Real-time + historical union query -> ``union`` of streaming-written
  segments and batch segments.
"""

from kylin_on_parquet_v2_spark.streaming.segments import (
    SEGMENT_COL,
    hybrid_union,
    ingest_segments,
    windowed_aggregate,
)

__all__ = ["SEGMENT_COL", "ingest_segments", "windowed_aggregate", "hybrid_union"]
