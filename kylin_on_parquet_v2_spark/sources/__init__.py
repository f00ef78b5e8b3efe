"""Source connectors — reference SURVEY.md §2.1.

Parquet is the primary store (always available). CSV/JSON/ORC/JDBC use
Spark's built-in readers. Kafka requires the spark-sql-kafka connector jar
(not in this container) — gated behind availability detection, with the full
reader wiring in place so it activates when the jar is present.
"""

from kylin_on_parquet_v2_spark.sources.readers import (
    kafka_available,
    read_csv,
    read_jdbc,
    read_json,
    read_kafka_stream,
    read_orc,
    read_parquet,
)

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_jdbc",
    "read_kafka_stream",
    "kafka_available",
]
