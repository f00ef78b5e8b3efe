"""Typed source readers.

Reference parity: Hive source (``engine/spark/source/``, CreateFlatTable
reads ``spark.table``) -> our registered parquet views; JDBC source
(``source-jdbc/``) -> ``spark.read.jdbc``; Kafka source (``source-kafka/``,
``stream-source-kafka/``) -> Structured Streaming kafka format, gated on the
connector jar being present.

Every reader takes an explicit schema where the format cannot carry one
(CSV/JSON) — the engine's type system is declared, never inferred
(reference DataType.java:74-85: fixed scalar type registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar primary store: pushdown + pruning come free."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV with a declared schema (inferSchema is banned: one extra full
    scan and nondeterministic types at 100 TB)."""
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.json(path, schema=schema)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source. Always pass partition_column+bounds for big tables —
    without them Spark reads through ONE connection (the classic JDBC
    bottleneck the reference's source-jdbc also documents; JdbcExplorer
    splits on a numeric column the same way).

    Exercised END TO END in this container against an embedded Derby
    database (Spark ships the derby jars): see
    ``corpus/sources_corpus.py::jdbc_source_agg`` (oracle-checked) and
    ``tests/test_sources.py`` (partitioned read, filter pushdown)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka -> Structured Streaming source (reference real-time ingest,
    stream-source-kafka). Raises a clear error when the connector jar is
    absent (this container ships without it)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector jar not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10 to spark.jars.packages. "
            "The downstream pipeline (streaming/segments.py) is "
            "source-agnostic and works unchanged once the jar is present."
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_wire_schema() -> StructType:
    """The exact record schema Spark's kafka source emits — the contract
    every downstream transformer here is written against. Declared once so
    the parser layer can be built and tested in environments without the
    connector jar (like this one): any batch/streaming frame with this
    schema — the real source, a replayed capture, a test fixture — feeds
    the same pipeline.
    """
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    return StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField("timestampType", IntegerType()),
        ]
    )


def decode_kafka_events(frame: DataFrame, value_schema: StructType) -> DataFrame:
    """Kafka wire records -> typed event rows (reference parity: the
    streaming parser in ``stream-source-kafka`` — TimedJsonStreamParser
    turns each message value into a typed event row keyed by the declared
    table schema).

    JSON-decodes ``value`` JVM-side (``from_json`` — no Python) against the
    DECLARED schema (inference is banned, same rule as the CSV/JSON
    readers) and keeps (topic, partition, offset, kafka_ts): offset is the
    redelivery-dedup key downstream
    (``streaming/segments.py::dedup_redelivery``), partition+offset the
    exactly-once bookmark. Works identically on batch and streaming frames.
    """
    from pyspark.sql import functions as F

    return frame.select(
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("__v"),
    ).select("topic", "partition", "offset", "kafka_ts", "__v.*")
