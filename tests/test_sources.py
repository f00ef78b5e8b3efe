"""Typed source readers (sources/readers.py — reference ``source-jdbc/``,
``source-kafka/``, Hive/CSV source surface).

The JDBC path runs END TO END against an embedded Derby database (Spark
ships the derby jars): partitioned parallel read, filter pushdown into the
JDBCRelation, round-trip losslessness. Kafka stays environment-blocked
(no connector jar, no network) — the availability probe and the explicit
refusal are what's testable here.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kylin_on_parquet_v2_spark.sources.readers import (
    kafka_available,
    read_csv,
    read_jdbc,
    read_json,
    read_kafka_stream,
    read_orc,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = os.path.join(str(tmp_path_factory.mktemp("derby")), "db")
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(0, 100).selectExpr(
        "id", "id % 5 as k", "cast(id * 1.5 as double) as v"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "T1")
        .option("driver", DERBY)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_partitioned_read_roundtrip(spark, derby_url):
    """The multi-connection read shape: 4 partitions split on the numeric
    column, values lossless vs the written frame."""
    back = read_jdbc(
        spark,
        derby_url,
        "T1",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
        driver=DERBY,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    agg = back.agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert agg["n"] == 100 and abs(agg["sv"] - sum(i * 1.5 for i in range(100))) < 1e-9


def test_jdbc_single_connection_default(spark, derby_url):
    """Without partition bounds the read is one connection (1 partition) —
    the documented bottleneck the partitioned form exists to avoid."""
    back = read_jdbc(spark, derby_url, "T1", driver=DERBY)
    assert back.rdd.getNumPartitions() == 1
    assert back.count() == 100


def test_jdbc_filter_pushdown(spark, derby_url):
    """Filters reach the JDBCRelation (PushedFilters), not a post-scan
    Spark filter over the full table."""
    back = read_jdbc(
        spark, derby_url, "T1", driver=DERBY,
        partition_column="id", num_partitions=2, lower_bound=0, upper_bound=100,
    ).filter(F.col("k") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters", 1)[1][:120]
    assert back.count() == 20


def test_csv_declared_schema_no_inference(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    p = str(tmp_path / "c")
    spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string").write.option(
        "header", True
    ).csv(p)
    df = read_csv(spark, p, schema, header=True)
    assert df.schema == schema  # declared, not inferred
    assert {tuple(r) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_json_declared_schema(spark, tmp_path):
    schema = T.StructType([T.StructField("a", T.LongType())])
    p = str(tmp_path / "j")
    spark.createDataFrame([(5,), (6,)], "a long").write.json(p)
    df = read_json(spark, p, schema)
    assert df.schema == schema
    assert sorted(r["a"] for r in df.collect()) == [5, 6]


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "o")
    spark.range(10).write.orc(p)
    assert read_orc(spark, p).count() == 10


def test_kafka_unavailable_raises_clearly(spark):
    assert not kafka_available(spark)  # no connector jar in this container
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "t")


def test_capabilities_surface_kafka_block(spark, tmp_path):
    """Engine capability introspection (r12 verdict item 7): the Kafka
    env-block is a TYPED capability a user reads before wiring a stream —
    available flag, what blocks it, and the fix — alongside the supported
    source formats, time grains, and measure expressions."""
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    caps = OlapEngine(spark, storage_dir=str(tmp_path / "c")).capabilities()
    kafka = caps["sources"]["kafka"]
    assert kafka["available"] is False
    assert "jar" in kafka["blocked_by"]
    assert "spark-sql-kafka" in kafka["fix"]
    assert caps["sources"]["parquet"]["available"] is True
    assert "second" in caps["time_grains"] and "year" in caps["time_grains"]
    assert "COUNT_DISTINCT" in caps["measures"]


def test_kafka_wire_decode_roundtrip(spark):
    """The parser layer is jar-independent: a batch frame carrying the
    EXACT kafka source schema (kafka_wire_schema) decodes back to typed
    event rows with (topic, partition, offset) preserved — the reference's
    TimedJsonStreamParser contract (stream-source-kafka), written so the
    real source drops in unchanged once the connector jar exists."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kylin_on_parquet_v2_spark.sources.readers import (
        decode_kafka_events,
        kafka_wire_schema,
    )

    from kylin_on_parquet_v2_spark.session import register_views
    from tests.conftest import SF_SMOKE

    register_views(spark, SF_SMOKE)
    events = spark.table("events").select("event_id", "user_id", "event_type").limit(50)
    wire = events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("event_id", "user_id", "event_type"))
        .cast("binary")
        .alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 3).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    # the fixture must match the real source's schema EXACTLY
    assert [(f.name, f.dataType) for f in wire.schema.fields] == [
        (f.name, f.dataType) for f in kafka_wire_schema().fields
    ]
    payload = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    decoded = decode_kafka_events(wire, payload)
    got = {
        (r["event_id"], r["user_id"], r["event_type"], r["partition"], r["offset"])
        for r in decoded.collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["event_type"], int(r["event_id"] % 3), r["event_id"])
        for r in events.collect()
    }
    assert got == want


def test_kafka_wire_streaming_redelivery_dedup(spark, tmp_path):
    """End-to-end minus the jar: wire-schema records arrive TWICE (the
    at-least-once redelivery a Kafka consumer produces after a failure),
    the stream decodes through the same parser and dedups on
    (topic, partition, offset) — the exactly-once bookmark — leaving one
    typed row per message."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kylin_on_parquet_v2_spark.sources.readers import (
        decode_kafka_events,
        kafka_wire_schema,
    )

    from kylin_on_parquet_v2_spark.session import register_views
    from tests.conftest import SF_SMOKE

    register_views(spark, SF_SMOKE)
    events = spark.table("events").select("event_id", "event_type").limit(20)
    wire = events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("event_id", "event_type")).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    src = str(tmp_path / "wire")
    wire.write.mode("overwrite").parquet(src)
    wire.write.mode("append").parquet(src)  # redelivery: every record twice

    stream = spark.readStream.schema(kafka_wire_schema()).parquet(src)
    payload = StructType(
        [StructField("event_id", LongType()), StructField("event_type", StringType())]
    )
    decoded = decode_kafka_events(stream, payload).dropDuplicates(
        ["topic", "partition", "offset"]
    )
    q = (
        decoded.writeStream.outputMode("append")
        .format("memory")
        .queryName("kafka_wire_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("kafka_wire_dedup").collect()
    assert len(rows) == 20
    assert {r["event_id"] for r in rows} == {
        r["event_id"] for r in events.collect()
    }
