"""The full real-time OLAP loop (reference NRT architecture: Kafka ->
StreamingSegmentManager segments -> cube segments -> hybrid query):
stream-ingest events into segment parquet, cube them, stream MORE events,
incrementally refresh, and answer routed queries that match pushdown at
every step. File source stands in for Kafka (env-blocked; the pipeline
after readStream is source-agnostic)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL
from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.streaming.segments import ingest_segments

MODEL = DataModel(name="rt_star", fact_table="rt_events", partition_column="ts")

CUBE = CubeDesc(
    name="rt_cube",
    model_name="rt_star",
    dimensions=("event_type",),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "value")),
        MeasureDesc("bm_u", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")),
    ),
    segment_granularity="day",
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double, user_id int"

BATCH1 = [
    (1, dt.datetime(2024, 1, 1, 10), "click", 1.0, 7),
    (2, dt.datetime(2024, 1, 1, 11), "view", 2.0, 7),
    (3, dt.datetime(2024, 1, 2, 9), "click", 3.0, 8),
]
BATCH2 = [
    (4, dt.datetime(2024, 1, 3, 8), "click", 5.0, 9),
    (5, dt.datetime(2024, 1, 3, 9), "view", 7.0, 7),
]


def _register_store(spark, out_dir):
    # the ingested store is the cube's fact table; drop the ingest-side
    # segment col (the cube build derives its own from the partition column)
    spark.read.parquet(out_dir).drop(SEGMENT_COL).createOrReplaceTempView("rt_events")


def test_stream_ingest_cube_refresh_loop(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    df1 = spark.createDataFrame(BATCH1, SCHEMA)
    schema = df1.schema
    df1.coalesce(1).write.mode("append").parquet(src)
    ingest_segments(spark, src, out, ckpt, granularity="day", schema=schema)

    _register_store(spark, out)
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    eng.add_model(MODEL)
    inst = eng.build_cube(CUBE)
    assert inst.segments(spark) == ["2024-01-01", "2024-01-02"]

    q = """select event_type, sum(value) as s, count(distinct user_id) as nd
           from rt_events group by event_type order by event_type"""
    df = eng.sql(q, validate=True)
    assert eng.last_route is not None
    assert {r.event_type: (r.s, r.nd) for r in df.collect()} == {
        "click": (4.0, 2),
        "view": (2.0, 1),
    }

    # more events arrive on the stream: ingest (checkpoint processes only
    # the delta), refresh the cube incrementally, answers stay validated
    spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    ingest_segments(spark, src, out, ckpt, granularity="day", schema=schema)
    _register_store(spark, out)
    assert eng.refresh_cube("rt_cube") == ["2024-01-03"]
    assert inst.segments(spark) == ["2024-01-01", "2024-01-02", "2024-01-03"]

    df2 = eng.sql(q, validate=True)
    assert eng.last_route is not None
    assert {r.event_type: (r.s, r.nd) for r in df2.collect()} == {
        "click": (9.0, 3),  # users 7, 8, 9 — 9 entered via dict APPEND
        "view": (9.0, 1),  # user 7 viewed on two days/segments: ONE distinct
    }
