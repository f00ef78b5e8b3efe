"""Step-level timing of streaming_stream_join (r14 guide §1): where do the
~11 s/pass go — micro-batch execution, state-store commits, query start/stop,
or the batch aggregate over the memory sink?"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views
from kylin_on_parquet_v2_spark.corpus.streaming_corpus import _stream_source_dir
from kylin_on_parquet_v2_spark.session import get_spark
from kylin_on_parquet_v2_spark.streaming.segments import _normalize_ts, _stream_shuffle

spark = get_spark("r14-stream-steps")
spark.sparkContext.setLogLevel("ERROR")
views(spark, sf_dir)
spark.table("events").count()  # warm

src = _stream_source_dir(sf_dir)

for rep in range(int(os.environ.get("REPEATS", "3"))):
    t0 = time.perf_counter()
    schema = spark.read.parquet(src).schema
    t1 = time.perf_counter()
    stream = _normalize_ts(spark.readStream.schema(schema).parquet(src), "ts")
    left = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", "2 hours")
    )
    right = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", "2 hours")
    )
    joined = left.join(
        right,
        F.expr("l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + interval 1 hour"),
        "inner",
    )
    name = f"sj_steps_{rep}"
    with _stream_shuffle(spark):
        t2 = time.perf_counter()
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        t3 = time.perf_counter()
        q.processAllAvailable()
        t4 = time.perf_counter()
        progress = [p for p in q.recentProgress]
        q.stop()
        t5 = time.perf_counter()
    out = (
        spark.table(name)
        .groupBy("l_user")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.round(F.sum("r_value"), 2).alias("sum_value"))
        .orderBy("l_user")
    )
    out.write.format("noop").mode("overwrite").save()
    t6 = time.perf_counter()
    print(
        f"pass {rep}: schema={t1-t0:.2f} plan={t2-t1:.2f} start={t3-t2:.2f} "
        f"processAll={t4-t3:.2f} stop={t5-t4:.2f} agg+noop={t6-t5:.2f} "
        f"TOTAL={t6-t0:.2f}",
        flush=True,
    )
    for p in progress:
        dm = p.get("durationMs", {})
        n_rows = p.get("numInputRows")
        so = p.get("stateOperators", [])
        state = [
            (s.get("operatorName"), s.get("numRowsTotal"), s.get("commitTimeMs"))
            for s in so
        ]
        print(f"  batch {p.get('batchId')}: rows={n_rows} durationMs={dm} state={state}", flush=True)
