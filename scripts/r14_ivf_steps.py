"""Step-level timing of the IVF index queries (r14 guide §1: find where
similarity_ann_ivf_restated's 20 s @32c actually goes before changing it).

Replays similarity_ann_ivf_restated / _indexed phase by phase with
perf_counter around each driver-visible step, at the CURRENT code tree.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import proc_tmp, views
from kylin_on_parquet_v2_spark.pipeline import similarity as S
from kylin_on_parquet_v2_spark.session import get_spark

spark = get_spark("r14-ivf-steps")
spark.sparkContext.setLogLevel("ERROR")
views(spark, sf_dir)
emb = spark.table("embeddings")
emb.count()  # warm

T0 = time.perf_counter()
_last = [T0]


def mark(label: str) -> None:
    now = time.perf_counter()
    print(f"{now - _last[0]:7.3f}s  {label}", flush=True)
    _last[0] = now


def run_restated(tag: str) -> None:
    store = proc_tmp("ivf_steps_restate", tag)
    shutil.rmtree(store, ignore_errors=True)
    _last[0] = time.perf_counter()
    idx = S.IVFIndex(spark, store)
    idx.build(emb, train_fraction=0.25)
    mark("build (train 2 iters @0.25 + assign + partitionBy write)")
    changed = emb.filter(F.col("vec_id") < 10).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    deleted = [50, 51, 52, 53, 54]
    idx.restate(changed=changed, delete_ids=deleted)
    mark("restate (assign delta + semijoin + staged write + swap)")
    restated = emb.filter(
        ~F.col("vec_id").isin(list(range(10)) + deleted)
    ).unionByName(changed)
    queries = restated.filter(F.col("vec_id") < 20)
    got = idx.topk(queries, k=5, n_probe=8)
    got_rows = got.orderBy("query_id", "rn").collect()
    mark("topk n_probe=8 + collect")
    truth = {
        (r["query_id"], r["cand_id"])
        for r in S.brute_force_topk_vectorized(restated, queries, k=5).collect()
    }
    hits = sum((r["query_id"], r["cand_id"]) in truth for r in got_rows)
    assert truth and hits / len(truth) >= 0.5
    mark("vectorized brute-force truth + recall check")
    spark.createDataFrame(got_rows, got.schema).write.format("noop").mode(
        "overwrite"
    ).save()
    mark("createDataFrame + noop")


def run_indexed(tag: str) -> None:
    store = proc_tmp("ivf_steps_indexed", tag)
    shutil.rmtree(store, ignore_errors=True)
    _last[0] = time.perf_counter()
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    mark("mid percentile job")
    idx = S.IVFIndex(spark, store)
    idx.build(emb.filter(F.col("vec_id") <= mid), train_fraction=0.25)
    mark("build half")
    idx.add(emb.filter(F.col("vec_id") > mid))
    mark("add half")
    queries = emb.filter(F.col("vec_id") < 20)
    got = idx.topk(queries, k=5)
    got_rows = got.orderBy("query_id", "rn").collect()
    mark("topk + collect")
    truth = {
        (r["query_id"], r["cand_id"])
        for r in S.brute_force_topk_vectorized(emb, queries, k=5).collect()
    }
    hits = sum((r["query_id"], r["cand_id"]) in truth for r in got_rows)
    assert truth and hits / len(truth) >= 0.5
    mark("truth + recall")


for i in range(int(os.environ.get("REPEATS", "2"))):
    print(f"--- restated pass {i}")
    run_restated(f"p{i}")
for i in range(int(os.environ.get("REPEATS", "2"))):
    print(f"--- indexed pass {i}")
    run_indexed(f"p{i}")
print(f"total {time.perf_counter() - T0:.2f}s")
