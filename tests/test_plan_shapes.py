"""Golden plan-shape suite: exact physical-operator counts for headline
pipeline queries.

Correctness tests prove the VALUES; these pin the SHAPE — the thing that
actually decides 100 TB behavior. A refactor that silently adds an
Exchange, degrades a broadcast join to sort-merge, or sneaks in a
nested-loop join keeps every value test green while multiplying cluster
cost; here it fails loudly and the golden entry must be updated
consciously (with a reason).

Counts come from the pre-execution physical plan (AQE's initial plan) —
deterministic for a fixed Spark version and the pinned session config.
Routed/cube plans are shape-asserted in their own suites
(test_bucketed_layouts.py, test_router.py, test_hybrid.py); this file
covers the pushdown/pipeline surface, which has no cube fixture cost.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline import decontam as DC
from kylin_on_parquet_v2_spark.pipeline import dedup as D
from kylin_on_parquet_v2_spark.pipeline import export as EX
from kylin_on_parquet_v2_spark.pipeline import similarity as S
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_SMOKE

#: operators whose count defines the plan's scale shape. Ordered from
#: "data movement" to "compute"; BroadcastExchange counts separately from
#: shuffle Exchange because one is benign at scale and the other is the
#: cost driver.
_OPS = {
    "shuffle_exchange": re.compile(r"\bExchange (hash|range|Single)"),
    "broadcast_exchange": re.compile(r"\bBroadcastExchange\b"),
    "broadcast_hash_join": re.compile(r"\bBroadcastHashJoin\b"),
    "sort_merge_join": re.compile(r"\bSortMergeJoin\b"),
    "nested_loop_join": re.compile(r"\bBroadcastNestedLoopJoin\b|\bCartesianProduct\b"),
    "window": re.compile(r"\bWindow\b"),
    "generate": re.compile(r"\bGenerate\b"),
}


def _shape(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {name: len(rx.findall(plan)) for name, rx in _OPS.items()}


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_SMOKE)


def _docs(spark):
    return spark.table("documents")


# ---- golden shapes -----------------------------------------------------------
# Each entry: builder -> expected counts. A diff means the plan changed;
# update ONLY with a scale argument in the commit message.


def test_shape_decontam_report(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    assert _shape(DC.contamination_report(docs, ev, n=5)) == {
        # one rollup shuffle on doc_id + the EVAL-side gram distinct
        # (eval-sized, feeds the BroadcastExchange — benign); the corpus
        # gram explosion itself is Exchange-free
        "shuffle_exchange": 2,
        "broadcast_exchange": 1,
        "broadcast_hash_join": 1,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 0,
        "generate": 2,  # corpus grams + eval grams
    }


def test_shape_decontam_filter(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    shape = _shape(DC.decontaminate(docs, ev, n=5))
    # dirty-id distinct (1 shuffle) + anti join of corpus vs small dirty
    # set; the anti join may plan as SMJ pre-AQE (tiny side converts at
    # runtime) but must never be a nested loop
    assert shape["nested_loop_join"] == 0
    assert shape["broadcast_hash_join"] >= 1  # the gram probe
    assert shape["shuffle_exchange"] <= 3, shape


def test_shape_minhash_lsh_pairs(spark):
    docs = _docs(spark)
    shape = _shape(D.minhash_lsh_pairs(docs))
    # banded bucket equi self-join: everything hash-partitioned, no
    # broadcast (both sides corpus-sized), never a nested loop
    assert shape["nested_loop_join"] == 0
    assert shape["sort_merge_join"] + shape["broadcast_hash_join"] >= 1
    assert shape["generate"] >= 1


def test_shape_ann_lsh_topk(spark):
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    assert _shape(S.ann_lsh_topk(emb, queries, k=5)) == {
        # query side broadcast into the bucket join; one window for top-k
        # ranking (its Exchange re-partitions by query_id)
        "shuffle_exchange": 1,
        "broadcast_exchange": 1,
        "broadcast_hash_join": 1,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 1,
        "generate": 0,
    }


def test_shape_export_positions(spark):
    docs = _docs(spark)
    assert _shape(EX.shuffled_positions(docs, n_shards=8, seed=1)) == {
        # exactly ONE shuffle (by shard, for the per-shard ranking window);
        # a global-order implementation would show a range Exchange into a
        # single-partition window — the regression this golden guards
        "shuffle_exchange": 1,
        "broadcast_exchange": 0,
        "broadcast_hash_join": 0,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 1,
        "generate": 0,
    }


def test_shape_semantic_neardup(spark):
    emb = spark.table("embeddings")
    assigned = emb.select(
        "vec_id", "embedding", (F.col("label") % 4).alias("sem_cluster")
    )
    shape = _shape(S.semantic_neardup_removed(assigned, 0.3))
    # equi self-join on the cluster key + distinct of removed ids; never
    # a nested loop over the corpus
    assert shape["nested_loop_join"] == 0
    assert shape["sort_merge_join"] + shape["broadcast_hash_join"] >= 1


_RR = re.compile(r"\bRoundRobinPartitioning\b")


def test_semantic_neardup_repartition_is_gated(spark):
    """Round-7 verdict #1: the probe-side round-robin spread exists ONLY to
    rescue an under-partitioned input (single small file => one task doing
    sum-of-cluster^2 work). A many-partition corpus must NOT pay an extra
    full shuffle of rows x embedding vectors on the way into the pair
    join."""
    emb = spark.table("embeddings").select(
        "vec_id", "embedding", (F.col("label") % 4).alias("sem_cluster")
    )
    par = spark.sparkContext.defaultParallelism

    # under-partitioned input (raw sf0.001 scan is a single split): the
    # operator round-robins it up to defaultParallelism
    assert emb.rdd.getNumPartitions() < par
    plan_small = (
        S.semantic_neardup_removed(emb, 0.3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(_RR.findall(plan_small)) == 1

    # many-partition input (a real many-file scan, not an injected
    # repartition — that would show up on BOTH sides of the self-join):
    # the plan must contain NO RoundRobinPartitioning at all
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        emb.repartition(par * 2).write.parquet(f"{td}/wide")
        wide = spark.read.parquet(f"{td}/wide")
        assert wide.rdd.getNumPartitions() >= par
        plan_wide = (
            S.semantic_neardup_removed(wide, 0.3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert len(_RR.findall(plan_wide)) == 0


def test_shape_passage_dedup(spark):
    docs = _docs(spark)
    assert _shape(D.passage_dedup(docs, window=8)) == {
        # passage explode map-side (1 generate); keep-first is ONE window
        # keyed by the passage md5; per-doc rollup is the second and last
        # shuffle. No joins of any kind.
        "shuffle_exchange": 2,
        "broadcast_exchange": 0,
        "broadcast_hash_join": 0,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 1,
        "generate": 1,
    }


def test_shape_top_ngrams(spark):
    from kylin_on_parquet_v2_spark.pipeline import text as T

    assert _shape(T.top_ngrams(_docs(spark), n=2, k=20)) == {
        # COUNT DISTINCT expands to the two-level (gram, doc) agg => two
        # hash exchanges carrying distinct pairs; k rows to the driver
        "shuffle_exchange": 2,
        "broadcast_exchange": 0,
        "broadcast_hash_join": 0,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 0,
        "generate": 1,
    }


def test_shape_quality_quantile_gate(spark):
    from kylin_on_parquet_v2_spark.pipeline import text as T

    assert _shape(T.quality_quantile_gate(_docs(spark))) == {
        # thresholds: one |langs|-sized ordered-set aggregation, broadcast
        # back; the gate is a map-side filter — the corpus never shuffles
        "shuffle_exchange": 1,
        "broadcast_exchange": 1,
        "broadcast_hash_join": 1,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 0,
        "generate": 0,
    }


def test_decontam_broadcast_guard(spark):
    """Round-7 verdict #5: an over-threshold eval gram set must NOT be
    force-broadcast (F.broadcast bypasses Spark's own size guard and would
    OOM executors); the probe falls back to a sort-merge join. Values are
    identical on either path."""
    docs = _docs(spark)
    eval_docs = docs.filter(F.col("doc_id") % 29 == 0)

    fast = DC.decontaminate(docs, eval_docs, n=5)
    guarded = DC.decontaminate(docs, eval_docs, n=5, eval_broadcast_limit=1)
    plan_fast = fast._jdf.queryExecution().executedPlan().toString()
    plan_guarded = guarded._jdf.queryExecution().executedPlan().toString()
    # default: gram probe is a forced broadcast semi-join
    assert "BroadcastHashJoin" in plan_fast
    # over the limit: the probe join degrades to sort-merge (the final
    # anti-join on the small dirty-id set may still broadcast — that one
    # is bounded by the contaminated minority, not by the eval set)
    assert "SortMergeJoin" in plan_guarded
    same = sorted(map(str, fast.collect())) == sorted(map(str, guarded.collect()))
    assert same
    # report path honors the guard too
    rep = DC.contamination_report(docs, eval_docs, n=5, eval_broadcast_limit=1)
    assert "SortMergeJoin" in rep._jdf.queryExecution().executedPlan().toString()


def test_shape_exact_dedup(spark):
    docs = _docs(spark)
    assert _shape(D.exact_dedup(docs)) == {
        # one shuffle on the content digest; pure map-side hashing before it
        "shuffle_exchange": 1,
        "broadcast_exchange": 0,
        "broadcast_hash_join": 0,
        "sort_merge_join": 0,
        "nested_loop_join": 0,
        "window": 0,
        "generate": 0,
    }
