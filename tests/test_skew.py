"""AQE skew-join evidence: the engine's scale story for hot keys
(SURVEY.md §4, and the 'AQE's skew split handles a hot cluster' claim in
pipeline/similarity.py::semantic_neardup_removed) is that Spark splits a
skewed shuffle partition at runtime. This test proves the claim fires
under this session's configs rather than leaving it as prose.

Thresholds are lowered to make local-mode data 'big'; two findings this
probe produced are worth keeping on record:

- a pushable post-join filter gets pushed BELOW the shuffle by Catalyst,
  shrinking the 'hot' partition before AQE ever sees it — skew handling
  and predicate pushdown compose, and pushdown wins first;
- the executed/adaptive plan must be read off the SAME QueryExecution
  that ran (df.collect()); df.count() plans a different tree and the
  original df's plan stays un-finalized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: (conf, probe value) — session values restored after the test
_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
}


def test_aqe_splits_hot_key_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        # 95% of the fact side lands on key 0 (one hot shuffle partition,
        # ~85 MB of incompressible md5 strings); the dim side has one row
        # per key so the join output stays row-per-fact-row
        a = spark.range(2000000).select(
            (F.when(F.col("id") % 20 < 19, 0).otherwise(F.col("id") % 97)).alias("k"),
            F.md5(F.col("id").cast("string")).alias("va"),
        )
        b = spark.range(97).select(F.col("id").alias("k2"), F.col("id").alias("vb"))
        j = (
            a.join(b, F.col("k") == F.col("k2"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("va")).alias("s"))
        )
        rows = j.collect()  # finalizes THIS QueryExecution's adaptive plan
        assert rows[0]["n"] == 2000000 and rows[0]["s"] == 64000000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # the AQEShuffleRead over the split reads
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
