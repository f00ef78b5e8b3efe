"""Shard-aware storage: bucketed tables.

Reference parity: the shardBy rowkey column + ``KylinFileSourceScanExec``
(``kylin-spark-common/.../execution/KylinFileSourceScanExec.scala:74-135``) —
a scan over shard-partitioned files reports ``HashPartitioning`` output so
groupBy/join on the shard key needs NO shuffle, and literal filters on the
shard key prune bucket files (``FilePruner.pruneShards`` :287-373).

Spark mapping: both behaviors are built into bucketed tables
(``bucketBy(n, col).saveAsTable``) — the scan carries the bucket spec, the
planner drops the Exchange, and ``spark.sql.sources.bucketing.enabled``
file pruning handles equality filters. This module is the thin write-side
helper; the proof lives in ``tests/test_bucketing.py`` (plan assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table.

    At 100 TB, bucket the fact table by its highest-fan-in join/group key:
    every later join or aggregation on that key starts pre-partitioned.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def scan_is_shuffle_free(spark: SparkSession, sql: str, key: str) -> bool:
    """True if the physical plan for ``sql`` contains no shuffle on ``key``
    (the bucketed scan satisfied the required distribution)."""
    plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    return not any(
        "Exchange hashpartitioning" in ln and key in ln for ln in plan.splitlines()
    )
