"""Training-shard export: deterministic global shuffle + fixed shard fan-out.

The last step of a curation pipeline: the cleaned corpus must reach the
trainer as N shard files whose concatenation is a *uniformly shuffled*
ordering of the documents — and the shuffle must be a pure function of
(doc id, seed) so a re-run (or a resumed run, or a different engine)
produces byte-identical shards.

100 TB shape
------------
- A true global ``ORDER BY random()`` is a full range-partitioned sort of
  the corpus AND is non-reproducible. Instead the shuffle key is
  ``md5(id || ':' || seed)``: uniform, deterministic, and engine-portable.
- Sharding is ONE hash shuffle (``repartition(n, shard)``), then each
  shard sorts locally (``sortWithinPartitions``) — the sort is bounded by
  shard size (corpus/N), never global. Position numbering uses a window
  partitioned BY SHARD, so row_number never funnels through a single
  partition.
- The writer emits ``shard=k/`` directories via ``partitionBy`` after the
  repartition, so each shard is one task writing one file run, and the
  manifest (per-shard doc/token counts) is a map-side-combinable
  aggregation over the same frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline.text import token_count


def shuffle_key(id_col: Column, seed: int) -> Column:
    """Deterministic uniform shuffle key: md5 of ``id:seed``.

    A lowercase hex string — string comparison orders it identically in
    any engine (DuckDB replays it verbatim, which is what makes the
    export oracle-checkable)."""
    return F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed))).cast("binary"))


def shard_of(key: Column, n_shards: int) -> Column:
    """Shard id in [0, n_shards) from the first 8 hex chars of the key
    (independent bits from the same digest; conv() is JVM codegen)."""
    return F.pmod(F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)).cast("int")


def assign_shards(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8, seed: int = 1
) -> DataFrame:
    """Corpus + (``shard``, ``shuffle_key``) columns. Pure projection —
    no shuffle until the caller repartitions or aggregates."""
    clash = {"shard", "shuffle_key"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has reserved column(s) {sorted(clash)}")
    key = shuffle_key(F.col(id_col), seed)
    return df.withColumn("shuffle_key", key).withColumn(
        "shard", shard_of(F.col("shuffle_key"), n_shards)
    )


def shuffled_positions(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8, seed: int = 1
) -> DataFrame:
    """(shard, position, id, shuffle_key): the exact training order.

    ``position`` is the 1-based rank within the shard by (key, id) — the
    id tiebreak makes the order total even under digest collisions. The
    window partitions by shard, so ranking parallelizes across shards."""
    assigned = assign_shards(df, id_col, n_shards, seed)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return assigned.select(
        "shard",
        F.row_number().over(w).alias("position"),
        F.col(id_col),
        "shuffle_key",
    )


def export_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    seed: int = 1,
) -> DataFrame:
    """Write the shuffled corpus as ``shard=k/`` parquet dirs and return
    the manifest (per-shard docs + token sum) the trainer uses to size
    epochs. One repartition on the shard id; rows are written in shuffle
    order (``sortWithinPartitions`` — bounded by shard size)."""
    assigned = assign_shards(df, id_col, n_shards, seed)
    (
        # leading sort on the partition column: the dynamic-partition writer
        # requires task rows ordered by partition cols and would inject its
        # own (non-stable) sort otherwise, scrambling the shuffle order
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(assigned, text_col=text_col)


def shard_manifest(assigned: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-shard manifest: document count and whitespace-token sum."""
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count(F.col(text_col))).alias("tokens"),
    )
