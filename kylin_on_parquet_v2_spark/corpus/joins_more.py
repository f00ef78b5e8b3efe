"""Join surface beyond the round-1 corpus: RIGHT/FULL OUTER (declared in
SURVEY §2.3, previously untested), plus the two time-series joins a
training-data pipeline needs that neither the reference nor vanilla Spark
SQL provides as an operator — AS-OF join and bounded range join — each
expressed as compositions of existing DataFrame ops (SURVEY's "custom
operator" strategy (a)).

Scale notes (100 TB):
- as-of: union-tag + per-key window (`last(ignorenulls)`) — ONE shuffle on
  the join key, no nested-loop join, no per-row Python.
- range join: candidate bin equi-join (explode each probe row into the 2
  bins its window can touch) + exact interval filter — turns the
  BroadcastNestedLoopJoin hazard into a hash join whose fan-out is bounded
  by bin width; the classic binned range-join rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def right_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    cust = spark.table("customer")
    nat = spark.table("nation")
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("n_name")
    )


def full_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER between per-user click and purchase totals — users present
    on either side survive with zero-filled counts."""
    views(spark, sf_dir)
    ev = spark.table("events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .withColumnRenamed("user_id", "cu")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .withColumnRenamed("user_id", "pu")
    )
    return (
        clicks.join(purchases, clicks.cu == purchases.pu, "full")
        .select(
            F.coalesce("cu", "pu").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("user_id")
    )


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase gets the user's most recent click value at
    or before the purchase time.

    Union-tag + window instead of a join: click and purchase rows interleave
    in one (user, ts) ordering and `last(click_value, ignorenulls=True)`
    carries the latest click forward — one shuffle, no range join. Clicks
    are pre-deduped per (user, ts) so the as-of pick is deterministic.
    """
    views(spark, sf_dir)
    ev = spark.table("events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "ts", "click_value", F.lit(None).cast("long").alias("event_id"), F.lit(None).cast("double").alias("purchase_value"), F.lit(0).alias("is_purchase"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("click_value"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(1).alias("is_purchase"),
    )
    # clicks sort before purchases at equal ts => the match is inclusive
    # (click at exactly the purchase time counts), matching ASOF semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("asof_click", F.last("click_value", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.round("purchase_value", 2).alias("purchase_value"),
            F.round("asof_click", 2).alias("asof_click"),
        )
        .orderBy("event_id")
    )


#: range-join window width and bin size (seconds)
_RANGE_SECONDS = 60


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: per error event, how many views by the same user
    in the preceding 60 seconds.

    Probe rows are exploded into the two 60s bins their window can touch
    and equi-joined on (user, bin) before the exact interval filter — a
    hash join with bounded fan-out instead of a nested-loop join.
    """
    views(spark, sf_dir)
    ev = spark.table("events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    # bin id only needs a monotonic micros mapping (ts is NTZ; the UTC-pinned
    # session makes the cast deterministic, and the exact filter runs after)
    def _bin(c):
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(_RANGE_SECONDS * 1_000_000)
        ).cast("long")

    view_rows = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
        _bin(F.col("ts")).alias("v_bin"),
    )
    ebin = _bin(F.col("ts"))
    probes = errors.withColumn("bin", F.explode(F.array(ebin - 1, ebin)))
    matches = (
        probes.join(
            view_rows,
            (probes.user_id == view_rows.v_user) & (probes.bin == view_rows.v_bin),
        )
        .filter(
            F.col("vts").between(
                F.col("ts") - F.expr(f"interval {_RANGE_SECONDS} seconds"), F.col("ts")
            )
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    return (
        errors.join(matches, "event_id", "left")
        .select("event_id", "user_id", F.coalesce("n_views", F.lit(0)).alias("n_views"))
        .orderBy("event_id")
    )


QUERIES = {
    "right_outer_join_agg": right_outer_join_agg,
    "full_outer_join_agg": full_outer_join_agg,
    "asof_join_events": asof_join_events,
    "range_join_binned": range_join_binned,
}

ORACLES = {
    "right_outer_join_agg": """
        select n_name, count(c_custkey) as n_customers
        from customer right join nation on c_nationkey = n_nationkey
        group by n_name
        order by n_name
    """,
    "full_outer_join_agg": """
        with c as (select user_id, count(*) as n_clicks from events
                   where event_type = 'click' group by user_id),
             p as (select user_id, count(*) as n_purchases from events
                   where event_type = 'purchase' group by user_id)
        select coalesce(c.user_id, p.user_id) as user_id,
               coalesce(n_clicks, 0) as n_clicks,
               coalesce(n_purchases, 0) as n_purchases
        from c full outer join p on c.user_id = p.user_id
        order by user_id
    """,
    "asof_join_events": """
        with c as (select user_id, ts, max(value) as click_value
                   from events where event_type = 'click' group by user_id, ts),
             p as (select event_id, user_id, ts, value from events
                   where event_type = 'purchase')
        select p.event_id, p.user_id,
               round(p.value, 2) as purchase_value,
               round(c.click_value, 2) as asof_click
        from p asof left join c
          on p.user_id = c.user_id and p.ts >= c.ts
        order by p.event_id
    """,
    "range_join_binned": """
        with e as (select event_id, user_id, ts from events where event_type = 'error'),
             v as (select user_id, ts from events where event_type = 'view')
        select e.event_id, e.user_id, count(v.ts) as n_views
        from e left join v
          on v.user_id = e.user_id
         and v.ts between e.ts - interval 60 second and e.ts
        group by e.event_id, e.user_id
        order by e.event_id
    """,
}
