"""Window functions — full surface of the reference's WindowPlan.scala (337):
ranking, offsets, aggregates-over-window, frame specs; plus PERCENT_RANK /
CUME_DIST which the reference lists but fails to dispatch (SURVEY.md §2.5 —
we support them properly).

Determinism contract: every window ORDER BY includes a unique tiebreaker
(o_orderkey / l_linenumber) except for rank/dense_rank, whose tie handling is
itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER / RANK / DENSE_RANK — WindowPlan.scala:158-163."""
    views(spark, sf_dir)
    orders = spark.table("orders")
    w_unique = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_ties = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_ties).alias("rk"),
            F.dense_rank().over(w_ties).alias("drk"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("o_orderpriority", "rn")
    )


def window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD / LAG (with default) / FIRST_VALUE / LAST_VALUE / NTILE —
    WindowPlan.scala:164-204."""
    views(spark, sf_dir)
    orders = spark.table("orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        F.first("o_orderkey").over(w_full).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "o_orderkey")


def window_agg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG/MIN/MAX/COUNT over ROWS frames (running + sliding) —
    WindowPlan.scala:205-229, frame construction :277-336."""
    views(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 200)
    w_run = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_slide = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(-1, 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w_run), 2).alias("running_qty"),
        # avg over integer-valued quantities: exact in FP, so the rounded
        # value can't sit on a .xx5 boundary where engines' summation-order
        # noise would flip the last digit.
        F.round(F.avg("l_quantity").over(w_slide), 4).alias("sliding_avg"),
        F.min("l_quantity").over(w_slide).alias("sliding_min"),
        F.max("l_quantity").over(w_slide).alias("sliding_max"),
        F.count(F.lit(1)).over(w_slide).alias("sliding_n"),
    ).orderBy("l_orderkey", "l_linenumber")


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST — unsupported in the reference runtime
    (MatchError, WindowPlan.scala:43-54 lists them without a dispatch case);
    we implement them natively."""
    views(spark, sf_dir)
    sup = spark.table("supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return sup.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("s_suppkey")


def window_nth_value(spark, sf_dir):
    """nth_value over an unbounded frame + first_value running — the last
    uncovered ranking-family functions."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) over (partition by o_orderpriority
                                                order by o_orderkey
                                                rows between unbounded preceding
                                                and unbounded following) as second_price,
               first_value(o_orderpriority) over (order by o_orderkey) as fst
        from orders where o_orderkey < 500
        order by o_orderkey
        """
    )


QUERIES = {
    "window_nth_value": window_nth_value,
    "window_ranking": window_ranking,
    "window_offsets": window_offsets,
    "window_agg_frames": window_agg_frames,
    "window_percent_rank": window_percent_rank,
}

ORACLES = {
    "window_nth_value": """
        select o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) over (partition by o_orderpriority
                                                order by o_orderkey
                                                rows between unbounded preceding
                                                and unbounded following) as second_price,
               first_value(o_orderpriority) over (order by o_orderkey) as fst
        from orders where o_orderkey < 500
        order by o_orderkey
    """,
    "window_ranking": """
        select * from (
            select o_orderkey, o_orderpriority,
                   row_number() over (partition by o_orderpriority
                                      order by o_totalprice desc, o_orderkey) as rn,
                   rank() over (partition by o_orderpriority order by o_orderstatus) as rk,
                   dense_rank() over (partition by o_orderpriority order by o_orderstatus) as drk
            from orders
        ) t where rn <= 5
        order by o_orderpriority, rn
    """,
    "window_offsets": """
        select o_custkey, o_orderkey,
               lag(o_totalprice, 1) over w as prev_price,
               lead(o_totalprice, 1, -1.0) over w as next_price,
               first_value(o_orderkey) over w_full as first_key,
               last_value(o_orderkey) over w_full as last_key,
               ntile(4) over w as quartile
        from orders
        where o_custkey <= 20
        window w as (partition by o_custkey order by o_orderkey),
               w_full as (partition by o_custkey order by o_orderkey
                          rows between unbounded preceding and unbounded following)
        order by o_custkey, o_orderkey
    """,
    "window_agg_frames": """
        select l_orderkey, l_linenumber,
               round(sum(l_quantity) over w_run, 2) as running_qty,
               round(avg(l_quantity) over w_slide, 4) as sliding_avg,
               min(l_quantity) over w_slide as sliding_min,
               max(l_quantity) over w_slide as sliding_max,
               count(*) over w_slide as sliding_n
        from lineitem
        where l_orderkey <= 200
        window w_run as (partition by l_orderkey order by l_linenumber
                         rows between unbounded preceding and current row),
               w_slide as (partition by l_orderkey order by l_linenumber
                           rows between 1 preceding and 1 following)
        order by l_orderkey, l_linenumber
    """,
    "window_percent_rank": """
        select s_suppkey,
               round(percent_rank() over w, 4) as pr,
               round(cume_dist() over w, 4) as cd
        from supplier
        window w as (order by s_acctbal desc, s_suppkey)
        order by s_suppkey
    """,
}
