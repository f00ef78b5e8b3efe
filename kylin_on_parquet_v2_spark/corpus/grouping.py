"""GROUPING SETS / CUBE / ROLLUP + GROUPING() — reference expands these via
``AggregateMultipleExpandRule.java:45-120`` into unions of simple aggregates;
Spark has them natively (``df.cube/rollup/groupingSets`` + ``F.grouping``) —
SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    cust = spark.table("customer")
    nation = spark.table("nation")
    region = spark.table("region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    orders = spark.table("orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — corpus ``sql_grouping/query00.sql`` parity."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


QUERIES = {
    "rollup_region_nation": rollup_region_nation,
    "cube_status_priority": cube_status_priority,
    "grouping_sets_explicit": grouping_sets_explicit,
}

ORACLES = {
    "rollup_region_nation": """
        select r_name, n_name,
               cast(grouping(r_name) as int) as g_region,
               cast(grouping(n_name) as int) as g_nation,
               count(*) as n,
               round(sum(c_acctbal), 2) as sum_bal
        from customer
          join nation on c_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
        group by rollup(r_name, n_name)
        order by g_region, g_nation, r_name, n_name
    """,
    "cube_status_priority": """
        select o_orderstatus, o_orderpriority,
               cast(grouping(o_orderstatus) as int) as g_status,
               cast(grouping(o_orderpriority) as int) as g_prio,
               count(*) as n,
               round(sum(o_totalprice), 2) as sum_price
        from orders
        group by cube(o_orderstatus, o_orderpriority)
        order by g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    "grouping_sets_explicit": """
        select l_returnflag, l_linestatus,
               cast(grouping(l_returnflag) as int) as g_rf,
               cast(grouping(l_linestatus) as int) as g_ls,
               round(sum(l_quantity), 2) as sum_qty
        from lineitem
        group by grouping sets ((l_returnflag), (l_linestatus), ())
        order by g_rf, g_ls, l_returnflag, l_linestatus
    """,
}
