"""Subqueries: IN / EXISTS / NOT EXISTS / scalar — the reference decorrelates
these through Calcite into joins (corpus ``sql_subquery/``, SURVEY.md §2.3);
our DataFrame forms are explicit semi/anti/cross joins. OFFSET is included
here too: dead code in the reference (``LimitPlan.scala:36-45``), implemented
properly by us.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def semi_join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) == left-semi join."""
    views(spark, sf_dir)
    cust = spark.table("customer")
    big_orders = spark.table("orders").filter(F.col("o_totalprice") > 250000)
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS == left-anti join: customers with no orders at all."""
    views(spark, sf_dir)
    cust = spark.table("customer")
    orders = spark.table("orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_mktsegment")
    )


def scalar_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (SINGLE_VALUE, AggregatePlan.scala:166-168): parts
    priced above the global average."""
    views(spark, sf_dir)
    part = spark.table("part")
    avg_price = part.agg(F.avg("p_retailprice").alias("a"))
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("a"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_premium"))
        .orderBy("p_brand")
    )


def correlated_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery decorrelated into a join on a grouped subquery:
    each customer's orders above that customer's own average."""
    views(spark, sf_dir)
    orders = spark.table("orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(per_cust, orders.o_custkey == per_cust.k)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("o_orderpriority")
    )


def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET — unimplemented in the reference (LimitPlan.scala
    :36-45 commented out); native ``df.offset`` for us."""
    views(spark, sf_dir)
    orders = spark.table("orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(10)
    )


def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST (Oracle-style defaults in the reference,
    SortPlan.scala:34-77)."""
    views(spark, sf_dir)
    cust = spark.table("customer")
    with_nulls = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    ).filter(F.col("c_custkey") <= 50)
    return with_nulls.orderBy(
        F.col("bal").desc_nulls_first(), F.col("c_custkey").asc()
    )


QUERIES = {
    "semi_join_in_subquery": semi_join_in_subquery,
    "anti_join_not_exists": anti_join_not_exists,
    "scalar_subquery_avg": scalar_subquery_avg,
    "correlated_agg_subquery": correlated_agg_subquery,
    "limit_offset": limit_offset,
    "sort_null_ordering": sort_null_ordering,
}

ORACLES = {
    "semi_join_in_subquery": """
        select c_custkey, c_name, c_mktsegment
        from customer
        where c_custkey in (select o_custkey from orders where o_totalprice > 250000)
        order by c_custkey
    """,
    "anti_join_not_exists": """
        select c_mktsegment, count(*) as n_inactive
        from customer c
        where not exists (select 1 from orders o where o.o_custkey = c.c_custkey)
        group by c_mktsegment
        order by c_mktsegment
    """,
    "scalar_subquery_avg": """
        select p_brand, count(*) as n_premium
        from part
        where p_retailprice > (select avg(p_retailprice) from part)
        group by p_brand
        order by p_brand
    """,
    "correlated_agg_subquery": """
        select o_orderpriority, count(*) as n_above_avg
        from orders o
        where o_totalprice > (select avg(o2.o_totalprice) from orders o2
                              where o2.o_custkey = o.o_custkey)
        group by o_orderpriority
        order by o_orderpriority
    """,
    "limit_offset": """
        select o_orderkey, o_totalprice
        from orders
        order by o_totalprice desc, o_orderkey
        limit 10 offset 5
    """,
    "sort_null_ordering": """
        select c_custkey,
               case when c_acctbal < 0 then null else c_acctbal end as bal
        from customer
        where c_custkey <= 50
        order by bal desc nulls first, c_custkey asc
    """,
}
