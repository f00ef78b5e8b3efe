"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (cube-routed TPC-H-Q1-style pricing
summary) on sf0.001. ``queries()`` — one DataFrame-API implementation per
operator declared done from SURVEY.md §2. ``oracle_sql()`` — the equivalent
ANSI SQL DuckDB runs on the same parquet for the correctness gate.

Column-name contract: every computed column is aliased identically in the
Spark code and the oracle SQL. Doubles that aggregate across partitions are
rounded to 2 decimals on BOTH sides so partial-agg ordering noise can't flip
the value hash.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE, TPCH_MODEL
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.session import register_views

# ---------------------------------------------------------------------------
# helpers

_ENGINES: dict[str, OlapEngine] = {}


def _views(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)


def _engine(spark: SparkSession, sf_dir: str) -> OlapEngine:
    """Engine with the standard TPC-H star cube built (cached per sf_dir)."""
    key = os.path.abspath(sf_dir)
    eng = _ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    storage = os.path.join(
        tempfile.gettempdir(), "kylin_entry_cubes", key.strip("/").replace("/", "_")
    )
    eng = OlapEngine(spark, storage_dir=storage)
    eng.register_sources(sf_dir)
    eng.add_model(TPCH_MODEL)
    eng.build_cube(TPCH_CUBE)
    _ENGINES[key] = eng
    return eng


# ---------------------------------------------------------------------------
# queries (DataFrame API — the engine's operator surface)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter -> groupBy -> 8 aggregates -> sort.

    Operators: parquet scan w/ predicate pushdown, filter, hash aggregate
    (SUM/AVG/COUNT), sort (SURVEY §2.1, §2.2, §2.4, §2.6).
    """
    _views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join x2 + filter + agg + topk (sort/limit) — SURVEY §2.3, §2.6."""
    _views(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    li = spark.table("lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake joins (depth 4) + region filter + agg — SURVEY §2.3."""
    _views(spark, sf_dir)
    li = spark.table("lineitem")
    orders = spark.table("orders")
    cust = spark.table("customer")
    nation = spark.table("nation")
    region = spark.table("region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-only global aggregate (no group) — SURVEY §2.2, §2.4."""
    _views(spark, sf_dir)
    li = spark.table("lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


def agg_count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT (reference bitmap measure semantics) — §2.4."""
    _views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.countDistinct("l_partkey").alias("nd_part"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def cube_routed_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOLAP path: same aggregate served from a pre-built cuboid layout
    through the router (exact-match hit => project-only plan) — SURVEY §3, §4.

    The oracle (flat SQL on source tables) proves routed == ground truth.
    """
    eng = _engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               count(*) as count_order
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_q1"
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        "count_order",
    )


def cube_routed_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake aggregate routed onto a (r_name, n_name) cuboid with
    re-aggregation + AVG decomposition (SUM/COUNT) — SURVEY §2.4, §3."""
    eng = _engine(spark, sf_dir)
    df = eng.sql(
        """
        select n_name,
               sum(l_extendedprice) as sum_price,
               avg(l_extendedprice) as avg_price,
               count(*) as n
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
        group by n_name
        order by n_name
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_snowflake"
    return df.select(
        "n_name",
        F.round("sum_price", 2).alias("sum_price"),
        F.round("avg_price", 2).alias("avg_price"),
        "n",
    )


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cube-routed pricing summary on sf0.001."""
    return cube_routed_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_nation_revenue": q5_nation_revenue,
        "q6_revenue_change": q6_revenue_change,
        "agg_count_distinct_exact": agg_count_distinct_exact,
        "cube_routed_q1": cube_routed_q1,
        "cube_routed_snowflake": cube_routed_snowflake,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
                   round(avg(l_quantity), 2) as avg_qty,
                   round(avg(l_extendedprice), 2) as avg_price,
                   round(avg(l_discount), 4) as avg_disc,
                   count(*) as count_order
            from lineitem
            where l_shipdate <= date '1998-09-02'
            group by l_returnflag, l_linestatus
            order by l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            select l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem
              join orders on l_orderkey = o_orderkey
              join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING'
              and o_orderdate < date '1995-03-15'
              and l_shipdate > date '1995-03-15'
            group by l_orderkey, o_orderdate, o_orderpriority
            order by revenue desc, l_orderkey asc
            limit 10
        """,
        "q5_nation_revenue": """
            select n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem
              join orders on l_orderkey = o_orderkey
              join customer on o_custkey = c_custkey
              join nation on c_nationkey = n_nationkey
              join region on n_regionkey = r_regionkey
            where r_name = 'ASIA'
            group by n_name
            order by revenue desc, n_name asc
        """,
        "q6_revenue_change": """
            select round(sum(l_extendedprice * l_discount), 2) as revenue
            from lineitem
            where l_shipdate >= date '1995-01-01'
              and l_shipdate < date '1996-01-01'
              and l_discount between 0.05 and 0.07
              and l_quantity < 24
        """,
        "agg_count_distinct_exact": """
            select l_returnflag,
                   count(distinct l_suppkey) as nd_supp,
                   count(distinct l_partkey) as nd_part,
                   count(*) as n
            from lineitem
            group by l_returnflag
            order by l_returnflag
        """,
        "cube_routed_q1": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   count(*) as count_order
            from lineitem
            group by l_returnflag, l_linestatus
            order by l_returnflag, l_linestatus
        """,
        "cube_routed_snowflake": """
            select n_name,
                   round(sum(l_extendedprice), 2) as sum_price,
                   round(avg(l_extendedprice), 2) as avg_price,
                   count(*) as n
            from lineitem
              join orders on l_orderkey = o_orderkey
              join customer on o_custkey = c_custkey
              join nation on c_nationkey = n_nationkey
            group by n_name
            order by n_name
        """,
    }
