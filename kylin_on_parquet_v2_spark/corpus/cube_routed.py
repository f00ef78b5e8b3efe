"""Cube-routed queries: the MOLAP acceleration path, proven against the
flat-SQL oracle (reference: aggregate->cuboid routing, SURVEY.md §3-§4).

Every query here goes through ``OlapEngine.sql`` and MUST take a cuboid
route (asserted) — the DuckDB oracle then proves routed == ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import engine


def cube_routed_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match cuboid hit => project-only plan (zero query-time agg)."""
    eng = engine(spark, sf_dir)
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
    """Snowflake aggregate routed onto a cuboid with re-aggregation + AVG
    decomposition (SUM/COUNT)."""
    eng = engine(spark, sf_dir)
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


def cube_routed_filter_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension filter + re-agg from a wider cuboid; exact count-distinct
    answered from dimension columns (DimCountDistinct semantics)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select o_orderpriority,
               count(distinct p_brand) as nd_brand,
               sum(l_quantity) as sum_qty
        from lineitem
          join orders on l_orderkey = o_orderkey
          join part on l_partkey = p_partkey
        where o_orderstatus = 'F'
        group by o_orderpriority
        order by o_orderpriority
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_filter_dim"
    return df.select(
        "o_orderpriority", "nd_brand", F.round("sum_qty", 2).alias("sum_qty")
    )


def cube_routed_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total aggregate (no GROUP BY) from the smallest cuboid."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select sum(l_extendedprice) as total_price,
               min(l_extendedprice) as min_price,
               max(l_extendedprice) as max_price,
               count(*) as n
        from lineitem
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_global"
    return df.select(
        F.round("total_price", 2).alias("total_price"),
        "min_price",
        "max_price",
        "n",
    )


QUERIES = {
    "cube_routed_q1": cube_routed_q1,
    "cube_routed_snowflake": cube_routed_snowflake,
    "cube_routed_filter_dim": cube_routed_filter_dim,
    "cube_routed_global": cube_routed_global,
}

ORACLES = {
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
    "cube_routed_filter_dim": """
        select o_orderpriority,
               count(distinct p_brand) as nd_brand,
               round(sum(l_quantity), 2) as sum_qty
        from lineitem
          join orders on l_orderkey = o_orderkey
          join part on l_partkey = p_partkey
        where o_orderstatus = 'F'
        group by o_orderpriority
        order by o_orderpriority
    """,
    "cube_routed_global": """
        select round(sum(l_extendedprice), 2) as total_price,
               min(l_extendedprice) as min_price,
               max(l_extendedprice) as max_price,
               count(*) as n
        from lineitem
    """,
}
