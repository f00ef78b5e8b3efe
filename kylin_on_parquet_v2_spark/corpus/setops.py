"""Set operations — UNION ALL / UNION (distinct) native in the reference
(``UnionPlan.scala:28-44``); INTERSECT / EXCEPT fall to pushdown there
(SURVEY.md §2.7) but are native DataFrame ops for us. VALUES and single-row
relations (``ValuesPlan.scala``, ``TableScanPlan.scala:279-284``) included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kylin_on_parquet_v2_spark.corpus.base import views


def union_all_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (n-ary fold) — duplicates preserved."""
    views(spark, sf_dir)
    orders = spark.table("orders")
    hi = orders.filter(F.col("o_totalprice") >= 100000).select("o_orderstatus", "o_orderkey")
    lo = orders.filter(F.col("o_totalprice") < 100000).select("o_orderstatus", "o_orderkey")
    both = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderstatus", "o_orderkey"
    )
    return (
        hi.union(lo)
        .union(both)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dropDuplicates (UnionPlan.scala:37-42)."""
    views(spark, sf_dir)
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — native for us, pushdown-only in the reference."""
    views(spark, sf_dir)
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customer nations with no supplier."""
    views(spark, sf_dir)
    c = spark.table("customer").select(F.col("c_nationkey").alias("nationkey"))
    s = spark.table("supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES inline relation (ValuesPlan.scala:29-45) joined to a table."""
    views(spark, sf_dir)
    schema = StructType(
        [StructField("r_regionkey", IntegerType()), StructField("tier", StringType())]
    )
    tiers = spark.createDataFrame(
        [(0, "core"), (1, "core"), (2, "growth"), (3, "growth"), (4, "frontier")], schema
    )
    region = spark.table("region")
    return (
        region.join(F.broadcast(tiers), "r_regionkey")
        .select("r_regionkey", "r_name", "tier")
        .orderBy("r_regionkey")
    )


def single_row_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant SELECT with no table (TableScanPlan.scala:279-284)."""
    return spark.range(1).select(
        F.lit(1).cast("int").alias("one"),
        F.lit("kylin").alias("name"),
        F.round(F.lit(2.5) * 2, 1).alias("five"),
    )


def intersect_all_pairs(spark, sf_dir):
    """INTERSECT ALL — multiset semantics (duplicates kept to the min
    multiplicity); native here, pushdown-only in the reference."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select l_returnflag, l_linestatus from lineitem where l_quantity > 45
        intersect all
        select l_returnflag, l_linestatus from lineitem where l_discount > 0.08
        order by 1, 2
        """
    )


def except_all_pairs(spark, sf_dir):
    """EXCEPT ALL — multiset difference (per-row multiplicity subtraction)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select l_returnflag, l_linestatus from lineitem where l_quantity > 45
        except all
        select l_returnflag, l_linestatus from lineitem where l_discount > 0.08
        order by 1, 2
        """
    )


def ordinal_group_order(spark, sf_dir):
    """GROUP BY / ORDER BY ordinals (reference corpus sql_ordinal/):
    Catalyst resolves the ordinals to attributes during analysis, so the
    digested plan is identical to the spelled-out query — it still takes
    an exact cuboid route."""
    from kylin_on_parquet_v2_spark.corpus.base import engine

    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus, sum(l_quantity) as s, count(*) as n
        from lineitem group by 1, 2 order by 1, 2
        """
    )
    assert eng.last_route is not None and eng.last_route.exact
    from pyspark.sql import functions as F

    return df.select(
        "l_returnflag", "l_linestatus", F.round("s", 2).alias("s"), "n"
    )


def dynamic_params(spark, sf_dir):
    """Prepared-statement parameters (reference corpus sql_dynamic/ +
    PreparedState): positional ? markers bound in the parser, so by
    analysis time the plan equals the spelled-out query and still routes."""
    from kylin_on_parquet_v2_spark.corpus.base import engine

    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_linestatus, count(*) as n
        from lineitem where l_returnflag = ? group by l_linestatus order by l_linestatus
        """,
        params=["A"],
    )
    assert eng.last_route is not None
    return df


QUERIES = {
    "dynamic_params": dynamic_params,
    "ordinal_group_order": ordinal_group_order,
    "intersect_all_pairs": intersect_all_pairs,
    "except_all_pairs": except_all_pairs,
    "union_all_halves": union_all_halves,
    "union_distinct_nations": union_distinct_nations,
    "intersect_nations": intersect_nations,
    "except_nations": except_nations,
    "values_inline": values_inline,
    "single_row_select": single_row_select,
}

ORACLES = {
    "dynamic_params": """
        select l_linestatus, count(*) as n
        from lineitem where l_returnflag = 'A' group by l_linestatus order by l_linestatus
    """,
    "ordinal_group_order": """
        select l_returnflag, l_linestatus, round(sum(l_quantity), 2) as s, count(*) as n
        from lineitem group by 1, 2 order by 1, 2
    """,
    "intersect_all_pairs": """
        select l_returnflag, l_linestatus from lineitem where l_quantity > 45
        intersect all
        select l_returnflag, l_linestatus from lineitem where l_discount > 0.08
        order by 1, 2
    """,
    "except_all_pairs": """
        select l_returnflag, l_linestatus from lineitem where l_quantity > 45
        except all
        select l_returnflag, l_linestatus from lineitem where l_discount > 0.08
        order by 1, 2
    """,
    "union_all_halves": """
        select o_orderstatus, count(*) as n from (
            select o_orderstatus, o_orderkey from orders where o_totalprice >= 100000
            union all
            select o_orderstatus, o_orderkey from orders where o_totalprice < 100000
            union all
            select o_orderstatus, o_orderkey from orders where o_orderpriority = '1-URGENT'
        ) t group by o_orderstatus order by o_orderstatus
    """,
    "union_distinct_nations": """
        select c_nationkey as nationkey from customer
        union
        select s_nationkey as nationkey from supplier
        order by nationkey
    """,
    "intersect_nations": """
        select c_nationkey as nationkey from customer
        intersect
        select s_nationkey as nationkey from supplier
        order by nationkey
    """,
    "except_nations": """
        select c_nationkey as nationkey from customer
        except
        select s_nationkey as nationkey from supplier
        order by nationkey
    """,
    "values_inline": """
        select r_regionkey, r_name, tier
        from region
        join (values (0, 'core'), (1, 'core'), (2, 'growth'), (3, 'growth'),
                     (4, 'frontier')) as t(r_regionkey, tier)
          using (r_regionkey)
        order by r_regionkey
    """,
    "single_row_select": """
        select cast(1 as int) as one, 'kylin' as name, round(2.5 * 2, 1) as five
    """,
}
