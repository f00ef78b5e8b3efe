"""Date/time function surface — reference SparderRexVisitor.scala:101-119,
217-274 + KapExpresssions (TIMESTAMPADD/TIMESTAMPDIFF/add_months/dayofweek)
— SURVEY.md §2.8. Cross-engine note: Spark's dayofweek is 1-based (Sunday=1),
DuckDB's is 0-based — oracle SQL adjusts (+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def date_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT family: year/quarter/month/day/dayofweek/weekofyear."""
    views(spark, sf_dir)
    orders = spark.table("orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.hour("o_orderdate").alias("hr"),
    ).orderBy("o_orderkey")


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date ± interval, add_months, months_between, datediff, date_trunc —
    KapAddMonths/TimestampAdd/TimestampDiff parity (KapExpresssions.scala)."""
    views(spark, sf_dir)
    orders = spark.table("orders").filter(F.col("o_orderkey") <= 100)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).alias("plus30"),
        F.date_sub(d, 7).alias("minus7"),
        F.add_months(d, 3).alias("plus3mo"),
        # month-boundary diff (DuckDB datediff('month') semantics); Spark's
        # fractional months_between has no cross-engine equivalent.
        (
            (F.year(F.lit("1998-01-01").cast("date")) * 12 + F.month(F.lit("1998-01-01").cast("date")))
            - (F.year(d) * 12 + F.month(d))
        ).cast("long").alias("mm"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("dd"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon_start"),
        F.last_day(d).alias("mon_end"),
    ).orderBy("o_orderkey")


def date_group_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (the segment-granularity groupBy)."""
    views(spark, sf_dir)
    orders = spark.table("orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("month")
    )


def date_month_arithmetic(spark, sf_dir):
    """Month-clamped date arithmetic: add_months / last_day / date_add
    (the reference's date +/- interval month semantics,
    SparderRexVisitor.scala:155-253)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select o_orderkey,
               add_months(o_orderdate, 3) as plus3,
               last_day(o_orderdate) as eom,
               date_add(o_orderdate, 45) as plus45d
        from orders where o_orderkey < 500
        order by o_orderkey
        """
    )


QUERIES = {
    "date_month_arithmetic": date_month_arithmetic,
    "date_extract_parts": date_extract_parts,
    "date_arithmetic": date_arithmetic,
    "date_group_by_month": date_group_by_month,
}

ORACLES = {
    "date_month_arithmetic": """
        select o_orderkey,
               cast(o_orderdate + interval 3 month as date) as plus3,
               last_day(o_orderdate) as eom,
               cast(o_orderdate as date) + 45 as plus45d
        from orders where o_orderkey < 500
        order by o_orderkey
    """,
    "date_extract_parts": """
        select o_orderkey,
               year(o_orderdate) as yr,
               quarter(o_orderdate) as qtr,
               month(o_orderdate) as mon,
               day(o_orderdate) as dom,
               dayofweek(o_orderdate) + 1 as dow,
               dayofyear(o_orderdate) as doy,
               weekofyear(o_orderdate) as woy,
               hour(o_orderdate) as hr
        from orders where o_orderkey <= 100
        order by o_orderkey
    """,
    "date_arithmetic": """
        select o_orderkey,
               cast(o_orderdate + interval 30 day as date) as plus30,
               cast(o_orderdate - interval 7 day as date) as minus7,
               cast(o_orderdate + interval 3 month as date) as plus3mo,
               datediff('month', cast(o_orderdate as date), date '1998-01-01') as mm,
               datediff('day', cast(o_orderdate as date), date '1998-01-01') as dd,
               cast(date_trunc('month', o_orderdate) as date) as mon_start,
               last_day(cast(o_orderdate as date)) as mon_end
        from orders where o_orderkey <= 100
        order by o_orderkey
    """,
    "date_group_by_month": """
        select cast(date_trunc('month', o_orderdate) as date) as month,
               count(*) as n,
               round(sum(o_totalprice), 2) as sum_price
        from orders
        group by 1
        order by month
    """,
}
