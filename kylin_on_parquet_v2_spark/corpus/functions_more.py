"""Scalar-function surface, second batch — completing the §2.8 inventory
rows that are portable to the oracle: degrees/radians/cbrt/log2/pi/factorial,
repeat/reverse/contains/startswith/endswith/ascii/chr/left/right,
epoch round-trips + make_date, greatest/least.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def math_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    part = spark.table("part").filter(F.col("p_partkey") <= 40)
    return part.select(
        "p_partkey",
        F.round(F.degrees(F.col("p_size") / 100), 6).alias("deg"),
        F.round(F.radians("p_size"), 6).alias("rad"),
        F.round(F.cbrt("p_retailprice"), 6).alias("cbrt_price"),
        F.round(F.log2(F.col("p_size") + 1), 6).alias("log2_size"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_val"),
        F.factorial(F.col("p_size") % 10).cast("long").alias("fact_mod"),
        F.greatest("p_size", F.lit(25)).alias("gst"),
        F.least("p_size", F.lit(25)).alias("lst"),
    ).orderBy("p_partkey")


def string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    nation = spark.table("nation")
    return nation.select(
        "n_nationkey",
        F.repeat(F.substring("n_name", 1, 2), 3).alias("rep"),
        F.reverse("n_name").alias("rev"),
        F.col("n_name").contains("AN").alias("has_an"),
        F.col("n_name").startswith("A").alias("sw_a"),
        F.col("n_name").endswith("A").alias("ew_a"),
        F.ascii("n_name").alias("first_code"),
        F.expr("char(n_nationkey + 65)").alias("key_chr"),
        F.left(F.col("n_name"), F.lit(3)).alias("l3"),
        F.right(F.col("n_name"), F.lit(3)).alias("r3"),
    ).orderBy("n_nationkey")


def epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix epoch round-trips + make_date (to_timestamp/from_unixtime
    family, §2.8 datetime set)."""
    views(spark, sf_dir)
    orders = spark.table("orders").filter(F.col("o_orderkey") <= 50)
    ts = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.unix_timestamp(ts).alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp(ts)).cast("timestamp_ntz").alias("back"),
        F.make_date(F.year(ts), F.month(ts), F.dayofmonth(ts)).alias("md"),
    ).orderBy("o_orderkey")


def ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set / inverse-distribution aggregates (SQL:2003
    PERCENTILE_CONT / PERCENTILE_DISC ``WITHIN GROUP``, plus MEDIAN) — the
    ANSI spelling of the reference's percentile measure surface
    (``PercentileMeasureType``), answered exactly here via Spark's native
    ordered-set aggregates (sort-based; the SKETCH measures are the
    100 TB serving path, this is the exact-definition baseline)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select l_returnflag,
               round(percentile_cont(0.5) within group (order by l_quantity), 4) as pc50,
               round(percentile_disc(0.25) within group (order by l_quantity), 4) as pd25,
               round(median(l_extendedprice), 4) as med_price,
               round(percentile_cont(0.9) within group (order by l_discount), 6) as pc90_disc
        from lineitem group by l_returnflag order by l_returnflag
        """
    )


QUERIES = {
    "math_functions_2": math_functions_2,
    "string_functions_2": string_functions_2,
    "epoch_roundtrip": epoch_roundtrip,
    "ordered_set_aggs": ordered_set_aggs,
}

ORACLES = {
    "math_functions_2": """
        select p_partkey,
               round(degrees(p_size / 100.0), 6) as deg,
               round(radians(p_size), 6) as rad,
               round(cbrt(p_retailprice), 6) as cbrt_price,
               round(log2(p_size + 1), 6) as log2_size,
               round(pi(), 6) as pi_val,
               cast(factorial(p_size % 10) as bigint) as fact_mod,
               greatest(p_size, 25) as gst,
               least(p_size, 25) as lst
        from part where p_partkey <= 40
        order by p_partkey
    """,
    "string_functions_2": """
        select n_nationkey,
               repeat(substring(n_name, 1, 2), 3) as rep,
               reverse(n_name) as rev,
               contains(n_name, 'AN') as has_an,
               starts_with(n_name, 'A') as sw_a,
               ends_with(n_name, 'A') as ew_a,
               ascii(n_name) as first_code,
               chr(n_nationkey + 65) as key_chr,
               left(n_name, 3) as l3,
               right(n_name, 3) as r3
        from nation
        order by n_nationkey
    """,
    "epoch_roundtrip": """
        select o_orderkey,
               cast(floor(epoch(o_orderdate)) as bigint) as epoch_s,
               to_timestamp(cast(floor(epoch(o_orderdate)) as bigint))::timestamp as back,
               make_date(year(o_orderdate), month(o_orderdate), day(o_orderdate)) as md
        from orders where o_orderkey <= 50
        order by o_orderkey
    """,
    "ordered_set_aggs": """
        select l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) as pc50,
               round(quantile_disc(l_quantity, 0.25), 4) as pd25,
               round(median(l_extendedprice), 4) as med_price,
               round(quantile_cont(l_discount, 0.9), 6) as pc90_disc
        from lineitem group by l_returnflag order by l_returnflag
    """,
}
