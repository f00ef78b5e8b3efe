"""Math + conditional + cast surface — reference ExpressionConverter.scala
:153-170, 275-303, 351-354 and SparderRexVisitor arithmetic — SURVEY.md §2.8.
Transcendentals rounded to 6 decimals: libm low-bit noise differs per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 50)
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(-x).alias("abs_x"),
        (F.floor(x * 10 + 0.5) / 10).alias("round_x"),
        # cast to double: Spark ceil/floor return BIGINT while DuckDB returns
        # DOUBLE — identical values hash differently as int64 vs float64
        F.ceil(x).cast("double").alias("ceil_x"),
        F.floor(x).cast("double").alias("floor_x"),
        F.sign(x - 30000).cast("double").alias("sign_x"),
        (F.col("l_quantity") % 7).alias("mod_x"),
        F.round(F.sqrt(x), 6).alias("sqrt_x"),
        F.round(F.pow(F.col("l_quantity"), F.lit(2)), 2).alias("pow_x"),
        F.round(F.ln(x), 6).alias("ln_x"),
        F.round(F.log10(x), 6).alias("log10_x"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_x"),
    ).orderBy("l_orderkey", "l_linenumber")


def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / REINTERPRET surface (ExpressionConverter.scala:120-126)."""
    views(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 30)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("double").alias("key_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.lit("42").cast("int").alias("parsed"),
    ).orderBy("l_orderkey", "l_linenumber")


def arithmetic_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """+ - * / precedence and null propagation (SparderRexVisitor:155-267)."""
    views(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 30)
    charged = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    # floor-trick rounding: bit-identical across engines for row-level
    # expressions (see corpus/advanced.py note on round() divergence)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(charged * 10000 + 0.5) / 10000).alias("charged"),
        (F.floor(unit * 10000 + 0.5) / 10000).alias("unit_price"),
        (F.col("l_quantity") + F.col("l_linenumber") - 1).alias("sum_mix"),
        (F.col("l_extendedprice") * F.lit(None).cast("double")).alias("null_prop"),
    ).orderBy("l_orderkey", "l_linenumber")


QUERIES = {
    "math_functions": math_functions,
    "cast_types": cast_types,
    "arithmetic_expressions": arithmetic_expressions,
}

ORACLES = {
    "math_functions": """
        select l_orderkey, l_linenumber,
               abs(-l_extendedprice) as abs_x,
               floor(l_extendedprice * 10 + 0.5) / 10 as round_x,
               ceil(l_extendedprice) as ceil_x,
               floor(l_extendedprice) as floor_x,
               cast(sign(l_extendedprice - 30000) as double) as sign_x,
               l_quantity % 7 as mod_x,
               round(sqrt(l_extendedprice), 6) as sqrt_x,
               round(pow(l_quantity, 2), 2) as pow_x,
               round(ln(l_extendedprice), 6) as ln_x,
               round(log10(l_extendedprice), 6) as log10_x,
               round(exp(l_discount), 6) as exp_x
        from lineitem where l_orderkey <= 50
        order by l_orderkey, l_linenumber
    """,
    "cast_types": """
        select l_orderkey, l_linenumber,
               cast(l_quantity as int) as qty_int,
               cast(l_quantity as varchar) as qty_str,
               cast(l_orderkey as double) as key_dbl,
               cast(l_shipdate as date) as ship_date,
               cast(cast(l_extendedprice as decimal(18,2)) as double) as price_dec,
               cast('42' as int) as parsed
        from lineitem where l_orderkey <= 30
        order by l_orderkey, l_linenumber
    """,
    "arithmetic_expressions": """
        select l_orderkey, l_linenumber,
               floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) / 10000 as charged,
               floor(l_extendedprice / l_quantity * 10000 + 0.5) / 10000 as unit_price,
               l_quantity + l_linenumber - 1 as sum_mix,
               l_extendedprice * cast(null as double) as null_prop
        from lineitem where l_orderkey <= 30
        order by l_orderkey, l_linenumber
    """,
}
