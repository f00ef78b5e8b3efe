"""String function surface — reference ExpressionConverter.scala:171-216,
339-344 (lower upper char_length replace substring initcap instr concat
trim lpad rpad split_part levenshtein md5 regexp ...) — SURVEY.md §2.8.
All map to native pyspark.sql.functions (JVM-side, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def string_functions_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_custkey") <= 30)
    return cust.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.length("c_name").alias("len"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("cat"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.trim(F.lpad("c_mktsegment", 12, " ")).alias("trimmed"),
        F.lpad("c_custkey", 6, "0").alias("padded"),
        F.initcap(F.lower("c_mktsegment")).alias("cap"),
    ).orderBy("c_custkey")


def string_functions_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instr/locate, split_part, levenshtein, md5, regexp."""
    views(spark, sf_dir)
    part = spark.table("part").filter(F.col("p_partkey") <= 40)
    return part.select(
        "p_partkey",
        F.instr("p_name", "a").alias("pos_a"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev"),
        F.md5(F.col("p_name").cast("binary")).alias("digest"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.col("p_name").rlike("^[a-f]").alias("starts_af"),
    ).orderBy("p_partkey")


def like_in_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN / CASE WHEN / IS NULL — corpus sql_like, sql_casewhen;
    ExpressionConverter.scala:64-100."""
    views(spark, sf_dir)
    part = spark.table("part")
    return (
        part.filter(F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .select(
            "p_partkey",
            "p_brand",
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_class"),
            F.col("p_type").like("%BRASS%").alias("is_brass"),
            F.isnull(F.nullif(F.col("p_size").cast("int"), F.lit(25))).alias("is_25"),
            F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#22")), F.lit("other")).alias(
                "brand_or_other"
            ),
        )
        .orderBy("p_partkey")
    )


QUERIES = {
    "string_functions_core": string_functions_core,
    "string_functions_search": string_functions_search,
    "like_in_case": like_in_case,
}

ORACLES = {
    "string_functions_core": """
        select c_custkey,
               lower(c_name) as lo,
               upper(c_mktsegment) as up,
               length(c_name) as len,
               substring(c_name, 1, 8) as sub,
               concat_ws('-', c_mktsegment, c_name) as cat,
               replace(c_name, 'Customer', 'Cust') as repl,
               trim(lpad(c_mktsegment, 12, ' ')) as trimmed,
               lpad(cast(c_custkey as varchar), 6, '0') as padded,
               upper(substr(lower(c_mktsegment), 1, 1))
                   || substr(lower(c_mktsegment), 2) as cap
        from customer where c_custkey <= 30
        order by c_custkey
    """,
    "string_functions_search": """
        select p_partkey,
               instr(p_name, 'a') as pos_a,
               split_part(p_type, ' ', 1) as type_head,
               levenshtein(p_brand, 'Brand#11') as lev,
               md5(p_name) as digest,
               coalesce(regexp_extract(p_brand, 'Brand#(\\d+)', 1), '') as brand_num,
               p_name like '%gold%' as has_gold,
               regexp_matches(p_name, '^[a-f]') as starts_af
        from part where p_partkey <= 40
        order by p_partkey
    """,
    "like_in_case": """
        select p_partkey, p_brand,
               case when p_size < 10 then 'small'
                    when p_size < 30 then 'medium'
                    else 'large' end as size_class,
               p_type like '%BRASS%' as is_brass,
               (nullif(p_size, 25) is null) as is_25,
               coalesce(nullif(p_brand, 'Brand#22'), 'other') as brand_or_other
        from part
        where p_brand in ('Brand#11', 'Brand#22', 'Brand#33')
        order by p_partkey
    """,
}
