"""Scalar-function conformance sweep — the ~25 §2.8 names the reference's
expression converter dispatches that had no corpus query until round 6
(reference ``ExpressionConverter.scala:39-59,153-361`` — ltrim/rtrim, power,
cot, hypot, sinh/cosh/tanh, expm1, log1p, bround, conv, crc32, sha1,
substring_index, find_in_set, sentences, ifnull, date_part, to_date,
from_utc_timestamp/to_utc_timestamp — and ``KapExpresssions.scala:203-259``
— timestampadd/timestampdiff, truncate — plus the nullary constants pi/e).

Every name is exercised through the Spark builtin (JVM whole-stage codegen;
zero Python) and value-checked against DuckDB. Where DuckDB lacks the
function the oracle spells out the EXACT semantics instead:

- sinh/cosh/tanh/expm1/log1p: exp-formula expansion, rounded to 6 decimals
  on both sides (libm low-bit noise).
- bround (HALF_EVEN): explicit tie-to-even CASE over floor/ceil — the
  inputs include real .5 ties so the banker's-rounding behavior itself is
  what's compared, not just the easy cases.
- crc32/sha1: DuckDB has neither; the oracle inlines the expected digest
  per region name (computed with Python's zlib/hashlib at import — the
  TPC-H region names are part of the spec, so the constants are stable).
- sentences: the count is derived from the constructed text's period count
  on the oracle side (BreakIterator and the regexp agree on simple
  '. '-separated prose, which is what the fixture text is).
- timestampdiff counts COMPLETE units while DuckDB's date_diff counts
  boundary crossings — the queries anchor the start on a date_trunc of the
  same unit, where the two definitions coincide exactly.
- truncate(num, d): not a Spark builtin — registered as a SQL scalar UDF
  (CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN, Spark 4 SQL UDFs), the
  same route the reference takes for its Kap* extension functions.
"""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views

_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

_CRC_CASE = "case r_name " + " ".join(
    f"when '{n}' then {zlib.crc32(n.encode())}" for n in _REGIONS
) + " end"
_SHA1_CASE = "case r_name " + " ".join(
    f"when '{n}' then '{hashlib.sha1(n.encode()).hexdigest()}'" for n in _REGIONS
) + " end"

#: DuckDB spelling of Spark's HALF_EVEN bround(x): ties go to the even
#: neighbour, everything else is plain rounding.  Callers must add ``+ 0.0``
#: after the cast: ``ceil(-0.5)`` yields IEEE ``-0.0`` in DuckDB while
#: Spark's BigDecimal bround gives ``0.0`` — adding positive zero collapses
#: the signed zero so the value hash compares equal.
_BROUND = (
    "case when {x} - floor({x}) = 0.5 then "
    "(case when cast(floor({x}) as bigint) % 2 = 0 then floor({x}) "
    "else ceil({x}) end) else round({x}) end"
)


def register_truncate_udf(spark: SparkSession) -> None:
    """TRUNCATE(num, d) as a SQL scalar UDF (KapExpresssions.scala:203-259
    implements it as a custom expression; Spark 4's SQL UDFs are the
    engine-native equivalent — the body inlines into the plan, no Python)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION truncate_num(x DOUBLE, d INT) "
        "RETURNS DOUBLE RETURN "
        "CASE WHEN x >= 0 THEN floor(x * power(10, d)) / power(10, d) "
        "ELSE ceil(x * power(10, d)) / power(10, d) END"
    )


def scalar_conformance_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    register_truncate_udf(spark)
    r = spark.table("region")
    x = (F.col("r_regionkey").cast("double") + F.lit(0.5)).alias("x")
    return (
        r.select("r_regionkey", "r_name", x)
        .select(
            "r_regionkey",
            F.round(F.cot(F.col("x")), 6).alias("cot_x"),
            F.round(F.hypot(F.col("x"), F.col("x") + 1), 6).alias("hypot_xy"),
            F.round(F.sinh(F.col("x")), 6).alias("sinh_x"),
            F.round(F.cosh(F.col("x")), 6).alias("cosh_x"),
            F.round(F.tanh(F.col("x")), 6).alias("tanh_x"),
            F.round(F.expm1(F.col("x") / 10), 6).alias("expm1_x"),
            F.round(F.log1p(F.col("x")), 6).alias("log1p_x"),
            F.bround(F.col("x")).alias("bround_pos"),
            F.bround(-F.col("x")).alias("bround_neg"),
            F.round(F.pow(F.col("x"), F.lit(2)), 6).alias("power_x"),
            F.conv(
                (F.col("r_regionkey") * 100 + 15).cast("string"), 10, 16
            ).alias("conv_hex"),
            F.expr("truncate_num(x * 3.7 + 0.081, 2)").alias("trunc_x"),
            F.round(F.expr("pi()"), 6).alias("pi_v"),
            F.round(F.expr("e()"), 6).alias("e_v"),
        )
        .orderBy("r_regionkey")
    )


def scalar_conformance_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    r = spark.table("region")
    sent_text = F.concat(
        F.col("r_name"), F.lit(" is large. It spans far. The end.")
    )
    return r.select(
        "r_regionkey",
        F.ltrim(F.concat(F.lit("   "), F.col("r_name"))).alias("ltrim_s"),
        F.rtrim(F.concat(F.col("r_name"), F.lit("   "))).alias("rtrim_s"),
        F.substring_index(F.col("r_name"), " ", 1).alias("first_word"),
        F.find_in_set(F.col("r_name"), F.lit("ASIA,EUROPE,AFRICA")).alias("set_pos"),
        F.size(F.sentences(sent_text)).alias("n_sentences"),
        F.crc32(F.col("r_name").cast("binary")).alias("crc_name"),
        F.sha1(F.col("r_name").cast("binary")).alias("sha1_name"),
        F.expr("ifnull(nullif(r_name, 'ASIA'), 'missing')").alias("ifnull_s"),
    ).orderBy("r_regionkey")


def scalar_conformance_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    ev = spark.table("events").filter(F.col("event_id") < 200)
    base = F.date_trunc("minute", F.col("ts"))
    return ev.select(
        "event_id",
        F.to_date(F.col("ts")).alias("event_date"),
        F.date_part(F.lit("YEAR"), F.col("ts")).alias("year_part"),
        F.from_utc_timestamp(base, "GMT+05:30").alias("local_ts"),
        F.to_utc_timestamp(base, "GMT+05:30").alias("utc_ts"),
        F.expr("timestampadd(MINUTE, 90, date_trunc('minute', ts))").alias("ts_plus"),
        F.expr(
            "timestampdiff(HOUR, date_trunc('day', ts), date_trunc('hour', ts))"
        ).alias("hours_into_day"),
        F.expr(
            "timestampdiff(MINUTE, date_trunc('day', ts), date_trunc('minute', ts))"
        ).alias("minutes_into_day"),
    ).orderBy("event_id")


def scalar_conformance_nullary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The misc nullary set (ExpressionConverter.scala:55-57,304-305):
    current_database / monotonically_increasing_id / now / uuid /
    spark_partition_id / input_file_name / current_date /
    current_timestamp. Inherently nondeterministic values, so the oracle
    checks the PROPERTIES each must satisfy (ids unique, uuid shape, file
    name from the parquet-backed view, sane clock) — every function still
    executes for real on the Spark side."""
    views(spark, sf_dir)
    r = spark.table("region").select(
        F.monotonically_increasing_id().alias("mid"),
        F.expr("uuid()").alias("u"),
        F.expr("spark_partition_id()").alias("pid"),
        F.input_file_name().alias("fn"),
    )
    return (
        r.agg(
            (F.count_distinct("mid") == F.count(F.lit(1))).alias("mid_unique"),
            F.bool_and(F.length("u") == 36).alias("uuid_ok"),
            F.bool_and(F.col("pid") >= 0).alias("pid_ok"),
            F.bool_and(F.col("fn").contains("parquet")).alias("file_ok"),
        )
        .withColumn("db_ok", F.expr("length(current_database()) > 0"))
        .withColumn("year_ok", F.expr("year(current_date()) >= 2024"))
        .withColumn("now_ok", F.expr("now() is not null"))
        .withColumn("cts_ok", F.expr("current_timestamp() is not null"))
    )


QUERIES = {
    "scalar_conformance_math": scalar_conformance_math,
    "scalar_conformance_string": scalar_conformance_string,
    "scalar_conformance_datetime": scalar_conformance_datetime,
    "scalar_conformance_nullary": scalar_conformance_nullary,
}

ORACLES = {
    "scalar_conformance_math": f"""
        with t as (
            select r_regionkey, r_name,
                   cast(r_regionkey as double) + 0.5 as x
            from region
        )
        select r_regionkey,
               round(cot(x), 6) as cot_x,
               round(sqrt(x*x + (x+1)*(x+1)), 6) as hypot_xy,
               round((exp(x) - exp(-x)) / 2, 6) as sinh_x,
               round((exp(x) + exp(-x)) / 2, 6) as cosh_x,
               round((exp(x) - exp(-x)) / (exp(x) + exp(-x)), 6) as tanh_x,
               round(exp(x / 10) - 1, 6) as expm1_x,
               round(ln(1 + x), 6) as log1p_x,
               cast({_BROUND.format(x="x")} as double) + 0.0 as bround_pos,
               cast({_BROUND.format(x="(-x)")} as double) + 0.0 as bround_neg,
               round(power(x, 2), 6) as power_x,
               to_hex(r_regionkey * 100 + 15) as conv_hex,
               floor((x * 3.7 + 0.081) * 100) / 100 as trunc_x,
               round(pi(), 6) as pi_v,
               round(exp(1), 6) as e_v
        from t
        order by r_regionkey
    """,
    "scalar_conformance_string": f"""
        select r_regionkey,
               ltrim('   ' || r_name) as ltrim_s,
               rtrim(r_name || '   ') as rtrim_s,
               string_split(r_name, ' ')[1] as first_word,
               cast(coalesce(
                   list_position(string_split('ASIA,EUROPE,AFRICA', ','), r_name),
                   0) as integer) as set_pos,
               cast(
                   length(r_name || ' is large. It spans far. The end.')
                 - length(replace(r_name || ' is large. It spans far. The end.',
                                  '.', ''))
                 as integer) as n_sentences,
               {_CRC_CASE} as crc_name,
               {_SHA1_CASE} as sha1_name,
               ifnull(nullif(r_name, 'ASIA'), 'missing') as ifnull_s
        from region
        order by r_regionkey
    """,
    "scalar_conformance_nullary": """
        select true as mid_unique, true as uuid_ok, true as pid_ok,
               true as file_ok, true as db_ok, true as year_ok,
               true as now_ok, true as cts_ok
    """,
    "scalar_conformance_datetime": """
        select event_id,
               cast(ts as date) as event_date,
               cast(date_part('year', ts) as integer) as year_part,
               date_trunc('minute', ts) + INTERVAL 330 MINUTE as local_ts,
               date_trunc('minute', ts) - INTERVAL 330 MINUTE as utc_ts,
               date_trunc('minute', ts) + INTERVAL 90 MINUTE as ts_plus,
               date_diff('hour', date_trunc('day', ts),
                         date_trunc('hour', ts)) as hours_into_day,
               date_diff('minute', date_trunc('day', ts),
                         date_trunc('minute', ts)) as minutes_into_day
        from events
        where event_id < 200
        order by event_id
    """,
}
