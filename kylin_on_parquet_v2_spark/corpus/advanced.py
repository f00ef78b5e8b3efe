"""Gap-fill for the remaining SURVEY §2 inventory rows: theta joins
(pushdown-only in the reference), MassIn, $SUM0, RANGE window frames,
the Python UDF/pandas_udf surface (§2.10), encode/hash string functions,
sessionization, and pivot.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kylin_on_parquet_v2_spark.corpus.base import views


def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join — equi keys only in the reference cube path,
    theta falls to pushdown (SURVEY §2.3); native for us."""
    views(spark, sf_dir)
    sup = spark.table("supplier")
    cust = spark.table("customer")
    return (
        sup.join(
            cust,
            (sup.s_nationkey == cust.c_nationkey) & (sup.s_acctbal > cust.c_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_poorer_compatriots"))
        .orderBy("s_suppkey")
    )


def mass_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassIn (filter against an external value set, MassInUDF.java:23-27):
    a large literal IN list stays a broadcast hash set; beyond memory it
    becomes a broadcast semi-join — both shown here."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    keys = list(range(2, 150, 3))
    via_isin = li.filter(F.col("l_partkey").isin(keys))
    key_df = spark.createDataFrame([(k,) for k in keys], ["k"])
    via_semi = li.join(
        F.broadcast(key_df), li.l_partkey == key_df.k, "left_semi"
    )
    return (
        via_isin.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_isin"))
        .join(
            via_semi.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_semi")),
            "l_returnflag",
        )
        .orderBy("l_returnflag")
    )


def sum0_null_to_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$SUM0 (null -> 0 sum, from Calcite's AVG/grouping rewrites;
    KapExpresssions.scala:115-175 ``Sum0``): coalesce(sum(x), 0) where empty
    groups would yield NULL."""
    views(spark, sf_dir)
    cust = spark.table("customer")
    big = spark.table("orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias("sum0_price"),
            F.count("o_orderkey").alias("n_big"),
        )
        .orderBy("c_custkey")
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, WindowPlan.scala buildRange :277-336) —
    deterministic even under order ties, unlike ROWS."""
    views(spark, sf_dir)
    part = spark.table("part")
    w = Window.orderBy("p_size").rangeBetween(-5, Window.currentRow)
    return part.select(
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_within_5"),
        F.round(F.sum("p_retailprice").over(w), 2).alias("sum_within_5"),
    ).orderBy("p_partkey")


def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's UDF surface (SURVEY §2.10): Arrow-vectorized pandas_udf
    registered via spark.udf.register and used from both the DataFrame API
    and SQL text. Deterministic arithmetic => full oracle."""
    views(spark, sf_dir)

    @pandas_udf("double")
    def charged_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        # no rounding here: pandas .round is half-even, Spark/DuckDB round
        # half-up — rounding happens JVM-side for oracle bit-parity
        return price * (1.0 - discount) * (1.0 + tax)

    spark.udf.register("charged_price", charged_price)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 60)
    # floor-based rounding, NOT round(): Spark rounds the shortest decimal
    # repr of a double (BigDecimal.valueOf) while DuckDB rounds the binary
    # value — they disagree exactly at .xxxx5 boundaries. floor(x*1e4+0.5)
    # is pure IEEE arithmetic, bit-identical in both engines.
    ud = charged_price("l_extendedprice", "l_discount", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(ud * 10000 + 0.5) / 10000).alias("charged"),
        F.expr(
            "floor(charged_price(l_extendedprice, l_discount, l_tax) * 10000 + 0.5) / 10000"
        ).alias("charged_sql"),
    ).orderBy("l_orderkey", "l_linenumber")


def string_encode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64/unbase64/sha2 (ExpressionConverter string set §2.8)."""
    views(spark, sf_dir)
    nation = spark.table("nation")
    return nation.select(
        "n_nationkey",
        F.base64(F.encode("n_name", "utf-8")).alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode("n_name", "utf-8"))), "utf-8").alias(
            "roundtrip"
        ),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("sha"),
    ).orderBy("n_nationkey")


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) + cumulative sum over gap>30min starts new
    session (the batch form of streaming session_window)."""
    views(spark, sf_dir)
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # millisecond precision: second-truncating unix_timestamp would disagree
    # with the oracle's epoch arithmetic on sub-second gaps
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    with_gap = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800 * 1000), 1).otherwise(0).alias("new_session"),
    )
    sess = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (the exact API Structured
    Streaming's session windows use — F.session_window works identically on
    batch): per user, sessions close after a 30-minute gap; the window
    struct carries [first_event, last_event + gap). Oracle replicates the
    boundaries with lag + gap cumsum sessionization."""
    views(spark, sf_dir)
    ev = spark.table("events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start").cast("timestamp")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end").cast("timestamp")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start_ms")
    )


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional-aggregation expansion) — §2 'common OLAP pattern';
    fixed value list keeps the schema static (mandatory at scale: a dynamic
    pivot needs an extra distinct scan)."""
    views(spark, sf_dir)
    ev = spark.table("events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("view").alias("n_view"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
        .orderBy("user_id")
    )


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns: JSON property extraction + typed aggregation
    (beyond the reference — it has no JSON functions at all; a training-data
    pipeline lives on them). get_json_object is JVM-side (Jackson), and
    from_json gives the typed-struct path."""
    views(spark, sf_dir)
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    typed = F.from_json("props", "k INT")
    return (
        ev.select("event_type", k.alias("k"), typed.getField("k").alias("k_typed"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum("k_typed").cast("long").alias("sum_k_typed"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "json_extract_props": json_extract_props,
    "theta_join": theta_join,
    "mass_in_filter": mass_in_filter,
    "sum0_null_to_zero": sum0_null_to_zero,
    "window_range_frame": window_range_frame,
    "udf_pandas_vectorized": udf_pandas_vectorized,
    "string_encode_funcs": string_encode_funcs,
    "sessionize_events": sessionize_events,
    "session_window_agg": session_window_agg,
    "pivot_event_types": pivot_event_types,
}

ORACLES = {
    "json_extract_props": """
        select event_type,
               count(*) as n,
               cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint) as sum_k,
               cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint) as sum_k_typed,
               max(cast(json_extract_string(props, '$.k') as int)) as max_k
        from events
        group by event_type
        order by event_type
    """,
    "theta_join": """
        select s_suppkey, count(*) as n_poorer_compatriots
        from supplier join customer
          on s_nationkey = c_nationkey and s_acctbal > c_acctbal
        group by s_suppkey
        order by s_suppkey
    """,
    "mass_in_filter": """
        with keys as (select unnest(range(2, 150, 3)) as k)
        select l_returnflag,
               count(*) as n_isin,
               count(*) as n_semi
        from lineitem
        where l_partkey in (select k from keys)
        group by l_returnflag
        order by l_returnflag
    """,
    "sum0_null_to_zero": """
        select c_custkey,
               coalesce(round(sum(o_totalprice), 2), 0.0) as sum0_price,
               count(o_orderkey) as n_big
        from customer
          left join (select * from orders where o_totalprice > 300000) o
            on c_custkey = o_custkey
        group by c_custkey
        order by c_custkey
    """,
    "window_range_frame": """
        select p_partkey, p_size,
               count(*) over w as n_within_5,
               round(sum(p_retailprice) over w, 2) as sum_within_5
        from part
        window w as (order by p_size range between 5 preceding and current row)
        order by p_partkey
    """,
    "udf_pandas_vectorized": """
        select l_orderkey, l_linenumber,
               floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) / 10000 as charged,
               floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) / 10000 as charged_sql
        from lineitem where l_orderkey <= 60
        order by l_orderkey, l_linenumber
    """,
    "string_encode_funcs": """
        select n_nationkey,
               base64(encode(n_name)) as b64,
               n_name as roundtrip,
               sha256(n_name) as sha
        from nation
        order by n_nationkey
    """,
    "session_window_agg": """
        with g as (
            select user_id, ts, value,
                   case when lag(ts) over (partition by user_id order by ts) is null
                             or epoch_us(ts) - epoch_us(lag(ts) over (partition by user_id order by ts)) >= 1800 * 1000000
                        then 1 else 0 end as new_session
            from events
        ),
        s as (
            select user_id, ts, value,
                   sum(new_session) over (partition by user_id order by ts
                                          rows between unbounded preceding and current row) as sid
            from g
        )
        select user_id,
               epoch_ms(min(ts)) as session_start_ms,
               epoch_ms(max(ts)) + 1800 * 1000 as session_end_ms,
               count(*) as n_events,
               round(sum(value), 2) as sum_value
        from s
        group by user_id, sid
        order by user_id, session_start_ms
    """,
    "sessionize_events": """
        select user_id,
               cast(max(session_id) as bigint) as n_sessions,
               count(*) as n_events
        from (
            select user_id, event_id,
                   sum(new_session) over (partition by user_id
                                          order by ts, event_id
                                          rows between unbounded preceding and current row) as session_id
            from (
                select user_id, event_id, ts,
                       case when lag(ts) over (partition by user_id order by ts, event_id) is null
                                 or epoch_ms(ts) - epoch_ms(lag(ts) over (partition by user_id order by ts, event_id)) > 1800 * 1000
                            then 1 else 0 end as new_session
                from events
            ) g
        ) s
        group by user_id
        order by user_id
    """,
    "pivot_event_types": """
        select user_id,
               count(case when event_type = 'click' then 1 end) as n_click,
               count(case when event_type = 'view' then 1 end) as n_view,
               count(case when event_type = 'purchase' then 1 end) as n_purchase,
               count(case when event_type = 'signup' then 1 end) as n_signup,
               count(case when event_type = 'error' then 1 end) as n_error
        from events
        group by user_id
        order by user_id
    """,
}
