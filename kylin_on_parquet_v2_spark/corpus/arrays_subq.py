"""Array-column operators (over the embeddings table) + SQL-text subqueries
(Catalyst decorrelation — the reference leans on Calcite for the same,
corpus sql_subquery/) + multi-distinct aggregation (RewriteDistinctAggregates
expansion, the plan Kylin's AggregateMultipleExpandRule approximates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    emb = spark.table("embeddings").filter(F.col("vec_id") < 30)
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.element_at(v, 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at(v, -1).cast("double"), 6).alias("last_val"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("vec_sum"),
        F.round(F.array_max(v).cast("double"), 6).alias("vec_max"),
        F.round(F.array_min(v).cast("double"), 6).alias("vec_min"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")),
            6,
        ).alias("head8_sum"),
    ).orderBy("vec_id")


def subquery_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT EXISTS / scalar subqueries straight through SQL text —
    Catalyst decorrelates them (our Calcite, SURVEY §3)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select o_orderpriority, count(*) as n
        from orders o
        where o_totalprice > (select avg(o_totalprice) from orders)
          and o_custkey in (select c_custkey from customer where c_mktsegment = 'BUILDING')
          and not exists (select 1 from lineitem l
                          where l.l_orderkey = o.o_orderkey and l.l_discount > 0.09)
        group by o_orderpriority
        order by o_orderpriority
        """
    )


def multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT x) over different columns in ONE aggregate —
    Catalyst's RewriteDistinctAggregates expand (grouping-set machinery)."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.countDistinct("l_partkey").alias("nd_part"),
            F.countDistinct("l_returnflag").alias("nd_rf"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_linestatus")
    )


def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface: LATERAL VIEW explode() — the table-generating operator
    the reference lacks entirely (SURVEY §2 notes its only UDTF is the
    internal TopN unpack); Spark's Generate node makes it native. Token
    frequency over the corpus: explode is map-side, one groupBy shuffle."""
    views(spark, sf_dir)
    return spark.sql(
        r"""
        select tok, count(*) as n, count(distinct doc_id) as nd
        from documents
        lateral view explode(split(regexp_replace(trim(lower(text)), '\\s+', ' '), ' ')) t as tok
        group by tok
        order by n desc, tok
        limit 20
        """
    )


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNPIVOT (wide->long): the inverse of pivot_event_types; Spark
    plans it as an Expand (same machinery as grouping sets), so rows fan
    out map-side with no shuffle before the aggregate."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select l_returnflag, metric, round(sum(val), 2) as total
        from lineitem unpivot (val for metric in (l_quantity, l_extendedprice, l_discount))
        group by l_returnflag, metric
        order by l_returnflag, metric
        """
    )


QUERIES = {
    "array_functions": array_functions,
    "subquery_sql_text": subquery_sql_text,
    "multi_distinct": multi_distinct,
    "lateral_explode_tokens": lateral_explode_tokens,
    "unpivot_metrics": unpivot_metrics,
}

ORACLES = {
    "array_functions": """
        select vec_id,
               len(embedding) as dim,
               round(embedding[1]::double, 6) as first_val,
               round(embedding[-1]::double, 6) as last_val,
               round(list_sum(embedding::double[]), 6) as vec_sum,
               round(list_max(embedding)::double, 6) as vec_max,
               round(list_min(embedding)::double, 6) as vec_min,
               round(list_sum((embedding[1:8])::double[]), 6) as head8_sum
        from embeddings where vec_id < 30
        order by vec_id
    """,
    "subquery_sql_text": """
        select o_orderpriority, count(*) as n
        from orders o
        where o_totalprice > (select avg(o_totalprice) from orders)
          and o_custkey in (select c_custkey from customer where c_mktsegment = 'BUILDING')
          and not exists (select 1 from lineitem l
                          where l.l_orderkey = o.o_orderkey and l.l_discount > 0.09)
        group by o_orderpriority
        order by o_orderpriority
    """,
    "multi_distinct": """
        select l_linestatus,
               count(distinct l_suppkey) as nd_supp,
               count(distinct l_partkey) as nd_part,
               count(distinct l_returnflag) as nd_rf,
               round(sum(l_quantity), 2) as sum_qty,
               count(*) as n
        from lineitem
        group by l_linestatus
        order by l_linestatus
    """,
    "lateral_explode_tokens": r"""
        select tok, count(*) as n, count(distinct doc_id) as nd
        from (select doc_id,
                     unnest(string_split(
                         regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) as tok
              from documents)
        group by tok
        order by n desc, tok
        limit 20
    """,
    "unpivot_metrics": """
        select l_returnflag, metric, round(sum(val), 2) as total
        from (unpivot lineitem on l_quantity, l_extendedprice, l_discount
              into name metric value val)
        group by l_returnflag, metric
        order by l_returnflag, metric
    """,
}
