"""Typed-source corpus: JDBC (embedded Derby), CSV and ORC round-trips.

Reference parity: ``source-jdbc/`` (JdbcSource/JdbcExplorer — the
reference syncs RDBMS tables into its source layer and cubes from them)
and the Hive/CSV source surface (``engine/spark/source/``). The container
has no external database, but Spark ships the Derby embedded engine
(`derby*.jar`, used by Hive metastores), so the JDBC path runs END TO END
here: write a dimension table into an embedded Derby database through
Spark's JDBC sink, then read it back through ``sources.readers.read_jdbc``
with a partitioned parallel scan — the exact multi-connection read shape a
production RDBMS source needs (single-connection JDBC reads are the
classic source bottleneck; the reference's JdbcExplorer splits on a
numeric column the same way).

Each query's DuckDB oracle runs on the original parquet, so the checks
prove the full loop: parquet -> JDBC database -> partitioned JDBC scan ->
join/aggregate == direct SQL over parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kylin_on_parquet_v2_spark.corpus.base import proc_tmp, views
from kylin_on_parquet_v2_spark.sources.readers import read_csv, read_jdbc, read_orc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: sf_dir -> JDBC url of a Derby database seeded with the nation table
_DERBY_DBS: dict[str, str] = {}
#: sf_dir -> staged path for the CSV/ORC round-trip sources
_STAGED: dict[tuple, str] = {}


def _derby_url(spark: SparkSession, sf_dir: str) -> str:
    """Seed (once per process+sf_dir) an embedded Derby DB with `nation`."""
    key = os.path.abspath(sf_dir)
    url = _DERBY_DBS.get(key)
    if url is not None:
        return url
    # per-process (proc_tmp): embedded Derby locks a database per JVM, so a
    # concurrent process opening the same path would fail outright
    db = os.path.join(proc_tmp("jdbc_src", key.strip("/").replace("/", "_")), "db")
    url = f"jdbc:derby:{db};create=true"
    (
        spark.table("nation")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "NATION")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    _DERBY_DBS[key] = url
    return url


def jdbc_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation rows served from an embedded Derby database via a PARTITIONED
    JDBC read (4 connections split on n_nationkey — JdbcExplorer's numeric
    split-column shape), joined to the parquet region view and aggregated.
    The oracle reads nation straight from parquet, so a hash match proves
    the JDBC sink+source round-trip is lossless."""
    views(spark, sf_dir)
    url = _derby_url(spark, sf_dir)
    nation = read_jdbc(
        spark,
        url,
        "NATION",
        partition_column="n_nationkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=25,
        driver=DERBY_DRIVER,
    )
    region = spark.table("region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("r_name")
    )


def _staged_path(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write region out once per process+sf_dir in the given format."""
    key = (os.path.abspath(sf_dir), fmt)
    path = _STAGED.get(key)
    if path is not None:
        return path
    path = os.path.join(
        proc_tmp("src_stage", key[0].strip("/").replace("/", "_")), fmt
    )
    df = spark.table("region")
    if fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    else:
        df.write.mode("overwrite").orc(path)
    _STAGED[key] = path
    return path


_REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.LongType()),
        T.StructField("r_name", T.StringType()),
        T.StructField("r_comment", T.StringType()),
    ]
)


def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with a DECLARED schema (inferSchema banned: an extra full
    scan and nondeterministic types at 100 TB — reference DataType.java
    fixed-type registry): parquet -> csv -> typed read -> aggregate must
    equal the direct parquet answer."""
    views(spark, sf_dir)
    path = _staged_path(spark, sf_dir, "csv")
    df = read_csv(spark, path, _REGION_SCHEMA, header=True)
    return df.groupBy().agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.sum("r_regionkey").cast("long").alias("key_sum"),
        F.min("r_name").alias("first_region"),
    )


def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source (the reference reads Hive tables in ORC): self-describing
    columnar round-trip with predicate pushdown on the read."""
    views(spark, sf_dir)
    path = _staged_path(spark, sf_dir, "orc")
    df = read_orc(spark, path).filter(F.col("r_regionkey") >= 1)
    return df.select("r_regionkey", "r_name").orderBy("r_regionkey")


QUERIES = {
    "jdbc_source_agg": jdbc_source_agg,
    "csv_source_roundtrip": csv_source_roundtrip,
    "orc_source_roundtrip": orc_source_roundtrip,
}

ORACLES = {
    "jdbc_source_agg": """
        select r_name,
               count(*) as n_nations,
               min(n_name) as first_nation
        from nation join region on n_regionkey = r_regionkey
        group by r_name
        order by r_name
    """,
    "csv_source_roundtrip": """
        select count(*) as n_regions,
               cast(sum(r_regionkey) as bigint) as key_sum,
               min(r_name) as first_region
        from region
    """,
    "orc_source_roundtrip": """
        select r_regionkey, r_name from region
        where r_regionkey >= 1
        order by r_regionkey
    """,
}
