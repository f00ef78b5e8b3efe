"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (cube-routed TPC-H-Q1-style pricing
summary) on sf0.001. ``queries()`` — one DataFrame-API implementation per
operator declared done from SURVEY.md §2, organized by feature module under
``kylin_on_parquet_v2_spark/corpus/`` (mirroring the reference's SQL-corpus
folders). ``oracle_sql()`` — the equivalent ANSI SQL DuckDB runs on the same
parquet for the correctness gate.

Column-name contract: every computed column is aliased identically in the
Spark code and the oracle SQL. Doubles that aggregate across partitions are
rounded on BOTH sides so partial-agg ordering noise can't flip the value
hash. Queries whose values are engine-specific by nature (sketch estimates,
approximate ANN, Python-side decoders) omit the oracle entry => the driver
records the weaker rows-only check; tests assert their invariants instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kylin_on_parquet_v2_spark.corpus import all_oracles, all_queries
from kylin_on_parquet_v2_spark.corpus.base import engine as _engine  # bench uses this


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cube-routed pricing summary on sf0.001."""
    from kylin_on_parquet_v2_spark.corpus.cube_routed import cube_routed_q1

    return cube_routed_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
