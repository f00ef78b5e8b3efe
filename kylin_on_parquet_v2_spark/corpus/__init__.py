"""Query corpus: one module per feature area, mirroring the reference's SQL
corpus organization (``kylin-it/src/test/resources/query/`` — sql_join,
sql_window, sql_grouping, sql_percentile, sql_intersect_count, ...).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
(the PySpark implementation of the operator surface) and ``ORACLES:
dict[name, sql]`` (DuckDB-equivalent ANSI SQL). ``all_queries()`` /
``all_oracles()`` merge them for the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from kylin_on_parquet_v2_spark.corpus import (
        advanced,
        arrays_subq,
        cube_routed,
        functions_date,
        functions_misc,
        functions_more,
        functions_string,
        grouping,
        measures,
        pipeline,
        setops,
        streaming_corpus,
        subquery,
        tpch,
        windows,
    )

    return [
        tpch,
        cube_routed,
        windows,
        grouping,
        setops,
        subquery,
        functions_string,
        functions_date,
        functions_misc,
        functions_more,
        measures,
        advanced,
        arrays_subq,
        pipeline,
        streaming_corpus,
    ]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate corpus query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
