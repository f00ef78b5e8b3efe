"""Dual-execution differential test (reference NManualBuildAndQueryTest /
NExecAndComp CompareLevel.SAME): every ``__spark_entry__.queries()`` entry
must match its DuckDB oracle on the same parquet at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_same

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_priority_rotation_names_are_real():
    """The driver checks only the first 50 queries() entries, ordered by
    corpus._PRIORITY — a typo in a rotated name would silently drop that
    query out of its intended window slot instead of failing anywhere."""
    from kylin_on_parquet_v2_spark.corpus import _PRIORITY

    ghosts = [n for n in _PRIORITY if n not in _QUERIES]
    assert not ghosts, f"_PRIORITY names with no queries() entry: {ghosts}"
    dupes = [n for n in set(_PRIORITY) if _PRIORITY.count(n) > 1]
    assert not dupes, f"duplicate _PRIORITY entries: {dupes}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_SMOKE)
    assert_same(df, duck, _ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
