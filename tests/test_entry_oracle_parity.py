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


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_SMOKE)
    assert_same(df, duck, _ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
