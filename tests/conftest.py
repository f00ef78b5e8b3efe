from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kylin_on_parquet_v2_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the driver's source views registered (sf0.001)."""
    import duckdb

    from kylin_on_parquet_v2_spark.session import SOURCE_TABLES

    con = duckdb.connect()
    for t in SOURCE_TABLES:
        path = f"{SF_SMOKE}/{t}.parquet"
        con.execute(f"create view {t} as select * from '{path}'")
    yield con
    con.close()
