"""Shard-aware scan parity: bucketed tables avoid shuffles on the bucket key
and co-locate bucket-to-bucket joins (KylinFileSourceScanExec semantics)."""

from __future__ import annotations

import pytest

from kylin_on_parquet_v2_spark.cube.bucketing import scan_is_shuffle_free, write_bucketed
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    register_views(spark, SF_SMOKE)
    write_bucketed(
        spark.table("lineitem"), "lineitem_bucketed", "l_suppkey", n_buckets=4
    )
    yield "lineitem_bucketed"
    spark.sql("drop table if exists lineitem_bucketed")


def test_groupby_on_bucket_key_is_shuffle_free(spark, bucketed):
    sql = f"select l_suppkey, sum(l_quantity) as s from {bucketed} group by l_suppkey"
    assert scan_is_shuffle_free(spark, sql, "l_suppkey")
    # sanity: the same groupBy on the unbucketed view DOES shuffle
    assert not scan_is_shuffle_free(
        spark, "select l_suppkey, sum(l_quantity) as s from lineitem group by l_suppkey",
        "l_suppkey",
    )


def test_bucketed_results_match_unbucketed(spark, bucketed):
    a = sorted(
        map(
            str,
            spark.sql(
                f"select l_suppkey, round(sum(l_quantity),2) as s from {bucketed} group by l_suppkey"
            ).collect(),
        )
    )
    b = sorted(
        map(
            str,
            spark.sql(
                "select l_suppkey, round(sum(l_quantity),2) as s from lineitem group by l_suppkey"
            ).collect(),
        )
    )
    assert a == b
