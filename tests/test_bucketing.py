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


def test_bucket_to_bucket_join_is_shuffle_free(spark, bucketed):
    """Both join sides bucketed on the join key with the SAME bucket count
    => co-located join, no Exchange on either side (the 100 TB fact-to-fact
    join shape; KylinFileSourceScanExec's shard-aligned join parity)."""
    register_views(spark, SF_SMOKE)
    write_bucketed(
        spark.table("orders"), "orders_bucketed", "o_orderkey", n_buckets=4
    )
    try:
        # force a real SortMergeJoin (broadcast would hide the exchange
        # question entirely at this fixture size)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            spark.table("lineitem"), "lineitem_bucketed_ok", "l_orderkey", n_buckets=4
        )
        sql = """select o_orderpriority, sum(l_quantity) as s
                 from lineitem_bucketed_ok join orders_bucketed
                   on l_orderkey = o_orderkey
                 group by o_orderpriority"""
        plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
        join_exchanges = [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
            and ("l_orderkey" in ln or "o_orderkey" in ln)
        ]
        assert not join_exchanges, plan
        assert "SortMergeJoin" in plan, plan
        # same answer as the unbucketed views
        a = sorted(map(str, spark.sql(sql).collect()))
        b = sorted(
            map(
                str,
                spark.sql(
                    """select o_orderpriority, sum(l_quantity) as s
                       from lineitem join orders on l_orderkey = o_orderkey
                       group by o_orderpriority"""
                ).collect(),
            )
        )
        assert a == b
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("drop table if exists orders_bucketed")
        spark.sql("drop table if exists lineitem_bucketed_ok")
