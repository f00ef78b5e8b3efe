"""Lookup snapshots: derived-dimension answers must reflect the lookup rows
the cube was BUILT from, not later mutations of the source view (reference
segment snapshots, TableScanPlan.createLookupTable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import CubeBuilder
from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE_SEG, TPCH_MODEL_SEG
from kylin_on_parquet_v2_spark.query.digest import extract_digest
from kylin_on_parquet_v2_spark.query.router import execute_route, plan_route
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_SMOKE

SQL = """select n_name, count(*) as n from lineitem
         join orders on l_orderkey = o_orderkey
         join customer on o_custkey = c_custkey
         join nation on c_nationkey = n_nationkey
         where l_shipdate >= date '1996-01-01'
         group by n_name"""


def test_derived_join_reads_snapshot_not_live_view(spark, tmp_path):
    register_views(spark, SF_SMOKE)
    inst = CubeBuilder(spark, TPCH_MODEL_SEG, TPCH_CUBE_SEG, str(tmp_path)).build()
    assert "nation" in inst.snapshots

    digest = extract_digest(spark.sql(SQL))
    route = plan_route(digest, inst)
    assert route is not None and route.derived
    before = {r.n_name for r in execute_route(digest, inst, route, spark).collect()}
    assert before and not any(n.startswith("X_") for n in before)

    # mutate the live view AFTER the build: snapshot answers must not change
    original = spark.table("nation")
    mutated = original.withColumn("n_name", F.concat(F.lit("X_"), F.col("n_name")))
    mutated.createOrReplaceTempView("nation")
    try:
        after = {r.n_name for r in execute_route(digest, inst, route, spark).collect()}
        assert after == before  # frozen at build time
        live = {r.n_name for r in spark.sql(SQL).collect()}
        assert all(n.startswith("X_") for n in live)  # flat path sees mutation
    finally:
        original.createOrReplaceTempView("nation")
