"""Focused tests for the round-13 optimization internals.

Each r13 change that touched an operator's internals gets a direct
assertion here: the register_views memo semantics, the vectorized
brute-force top-k's equivalence to the fold form, the array-form
percentile spelling, and the bounded decontam broadcast probe.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.pipeline import decontam as DC
from kylin_on_parquet_v2_spark.pipeline import similarity as S
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def test_register_views_memo_hit_and_dir_switch(spark):
    """Same (session, sf_dir) returns the cached map; switching sf_dir
    re-registers against the new directory (temp-view names are
    session-global, so multi-SF sessions must not see stale views)."""
    first = register_views(spark, SF_SMOKE)
    again = register_views(spark, SF_SMOKE)
    assert again is first  # cache hit: the identical name->DataFrame map

    smoke_rows = spark.table("lineitem").count()
    switched = register_views(spark, SF_CORRECTNESS)
    assert switched is not first  # dir switch re-registers
    bigger_rows = spark.table("lineitem").count()
    assert bigger_rows > smoke_rows  # views now point at the new dir

    back = register_views(spark, SF_SMOKE)
    assert back is not first and back is not switched
    assert spark.table("lineitem").count() == smoke_rows


def test_register_views_memo_caches_no_data(spark):
    """The memo holds unexecuted DataFrames only — a fresh call still
    plans a parquet scan (no collected rows, no cached results)."""
    views = register_views(spark, SF_SMOKE)
    plan = views["lineitem"]._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "FileScan" in plan
    assert "InMemoryTableScan" not in plan


def test_vectorized_bruteforce_matches_fold_form(spark):
    """brute_force_topk_vectorized (numpy/Arrow path, r13) returns the
    same per-query top-k as the fold-based brute_force_topk: identical
    (query_id, cand_id, rn) membership and cosines equal to the shared
    6-decimal rounding (summation order may differ in the last float
    bit, which the rounding absorbs off razor-edge ties)."""
    register_views(spark, SF_SMOKE)
    emb = spark.table("embeddings")
    queries = emb.orderBy("vec_id").limit(5)

    fold = {
        (r.query_id, r.rn): (r.cand_id, r.cos)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    vec = {
        (r.query_id, r.rn): (r.cand_id, r.cos)
        for r in S.brute_force_topk_vectorized(emb, queries, k=5).collect()
    }
    assert set(fold) == set(vec)
    for key, (cand_f, cos_f) in fold.items():
        cand_v, cos_v = vec[key]
        assert cand_v == cand_f, (key, cand_f, cand_v)
        assert cos_v == pytest.approx(cos_f, abs=1e-6), (key, cos_f, cos_v)


def test_vectorized_bruteforce_empty_queries(spark):
    register_views(spark, SF_SMOKE)
    emb = spark.table("embeddings")
    empty = emb.filter(F.lit(False))
    assert S.brute_force_topk_vectorized(emb, empty, k=3).count() == 0


def test_array_percentile_equals_scalar_spelling(spark):
    """The r13 array-form percentile (one shared value->count buffer)
    is bit-identical to the scalar spelling it replaced."""
    register_views(spark, SF_SMOKE)
    arr = spark.sql(
        "select l_returnflag, percentile(l_extendedprice, array(0.5, 0.9)) ps "
        "from lineitem group by l_returnflag"
    ).collect()
    scal = spark.sql(
        "select l_returnflag, percentile(l_extendedprice, 0.5) p50, "
        "percentile(l_extendedprice, 0.9) p90 from lineitem group by l_returnflag"
    ).collect()
    got = {r.l_returnflag: (r.ps[0], r.ps[1]) for r in arr}
    want = {r.l_returnflag: (r.p50, r.p90) for r in scal}
    assert got == want  # exact equality, not approx


def test_decontam_probe_side_decision_unchanged(spark):
    """The r13 limit+1 probe makes the same broadcast-vs-merge decision
    as the full count it replaced, on both sides of the threshold."""
    small = spark.range(5).select(F.col("id").alias("gram"))
    large = spark.range(50).select(F.col("id").alias("gram"))

    def hint_names(df):
        plan = df._jdf.queryExecution().logical().toString()
        return plan.splitlines()[0]

    under = DC._probe_side(small, limit=10)
    over = DC._probe_side(large, limit=10)
    trusted = DC._probe_side(large, limit=None)
    assert "broadcast" in hint_names(under).lower()
    assert "merge" in hint_names(over).lower()
    assert "broadcast" in hint_names(trusted).lower()
