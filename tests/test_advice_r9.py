"""Round-9 advisor regressions: query-id reuse vs job-group poisoning,
duplicate-id collisions, watchdog attribution + crash resilience."""

from __future__ import annotations

import threading
import time

import pytest

from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.query.lifecycle import QueryTracker

from tests.test_cancellation import CANCEL_DEADLINE_SEC, SLOW_SQL


def test_retry_with_same_query_id_survives_a_stop(spark, tmp_path):
    """r8 advisor (medium): cancelJobGroupAndFutureJobs leaves the group id
    in SparkContext's cancelled-groups set. The job group is now a fresh
    internal id per execution, so a client retrying with the SAME query_id
    after a stop must run normally instead of dying on arrival."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    with eng.tracked_query(query_id="retry-me", description=SLOW_SQL) as qid:
        assert qid == "retry-me"
        timer = threading.Timer(1.0, lambda: eng.stop_query("retry-me"))
        timer.start()
        t0 = time.monotonic()
        with pytest.raises(Exception):
            eng.sql(SLOW_SQL).collect()
        assert time.monotonic() - t0 < CANCEL_DEADLINE_SEC
        timer.join()
    # the retry: same external id, new internal group — must complete
    with eng.tracked_query(query_id="retry-me", description="retry"):
        assert eng.sql("select 41 + 1 as x").collect()[0]["x"] == 42


def test_concurrent_duplicate_query_id_rejected(spark, tmp_path):
    """Two live queries sharing an id would collide in the registry (one
    finish() untracks the other; one stop kills both) — the second start
    raises, which the REST layer surfaces as 409."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    with eng.tracked_query(query_id="dup-id"):
        with pytest.raises(ValueError, match="already running"):
            with eng.tracked_query(query_id="dup-id"):
                pass  # pragma: no cover — must not be reached
    # after the first finishes, the id is reusable
    with eng.tracked_query(query_id="dup-id"):
        pass


def test_user_stop_reason_mentioning_budget_counts_as_user(spark):
    """r8 verdict #4: attribution is an explicit flag, not a substring —
    a user-supplied reason containing 'budget' is a USER cancel."""
    tracker = QueryTracker(spark)
    tracker.start("q-budget-word", "select 1")
    assert tracker.stop_query("q-budget-word", reason="budget review: stop it")
    tracker.finish("q-budget-word")
    assert tracker.n_cancelled_by_user == 1
    assert tracker.n_cancelled_by_watchdog == 0
    # and the watchdog path attributes via the flag
    tracker.start("q-watchdog", "select 1")
    assert tracker.stop_query(
        "q-watchdog", reason="exceeded 1s wall-time budget (watchdog)",
        by_watchdog=True,
    )
    tracker.finish("q-watchdog")
    assert tracker.n_cancelled_by_watchdog == 1
    assert tracker.n_cancelled_by_user == 1


def test_streaming_gate_empty_replay_clears_stale_epoch(spark, tmp_path):
    """r8 advisor: dynamic partition overwrite only rewrites partitions
    PRESENT in the replayed write — a replay whose filtered batch is empty
    must explicitly clear the epoch's stale partition dir."""
    import os

    from pyspark.sql import functions as F

    from kylin_on_parquet_v2_spark.pipeline.decontam import streaming_decontaminate
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "clean")
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).limit(50)
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(eval_docs, ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q, grams = streaming_decontaminate(
            stream, eval_docs, out_dir, str(tmp_path / ckpt), n=5
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            grams.unpersist()

    # pass 1: a small eval set — most rows are clean, partitions exist
    run(spark.read.schema(schema).parquet(src).filter(F.col("doc_id") % 29 == 0), "c1")
    assert spark.read.parquet(out_dir).count() > 0
    epoch_dirs = [d for d in os.listdir(out_dir) if d.startswith("__epoch=")]
    assert epoch_dirs
    # pass 2 (checkpoint loss, worst case): EVERY doc is now contaminated —
    # the replayed epochs are empty and must remove their stale partitions
    run(spark.read.schema(schema).parquet(src), "c2")
    left = [d for d in os.listdir(out_dir) if d.startswith("__epoch=")]
    assert left == [], f"stale epoch partitions survived an empty replay: {left}"


def test_rdd_probe_gated_to_map_side_plans(spark):
    """r8 advisor: `.rdd` finalizes AQE and eagerly runs upstream shuffle
    stages — the repartition probe must only touch shuffle-free inputs."""
    from kylin_on_parquet_v2_spark.pipeline.similarity import _map_side_only

    base = spark.range(100).selectExpr("id as vec_id", "array(1.0, 2.0) as embedding")
    assert _map_side_only(base.filter("vec_id > 3"))
    shuffled = base.groupBy("vec_id").count()
    assert not _map_side_only(shuffled)
    joined = base.join(base.selectExpr("vec_id"), "vec_id")
    assert not _map_side_only(joined)


def test_watchdog_survives_a_sweep_exception(spark):
    """r8 advisor: one failing sweep must not kill the detector thread —
    later over-budget queries still get cancelled."""
    tracker = QueryTracker(spark, default_timeout_sec=0.4, detect_interval_sec=0.05)
    boom = {"armed": True}
    orig = tracker.stop_query

    def flaky(qid, reason="", by_watchdog=False):
        if boom.pop("armed", False):
            raise RuntimeError("transient gateway error")
        return orig(qid, reason=reason, by_watchdog=by_watchdog)

    tracker.stop_query = flaky
    tracker.start("doomed", "select slow")
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if tracker.was_cancelled("doomed"):
            break
        time.sleep(0.05)
    assert tracker.was_cancelled("doomed"), "watchdog died after one error"
    assert tracker.n_watchdog_errors >= 1
    tracker.finish("doomed")
    tracker.shutdown()


def test_rdd_probe_blocks_limited_inputs(spark):
    """GlobalLimit/LocalLimit plans must also fail the map-side probe —
    finalizing them under AQE would eagerly run the limit's stages."""
    from kylin_on_parquet_v2_spark.pipeline.similarity import _map_side_only

    base = spark.range(100).selectExpr("id as vec_id", "array(1.0, 2.0) as embedding")
    assert not _map_side_only(base.limit(10))
