"""Query cancellation / wall-time budget (the reference's last operational
subsystem: ResultPlan.scala:89/115 setJobGroup/cancelJobGroup,
SparkSqlClient.scala:78-93 interruptOnCancel, QueryController.java:217-220
REST stopQuery, BadQueryDetector.java:129-147 watchdog)."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.server import make_server

# A deliberately slow pushdown scan: ~5e11 generated rows would take minutes
# on local[32]; Spark's Range tasks poll the kill flag between batches, so a
# cancel lands in milliseconds. If cancellation were broken the pytest run
# would stall here — that IS the regression signal.
SLOW_SQL = "select sum(id % 10) as s from range(500000000000)"

#: generous bound: the collect must die from the cancel, not run to the end
CANCEL_DEADLINE_SEC = 60


def test_stop_query_mid_flight(spark, tmp_path):
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    stopped: list[bool] = []
    with eng.tracked_query(description=SLOW_SQL) as qid:
        # the registry sees the query while it runs
        assert any(q["query_id"] == qid for q in eng.running_queries())
        timer = threading.Timer(1.0, lambda: stopped.append(eng.stop_query(qid)))
        timer.start()
        t0 = time.monotonic()
        with pytest.raises(Exception) as ei:
            eng.sql(SLOW_SQL).collect()
        elapsed = time.monotonic() - t0
        timer.join()
    assert stopped == [True]
    assert elapsed < CANCEL_DEADLINE_SEC, "cancel did not interrupt the scan"
    assert "cancel" in str(ei.value).lower()
    assert eng.tracker.was_cancelled(qid) == "stopped by user"
    # finished => no longer running; stopping again reports not-found
    assert all(q["query_id"] != qid for q in eng.running_queries())
    assert eng.stop_query(qid) is False
    # the engine keeps serving after a kill (the whole point: one runaway
    # query dies, the session survives)
    assert eng.sql("select 41 + 1 as x").collect()[0]["x"] == 42
    assert eng.metrics["queries_cancelled_user"] >= 1


def test_watchdog_kills_over_budget_query(spark, tmp_path):
    eng = OlapEngine(
        spark, storage_dir=str(tmp_path / "cubes"), query_timeout_sec=2.0
    )
    with eng.tracked_query(description="budgeted slow scan") as qid:
        t0 = time.monotonic()
        with pytest.raises(Exception):
            eng.sql(SLOW_SQL).collect()
        elapsed = time.monotonic() - t0
    assert elapsed < CANCEL_DEADLINE_SEC
    reason = eng.tracker.was_cancelled(qid)
    assert reason is not None and "budget" in reason
    assert eng.metrics["queries_cancelled_watchdog"] >= 1
    # fast queries inside the SAME budget regime are untouched
    with eng.tracked_query(description="fast") as qid2:
        assert eng.sql("select 1 as x").collect()[0]["x"] == 1
    assert eng.tracker.was_cancelled(qid2) is None


def test_per_query_timeout_overrides_default(spark, tmp_path):
    # engine default is generous; the per-query budget is the binding one
    eng = OlapEngine(
        spark, storage_dir=str(tmp_path / "cubes"), query_timeout_sec=3600.0
    )
    with eng.tracked_query(timeout_sec=2.0, description="tight budget") as qid:
        with pytest.raises(Exception):
            eng.sql(SLOW_SQL).collect()
    reason = eng.tracker.was_cancelled(qid)
    assert reason is not None and "2.0s" in reason


def test_slow_report_level_does_not_kill(spark, tmp_path):
    """BadQueryDetector's first level (BadQueryDetector.java:138-141):
    queries past the ALERT threshold are reported as slow — not killed —
    and only the kill budget cancels. A query slower than the alert but
    faster than (no) budget completes and lands in the slow log."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    eng.tracker.slow_threshold_sec = 1.0
    eng.tracker.detect_interval_sec = 0.2
    with eng.tracked_query(description="slow but legal") as qid:
        rows = eng.sql("select sum(id % 7) as s from range(30000000000)").collect()
        assert rows
    assert qid in eng.tracker.slow_queries
    assert eng.tracker.was_cancelled(qid) is None  # reported, never killed
    assert eng.metrics["queries_slow_reported"] >= 1


def test_low_memory_alert_level(spark, tmp_path):
    """BadQueryDetector's third report (BadQueryDetector.java:165-167):
    system available memory under the alert floor while queries run is
    counted — reported, never killed (the box, not one query, is the
    problem). An absurdly high floor makes the condition always true."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    eng.tracker.low_memory_alert_mb = 10**9  # always "low"
    eng.tracker.detect_interval_sec = 0.1
    with eng.tracked_query(description="memory probe") as qid:
        eng.sql("select sum(id % 7) as s from range(5000000000)").collect()
    assert eng.tracker.n_low_memory_alerts >= 1
    assert eng.tracker.last_avail_mb is not None
    assert eng.tracker.was_cancelled(qid) is None  # never killed for memory


def test_engine_shutdown_cancels_running(spark, tmp_path):
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    done: dict = {}

    def run():
        with eng.tracked_query(query_id="shutdown-victim"):
            try:
                eng.sql(SLOW_SQL).collect()
                done["r"] = "completed"
            except Exception:
                done["r"] = "cancelled"

    t = threading.Thread(target=run)
    t.start()
    time.sleep(1.5)
    eng.shutdown()
    t.join(timeout=CANCEL_DEADLINE_SEC)
    assert not t.is_alive() and done["r"] == "cancelled"
    assert eng.tracker.was_cancelled("shutdown-victim") == "engine shutdown"


def test_cancel_isolates_concurrent_queries(spark, tmp_path):
    """Killing one query must not touch a concurrently running one — the
    job group is per-query, not per-engine (the whole point of
    setJobGroup over cancelAllJobs)."""
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    results: dict = {}

    def victim():
        with eng.tracked_query(query_id="victim-q", description=SLOW_SQL):
            try:
                eng.sql(SLOW_SQL).collect()
                results["victim"] = "completed"
            except Exception:
                results["victim"] = "cancelled"

    def bystander():
        # moderate real work on the same SparkSession, own job group
        with eng.tracked_query(description="bystander"):
            try:
                rows = eng.sql(
                    "select count(*) as n, sum(id % 7) as s from range(200000000)"
                ).collect()
                results["bystander"] = (rows[0]["n"], rows[0]["s"])
            except Exception as exc:  # pragma: no cover — the failure mode
                results["bystander"] = f"FAILED: {exc}"

    tv = threading.Thread(target=victim)
    tb = threading.Thread(target=bystander)
    tv.start()
    tb.start()
    time.sleep(1.5)
    assert eng.stop_query("victim-q") is True
    tv.join(timeout=CANCEL_DEADLINE_SEC)
    tb.join(timeout=CANCEL_DEADLINE_SEC)
    assert not tv.is_alive() and not tb.is_alive()
    assert results["victim"] == "cancelled"
    # 200M rows: count exact; sum(id % 7) has a closed form but equality
    # with the engine's own small recompute is the simpler oracle
    expect = spark.sql(
        "select count(*) as n, sum(id % 7) as s from range(200000000)"
    ).collect()[0]
    assert results["bystander"] == (expect["n"], expect["s"])


def _post(base: str, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"{base}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base: str, path: str) -> tuple[int, dict]:
    with urllib.request.urlopen(f"{base}{path}") as resp:
        return resp.status, json.loads(resp.read())


def test_server_stop_endpoint(spark, tmp_path):
    eng = OlapEngine(spark, storage_dir=str(tmp_path / "cubes"))
    srv = make_server(eng)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # stopping an unknown id is a clean no-op, not an error
        code, body = _post(base, "/api/query/stop", {"query_id": "nope"})
        assert code == 200 and body["stopped"] is False

        results: list[tuple[int, dict]] = []
        t = threading.Thread(
            target=lambda: results.append(
                _post(base, "/api/query", {"sql": SLOW_SQL, "query_id": "kill-me"})
            )
        )
        t.start()
        # wait until the slow query shows up in the running listing
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            _, listing = _get(base, "/api/queries")
            if any(q["query_id"] == "kill-me" for q in listing["queries"]):
                break
            time.sleep(0.2)
        else:
            pytest.fail("slow query never appeared in /api/queries")

        code, body = _post(base, "/api/query/stop", {"query_id": "kill-me"})
        assert code == 200 and body["stopped"] is True

        t.join(timeout=CANCEL_DEADLINE_SEC)
        assert not t.is_alive(), "request did not return after stop"
        code, body = results[0]
        assert code == 410, body
        assert body["cancelled"] is True and body["query_id"] == "kill-me"
        assert "stopped via REST" in body["reason"]

        # the server keeps serving after the kill
        code, body = _post(base, "/api/query", {"sql": "select 7 as x"})
        assert code == 200 and body["rows"] == [[7]]
        assert body["query_id"]  # every response carries its id
    finally:
        srv.shutdown()
