"""Segment REFRESH (round-11; reference ``CubeManager.refreshSegment`` —
the REFRESH job type re-cubes an existing TSRange whose source rows were
restated, e.g. a late-data correction, without touching other segments).

Adversarial cases: other segments' bytes are bit-identical after the
refresh (file listing compared); pre-refresh queries serve the OLD data and
post-refresh queries the NEW (the late row appears exactly once); bitmap
distinct counts survive a restatement that introduces a NEW dictionary
value; refresh is idempotent; a memoized route planned over the old dim
ranges expires (lifecycle epoch)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine


def _rows(late: bool):
    rows = [
        ("view" if u % 2 == 0 else "click", dt.date(2024, 3, d), u, 1.0)
        for d in (1, 2, 3)
        for u in range(4)
    ]
    if late:
        # a restatement lands in day 2: one extra row with a NEW user id
        rows.append(("view", dt.date(2024, 3, 2), 99, 5.0))
    return rows


def _listing(path: str) -> dict[str, list[str]]:
    out = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        fs = sorted(f for f in files if not f.startswith("."))
        if fs:
            out[rel] = fs
    return out


@pytest.fixture()
def engine(spark, tmp_path_factory):
    spark.createDataFrame(
        _rows(late=False), "etype string, d date, user_id long, v double"
    ).createOrReplaceTempView("sr_fact")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("sr_cubes")))
    eng.add_model(DataModel(name="sr_star", fact_table="sr_fact", partition_column="d"))
    eng.build_cube(
        CubeDesc(
            name="sr_cube",
            model_name="sr_star",
            dimensions=("etype", "d"),
            measures=(
                MeasureDesc("_cnt", FunctionDesc("COUNT")),
                MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
                MeasureDesc(
                    "bm_user", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")
                ),
            ),
            segment_granularity="day",
        )
    )
    return eng


SQL = (
    "select etype, count(*) as n, sum(v) as sv, count(distinct user_id) as u "
    "from sr_fact group by etype order by etype"
)


def test_refresh_applies_restatement_and_leaves_others_untouched(spark, engine):
    inst = engine.cubes["sr_cube"]
    before = {r.etype: (r.n, r.sv, r.u) for r in engine.sql(SQL).collect()}
    assert before == {"click": (6, 6.0, 2), "view": (6, 6.0, 2)}

    # untouched-segment evidence: exact file listings of the other days
    base_path = inst.layouts[max(inst.layouts)]
    others = {
        seg: _listing(os.path.join(base_path, f"__segment__={seg}"))
        for seg in ("2024-03-01", "2024-03-03")
    }

    # the source restates day 2 (late row, NEW user id 99)
    spark.createDataFrame(
        _rows(late=True), "etype string, d date, user_id long, v double"
    ).createOrReplaceTempView("sr_fact")

    # pre-refresh: the cube still serves the OLD day-2 bytes
    assert {r.etype: (r.n, r.sv, r.u) for r in engine.sql(SQL).collect()} == before

    engine.refresh_segment("sr_cube", "2024-03-02")
    after = {r.etype: (r.n, r.sv, r.u) for r in engine.sql(SQL, validate=True).collect()}
    assert engine.last_route is not None
    # +1 view row, +5.0 v, and user 99 is a new distinct (bitmap extended)
    assert after == {"click": (6, 6.0, 2), "view": (7, 11.0, 3)}

    for seg, listing in others.items():
        assert _listing(os.path.join(base_path, f"__segment__={seg}")) == listing, seg


def test_refresh_is_idempotent(spark, engine):
    spark.createDataFrame(
        _rows(late=True), "etype string, d date, user_id long, v double"
    ).createOrReplaceTempView("sr_fact")
    engine.refresh_segment("sr_cube", "2024-03-02")
    once = [tuple(r) for r in engine.sql(SQL, skip_result_cache=True).collect()]
    engine.refresh_segment("sr_cube", "2024-03-02")
    twice = [tuple(r) for r in engine.sql(SQL, skip_result_cache=True).collect()]
    assert once == twice
    # no staging residue in any layout dir
    inst = engine.cubes["sr_cube"]
    for path in inst.layouts.values():
        assert not [n for n in os.listdir(path) if "staging" in n], path


def test_refresh_unknown_segment_or_unsegmented_refuses(spark, engine, tmp_path):
    with pytest.raises(ValueError, match="unknown segment"):
        engine.refresh_segment("sr_cube", "1999-01-01")
    eng2 = OlapEngine(spark, storage_dir=str(tmp_path / "flat_cubes"))
    eng2.add_model(DataModel(name="sr_flat_star", fact_table="sr_fact"))
    eng2.build_cube(
        CubeDesc(
            name="sr_flat_cube",
            model_name="sr_flat_star",
            dimensions=("etype",),
            measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
        )
    )
    with pytest.raises(ValueError, match="segmented"):
        eng2.refresh_segment("sr_flat_cube", "2024-03-02")
