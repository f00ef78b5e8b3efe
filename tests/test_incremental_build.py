"""Incremental segment build tests (reference: per-segment cubing jobs —
CubeSegment/CubeBuildJob build one TSRange at a time; NGlobalDictionaryV2
appends new dictionary values without re-encoding history).

The adversarial cases: dictionary ids must stay STABLE across refreshes
(old segments' word bags keep their meaning), history bytes must be
untouched, and a refresh carrying brand-new distinct values must still
answer COUNT DISTINCT exactly from the bitmap across old + new segments.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL
from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

INC_MODEL = DataModel(name="inc_star", fact_table="inc_f", partition_column="d")

INC_CUBE = CubeDesc(
    name="inc_cube",
    model_name="inc_star",
    dimensions=("cat", "d"),  # d as dim so date filters route (and fold)
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
        MeasureDesc("bm_u", FunctionDesc("COUNT_DISTINCT", "u", "bitmap")),
    ),
    segment_granularity="day",
)

DAY1 = [  # two initial segments
    ("a", dt.date(2024, 1, 1), 10.0, 101),
    ("a", dt.date(2024, 1, 1), 5.0, 102),
    ("b", dt.date(2024, 1, 1), 1.0, 103),
    ("a", dt.date(2024, 1, 2), 2.0, 101),
    ("b", dt.date(2024, 1, 2), 4.0, 104),
]
DAY3 = [  # the increment: repeats user 101, introduces NEW users 105/106
    ("a", dt.date(2024, 1, 3), 7.0, 101),
    ("a", dt.date(2024, 1, 3), 3.0, 105),
    ("b", dt.date(2024, 1, 3), 9.0, 106),
]
SCHEMA = "cat string, d date, v double, u int"


def _register(spark, rows):
    spark.createDataFrame(rows, SCHEMA).createOrReplaceTempView("inc_f")


def _dict_map(spark, storage, cube="inc_cube"):
    d = spark.read.parquet(os.path.join(storage, cube, "dict", "u"))
    return {r.value: r.did for r in d.collect()}


def _layout_files(inst):
    out = {}
    for path in inst.layouts.values():
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
    return out


@pytest.fixture()
def engine(spark, tmp_path):
    _register(spark, DAY1)
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(INC_MODEL)
    eng.build_cube(INC_CUBE)
    return eng


def test_increment_appends_only_new_segments(spark, engine, tmp_path):
    inst = engine.cubes["inc_cube"]
    assert inst.segments(spark) == ["2024-01-01", "2024-01-02"]
    before_files = _layout_files(inst)
    dict_before = _dict_map(spark, str(tmp_path))

    _register(spark, DAY1 + DAY3)
    built = engine.refresh_cube("inc_cube")
    assert built == ["2024-01-03"]
    assert inst.segments(spark) == ["2024-01-01", "2024-01-02", "2024-01-03"]

    # history bytes untouched: every pre-existing file still there, same mtime
    after_files = _layout_files(inst)
    for p, mtime in before_files.items():
        assert after_files.get(p) == mtime, f"history file rewritten: {p}"

    # dictionary extended, never re-encoded: old ids identical, new ids above
    dict_after = _dict_map(spark, str(tmp_path))
    for v, did in dict_before.items():
        assert dict_after[v] == did
    new_ids = {did for v, did in dict_after.items() if v not in dict_before}
    assert new_ids == {max(dict_before.values()) + 1, max(dict_before.values()) + 2}
    assert sorted(dict_after.values()) == list(range(len(dict_after)))  # dense

    # routed answers across old+new segments == pushdown (bitmap included)
    df = engine.sql(
        """select cat, sum(v) as s, count(*) as n, count(distinct u) as nd
           from inc_f group by cat order by cat""",
        validate=True,
    )
    assert engine.last_route is not None
    got = {r.cat: (r.s, r.n, r.nd) for r in df.collect()}
    assert got == {"a": (27.0, 5, 3), "b": (14.0, 3, 3)}

    # nothing new -> no-op
    assert engine.refresh_cube("inc_cube") == []


def test_increment_then_auto_merge_round_trip(spark, tmp_path):
    from dataclasses import replace

    _register(spark, DAY1)
    desc = replace(INC_CUBE, name="inc_cube_am", auto_merge_segments=3)
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(INC_MODEL)
    inst = eng.build_cube(desc)

    _register(spark, DAY1 + DAY3)
    assert eng.refresh_cube("inc_cube_am") == ["2024-01-03"]
    # threshold 3 reached -> auto-merge fired inside refresh: oldest two
    # merged, the newest (still-ingesting) segment left alone
    assert inst.segments(spark) == ["2024-01-01", "2024-01-03"]
    assert inst.segment_ranges == {"2024-01-01": "2024-01-02"}

    df = eng.sql(
        """select cat, sum(v) as s, count(distinct u) as nd
           from inc_f group by cat order by cat""",
        validate=True,
    )
    assert eng.last_route is not None
    assert {r.cat: (r.s, r.nd) for r in df.collect()} == {
        "a": (27.0, 3),
        "b": (14.0, 3),
    }

    # a lower-bound filter inside the merged range: relaxed, not mis-pruned
    df2 = eng.sql(
        """select cat, count(*) as n from inc_f
           where d >= date '2024-01-02' group by cat order by cat""",
        validate=True,
    )
    route = eng.last_route
    assert route is not None
    assert any("'2024-01-01'" in p for p in route.segment_filters), route.segment_filters
