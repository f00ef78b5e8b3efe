"""Segment retention tests (reference CubeDesc retentionRange +
CubeManager retired-segment cleanup): only the newest N segment dirs
survive a refresh; the cube then answers over the retained range with the
same values the flat path gives over that range."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import SEGMENT_COL, CubeInstance
from kylin_on_parquet_v2_spark.cube.merge import apply_retention
from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

RET_MODEL = DataModel(name="ret_star", fact_table="ret_f", partition_column="d")

RET_CUBE = CubeDesc(
    name="ret_cube",
    model_name="ret_star",
    dimensions=("cat", "d"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
    ),
    segment_granularity="day",
    retention_segments=2,
)

ROWS = [
    ("a", dt.date(2024, 1, 1), 10.0),
    ("b", dt.date(2024, 1, 1), 1.0),
    ("a", dt.date(2024, 1, 2), 2.0),
    ("b", dt.date(2024, 1, 2), 4.0),
    ("a", dt.date(2024, 1, 3), 7.0),
    ("b", dt.date(2024, 1, 4), 9.0),
]
SCHEMA = "cat string, d date, v double"


def _register(spark, rows):
    spark.createDataFrame(rows, SCHEMA).createOrReplaceTempView("ret_f")


def test_retention_drops_oldest_dirs_and_keeps_answers(spark, tmp_path):
    _register(spark, ROWS)
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(RET_MODEL)
    inst = eng.build_cube(RET_CUBE)
    assert len(inst.segments(spark)) == 4

    dropped = apply_retention(spark, inst)
    assert dropped == ["2024-01-01", "2024-01-02"]
    assert inst.segments(spark) == ["2024-01-03", "2024-01-04"]
    # every layout lost the old dirs, not just the base one
    for path in inst.layouts.values():
        dirs = [d for d in os.listdir(path) if d.startswith(SEGMENT_COL)]
        assert sorted(dirs) == [
            f"{SEGMENT_COL}=2024-01-03",
            f"{SEGMENT_COL}=2024-01-04",
        ]
    # the cube now answers over the retained range; the flat equivalent is
    # the source filtered to that range
    eng._cache_epoch += 1  # dropping dirs outside refresh_cube: bust cache
    got = {
        (r["cat"], r["s"]) for r in eng.sql(
            "select cat, sum(v) as s from ret_f group by cat"
        ).collect()
    }
    assert eng.last_route is not None
    assert got == {("a", 7.0), ("b", 9.0)}


def test_retention_persists_through_reload(spark, tmp_path):
    _register(spark, ROWS)
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(RET_MODEL)
    inst = eng.build_cube(RET_CUBE)
    apply_retention(spark, inst)
    again = CubeInstance.load(RET_CUBE, RET_MODEL, str(tmp_path), spark)
    assert again is not None
    assert again.segments(spark) == ["2024-01-03", "2024-01-04"]


def test_retention_noop_below_threshold(spark, tmp_path):
    _register(spark, ROWS[:4])  # 2 segments only
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(RET_MODEL)
    inst = eng.build_cube(RET_CUBE)
    assert apply_retention(spark, inst) == []
    assert len(inst.segments(spark)) == 2


def test_refresh_applies_retention(spark, tmp_path):
    """The refresh loop enforces retention automatically: after new days
    land, the oldest dirs are gone without an explicit call."""
    _register(spark, ROWS[:4])  # days 1-2
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.add_model(RET_MODEL)
    eng.build_cube(RET_CUBE)
    _register(spark, ROWS)  # days 3-4 land in the source
    built = eng.refresh_cube("ret_cube")
    assert built == ["2024-01-03", "2024-01-04"]
    assert eng.cubes["ret_cube"].segments(spark) == ["2024-01-03", "2024-01-04"]
