"""User-pluggable measure types (reference MeasureTypeFactory.java:121-135:
custom measure types registered by config contribute their aggregators to
the build and query paths)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.build import CubeBuilder
from kylin_on_parquet_v2_spark.cube.measures import (
    MeasureType,
    finalize,
    register_measure_type,
)
from kylin_on_parquet_v2_spark.metadata.cube import (
    CubeDesc,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.metadata.model import DataModel
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_SMOKE


def _register_sum_sq():
    register_measure_type(
        MeasureType(
            name="SUM_SQ",
            build_agg=lambda f, name, schema: F.sum(
                F.col(f.parameter) * F.col(f.parameter)
            ).alias(name),
            # additive: re-aggregation over layout rows is a plain SUM
            reagg=lambda f, name, schema: F.sum(name).alias(name),
            finalize=lambda f, c: F.round(c, 4),
        )
    )


def test_custom_measure_builds_and_reaggregates(spark, tmp_path):
    _register_sum_sq()
    register_views(spark, SF_SMOKE)

    model = DataModel(name="mini", fact_table="lineitem", lookups=())
    cube = CubeDesc(
        name="mini_cube",
        model_name="mini",
        dimensions=("l_returnflag", "l_linestatus"),
        measures=(
            MeasureDesc("_count", FunctionDesc("COUNT")),
            MeasureDesc("ssq_qty", FunctionDesc("SUM_SQ", "l_quantity")),
        ),
    )
    inst = CubeBuilder(spark, model, cube, str(tmp_path)).build()

    flat = spark.table("lineitem")
    truth = {
        (r.l_returnflag, r.l_linestatus): round(r.ssq, 4)
        for r in flat.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("ssq"))
        .collect()
    }
    # base layout carries the custom partial aggregate
    base = inst.scheduler.find_best_match(frozenset(("l_returnflag", "l_linestatus")))
    got = {
        (r.l_returnflag, r.l_linestatus): round(r.ssq_qty, 4)
        for r in inst.layout_df(spark, base).collect()
    }
    assert got == truth

    # child layout (one dim) was re-aggregated through the plugin's reagg
    child = inst.scheduler.find_best_match(frozenset(("l_returnflag",)))
    assert set(child.dims) == {"l_returnflag"}
    truth1 = {}
    for (rf, _ls), v in truth.items():
        truth1[rf] = round(truth1.get(rf, 0.0) + v, 2)
    got1 = {
        r.l_returnflag: round(r.ssq_qty, 2)
        for r in inst.layout_df(spark, child).collect()
    }
    assert got1 == truth1

    # finalize hook applies the plugin's surface transform
    m = cube.measure("ssq_qty")
    out = inst.layout_df(spark, child).select(finalize(m).alias("v")).collect()
    assert all(r.v == round(r.v, 4) for r in out)


def test_unknown_measure_expression_rejected():
    import pytest

    with pytest.raises(ValueError):
        FunctionDesc("NO_SUCH_MEASURE", "x")
