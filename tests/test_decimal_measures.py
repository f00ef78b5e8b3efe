"""Decimal SUM precision pinning (CuboidAggregator.scala:125-132 parity):
layered re-aggregation must not widen decimal precision build over build,
and values must survive the cube path exactly."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from kylin_on_parquet_v2_spark.cube.build import CubeBuilder
from kylin_on_parquet_v2_spark.metadata.cube import CubeDesc, FunctionDesc, MeasureDesc
from kylin_on_parquet_v2_spark.metadata.model import DataModel
from kylin_on_parquet_v2_spark.session import register_views
from tests.conftest import SF_SMOKE


def test_decimal_sum_precision_pinned(spark, tmp_path):
    register_views(spark, SF_SMOKE)
    spark.table("lineitem").withColumn(
        "l_price_dec", F.col("l_extendedprice").cast(DecimalType(19, 4))
    ).createOrReplaceTempView("lineitem_dec")

    model = DataModel(name="dec_model", fact_table="lineitem_dec")
    cube = CubeDesc(
        name="dec_cube",
        model_name="dec_model",
        dimensions=("l_returnflag", "l_linestatus"),
        measures=(
            MeasureDesc("_count", FunctionDesc("COUNT")),
            MeasureDesc("sum_dec", FunctionDesc("SUM", "l_price_dec")),
        ),
    )
    inst = CubeBuilder(spark, model, cube, str(tmp_path)).build()

    # every layout, including children built FROM parents, keeps the pinned
    # precision (19+10, 4) instead of widening per build layer
    for cuboid_id in inst.layouts:
        df = inst.layout_df(spark, inst.scheduler.cuboids[cuboid_id])
        dt = df.schema["sum_dec"].dataType
        assert isinstance(dt, DecimalType)
        assert (dt.precision, dt.scale) == (29, 4), (cuboid_id, dt)

    # and the values are exact: smallest cuboid total == source total
    total = (
        spark.table("lineitem_dec").agg(F.sum("l_price_dec").alias("s")).collect()[0].s
    )
    small = inst.scheduler.find_best_match(frozenset(("l_returnflag",)))
    cube_total = (
        inst.layout_df(spark, small).agg(F.sum("sum_dec").alias("s")).collect()[0].s
    )
    assert total == cube_total
