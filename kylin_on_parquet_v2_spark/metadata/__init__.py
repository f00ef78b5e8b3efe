"""Metadata layer: star/snowflake data models and cube descriptors.

Reference parity: ``core-metadata/.../model/DataModelDesc.java``,
``core-cube/.../cube/model/CubeDesc.java`` — re-expressed as plain Python
dataclasses (JSON-serializable), with every runtime object a Spark DataFrame.
"""

from kylin_on_parquet_v2_spark.metadata.model import DataModel, JoinDesc, JoinTable
from kylin_on_parquet_v2_spark.metadata.cube import (
    AggregationGroup,
    CubeDesc,
    FunctionDesc,
    MeasureDesc,
    TimeDerivedDim,
)

__all__ = [
    "DataModel",
    "JoinDesc",
    "JoinTable",
    "AggregationGroup",
    "CubeDesc",
    "FunctionDesc",
    "MeasureDesc",
    "TimeDerivedDim",
]
