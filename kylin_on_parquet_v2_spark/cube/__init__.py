"""Cube subsystem: cuboid lattice, build job, layout storage, segments."""

from kylin_on_parquet_v2_spark.cube.cuboid import Cuboid, CuboidScheduler
from kylin_on_parquet_v2_spark.cube.build import CubeBuilder, CubeInstance

__all__ = ["Cuboid", "CuboidScheduler", "CubeBuilder", "CubeInstance"]
