"""Query layer: SQL digest extraction, cuboid routing, engine facade.

Reference parity: ``query/.../relnode/OLAPContext.java:122-182`` (SQLDigest),
``RealizationChooser`` + ``Cuboid.findCuboid`` routing, and the pushdown path
``SparkSqlClient.scala:41-76`` (our default/fallback — plain ``spark.sql``).
"""

from kylin_on_parquet_v2_spark.query.engine import OlapEngine

__all__ = ["OlapEngine"]
