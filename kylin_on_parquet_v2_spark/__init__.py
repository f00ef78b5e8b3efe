"""kylin_on_parquet_v2_spark — a PySpark-native OLAP engine.

A from-scratch rebuild of the capabilities of Kyligence/kylin-on-parquet-v2
("Parquet Storage / Sparder" Apache Kylin) on idiomatic PySpark:

- Spark SQL / Catalyst is the query engine (the reference's own "pushdown"
  path, ``kylin-spark-query/.../pushdown/SparkSqlClient.scala:41-76``, is our
  default path — always-correct by construction).
- The cube subsystem (star model -> flat table -> cuboid layouts on Parquet,
  query routing to the best layout) is a pure *accelerator*, never a
  correctness dependency.
- Beyond the reference's surface, large-scale training-data-pipeline
  operators live in :mod:`kylin_on_parquet_v2_spark.pipeline` (dedup,
  similarity search, text analysis, multimodal columns).

See SURVEY.md at the repo root for the reference -> Spark mapping.
"""

from kylin_on_parquet_v2_spark.session import get_spark, register_views

__all__ = ["get_spark", "register_views"]

__version__ = "0.1.0"
