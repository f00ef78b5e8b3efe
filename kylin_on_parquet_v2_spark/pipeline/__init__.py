"""Large-scale training-data pipeline operators (beyond the reference's own
surface, per BASELINE.json north star): deduplication, similarity search,
text analysis, multimodal columns.

Design rule: everything is built from JVM-side ``pyspark.sql.functions``
(codegen'd, shuffle-aware) — portable hashes are md5-based so the DuckDB
oracle can replay them bit-for-bit. Python/pandas UDFs appear only where the
semantics genuinely need them (multimodal decode), Arrow-batched.
"""

from kylin_on_parquet_v2_spark.pipeline import (
    decontam,
    dedup,
    export,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = [
    "decontam",
    "dedup",
    "export",
    "multimodal",
    "sampling",
    "similarity",
    "text",
]
