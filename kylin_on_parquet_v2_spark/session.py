"""SparkSession bootstrap and source-view registry.

Reference parity: the reference sizes shuffle partitions per query from the
pruned scan bytes (``kylin-spark-common/.../datasource/ResetShufflePartition.scala:43-57``,
``ResultPlan.scala:67-73``, 64 MB/partition target). On Spark 3+/4 AQE does the
same job at runtime (``spark.sql.adaptive.coalescePartitions``), so we enable
AQE instead of re-implementing the arithmetic — see SURVEY.md §4.

Scale notes (100 TB / 1000 executors):
- AQE coalesces small shuffle partitions and splits skewed ones at runtime;
  the static ``spark.sql.shuffle.partitions`` below is only the *initial*
  number, sized via env for local runs.
- ``maxPartitionBytes=128m`` keeps scan tasks within executor memory at any
  input size; parquet vectorized reader + whole-stage codegen are defaults.
- Broadcast threshold stays at Spark's default (10 MB); dimension tables in a
  star model are broadcast explicitly by the query layer where provably small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver's synthetic tables (TESTDATA.md). Order matters nowhere, but the
#: names are part of the oracle contract.
SOURCE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(app_name: str = "kylin-on-parquet-v2-spark") -> SparkSession:
    """Create (or reuse) the engine SparkSession with scale-oriented defaults."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE replaces the reference's manual shuffle-partition sizing and
        # gives skew-join splitting for free at cluster scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Arrow for the (rare) pandas-UDF paths: vectorized transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Source parquet may carry TIMESTAMP(NANOS) (pandas/arrow writers);
        # read them as long and convert in register_views.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table support (shard-aware scans, KylinFileSourceScanExec
        # parity): keep the warehouse + metastore out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/kylin_spark_warehouse")
        .config(
            "spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/kylin_derby"
        )
    )
    return builder.getOrCreate()


#: memo attribute stamped onto the session: (abspath(sf_dir), views).
#: Registration is idempotent metadata work — ten parquet schema inferences
#: plus ten catalog writes per call — yet every corpus query calls it
#: defensively, so an un-memoized call burned ~0.5 s of pure driver time per
#: query (guide §5: the driver should do almost no work on the query path).
#: The memo caches only CATALOG REGISTRATION (name -> unexecuted DataFrame);
#: every query still scans the parquet. Switching sf_dir on the same session
#: re-registers (the temp-view names are session-global), which keeps
#: multi-SF test sessions correct. Stored ON the session object (r13
#: advisor) so its lifetime is the session's — no global dict holding strong
#: refs to dead sessions, no id()-reuse aliasing.
_VIEWS_MEMO_ATTR = "_graft_views_memo"


def invalidate_views_memo(spark: SparkSession) -> None:
    """Drop the session's view memo — call after clobbering a source-named
    temp view or regenerating files under a registered sf_dir (the memo
    cannot see either; r13 advisor). The next register_views re-registers
    and re-lists."""
    if hasattr(spark, _VIEWS_MEMO_ATTR):
        delattr(spark, _VIEWS_MEMO_ATTR)


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, force: bool = False
) -> dict[str, DataFrame]:
    """Register every source parquet under ``sf_dir`` as a temp view.

    This is the engine's "Hive source" (reference: table registration through
    ``OLAPSchemaFactory`` + ``source-hive``; our sources are parquet files).
    Returns name -> DataFrame. Memoized per (session, sf_dir); ``force=True``
    (or :func:`invalidate_views_memo`) bypasses the memo when the catalog or
    the files underneath changed out from under it.
    """
    sf_abs = os.path.abspath(sf_dir)
    hit = getattr(spark, _VIEWS_MEMO_ATTR, None)
    if not force and hit is not None and hit[0] == sf_abs:
        return hit[1]
    # The session may be driver-provided (not built by get_spark): pin the
    # runtime-settable confs the sources/oracle comparison depend on.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    out: dict[str, DataFrame] = {}
    for name in SOURCE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _read_source(spark, path)
        df.createOrReplaceTempView(name)
        out[name] = df
    setattr(spark, _VIEWS_MEMO_ATTR, (sf_abs, out))
    return out


def _read_source(spark: SparkSession, path: str) -> DataFrame:
    """Read a source parquet, normalizing nanosecond timestamps.

    Spark rejects INT64 TIMESTAMP(NANOS) unless ``nanosAsLong`` is set, in
    which case the column surfaces as bigint nanoseconds; convert it back to
    a (UTC-naive) timestamp so downstream SQL sees the declared type.
    """
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        for fld in schema:
            if str(fld.type) == "timestamp[ns]" and fld.name in df.columns:
                from pyspark.sql import functions as F

                # INTEGER division ns->us: `/` promotes to double, whose
                # 53-bit mantissa cannot hold int64 nanos exactly — the
                # rounding slid some timestamps by a few microseconds off
                # the oracle's exact conversion
                df = df.withColumn(
                    fld.name,
                    F.timestamp_micros(
                        F.expr(f"`{fld.name}` div 1000")
                    ).cast("timestamp_ntz"),
                )
    except Exception:
        pass  # best-effort: plain read already succeeded
    return df
