"""Cube-build phase timing (r14, guide §1/§5): time the five bench build
phases exactly as bench.py runs them (thread pool), with per-cube spans,
under the CURRENT tree. Env knobs for A/B:

  SPARK_GRAFT_BUILD_PAR   override CubeBuilder.build_parallelism
  REPEATS                 default 1
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as entry_mod
from kylin_on_parquet_v2_spark.corpus import base as corpus_base
from kylin_on_parquet_v2_spark.corpus.cube_routed import _bucketed_engine
from kylin_on_parquet_v2_spark.corpus.measures import _kll_engine
from kylin_on_parquet_v2_spark.corpus.ssb import ssb_engine as _ssb_engine
from kylin_on_parquet_v2_spark.corpus.streaming_corpus import _hybrid_engine
from kylin_on_parquet_v2_spark.cube.build import CubeBuilder
from kylin_on_parquet_v2_spark.session import get_spark

par = os.environ.get("SPARK_GRAFT_BUILD_PAR")
if par:
    CubeBuilder.build_parallelism = int(par)
print(f"build_parallelism={CubeBuilder.build_parallelism}", flush=True)

spark = get_spark("r14-build-steps")
spark.sparkContext.setLogLevel("ERROR")

from concurrent.futures import ThreadPoolExecutor


def read_steal():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return vals[7], sum(vals)


def one_build(tag: str) -> None:
    # fresh fixture dirs per repeat: clear the per-process engine caches
    import shutil

    import kylin_on_parquet_v2_spark.corpus.base as cb
    import kylin_on_parquet_v2_spark.corpus.cube_routed as cr
    import kylin_on_parquet_v2_spark.corpus.measures as cm
    import kylin_on_parquet_v2_spark.corpus.ssb as cs
    import kylin_on_parquet_v2_spark.corpus.streaming_corpus as cc

    for mod, names in (
        (cb, ("_ENGINES",)),
        (cr, ("_BUCKETED_ENGINES",)),
        (cm, ("_KLL_ENGINES",)),
        (cs, ("_ENGINES",)),
        (cc, ("_HYBRID_ENGINES", "_INGESTED", "_INGESTED_TD", "_SRC_DIRS")),
    ):
        for n in names:
            d = getattr(mod, n, None)
            if isinstance(d, dict):
                d.clear()
    shutil.rmtree(cb.proc_tmp(), ignore_errors=True)

    s0, t0c = read_steal()
    t0 = time.perf_counter()

    def _run_phase(pf):
        phase, fn = pf
        tp = time.perf_counter()
        fn(spark, sf_dir)
        return phase, round(time.perf_counter() - tp, 2)

    phases = (
        ("standard_cubes", entry_mod._engine),
        ("hybrid_ingest", _hybrid_engine),
        ("bucketed_cube", _bucketed_engine),
        ("kll_cube", _kll_engine),
        ("ssb_cubes", _ssb_engine),
    )
    detail = {}
    with ThreadPoolExecutor(max_workers=len(phases)) as pool:
        for phase, sec in pool.map(_run_phase, phases):
            detail[phase] = sec
    total = time.perf_counter() - t0
    s1, t1c = read_steal()
    steal = 100.0 * (s1 - s0) / max(t1c - t0c, 1)
    print(f"{tag}: build_sec={total:.2f} steal={steal:.2f}% phases={detail}", flush=True)
    for cube, sec in sorted(corpus_base.BUILD_TIMINGS.items()):
        print(f"  cube:{cube} {sec}", flush=True)


for i in range(int(os.environ.get("REPEATS", "1"))):
    one_build(f"pass{i}")
