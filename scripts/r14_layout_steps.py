"""Per-cuboid driver-time breakdown of the standard tpch_cube build (r14,
VERDICT item 7: 0.79 s/cuboid of plan construction measured in r13).

Monkeypatches CubeBuilder internals with perf_counter spans to split each
layout into: agg-plan construction, columns/analysis triggers, write job,
footer read, re-read. Single-threaded (build_parallelism=1) so spans are
additive and attributable.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from kylin_on_parquet_v2_spark.cube import build as B
from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE, TPCH_MODEL
from kylin_on_parquet_v2_spark.session import get_spark, register_views

spark = get_spark("r14-layout-steps")
spark.sparkContext.setLogLevel("ERROR")
register_views(spark, sf_dir)

SPANS: dict[str, float] = defaultdict(float)
COUNTS: dict[str, int] = defaultdict(int)


def timed(label, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        SPANS[label] += time.perf_counter() - t0
        COUNTS[label] += 1
        return out

    return wrap


B.CubeBuilder._agg_from_flat = timed("agg_from_flat", B.CubeBuilder._agg_from_flat)
B.CubeBuilder._agg_from_parent = timed("agg_from_parent", B.CubeBuilder._agg_from_parent)
B.CubeBuilder._write_layout = timed("write_layout", B.CubeBuilder._write_layout)
B._parquet_rows = timed("parquet_rows", B._parquet_rows)
B.CubeBuilder._flat_with_segment = timed("flat_with_segment", B.CubeBuilder._flat_with_segment)
B.CubeBuilder._prepare_measure_bases = timed("prepare_measure_bases", B.CubeBuilder._prepare_measure_bases)
B.CubeBuilder._measure_key_nullability = timed("measure_key_nullability", B.CubeBuilder._measure_key_nullability)

# split write_layout into plan-side (pre-action) vs the parquet action
_orig_parquet = None


def main() -> None:
    B.CubeBuilder.build_parallelism = int(os.environ.get("SPARK_GRAFT_BUILD_PAR", "1"))
    store = "/tmp/r14_layout_steps_store"
    shutil.rmtree(store, ignore_errors=True)
    b = B.CubeBuilder(spark, TPCH_MODEL, TPCH_CUBE, store)
    t0 = time.perf_counter()
    inst = b.build()
    wall = time.perf_counter() - t0
    print(f"\nbuild wall {wall:.2f}s layouts={len(inst.layouts)} par={B.CubeBuilder.build_parallelism}")
    for k in sorted(SPANS, key=lambda k: -SPANS[k]):
        print(f"  {SPANS[k]:8.2f}s  n={COUNTS[k]:3d}  avg={SPANS[k]/max(COUNTS[k],1):6.3f}s  {k}")
    acc = sum(SPANS.values())
    print(f"  {acc:8.2f}s  accounted ({100*acc/wall:.0f}% of wall)")


if __name__ == "__main__":
    main()
