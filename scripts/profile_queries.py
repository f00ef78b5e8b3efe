"""Per-query profiler for the optimization rounds (guide §1): times each
named query against the noop sink on $SPARK_GRAFT_SF_DIR, and can capture
`.explain("formatted")` into plans/r<N>/<query>_<tag>.txt.

Usage:
  python scripts/profile_queries.py [--plans TAG] [--repeats N] name [name ...]
  python scripts/profile_queries.py --all            # every query, 1 pass

Timing methodology matches bench.py (build fn -> noop write, perf_counter
around both), but cube-build fixtures are paid before timing, exactly like
the bench. /proc/stat steal brackets are printed so numbers can be trusted.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS_DIR = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))


def read_steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None, help="capture plans with this tag")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-build", action="store_true", help="skip cube-build warmup")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from kylin_on_parquet_v2_spark.session import get_spark, register_views

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    qfns = entry_mod.queries()
    names = list(qfns) if args.all else args.names
    unknown = [n for n in names if n not in qfns]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.no_build:
        from kylin_on_parquet_v2_spark.corpus.cube_routed import _bucketed_engine
        from kylin_on_parquet_v2_spark.corpus.measures import _kll_engine
        from kylin_on_parquet_v2_spark.corpus.ssb import ssb_engine
        from kylin_on_parquet_v2_spark.corpus.streaming_corpus import _hybrid_engine

        t0 = time.perf_counter()
        for fn in (entry_mod._engine, _hybrid_engine, _bucketed_engine, _kll_engine, ssb_engine):
            fn(spark, sf_dir)
        for wdf in register_views(spark, sf_dir).values():
            wdf.count()
        print(f"[build+warm {time.perf_counter() - t0:.1f}s]", flush=True)

    s0, t0c = read_steal()
    results: dict[str, list[float]] = {n: [] for n in names}
    njobs: dict[str, int] = {}
    for rep in range(args.repeats):
        for name in names:
            group = f"profile:{name}:{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qfns[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[name].append(dt)
            njobs[name] = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            if args.plans and rep == 0:
                os.makedirs(PLANS_DIR, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w"
                ) as f:
                    f.write(plan)
            spark.sparkContext.setJobDescription(None)
    s1, t1c = read_steal()
    steal_pct = 100.0 * (s1 - s0) / max(t1c - t0c, 1)

    import statistics

    print(f"\nsf={sf_dir} repeats={args.repeats} steal={steal_pct:.2f}%")
    total = 0.0
    for name in names:
        med = statistics.median(results[name])
        total += med
        print(
            f"{med:8.3f}  min={min(results[name]):7.3f}  jobs={njobs[name]:3d}  {name} "
            f"{[round(x, 3) for x in results[name]]}"
        )
    print(f"{total:8.3f}  TOTAL (median sum)")


if __name__ == "__main__":
    main()
