"""Command-line SQL entry point (the reference's REST query endpoint,
``server-base/.../QueryService``, reduced to its essence: SQL in, rows out,
with transparent cube routing).

Usage:
    python -m kylin_on_parquet_v2_spark.cli "select ... from lineitem ..."
    python -m kylin_on_parquet_v2_spark.cli --explain "select ..."
    python -m kylin_on_parquet_v2_spark.cli --no-cube "select ..."  # pushdown only
    python -m kylin_on_parquet_v2_spark.cli --build-only            # build cubes, exit
    python -m kylin_on_parquet_v2_spark.cli --serve --port 7070     # REST endpoint
    python -m kylin_on_parquet_v2_spark.cli -i                      # interactive shell
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="PySpark OLAP engine SQL shell")
    p.add_argument("sql", nargs="?", help="SQL to run (omit with --build-only)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="source data directory (parquet per table)",
    )
    p.add_argument("--storage", default=None, help="cube layout storage dir")
    p.add_argument("--no-cube", action="store_true", help="pushdown only (no routing)")
    p.add_argument("--approx-distinct", action="store_true", help="allow hllc answers")
    p.add_argument("--explain", action="store_true", help="print route + physical plan")
    p.add_argument("--build-only", action="store_true", help="build cubes and exit")
    p.add_argument("--serve", action="store_true", help="start the HTTP query server")
    p.add_argument("-i", "--interactive", action="store_true", help="SQL REPL")
    p.add_argument("--port", type=int, default=7070, help="HTTP port for --serve")
    p.add_argument("-n", "--rows", type=int, default=50, help="max rows to print")
    p.add_argument(
        "--query-timeout",
        type=float,
        default=None,
        metavar="SEC",
        help="wall-time budget per query; past it the BadQueryDetector "
        "watchdog cancels the query's Spark jobs (reference "
        "kylin.query.timeout-seconds)",
    )
    args = p.parse_args(argv)

    if not args.sql and not args.build_only and not args.serve and not args.interactive:
        p.error("provide SQL, --build-only, --serve, or --interactive")

    from kylin_on_parquet_v2_spark.datasets import (
        TPCH_CUBE,
        TPCH_CUBE_SEG,
        TPCH_MODEL,
        TPCH_MODEL_SEG,
    )
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine
    from kylin_on_parquet_v2_spark.session import get_spark

    spark = get_spark("kylin-cli")
    spark.sparkContext.setLogLevel("ERROR")
    storage = args.storage or os.path.join(
        tempfile.gettempdir(),
        "kylin_cli_cubes",
        os.path.abspath(args.sf_dir).strip("/").replace("/", "_"),
    )
    eng = OlapEngine(
        spark, storage_dir=storage, query_timeout_sec=args.query_timeout
    )
    eng.register_sources(args.sf_dir)

    if not args.no_cube:
        t0 = time.perf_counter()
        eng.add_model(TPCH_MODEL)
        eng.add_model(TPCH_MODEL_SEG)
        eng.build_cube(TPCH_CUBE)
        eng.build_cube(TPCH_CUBE_SEG)
        print(f"[cubes ready in {time.perf_counter() - t0:.1f}s]", file=sys.stderr)
    if args.build_only:
        return 0
    if args.serve:
        from kylin_on_parquet_v2_spark.server import serve

        serve(eng, port=args.port)
        return 0
    if args.interactive:
        return _repl(eng, args)

    if args.explain:
        print(eng.explain(args.sql, approx_distinct=args.approx_distinct))
        return 0

    t0 = time.perf_counter()
    # tracked window: the --query-timeout watchdog can kill a runaway scan
    with eng.tracked_query(description=args.sql):
        df = eng.sql(
            args.sql, use_cube=not args.no_cube, approx_distinct=args.approx_distinct
        )
        df.show(args.rows, truncate=False)
    took = time.perf_counter() - t0
    route = eng.last_route
    via = (
        f"cuboid {route.cuboid.dims} of {route.cube}"
        if route is not None
        else "pushdown (spark.sql)"
    )
    print(f"[{took:.2f}s via {via}]", file=sys.stderr)
    return 0


def _repl(eng, args) -> int:
    """Line-oriented SQL shell: statements end with ';', 'explain <sql>;'
    prints the routing decision, 'exit;' leaves. Mirrors the reference's
    ad-hoc query console (its web UI 'Insight' tab) at terminal scale."""
    try:
        import readline  # noqa: F401 — line editing/history when available
    except ImportError:
        pass
    print("sql> ", end="", flush=True)
    buf: list[str] = []
    for line in sys.stdin:
        buf.append(line)
        if not line.rstrip().endswith(";"):
            print("...> ", end="", flush=True)
            continue
        stmt = " ".join(buf).strip().rstrip(";").strip()
        buf = []
        if stmt.lower() in ("exit", "quit"):
            return 0
        try:
            if stmt.lower().startswith("explain "):
                print(eng.explain(stmt[8:], approx_distinct=args.approx_distinct))
            elif stmt:
                t0 = time.perf_counter()
                with eng.tracked_query(description=stmt):
                    df = eng.sql(
                        stmt,
                        use_cube=not args.no_cube,
                        approx_distinct=args.approx_distinct,
                    )
                    df.show(args.rows, truncate=False)
                route = eng.last_route
                via = (
                    f"cuboid {route.cuboid.dims} of {route.cube}"
                    if route is not None
                    else "pushdown"
                )
                if len(eng.last_routes) > 1:
                    via += f" (+{len(eng.last_routes) - 1} more islands)"
                print(f"[{time.perf_counter() - t0:.2f}s via {via}]")
        except Exception as exc:  # keep the shell alive on bad SQL
            print(f"error: {str(exc).splitlines()[0] if str(exc) else exc!r}")
        print("sql> ", end="", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
