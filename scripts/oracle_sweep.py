"""Full oracle sweep: run every __spark_entry__ query at a given sf dir and
compare against its DuckDB oracle with the driver-calibrated canonicalizer
(tests/oracle_utils.assert_same). Rows-only queries (no oracle entry) are
executed and counted. Prints one status line per query and a summary.

Usage: python scripts/oracle_sweep.py [/root/testdata/sf0.01] [name-substr ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    name_filters = args[1:] if args and os.path.isdir(args[0]) else args

    import duckdb

    import __spark_entry__ as entry_mod
    from kylin_on_parquet_v2_spark.session import SOURCE_TABLES, get_spark
    from tests.oracle_utils import assert_same

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in SOURCE_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [
        n
        for n in queries
        if not name_filters or any(f in n for f in name_filters)
    ]
    ok = bad = rows_only = 0
    failures: list[str] = []
    t_start = time.perf_counter()
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                assert_same(df, con, oracles[name], name)
                ok += 1
                status = "ok"
            else:
                n = df.count()
                rows_only += 1
                status = f"rows_only({n})"
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            bad += 1
            status = f"FAIL: {type(exc).__name__}: {str(exc)[:200]}"
            failures.append(name)
            traceback.print_exc(limit=3)
        dt = time.perf_counter() - t0
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
    total = time.perf_counter() - t_start
    print(
        f"\nSWEEP {sf_dir}: {ok} oracle-ok, {rows_only} rows-only, "
        f"{bad} FAILED in {total:.0f}s"
    )
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
