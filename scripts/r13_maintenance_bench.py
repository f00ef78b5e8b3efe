"""r13 maintenance-surface measurements (VERDICT r12 next-round item 5).

Two claims measured, with /proc/stat steal brackets (the r11/r12 bench
discipline — this host is a shared VM):

1. **Connected components, pathological diameter** (item 1's before/after):
   the r12 min-label propagation needs DIAMETER rounds, so its default
   20-round budget silently SPLIT any deeper component; the r13 alternating
   large-star/small-star contraction needs ~log(n) rounds. Fixture: a
   D-node chain (diameter D-1, the worst case per node count) plus disjoint
   background pairs. The old implementation is reproduced verbatim below
   (from git history) for the timing/correctness comparison.

2. **Bucketed segment refresh vs history depth** (r12 claim: cost is one
   segment's share of a build, independent of accumulated history). Build
   the same bucketed cube with N and 10N day-segments, refresh ONE segment
   in each, compare wall-clock.

Usage: python scripts/r13_maintenance_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal_jiffies() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def minlabel_clusters_r12(pairs, id_col="doc_id", max_iterations=20):
    """The r12 implementation, reproduced for the before/after (min-label
    propagation; silently returns whatever labels exist at the cap)."""
    from pyspark.sql import functions as F

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("nmin")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("old_label"), F.coalesce(F.col("nlabel"), F.col("old_label"))
                ).alias("label"),
                F.col("old_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id")), rounds


def cc_fixture(spark, chain_len: int, background_pairs: int):
    rows = [(i, i + 1) for i in range(chain_len - 1)]
    base = 10**6
    rows += [(base + 2 * j, base + 2 * j + 1) for j in range(background_pairs)]
    return spark.createDataFrame(rows, ["doc_a", "doc_b"])


def bench_cc(spark, out: dict) -> None:
    from kylin_on_parquet_v2_spark.pipeline import dedup as D

    for chain_len in (200, 2000):
        pairs = cc_fixture(spark, chain_len, background_pairs=2000)
        key = f"cc_chain_{chain_len}"

        t = time.perf_counter()
        new_rows = D.duplicate_clusters(None, pairs=pairs).collect()
        t_new = time.perf_counter() - t
        chain_labels = {r["cluster_id"] for r in new_rows if r["doc_id"] < 10**6}
        new_exact = chain_labels == {0}

        # OLD implementation at its r12 default budget (20 rounds): shows
        # the silent split and gives a per-round cost
        t = time.perf_counter()
        old_df, _ = minlabel_clusters_r12(pairs, max_iterations=20)
        old_rows = old_df.collect()
        t_old_capped = time.perf_counter() - t
        old_chain_labels = {
            r["cluster_id"] for r in old_rows if r["doc_id"] < 10**6
        }
        out[key] = {
            "chain_diameter": chain_len - 1,
            "new_star_contraction_sec": round(t_new, 2),
            "new_exact": new_exact,
            "old_minlabel_20rounds_sec": round(t_old_capped, 2),
            "old_split_labels_at_default_cap": len(old_chain_labels),
        }
        if chain_len <= 200:
            # honest measured wall-clock to convergence (diameter rounds);
            # at 2000 this is ~10 minutes, so the larger size EXTRAPOLATES
            # from the capped run's per-round cost instead
            t = time.perf_counter()
            conv_df, rounds_full = minlabel_clusters_r12(
                pairs, max_iterations=chain_len + 5
            )
            conv_rows = conv_df.collect()
            t_old_full = time.perf_counter() - t
            out[key]["old_minlabel_to_convergence_sec"] = round(t_old_full, 2)
            out[key]["old_rounds_to_convergence"] = rounds_full
            out[key]["old_converged_exact"] = {
                r["cluster_id"] for r in conv_rows if r["doc_id"] < 10**6
            } == {0}
            out[key]["speedup_at_convergence"] = round(t_old_full / t_new, 1)
        else:
            per_round = t_old_capped / 20
            est = per_round * (chain_len - 1)
            out[key]["old_minlabel_to_convergence_sec_estimated"] = round(est, 1)
            out[key]["speedup_at_convergence_estimated"] = round(est / t_new, 1)
        print(key, out[key], file=sys.stderr)


def bench_bucket_refresh(spark, out: dict) -> None:
    import datetime as dt
    import shutil

    from kylin_on_parquet_v2_spark.metadata import (
        CubeDesc,
        DataModel,
        FunctionDesc,
        MeasureDesc,
    )
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    def rows(n_days: int, late: bool):
        o = [
            (k % 50, dt.date(2024, 1, 1) + dt.timedelta(days=day), float(k + day))
            for day in range(n_days)
            for k in range(1500)
        ]
        if late:
            o.append((77, dt.date(2024, 1, 2), 999.0))
        return o

    for n_days in (6, 60):
        store = f"/tmp/r13_bucket_refresh_{n_days}"
        shutil.rmtree(store, ignore_errors=True)
        spark.createDataFrame(
            rows(n_days, False), "sk long, d date, v double"
        ).createOrReplaceTempView("rb_fact")
        eng = OlapEngine(spark, storage_dir=store)
        eng.add_model(
            DataModel(name="rb_star", fact_table="rb_fact", partition_column="d")
        )
        t = time.perf_counter()
        eng.build_cube(
            CubeDesc(
                name="rb_cube",
                model_name="rb_star",
                dimensions=("sk", "d"),
                measures=(
                    MeasureDesc("_count", FunctionDesc("COUNT")),
                    MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
                ),
                cuboid_ids=(3,),
                shard_by="sk",
                shard_buckets=4,
                bucket_layouts=True,
                segment_granularity="day",
            )
        )
        t_build = time.perf_counter() - t
        spark.createDataFrame(
            rows(n_days, True), "sk long, d date, v double"
        ).createOrReplaceTempView("rb_fact")
        t = time.perf_counter()
        eng.refresh_segment("rb_cube", "2024-01-02")
        t_refresh = time.perf_counter() - t
        inst = eng.cubes["rb_cube"]
        for tname in inst.layout_tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
        out[f"bucket_refresh_{n_days}segs"] = {
            "segments": n_days,
            "build_sec": round(t_build, 2),
            "refresh_one_segment_sec": round(t_refresh, 2),
        }
        print(f"bucket_refresh_{n_days}segs", out[f"bucket_refresh_{n_days}segs"],
              file=sys.stderr)
    a = out["bucket_refresh_6segs"]["refresh_one_segment_sec"]
    b = out["bucket_refresh_60segs"]["refresh_one_segment_sec"]
    out["bucket_refresh_10x_history_ratio"] = round(b / a, 2)


def main() -> None:
    from kylin_on_parquet_v2_spark.session import get_spark

    spark = get_spark("r13-maintenance-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    s0 = steal_jiffies()
    t0 = time.perf_counter()
    bench_cc(spark, out)
    bench_bucket_refresh(spark, out)
    wall = time.perf_counter() - t0
    s1 = steal_jiffies()
    ncpu = os.cpu_count() or 1
    out["steal_pct"] = round(100.0 * (s1 - s0) / (wall * 100.0 * ncpu), 2)
    out["wall_sec"] = round(wall, 1)
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r13_maintenance_bench.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
