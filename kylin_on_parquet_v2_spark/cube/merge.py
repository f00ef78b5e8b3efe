"""Segment merge job.

Reference parity: ``kylin-spark-engine/.../job/CubeMergeJob.java`` +
``DFLayoutMergeAssist.java`` — union the layouts of adjacent segments and
re-aggregate them into one merged segment (Kylin's auto-merge keeps the
segment count bounded as real-time/daily builds accumulate).

Scale notes: merging re-aggregates layout rows (already tiny vs source
data) — one groupBy per cuboid; writes replace N small segment dirs with
one, which is also the small-files compaction path at 100 TB.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube import measures as M
from kylin_on_parquet_v2_spark.cube.build import (
    SEGMENT_COL,
    CubeInstance,
    with_shard_partition,
)


#: target parquet file size for merged segments (Spark's default
#: maxPartitionBytes — one scan task per merged file downstream)
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _segment_bytes(path: str, segments: list[str]) -> int:
    """On-disk bytes of the segment dirs being merged (upper bound on the
    merged output — re-aggregation only shrinks it)."""
    total = 0
    for seg in segments:
        seg_dir = os.path.join(path, f"{SEGMENT_COL}={seg}")
        if os.path.isdir(seg_dir):
            for root, _dirs, files in os.walk(seg_dir):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def merge_segments(
    spark: SparkSession,
    inst: CubeInstance,
    segments: list[str],
    new_segment: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> None:
    """Merge ``segments`` of every cuboid layout into ``new_segment``.

    The merged rows are the re-aggregation of the input segments' rows
    (COUNT->SUM, sketch-union, min/min, max/max — same rules as building a
    child layout from its parent).

    The merged segment is written with a size-based repartition (input
    bytes / target_file_bytes), NOT coalesce(1): a merged segment of a big
    cube at scale must not funnel through one task into one >2 GB file —
    merging is the small-files *compaction* path, and ~128 MB files keep
    one scan task per file downstream.
    """
    if not inst.segmented:
        raise ValueError("cube is not segmented; nothing to merge")
    if not segments:
        raise ValueError("no segments given")

    for cuboid_id, path in inst.layouts.items():
        cuboid = inst.scheduler.cuboids[cuboid_id]
        df = spark.read.parquet(path).filter(F.col(SEGMENT_COL).isin(segments))
        aggs = []
        for m in inst.desc.measures:
            if m.name not in df.columns:
                continue
            c = M.reagg_from_layout(m, df.schema)
            if c is not None:
                aggs.append(c)
        keys = list(cuboid.dims)
        merged = df.groupBy(*keys).agg(*aggs) if aggs else df.select(*keys).dropDuplicates()
        n_files = max(1, _segment_bytes(path, segments) // max(1, target_file_bytes))
        # Re-apply the shard partition dirs the original layout write used:
        # the merged segment must keep the same partition-directory depth
        # (and shard co-location) as unmerged segments under this root.
        merged, parts = with_shard_partition(merged, inst.desc)
        # stage the merged segment, then atomically swap the old dirs out
        staging = os.path.join(path, f"_staging_{SEGMENT_COL}={new_segment}")
        if parts:
            writer = merged.repartition(n_files, *[F.col(c) for c in parts])
            writer.write.mode("overwrite").partitionBy(*parts).parquet(staging)
        else:
            merged.repartition(n_files).write.mode("overwrite").parquet(staging)
        for seg in segments:
            seg_dir = os.path.join(path, f"{SEGMENT_COL}={seg}")
            if os.path.exists(seg_dir):
                shutil.rmtree(seg_dir)
        final = os.path.join(path, f"{SEGMENT_COL}={new_segment}")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(staging, final)
