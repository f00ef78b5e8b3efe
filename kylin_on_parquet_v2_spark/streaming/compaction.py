"""Realtime fragment compaction: merge a streaming store's accumulated
per-micro-batch Parquet files into size-targeted files, per partition dir.

Reference parity: ``stream-core/.../storage/columnar/FragmentFilesMerger.java:73``
(``merge(fragmentList)`` rewrites a segment's accumulated realtime fragments
into one bigger fragment inside a working directory, then swaps it in;
tested in ``FragmentFilesMergerTest.java:58``) and the fragment-count
trigger in the reference's compaction scheduling. Our realtime stores are
Hive-partitioned Parquet dirs appended once per micro-batch
(``streaming/segments.py::ingest_stream``, ``pipeline/decontam.py``'s
epoch-keyed gate), so a long-running stream accumulates one file set per
micro-batch — the classic small-files cliff at 100 TB: directory listing
cost plus one scan task per tiny file on every tail read.

Design:

- **Per partition dir, never across.** Compaction rewrites files WITHIN one
  ``__segment__=``/``__epoch=`` dir, so the partition layout — and with it
  segment-boundary pruning and the epoch-keyed replay idempotence contract
  (a replayed epoch dynamic-overwrites exactly its own dir) — survives
  verbatim.
- **Size-targeted, not coalesce(1).** Output file count = dir bytes /
  ``target_file_bytes`` (the same rule the batch segment merge uses):
  ~128 MB files keep one scan task per file downstream and never funnel a
  big segment through one task into a >2 GB file.
- **Write-then-swap, crash-repairable.** The compacted files are staged
  next to the live dir, a swap sentinel marks the staged bytes
  authoritative, and the swap is two fs metadata ops (rmtree + rename) —
  the same protocol as ``cube/merge.py``'s layout merge, including the
  finish-the-swap repair on rerun after a crash.
- **Concurrent-append safe.** The newest partition (still receiving
  appends) is skipped by default, and the file listing is re-checked after
  staging: if a micro-batch appended to the dir mid-compaction, the swap is
  aborted and the staging discarded (the next maintenance cycle retries) —
  compaction never deletes bytes it did not rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from kylin_on_parquet_v2_spark import fs as FS
from kylin_on_parquet_v2_spark.streaming.segments import SEGMENT_COL

#: same target as cube/merge.py — Spark's default maxPartitionBytes, one
#: scan task per compacted file downstream
TARGET_FILE_BYTES = 128 * 1024 * 1024

_STAGING_PREFIX = "_compacting_"


def _data_files(fs, d: str) -> list[str]:
    """Parquet data files directly under a partition dir (no dotfiles /
    '_'-prefixed sidecars / subdirs)."""
    out = []
    for name in fs.listdir(d):
        if name.startswith((".", "_")):
            continue
        if not fs.isdir(os.path.join(d, name)):
            out.append(name)
    return sorted(out)


def _repair_crashed_swap(fs, final_dir: str, staging: str, sentinel: str) -> bool:
    """Finish a swap a previous run staged but died mid-way through (the
    merge-swap repair): once the sentinel exists the staged bytes are the
    dir's truth. Returns True when a repair happened."""
    if not fs.exists(sentinel):
        return False
    if fs.exists(staging):
        if fs.exists(final_dir):
            fs.rmtree(final_dir)
        fs.rename(staging, final_dir)
    fs.remove(sentinel)
    return True


def compact_fragments(
    spark: SparkSession,
    store_dir: str,
    *,
    target_file_bytes: int = TARGET_FILE_BYTES,
    max_fragments: int | None = None,
    partition_col: str = SEGMENT_COL,
    skip_newest: bool = True,
    sort_col: str | None = "ts",
    bloom_cols: dict[str, int | None] | None = None,
    _pre_swap_hook=None,
) -> dict[str, tuple[int, int]]:
    """Compact every eligible ``partition_col=value`` dir under
    ``store_dir``; returns {partition value: (files before, files after)}
    for the dirs actually rewritten.

    ``max_fragments``: when set, only dirs with MORE than this many data
    files are compacted (the reference's fragment-count trigger —
    maintenance calls pass it so a freshly compacted store is a no-op);
    when None, any dir whose file count exceeds its size-derived target is
    rewritten. ``skip_newest`` leaves the max partition value alone — for
    segment stores that is the dir the stream is actively appending to
    (the reference never merges the building fragment either). Epoch-keyed
    stores (``partition_col='__epoch'``) keep their replay idempotence: a
    replayed epoch's dynamic overwrite replaces the whole (compacted) dir,
    exactly as it replaced the fragmented one.

    ``sort_col``: order rows within each compacted file by this column when
    the store carries it (default the event-time column) — task-local sort,
    no extra shuffle, and boundary-filtered tail scans skip row groups via
    parquet min/max stats.

    ``bloom_cols``: {column: expected ndv or None} — write parquet bloom
    filters on these columns in the compacted files (reference intent: the
    fragment inverted index, stream-core/.../storage/columnar/
    invertindex/*), so point lookups on high-cardinality non-sort columns
    skip row groups the min/max stats cannot.

    ``_pre_swap_hook(part_dir)`` is a test seam invoked between staging and
    the concurrent-append listing check.
    """
    fs = FS.fs_for(store_dir, spark)
    if not fs.exists(store_dir):
        return {}
    prefix = f"{partition_col}="
    parts = sorted(n for n in fs.listdir(store_dir) if n.startswith(prefix))
    if skip_newest and parts:
        parts = parts[:-1]
    out: dict[str, tuple[int, int]] = {}
    for part in parts:
        part_dir = os.path.join(store_dir, part)
        staging = os.path.join(store_dir, _STAGING_PREFIX + part)
        sentinel = staging + ".swapping"
        if _repair_crashed_swap(fs, part_dir, staging, sentinel):
            continue
        if fs.exists(staging):  # aborted pre-sentinel attempt: stale bytes
            fs.rmtree(staging)
        files = _data_files(fs, part_dir)
        n_bytes = FS.dir_bytes(part_dir, spark)
        n_target = max(1, n_bytes // max(1, target_file_bytes))
        threshold = max_fragments if max_fragments is not None else n_target
        if len(files) <= max(threshold, n_target):
            continue
        # read EXACTLY the snapshot files (not the dir): a file appended
        # after this listing is never part of the rewrite, and the pre-swap
        # listing check below refuses to delete it
        df = spark.read.parquet(*[os.path.join(part_dir, f) for f in files])
        staged = df.repartition(n_target)
        if sort_col and sort_col in df.columns:
            # order the compacted files by event time (task-local sort, no
            # extra shuffle): the hybrid tail's strict `ts > boundary`
            # filter then skips whole row groups via parquet min/max stats
            # instead of scanning every compacted file in boundary dirs
            staged = staged.sortWithinPartitions(sort_col)
        w = staged.write.mode("overwrite")
        for bcol, ndv in (bloom_cols or {}).items():
            if bcol in df.columns:
                w = w.option(f"parquet.bloom.filter.enabled#{bcol}", "true")
                if ndv:
                    w = w.option(
                        f"parquet.bloom.filter.expected.ndv#{bcol}", str(int(ndv))
                    )
        w.parquet(staging)
        if _pre_swap_hook is not None:
            _pre_swap_hook(part_dir)
        if _data_files(fs, part_dir) != files:
            # a concurrent micro-batch appended mid-compaction: the staged
            # rewrite is incomplete — discard it, retry next cycle
            fs.rmtree(staging)
            continue
        fs.write_text(sentinel, "")
        fs.rmtree(part_dir)
        fs.rename(staging, part_dir)
        fs.remove(sentinel)
        out[part[len(prefix):]] = (len(files), len(_data_files(fs, part_dir)))
    return out


def maybe_compact(
    spark: SparkSession,
    store_dir: str,
    max_fragments: int = 8,
    **kwargs,
) -> dict[str, tuple[int, int]]:
    """Threshold-triggered compaction for maintenance loops (the
    reference's fragments-count trigger): compact only partition dirs that
    accumulated more than ``max_fragments`` micro-batch file sets.
    Idempotent — a compacted dir is below threshold until the stream
    appends past it again."""
    return compact_fragments(
        spark, store_dir, max_fragments=max_fragments, **kwargs
    )
