"""KLL-style mergeable quantile sketch measure (round-6 verdict item 7).

Reference parity: the reference's percentile measure stores a t-digest
(``measure/percentile/PercentileCounter.java`` wrapping t-digest; UDAF at
``SparderAggFun.scala:39-180``) — a *mergeable* summary whose accuracy is
relative to RANK, not value range. The repo's routed default stays the
fixed-bin histogram (``measures.hist_*`` — DuckDB-oracle-able); this module
adds the rank-accurate alternative for heavy-tailed columns where a
declared [lo,hi] equi-width grid wastes all its bins on the bulk: returntype
``kll(k)`` on a PERCENTILE_APPROX measure.

Design (KLL compactor levels, deterministic variant):

- state = weighted sample {(v, w)} with w = 2^level, ENCODED as a flat
  ``array<double>`` of [v0,w0,v1,w1,...] pairs (one column, parquet- and
  Arrow-friendly; weights are exact powers of two, lossless as doubles far
  beyond any realistic level).
- insert  = items at level 0 (w=1)
- compact = lowest level holding >= 2 items: sort, promote one item of each
  pair to the next level (its weight doubles, total weight preserved), odd
  leftover stays. The in-pair pick alternates by level parity instead of a
  coin flip — DETERMINISTIC (bit-identical across runs/partitions given the
  same inputs; the randomized pick's unbiasedness is traded for
  reproducibility, same trade the histogram makes).
- merge   = concat pair lists, re-compact. Associative + commutative up to
  the deterministic compaction order — the builder only merges along the
  spanning tree, so layouts are reproducible.
- quantile(q) = smallest v whose cumulative weight reaches q * W.

Scale shape: the base-cuboid build is TWO-PHASE (``kll_build_two_phase``):
phase 1 groups by (dims, spark_partition_id) so the collect_list buffer
holds at most ONE input partition's rows for a group — bounded by
``spark.sql.files.maxPartitionBytes``, never the whole group (the
reference's t-digest UDAF streams inserts for the same reason,
``SparderAggFun.scala:39-180``); phase 2 merges the per-partition partial
sketches at the target grain, moving only ~k-sized states. Child layouts
and query-time re-aggregation merge stored sketches the same way
(Arrow-batched pandas UDFs, never per-row Python). Rank error ~O(1/k) at
the sizes the tolerance tests pin.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from kylin_on_parquet_v2_spark.metadata.cube import FunctionDesc


def kll_spec(func: FunctionDesc) -> int | None:
    """Parse returntype ``kll(k)`` -> k (sketch size parameter)."""
    rt = func.returntype or ""
    if rt.startswith("kll(") and rt.endswith(")"):
        try:
            return max(8, int(rt[4:-1]))
        except ValueError:
            pass
    return None


# -- pure-numpy sketch core ---------------------------------------------------


def _compress(vals: np.ndarray, ws: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compact a weighted sample to <= ~3k items, preserving total weight."""
    cap_total = max(3 * k, 6)
    if len(vals) <= cap_total:
        return vals, ws
    levels: dict[int, list] = {}
    for v, w in zip(vals.tolist(), ws.tolist()):
        l = int(w).bit_length() - 1
        levels.setdefault(l, []).append(v)
    total = sum(len(b) for b in levels.values())
    while total > cap_total:
        ls = sorted(l for l, b in levels.items() if len(b) >= 2)
        if not ls:
            break
        l = ls[0]
        buf = sorted(levels.pop(l))
        n = len(buf)
        even = n - (n % 2)
        promoted = buf[(l & 1) : even : 2]
        if n % 2:
            levels.setdefault(l, []).append(buf[-1])
        levels.setdefault(l + 1, []).extend(promoted)
        total = sum(len(b) for b in levels.values())
    out_v: list[float] = []
    out_w: list[float] = []
    for l, b in levels.items():
        out_v.extend(b)
        out_w.extend([float(1 << l)] * len(b))
    return np.asarray(out_v, dtype=np.float64), np.asarray(out_w, dtype=np.float64)


def _encode(vals: np.ndarray, ws: np.ndarray) -> list:
    out = np.empty(2 * len(vals), dtype=np.float64)
    out[0::2] = vals
    out[1::2] = ws
    return out.tolist()


def _decode(state) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(state, dtype=np.float64)
    return a[0::2], a[1::2]


def sketch_from_values(values: np.ndarray, k: int) -> list:
    values = values[~np.isnan(values)]
    v, w = _compress(values, np.ones(len(values)), k)
    return _encode(v, w)


def merge_sketches(states, k: int) -> list:
    vs, ws = [], []
    for s in states:
        if s is None or len(s) == 0:
            continue
        v, w = _decode(s)
        vs.append(v)
        ws.append(w)
    if not vs:
        return []
    v, w = _compress(np.concatenate(vs), np.concatenate(ws), k)
    return _encode(v, w)


def sketch_quantile(state, q: float) -> float | None:
    if state is None or len(state) == 0:
        return None
    v, w = _decode(state)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    target = q * cum[-1]
    idx = int(np.searchsorted(cum, target, side="left"))
    return float(v[min(idx, len(v) - 1)])


# -- Spark columns (Arrow-batched pandas UDFs) --------------------------------


@lru_cache(maxsize=None)
def _udfs(k: int):
    from pyspark.sql.functions import pandas_udf

    ret = ArrayType(DoubleType())

    @pandas_udf(ret)
    def compress_list(col: pd.Series) -> pd.Series:
        return col.map(
            lambda xs: sketch_from_values(
                np.asarray([] if xs is None else xs, dtype=np.float64), k
            )
        )

    @pandas_udf(ret)
    def merge_list(col: pd.Series) -> pd.Series:
        return col.map(lambda states: merge_sketches([] if states is None else states, k))

    @pandas_udf(DoubleType())
    def quantile(col: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series(
            [sketch_quantile(s, float(qq)) for s, qq in zip(col, q)],
            dtype="float64",
        )

    return compress_list, merge_list, quantile


def kll_build(func: FunctionDesc, name: str) -> Column:
    """Build partial: collect a sub-group's raw values, compress to one
    sketch in a single Arrow batch pass.  The collect_list here is only
    bounded when the surrounding groupBy includes a partition-local salt —
    use :func:`kll_build_two_phase` for any grouping whose groups can exceed
    one input partition (the base cuboid, hybrid tails)."""
    k = kll_spec(func)
    compress_list, _, _ = _udfs(k)
    return compress_list(F.collect_list(F.col(func.parameter).cast("double"))).alias(name)


#: phase-1 salt column; dropped by the phase-2 merge grouping
_PID_COL = "__kll_pid__"


#: max sketches any single merge buffer may collect; above this an extra
#: tree level caps the fan-in (a 100k-partition scan would otherwise hand
#: the final merge 100k × O(k) states per finest-grain group)
_MERGE_FANIN = 64


def kll_build_two_phase(df, keys: list, pairs: list, fanin: int = _MERGE_FANIN) -> "DataFrame":
    """Per-group sketches over ``df`` at grain ``keys`` without ever
    materializing a whole group.

    Phase 1 groups by (keys, spark_partition_id): with partial aggregation
    each (group, partition) buffer holds only that input partition's rows —
    bounded by the scan split size, independent of group cardinality (the
    skewed-finest-grain case a rank sketch exists for).  Phase 2 merges the
    per-partition partial sketches at the target grain; each input is a
    ~3k-item compressed state.  When the scan has more than ``fanin``
    partitions, an intermediate TREE level first merges within
    (keys, pid % fanin) — every merge buffer then holds at most
    max(fanin, #partitions/fanin) sketches, never #partitions of them.
    Merge is associative and deterministic (compaction order fixed), and
    parquet split planning is stable, so rebuilds stay bit-identical.

    ``pairs`` is ``[(FunctionDesc, out_name), ...]`` — one sketch column per
    KLL measure, all computed in the same aggregation passes.
    """
    pid = F.spark_partition_id().alias(_PID_COL)
    partial_aggs = [kll_build(f, n) for f, n in pairs]
    partials = df.groupBy(*keys, pid).agg(*partial_aggs)
    merge_aggs = [kll_reagg(f, n) for f, n in pairs]
    if df.rdd.getNumPartitions() > fanin:  # plan-time fact, no Spark job
        mid = F.pmod(F.col(_PID_COL), F.lit(fanin)).alias(_PID_COL)
        partials = partials.groupBy(*keys, mid).agg(*merge_aggs)
    return (partials.groupBy(*keys) if keys else partials.groupBy()).agg(*merge_aggs)


def kll_reagg(func: FunctionDesc, name: str) -> Column:
    """Re-aggregate stored sketches (child layouts / coarser query grain /
    segment merge): concat + re-compact — total weight preserved.

    Buffer bound: the collect gathers one O(k) state per INPUT ROW of the
    group. At build time the two-phase tree caps that at the fan-in; at
    query time the inputs are layout rows, and the router's cost rule
    (fewest layout rows scanned) points coarse queries at coarse layouts,
    so the per-group row count stays dimension-cardinality-sized, not
    fact-sized."""
    k = kll_spec(func)
    _, merge_list, _ = _udfs(k)
    return merge_list(F.collect_list(name)).alias(name)


def kll_percentile(func: FunctionDesc, col: Column, q: float) -> Column:
    _, _, quantile = _udfs(kll_spec(func))
    return quantile(col, F.lit(float(q)))
