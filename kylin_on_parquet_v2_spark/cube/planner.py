"""Cube planner: query-stats-driven cuboid recommendation.

Reference parity: ``core-cube/.../cuboid/algorithm/`` — CuboidRecommender
runs a GreedyAlgorithm over a BenefitPolicy, and ``BPUSCalculator.java``
implements *benefit per unit space*: a candidate's benefit is the total
aggregation-cost saving it brings to the workload divided by its row
count, picked greedily until the space budget is spent. This is the
classic greedy of Harinarayan, Rajaraman & Ullman, "Implementing Data
Cubes Efficiently" (SIGMOD '96), which carries a (1 - 1/e) optimality
guarantee; the reference's PBPUS variant weighs cuboids by query
probability — recording real query frequencies (what OlapEngine does)
is exactly that weighting.

Pure metadata computation: lattices are capped at 2^20 by the scheduler
and workloads are counters, so the planner never touches Spark — it can
run on a driver against 100 TB cube stats unchanged.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from kylin_on_parquet_v2_spark.cube.cuboid import CuboidScheduler


def estimate_cuboid_rows(
    dims: Iterable[str], base_rows: int, ndv: Mapping[str, int]
) -> int:
    """HRU size estimate for an unbuilt cuboid: the product of the dim
    NDVs, capped by the parent row count (a cuboid can never have more
    rows than the base). Correlated dims make the product an
    overestimate — fine for planning: overestimating size only makes the
    greedy more conservative about wide cuboids."""
    est = 1
    for d in dims:
        est *= max(1, int(ndv.get(d, base_rows)))
        if est >= base_rows:
            return base_rows
    return est


def recommend_cuboids(
    scheduler: CuboidScheduler,
    workload: Mapping[frozenset[str], int],
    rows: Mapping[int, int],
    budget_rows: int | None = None,
    max_cuboids: int | None = None,
) -> list[int]:
    """BPUS greedy: pick the cuboids (beyond the always-kept base and
    grand-total) that minimize workload cost under a row budget.

    ``workload`` maps needed-dim-sets to hit counts (OlapEngine records
    them per query); sets not coverable by the lattice are ignored (they
    can never route). ``rows`` maps cuboid_id -> measured or estimated
    row count; candidates without a size are skipped (unknown space).
    Cost model matches the router's: a query costs the rows of the
    cheapest selected cuboid covering it, initially the base cuboid.

    Returns selected cuboid ids sorted by dim count then id (base and
    grand-total first, then picks in greedy order).
    """
    all_ids = set(scheduler.cuboids)
    base_id = max(all_ids, key=lambda i: scheduler.cuboids[i].n_dims)
    zero_id = min(all_ids, key=lambda i: scheduler.cuboids[i].n_dims)
    base_rows = rows.get(base_id)
    if base_rows is None:
        raise ValueError("base cuboid size is required (measure or estimate it)")

    dims_of = {i: frozenset(scheduler.cuboids[i].dims) for i in all_ids}
    queries: list[tuple[frozenset[str], int]] = [
        (q, n)
        for q, n in workload.items()
        if any(q <= dims_of[i] for i in all_ids)
    ]
    selected = {base_id, zero_id}
    # current serving cost per query (base serves everything; the 0-dim
    # grand total serves the empty set for free)
    cost = {
        q: (rows.get(zero_id, 1) if not q else base_rows) for q, _ in queries
    }
    budget_left = None
    if budget_rows is not None:
        budget_left = budget_rows - sum(rows.get(i, 0) for i in selected)

    candidates = [
        i for i in all_ids - selected if rows.get(i) is not None
    ]
    picks: list[int] = []
    while candidates:
        if max_cuboids is not None and len(picks) >= max_cuboids:
            break
        best, best_bpus, best_saving = None, 0.0, 0.0
        for i in candidates:
            if budget_left is not None and rows[i] > budget_left:
                continue
            saving = 0.0
            for q, n in queries:
                if q <= dims_of[i] and cost[q] > rows[i]:
                    saving += n * (cost[q] - rows[i])
            if saving <= 0:
                continue
            bpus = saving / max(1, rows[i])
            if bpus > best_bpus:
                best, best_bpus, best_saving = i, bpus, saving
        if best is None:
            break
        picks.append(best)
        selected.add(best)
        candidates.remove(best)
        if budget_left is not None:
            budget_left -= rows[best]
        for q, _ in queries:
            if q <= dims_of[best] and cost[q] > rows[best]:
                cost[q] = rows[best]
    return sorted(selected, key=lambda i: (scheduler.cuboids[i].n_dims, i))
