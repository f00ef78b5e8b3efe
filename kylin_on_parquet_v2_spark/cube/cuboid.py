"""Cuboid lattice enumeration and spanning tree.

Reference parity: ``core-cube/.../cube/cuboid/Cuboid.java`` (a cuboid is a
dimension-subset bitmask) and ``DefaultCuboidScheduler.java`` (lattice walk,
``findBestMatchCuboid`` :93-120 — best match = smallest valid superset;
parent selection for layered builds mirrors
``kylin-spark-engine/.../job/ParentSourceChooser.scala:54-88`` — build each
cuboid from the smallest existing parent layout, else the flat table).

Pure Python — the lattice is metadata-sized (dozens of cuboids), never data.
"""

from __future__ import annotations

from dataclasses import dataclass

from kylin_on_parquet_v2_spark.metadata.cube import CubeDesc


@dataclass(frozen=True)
class Cuboid:
    """A dimension subset of the cube, identified by bitmask over
    ``cube.dimensions`` order (bit i == dimensions[i] present)."""

    cube_name: str
    dims: tuple[str, ...]  # in cube-dimension declaration order
    cuboid_id: int

    @property
    def n_dims(self) -> int:
        return len(self.dims)

    def covers(self, needed: frozenset[str]) -> bool:
        return needed <= set(self.dims)


class CuboidScheduler:
    """Enumerates the pruned cuboid set and answers best-match queries."""

    def __init__(self, cube: CubeDesc):
        self.cube = cube
        self._order = {d: i for i, d in enumerate(cube.dimensions)}
        self.cuboids: dict[int, Cuboid] = {}
        for dims in self._enumerate():
            c = self._make(dims)
            self.cuboids[c.cuboid_id] = c
        if cube.cuboid_ids is not None:
            # planner-pruned lattice (CuboidRecommender output applied):
            # keep only the recommended ids, plus the base cuboid (fallback
            # realization — every query stays coverable) and the 0-dim
            # grand total
            base_id = sum(1 << i for i in range(len(cube.dimensions)))
            keep = set(cube.cuboid_ids) | {base_id, 0}
            self.cuboids = {i: c for i, c in self.cuboids.items() if i in keep}

    # -- enumeration ---------------------------------------------------------

    def _make(self, dims: frozenset[str]) -> Cuboid:
        ordered = tuple(sorted(dims, key=self._order.__getitem__))
        cid = sum(1 << self._order[d] for d in dims)
        return Cuboid(self.cube.name, ordered, cid)

    def _enumerate(self) -> set[frozenset[str]]:
        """All dim subsets valid under at least one aggregation group, plus
        the base cuboid (all dimensions), which always exists (reference:
        base cuboid is the spanning-tree root and the fallback realization),
        plus the 0-dim grand-total cuboid (one row; answers global
        aggregates with zero scan and anchors global stored-TopN lists)."""
        valid: set[frozenset[str]] = {frozenset(self.cube.dimensions), frozenset()}
        for group in self.cube.groups():
            members = list(group.includes)
            n = len(members)
            if n > 20:
                raise ValueError(
                    f"aggregation group too wide ({n} dims) — split it; the "
                    "lattice is 2^n and must stay metadata-sized"
                )
            for mask in range(1 << n):
                dims = frozenset(members[i] for i in range(n) if mask >> i & 1)
                if group.valid(dims):
                    valid.add(dims)
        return valid

    # -- routing / build-order queries --------------------------------------

    def find_best_match(
        self, needed: frozenset[str], rows: dict[int, int] | None = None
    ) -> Cuboid | None:
        """Cheapest cuboid whose dims cover ``needed`` — by measured layout
        ROW COUNT when available (the real scan cost; a 2-dim cuboid over
        correlated dims can hold more rows than a 3-dim one), else fewest
        dims, then lowest id for determinism — reference
        ``findBestMatchCuboid`` + the Cuboid cost model."""
        candidates = [c for c in self.cuboids.values() if c.covers(needed)]
        if not candidates:
            return None

        def cost(c: Cuboid) -> tuple:
            # missing metadata (absent key) = unknown -> sorts last, falls
            # back to dim count; a MEASURED 0 rows is the cheapest possible
            # scan and must sort FIRST, not behind every populated layout
            r = (rows or {}).get(c.cuboid_id)
            return (float("inf") if r is None else r, c.n_dims, c.cuboid_id)

        return min(candidates, key=cost)

    def spanning_tree(self) -> list[tuple[Cuboid, Cuboid | None]]:
        """(cuboid, parent) pairs in build order (parents first).

        Parent = the smallest already-scheduled strict superset; None means
        build from the flat table. Layer-by-layer BFS like
        ``CubeBuildJob.build/buildLayer`` (CubeBuildJob.java:185-266).
        """
        by_size = sorted(self.cuboids.values(), key=lambda c: (-c.n_dims, c.cuboid_id))
        out: list[tuple[Cuboid, Cuboid | None]] = []
        seen: list[Cuboid] = []
        for c in by_size:
            dims = set(c.dims)
            parents = [p for p in seen if dims < set(p.dims)]
            parent = min(parents, key=lambda p: (p.n_dims, p.cuboid_id)) if parents else None
            out.append((c, parent))
            seen.append(c)
        return out
