"""Pre-build cuboid statistics (CubeStatsReader / FactDistinctColumns parity).

The reference's FIRST build step scans the flat table and feeds one HLL
counter per candidate cuboid, keyed by the encoded dim tuple
(``engine-mr/.../steps/FactDistinctColumnsMapper.java`` ->
``CuboidStatCalculator``; persisted and read back by
``core-cube/.../cube/cuboid/CubeStatsReader.java:104-180``, which the cube
planner's phase 1 consumes to size unbuilt cuboids). That gives the planner
REAL correlation-aware row estimates before any layout exists — unlike the
NDV-product bound (``planner.estimate_cuboid_rows``), which overestimates
whenever dims are correlated.

Spark-first shape: ONE global aggregate with an
``approx_count_distinct(struct(dims...), rsd)`` column per candidate cuboid —
HLL++ entirely JVM-side, partials combined map-side, and exactly one 1-row
result reaching the driver regardless of data size. On 100 TB this is a
single full scan (the same cost the reference pays in its statistics step)
with no shuffle of data rows — only sketch partials move. An optional
``sample_frac`` mirrors the reference's sampling knob
(``kylin.job.sampling-percentage``); sampled group-count estimates are lower
bounds (a sample cannot see groups it missed), which only makes the planner's
greedy more optimistic about wide cuboids — the same bias the reference
accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.cube.cuboid import CuboidScheduler

#: one aggregate expression is generated per candidate cuboid; lattices are
#: scheduler-capped far below this, but a hand-built scheduler could exceed
#: what a single Aggregate should carry — refuse loudly instead of
#: compiling a 100k-column codegen stage
MAX_STATS_CUBOIDS = 4096

#: sketches per aggregate pass. Above ~spark.sql.codegen.maxFields (default
#: 100) a wide Aggregate silently falls out of whole-stage codegen into
#: interpreted row-at-a-time evaluation — so a 4096-sketch single agg would
#: quietly run ~interpreted over the whole flat table. 64 keeps every pass
#: comfortably inside codegen; a >64-cuboid lattice costs ceil(n/64) scans
#: of the (optionally sampled) flat table, each fully pipelined and
#: shuffle-free (only 1-row sketch partials move). Measured at sf0.1
#: (PERFORMANCE.md): two codegen passes beat one 128-sketch interpreted
#: pass — chunking is not just a codegen-cliff guard, it is faster.
STATS_CHUNK = 64


def estimate_cuboid_stats(
    flat: DataFrame,
    scheduler: CuboidScheduler,
    rsd: float = 0.02,
    sample_frac: float | None = None,
    seed: int = 7,
) -> dict[int, int]:
    """Estimated row count for every cuboid in ``scheduler``'s lattice from
    the (unbuilt) flat table: HLL++ distinct count of each cuboid's dim
    tuple, one pass. The 0-dim grand total is the constant 1. ``rsd`` is
    the HLL relative standard deviation (reference default precision gives
    ~1-2%). Deterministic for a given input (HLL++ is; sampling is seeded).
    """
    cuboids = scheduler.cuboids
    if len(cuboids) > MAX_STATS_CUBOIDS:
        raise ValueError(
            f"{len(cuboids)} candidate cuboids exceeds MAX_STATS_CUBOIDS="
            f"{MAX_STATS_CUBOIDS}; prune the lattice (aggregation groups / "
            "max_combination) before estimating"
        )
    df = flat.sample(fraction=sample_frac, seed=seed) if sample_frac else flat
    est: dict[int, int] = {}
    aggs = []
    for cid, c in cuboids.items():
        if not c.dims:
            est[cid] = 1  # grand total: always exactly one row
            continue
        aggs.append(
            F.approx_count_distinct(
                F.struct(*[F.col(d) for d in c.dims]), rsd
            ).alias(f"c{cid}")
        )
    # chunked passes (<= STATS_CHUNK sketches each) keep every Aggregate
    # inside whole-stage codegen; chunk boundaries cannot change estimates
    # (each sketch is an independent column). HLL++ is deterministic, so
    # chunked == single-pass bit for bit — asserted in test_cube_stats.
    for lo in range(0, len(aggs), STATS_CHUNK):
        chunk = aggs[lo : lo + STATS_CHUNK]
        row = df.agg(*chunk).collect()[0]
        for name in row.asDict():
            est[int(name[1:])] = int(row[name])
    return est
