"""Cube descriptors: dimensions, measures, aggregation groups.

Reference parity: ``core-cube/.../cube/model/CubeDesc.java:142-224``
(dimensions :156, measures :158, aggregationGroups :167),
``AggregationGroup.java:62-67`` (mandatory/hierarchy/joint masks),
``core-metadata/.../model/FunctionDesc.java:60-67`` (SUM/MIN/MAX/COUNT/
COUNT_DISTINCT/PERCENTILE_APPROX/TOP_N/...), measure sketch types registered in
``core-metadata/.../measure/MeasureTypeFactory.java:110-152``.

Spark mapping: a measure is a pair of Spark aggregate Columns — the build-side
partial aggregate (into the cuboid layout) and the query-side re-aggregate
(over layout rows). See ``cube/build.py`` and SURVEY.md §2.4.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Measure expressions the cube understands. AVG never appears: like Calcite's
# standard rewrite in the reference (OLAPAggregateRel.java:94-116 has no AVG),
# the router decomposes AVG into SUM/COUNT.
MEASURE_EXPRESSIONS = frozenset(
    {
        "COUNT",  # count(*) or count(col)
        "SUM",
        "MIN",
        "MAX",
        "COUNT_DISTINCT",  # param 'exact' (bitmap-equivalent) | 'hllc'
        "TOP_N",
        "PERCENTILE_APPROX",
        "EXTENDED_COLUMN",
        "RAW",
        "COLLECT_SET",  # building block for exact re-aggregatable distinct
    }
)


@dataclass(frozen=True)
class FunctionDesc:
    """Aggregate function + parameter column(s).

    ``parameter`` is the flat-table column (None => count(*)). ``returntype``
    mirrors the reference's sketch-type strings where relevant:
    ``hllc(p)``, ``bitmap``, ``topn(n)``, ``percentile(p)``.
    """

    expression: str
    parameter: str | None = None
    returntype: str | None = None
    #: TOP_N group-by ("literal") columns — the dimension being ranked.
    extra_params: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.expression in MEASURE_EXPRESSIONS:
            return
        # user-pluggable measure types (MeasureTypeFactory parity); late
        # import — the registry lives with the aggregator implementations
        from kylin_on_parquet_v2_spark.cube.measures import registered_measure_type

        if registered_measure_type(self.expression) is None:
            raise ValueError(f"unknown measure expression {self.expression}")


@dataclass(frozen=True)
class MeasureDesc:
    name: str
    function: FunctionDesc


#: the reference's auto-derived event-time grain family
#: (core-metadata/.../dimension/TimeDerivedColumnType.java:35-151)
TIME_GRAINS = ("second", "minute", "hour", "day", "week", "month", "quarter", "year")


@dataclass(frozen=True)
class TimeDerivedDim:
    """A stored dimension that IS a grain truncation of an event-time
    column: ``name = date_trunc(grain, source)`` (reference
    ``TimeDerivedColumnType.java:35-151`` — streaming cubes declare
    minute_start/hour_start/... as first-class dim columns stamped at
    ingest). Declaring the mapping lets the router rewrite BI-spelled
    queries (``GROUP BY date_trunc('hour', ts)``, ``year(ts)``) onto the
    stored column, so they serve from the cube instead of a fact scan.
    The stored column must be the TIMESTAMP produced by ``date_trunc``
    (what ``streaming.segments.with_time_derived`` stamps)."""

    name: str  # stored dim column, e.g. "hour_start"
    source: str  # raw event-time column, e.g. "ts"
    grain: str  # one of TIME_GRAINS

    def __post_init__(self) -> None:
        if self.grain not in TIME_GRAINS:
            raise ValueError(
                f"unknown time grain {self.grain!r}; known: {TIME_GRAINS}"
            )


@dataclass(frozen=True)
class AggregationGroup:
    """Prunes the 2^n cuboid lattice (reference AggregationGroup.java:62-67).

    - ``includes``: dimensions this group spans.
    - ``mandatory``: must appear in every cuboid of the group.
    - ``hierarchies``: ordered chains — a member may appear only with all its
      ancestors (year > month > day).
    - ``joints``: all-or-nothing bundles.
    """

    includes: tuple[str, ...]
    mandatory: tuple[str, ...] = ()
    hierarchies: tuple[tuple[str, ...], ...] = ()
    joints: tuple[tuple[str, ...], ...] = ()
    #: cap on dimensions per cuboid (the spirit of the reference's
    #: kylin.cube.aggrgroup.max-combination safeguard): wide group-bys are
    #: served by re-aggregating the base cuboid instead of materializing
    #: every deep combination. None = unlimited.
    max_combination: int | None = None

    def valid(self, dims: frozenset[str]) -> bool:
        if not dims <= set(self.includes):
            return False
        if self.max_combination is not None and len(dims) > self.max_combination:
            return False
        if not set(self.mandatory) <= dims:
            return False
        for chain in self.hierarchies:
            seen_gap = False
            for d in chain:
                if d in dims:
                    if seen_gap:
                        return False
                else:
                    seen_gap = True
        for joint in self.joints:
            present = dims & set(joint)
            if present and present != set(joint):
                return False
        return True


@dataclass(frozen=True)
class CubeDesc:
    """A cube over a :class:`~kylin_on_parquet_v2_spark.metadata.model.DataModel`."""

    name: str
    model_name: str
    dimensions: tuple[str, ...]
    measures: tuple[MeasureDesc, ...]
    aggregation_groups: tuple[AggregationGroup, ...] = ()
    #: bucketing column for layout writes (reference 'shardby' rowkey flag)
    shard_by: str | None = None
    #: number of shard partition dirs per layout when shard_by is declared
    shard_buckets: int = 8
    #: cuboids are additionally partitioned by segment when the model declares
    #: a partition column; granularity is a Spark date_trunc unit.
    segment_granularity: str = "month"
    #: auto-merge threshold (reference CubeDesc.java:180 autoMergeTimeRanges,
    #: count-based here): when a segmented cube accumulates this many
    #: segments, ``maybe_auto_merge`` folds all but the newest into one.
    #: None disables auto-merge.
    auto_merge_segments: int | None = None
    #: retention policy (reference CubeDesc retentionRange, count-based
    #: here like auto_merge_segments): keep only the newest N segment dirs;
    #: older ones are dropped from storage on refresh. None keeps history
    #: forever. The cube then answers only over the retained range — the
    #: reference's retention has identical visible semantics.
    retention_segments: int | None = None
    #: planner-pruned lattice: when set, only these cuboid ids (plus the
    #: base and 0-dim cuboids, always kept) are scheduled/built — the
    #: apply step of CuboidRecommender's output (cube/planner.py).
    cuboid_ids: tuple[int, ...] | None = None
    #: opt-in BUCKETED layout storage on the shard column (requires
    #: shard_by): layouts that host the shard key are written as bucketed
    #: external tables (``bucketBy(shard_buckets, shard_by)``) instead of
    #: ``__shard__`` partition dirs, so the routed scan reports
    #: HashPartitioning on the shard key and a query-time groupBy/join on
    #: it needs NO Exchange — the reference's shard-aware scan
    #: (``KylinFileSourceScanExec.scala:74-135`` exposes outputPartitioning
    #: for exactly this). Bucket pruning replaces shard-dir pruning for
    #: equality filters. Not combinable with segment merge (merge rewrites
    #: files outside the bucket bookkeeping and drops the table spec).
    bucket_layouts: bool = False
    #: parquet BLOOM FILTERS on these columns at layout write (reference
    #: intent: the realtime store's fragment inverted index,
    #: stream-core/.../storage/columnar/invertindex/* — a per-fragment
    #: membership structure for point lookups). Rowkey-ordered writes give
    #: min/max skipping on LEADING dims; blooms give row-group skipping on
    #: equality probes over NON-leading high-cardinality dims (shard keys,
    #: id-like columns) whose values scatter across every row group.
    bloom_filter_dims: tuple[str, ...] = ()
    #: expected distinct count per bloom dim — sizes the filter bitset
    #: (parquet.bloom.filter.expected.ndv). Unset dims take parquet's
    #: max-bytes cap, which over-allocates on small row groups: declare the
    #: per-row-group NDV when known. Stored as (col, ndv) pairs so the
    #: frozen dataclass stays hashable (a dict field would break
    #: ``hash(desc)``); a plain dict passed in is normalized below.
    bloom_filter_ndv: tuple = ()
    #: declared event-time grain dimensions (TimeDerivedColumnType parity):
    #: each names a dimension of this cube that equals
    #: ``date_trunc(grain, source)``. The router uses these to rewrite
    #: grain expressions over the raw event-time column onto the stored
    #: dims. Mappings are ALSO auto-detected from the model's
    #: computed_columns whose expression is a date_trunc over one column.
    time_derived: tuple[TimeDerivedDim, ...] = ()

    def __post_init__(self) -> None:
        names = [m.name for m in self.measures]
        if len(names) != len(set(names)):
            raise ValueError("duplicate measure names")
        # normalize ANY mapping-like input (dict, list/tuple of pairs —
        # e.g. tuples JSON-roundtripped into lists) to sorted (col, ndv)
        # tuples so the frozen dataclass is unconditionally hashable
        object.__setattr__(
            self,
            "bloom_filter_ndv",
            tuple(sorted(dict(self.bloom_filter_ndv).items())),
        )
        if self.bucket_layouts and not self.shard_by:
            raise ValueError("bucket_layouts requires shard_by")
        for td in self.time_derived:
            if td.name not in self.dimensions:
                raise ValueError(
                    f"time-derived dim {td.name!r} is not a cube dimension"
                )
        for col in self.bloom_filter_dims:
            if col not in self.dimensions and col != self.shard_by:
                raise ValueError(
                    f"bloom-filter column {col!r} is neither a dimension "
                    "nor the shard column"
                )

    def bloom_ndv_map(self) -> dict[str, int]:
        """``bloom_filter_ndv`` as a dict. The field itself is stored as
        sorted (col, ndv) pairs so the frozen dataclass stays hashable —
        an r12 change that broke external readers still calling
        ``.get(col)`` on the old dict shape (r12 advisor); go through this
        accessor instead of re-wrapping with ``dict()`` at each use."""
        return dict(self.bloom_filter_ndv)

    def measure(self, name: str) -> MeasureDesc:
        for m in self.measures:
            if m.name == name:
                return m
        raise KeyError(name)

    def groups(self) -> tuple[AggregationGroup, ...]:
        """Aggregation groups, defaulting to one full group over all dims."""
        return self.aggregation_groups or (AggregationGroup(includes=self.dimensions),)
