"""Cube-routed queries: the MOLAP acceleration path, proven against the
flat-SQL oracle (reference: aggregate->cuboid routing, SURVEY.md §3-§4).

Every query here goes through ``OlapEngine.sql`` and MUST take a cuboid
route (asserted) — the DuckDB oracle then proves routed == ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import engine


def cube_routed_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match cuboid hit => project-only plan (zero query-time agg)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               count(*) as count_order
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_q1"
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        "count_order",
    )


def cube_routed_q1_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL TPC-H q1: expression measures sum(l_extendedprice*(1-l_discount))
    and sum(...*(1+l_tax)) routed onto cuboid measures over model computed
    columns (CreateFlatTable.scala:43-95 materialization +
    OLAPAggregateRel.java:528-600 rewrite), with the date filter folded into
    segment pruning on the month-partitioned cube."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               sum(l_extendedprice) as sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
               avg(l_quantity) as avg_qty,
               avg(l_extendedprice) as avg_price,
               avg(l_discount) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= date '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    )
    route = eng.last_route
    assert route is not None, "expected cuboid route for cube_routed_q1_revenue"
    assert route.cube == "tpch_cube_seg", route
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("sum_disc_price", 2).alias("sum_disc_price"),
        F.round("sum_charge", 2).alias("sum_charge"),
        F.round("avg_qty", 2).alias("avg_qty"),
        F.round("avg_price", 2).alias("avg_price"),
        F.round("avg_disc", 2).alias("avg_disc"),
        "count_order",
    )


def cube_routed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP routed onto cuboids: the multi-grouping-set aggregate expands
    into one cuboid aggregation per grouping set, unioned back with typed
    NULLs (reference AggregateMultipleExpandRule.java:45-120) — every branch
    reads the pre-aggregated layout, never the fact table."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               count(*) as n
        from lineitem
        group by rollup(l_returnflag, l_linestatus)
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_rollup"
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n",
    ).orderBy("l_returnflag", "l_linestatus")


def cube_routed_grouping_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicators ROUTED with the grouping-set expansion: per
    grouping set the indicator is a 0/1 literal on the served branch
    (AggregatePlan.scala:169-174 — the reference rewrites GROUPING to the
    per-set constant the same way)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               grouping(l_returnflag) as g_rf,
               grouping(l_linestatus) as g_ls,
               sum(l_quantity) as s, count(*) as n
        from lineitem
        group by rollup(l_returnflag, l_linestatus)
        order by l_returnflag, l_linestatus
        """
    )
    assert eng.last_route is not None, "expected route for grouping_indicator"
    return df.select(
        "l_returnflag", "l_linestatus", "g_rf", "g_ls",
        F.round("s", 2).alias("s"), "n",
    )


def cube_routed_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precise COUNT DISTINCT on a NON-dimension column served from the
    stored dictionary-id bitmap measure (global dictionary + word-bag
    bitmap; reference PreciseCountDistinct.scala:148-172 +
    NGlobalDictionaryV2.java) — exact, re-aggregatable, no flat-table scan."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, count(distinct l_partkey) as nd, count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
        """
    )
    route = eng.last_route
    assert route is not None, "expected cuboid route for cube_routed_bitmap_distinct"
    assert route.bitmap_distinct == {"nd": "bm_partkey"}, route
    return df


def cube_routed_topn_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k served from a STORED TopN measure: l_suppkey is not a cube
    dimension — the layout row's array<struct<key,val>> is exploded instead
    of scanning supplier-level rows (TopNUDAF.scala:28-100 build,
    TopNMeasureType.java:411-441 rewrite; exact for k <= n)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_suppkey, sum(l_quantity) as total_qty
        from lineitem
        group by l_suppkey
        order by total_qty desc, l_suppkey
        limit 10
        """
    )
    route = eng.last_route
    assert route is not None, "expected cuboid route for cube_routed_topn_measure"
    assert route.topn is not None, route
    return df.select("l_suppkey", F.round("total_qty", 2).alias("total_qty"))


def cube_routed_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx served from the MERGEABLE histogram sketch measure
    (fixed-bin counts, bin-wise-sum re-aggregation — the deterministic
    stand-in for the reference's t-digest PercentileCounter). The oracle
    replicates the identical histogram in DuckDB, so the check is exact
    even though the percentile itself is approximate (within bin width)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag,
               percentile_approx(l_quantity, 0.5) as p50,
               percentile_approx(l_quantity, 0.9) as p90
        from lineitem
        group by l_returnflag
        order by l_returnflag
        """
    )
    route = eng.last_route
    assert route is not None, "expected route for cube_routed_percentile_sketch"
    return df.select(
        "l_returnflag",
        F.round("p50", 2).alias("p50"),
        F.round("p90", 2).alias("p90"),
    )


def cube_routed_multi_col_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT(DISTINCT a, b) routed: distinct dimension TUPLES
    counted over layout rows (DimCountDistinct generalized to composite
    keys; SQL semantics — rows with any NULL column excluded)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select o_orderstatus,
               count(distinct l_returnflag, l_linestatus) as nd_combo,
               count(*) as n
        from lineitem join orders on l_orderkey = o_orderkey
        group by o_orderstatus
        order by o_orderstatus
        """
    )
    assert eng.last_route is not None, "expected route for multi-col distinct"
    return df


def cube_routed_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake aggregate routed onto a cuboid with re-aggregation + AVG
    decomposition (SUM/COUNT)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select n_name,
               sum(l_extendedprice) as sum_price,
               avg(l_extendedprice) as avg_price,
               count(*) as n
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
        group by n_name
        order by n_name
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_snowflake"
    return df.select(
        "n_name",
        F.round("sum_price", 2).alias("sum_price"),
        F.round("avg_price", 2).alias("avg_price"),
        "n",
    )


def cube_routed_filter_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension filter + re-agg from a wider cuboid; exact count-distinct
    answered from dimension columns (DimCountDistinct semantics)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select o_orderpriority,
               count(distinct p_brand) as nd_brand,
               sum(l_quantity) as sum_qty
        from lineitem
          join orders on l_orderkey = o_orderkey
          join part on l_partkey = p_partkey
        where o_orderstatus = 'F'
        group by o_orderpriority
        order by o_orderpriority
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_filter_dim"
    return df.select(
        "o_orderpriority", "nd_brand", F.round("sum_qty", 2).alias("sum_qty")
    )


def cube_routed_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total aggregate (no GROUP BY) from the smallest cuboid."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select sum(l_extendedprice) as total_price,
               min(l_extendedprice) as min_price,
               max(l_extendedprice) as max_price,
               count(*) as n
        from lineitem
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_global"
    return df.select(
        F.round("total_price", 2).alias("total_price"),
        "min_price",
        "max_price",
        "n",
    )


def cube_routed_segment_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range filter on the partition column routed onto the segmented
    cube: the router folds the bounds into __segment__ partition predicates
    (FilePruner.pruneSegments parity) so only matching month dirs are read."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, sum(l_quantity) as sum_qty, count(*) as n
        from lineitem
        where l_shipdate >= date '1995-01-01' and l_shipdate < date '1996-01-01'
        group by l_returnflag
        order by l_returnflag
        """
    )
    route = eng.last_route
    assert route is not None and route.cube == "tpch_cube_seg", route
    assert route.segment_filters, "expected folded segment predicates"
    return df.select("l_returnflag", F.round("sum_qty", 2).alias("sum_qty"), "n")


def cube_routed_derived_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived dimension: n_name is NOT in the segmented cube — the router
    recovers it by joining the nation lookup back on the c_nationkey host
    dim (DerivedProcess.scala parity)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select n_name, sum(l_extendedprice) as sum_price, count(*) as n
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
        where l_shipdate >= date '1997-01-01'
        group by n_name
        order by n_name
        """
    )
    route = eng.last_route
    assert route is not None and route.cube == "tpch_cube_seg", route
    assert route.derived, "expected derived-dimension recovery"
    return df.select("n_name", F.round("sum_price", 2).alias("sum_price"), "n")


def cube_routed_topn_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopN pattern `group by d order by sum(m) desc limit k` answered from
    a cuboid — exact, unlike the reference's approximate TopN measure
    (TopNMeasureType.java:411-441 rewrite; our cuboid route needs no
    accuracy boundary)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select p_brand, sum(l_extendedprice) as revenue
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        order by revenue desc, p_brand
        limit 5
        """
    )
    assert eng.last_route is not None, "expected cuboid route for topn rewrite"
    return df.select("p_brand", F.round("revenue", 2).alias("revenue"))


def cube_routed_window_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over a JOIN of routed aggregate islands — the
    compare-and-rank dashboard: each side serves from its own cuboid, the
    join runs on the tiny served results, and the rank replays above the
    join (OLAPWindowRel over the multi-context OLAPJoinRel — r4 refused
    this shape into pushdown)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select a.l_returnflag, a.sum_qty, b.n_f,
               rank() over (order by a.sum_qty desc) as qty_rank,
               round(b.n_f / a.n_all, 4) as f_share
        from (select l_returnflag, sum(l_quantity) as sum_qty, count(*) as n_all
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
        """
    )
    assert len(eng.last_routes) == 2, "expected both islands routed"
    return df.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_f",
        "qty_rank",
        "f_share",
    )


def cube_routed_topn_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-pinned dashboard top-k from a STORED TopN list on the SEGMENTED
    cube: the equality on the partition column pins one segment dir
    (pruned scan) and exactly one stored list per group survives the row
    filter, so the per-day top-50 prefix answers limit 10 exactly
    (TopNMeasureType.java:261-330 storage-partition capability — round-4
    verdict item 6)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_suppkey, sum(l_quantity) as day_qty
        from lineitem
        where l_shipdate = date '1996-03-15'
        group by l_suppkey
        order by day_qty desc, l_suppkey
        limit 10
        """
    )
    route = eng.last_route
    assert route is not None, "expected route for cube_routed_topn_pinned"
    assert route.topn is not None and route.cube == "tpch_cube_seg", route
    assert route.segment_filters, "expected pinned segment predicates"
    return df.select("l_suppkey", F.round("day_qty", 2).alias("day_qty"))


def cube_routed_topn_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-RANGE top-k from MERGED per-day stored TopN lists (round-6
    verdict item 6; the reference's TopNMeasureType.java:261-330 declares
    sum-merge of truncated lists an APPROXIMATE capability): served only
    under the engine's approx_topn opt-in — exact refusal stays the
    default. The oracle replicates the declared merge semantics faithfully
    (per-day top-50 lists, same val-desc/key-asc tie-break, re-summed), so
    the check is exact even though the capability is approximate."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_suppkey, sum(l_quantity) as qty
        from lineitem
        where l_shipdate >= date '1996-01-01' and l_shipdate <= date '1996-03-31'
        group by l_suppkey
        order by qty desc, l_suppkey
        limit 10
        """,
        approx_topn=True,
    )
    route = eng.last_route
    assert route is not None and route.topn is not None, route
    assert route.topn_approx, "expected the multi-segment merged-list route"
    assert route.segment_filters, "range bounds must prune segment dirs"
    return df.select("l_suppkey", F.round("qty", 2).alias("qty"))


def cube_routed_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over a select alias, applied post-aggregation on the layout."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select p_brand, sum(l_quantity) as sum_qty
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        having sum(l_quantity) > 100
        order by p_brand
        """
    )
    assert eng.last_route is not None, "expected cuboid route for having query"
    return df.select("p_brand", F.round("sum_qty", 2).alias("sum_qty"))


def cube_routed_having_hidden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over aggregates NOT in the select list (Spark's extended
    Project-over-Filter-over-Aggregate shape): the hidden count(*) routes as
    a measure column, filters post-aggregation, and is dropped from the
    output."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select p_brand, sum(l_quantity) as sum_qty
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        having count(*) > 200
        order by p_brand
        """
    )
    assert eng.last_route is not None, "expected route for hidden-having query"
    return df.select("p_brand", F.round("sum_qty", 2).alias("sum_qty"))


def cube_routed_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over the cube-served aggregate (OLAPWindowRel parity:
    the reference executes window calls ABOVE OLAPAggregateRel, so its whole
    sql_window corpus runs on cubes — `query/.../relnode/OLAPWindowRel.java`).
    The rank is computed over the routed per-(region, nation) sums; the
    route is asserted, proving windows no longer force pushdown."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select r_name, n_name,
               sum(l_quantity) as sum_qty,
               rank() over (partition by r_name order by sum(l_quantity) desc) as rnk
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
        group by r_name, n_name
        order by r_name, rnk, n_name
        """
    )
    assert eng.last_route is not None, "expected cuboid route for window_rank"
    return df.select(
        "r_name", "n_name", F.round("sum_qty", 2).alias("sum_qty"), "rnk"
    )


def cube_routed_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total over an EXACT cuboid hit: the window aggregate
    sum(sum(x)) over () and the post-window scalar division are replayed
    above a project-only layout scan (zero query-time aggregation + window
    post-processing — the dashboard 'percent of total' shape)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               sum(l_quantity) / sum(sum(l_quantity)) over () as share,
               row_number() over (partition by l_returnflag
                                  order by sum(l_quantity) desc) as rn
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    )
    route = eng.last_route
    assert route is not None and route.exact, "expected exact route for window_share"
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("share", 6).alias("share"),
        "rn",
    )


def cube_routed_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over the routed aggregate — exercises the frame-clause strip on
    re-parse (Catalyst renders lag's implied frame in a form the SQL parser
    rejects; digest._fix_frame_sql drops it)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag, l_linestatus, count(*) as n,
               lag(count(*)) over (partition by l_returnflag
                                   order by l_linestatus) as prev_n
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
    )
    assert eng.last_route is not None, "expected cuboid route for window_lag"
    return df


def cube_routed_dim_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over a dimension column with NO declared measure
    (FunctionDesc.isDimensionAsMetric — the reference serves min/max on
    rowkey columns straight from the dimension values): l_shipdate is a
    dimension of the segmented cube, so its per-group min/max re-aggregates
    from the layout's distinct values without any stored measure."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag,
               min(l_shipdate) as first_ship,
               max(l_shipdate) as last_ship,
               count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
        """
    )
    route = eng.last_route
    assert route is not None, "expected cuboid route for dim_minmax"
    assert route.dim_served, "expected dimension-as-measure serving"
    return df


def cube_routed_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over EXPRESSIONS of a dimension (year/month of l_shipdate)
    routed onto the day-grained layout — the dashboard time-series shape.
    The reference materializes time hierarchies as extra dimensions; here
    any deterministic scalar expression of dim columns re-groups exactly
    from the layout's distinct values."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select year(l_shipdate) as y, month(l_shipdate) as m,
               sum(l_quantity) as sum_qty, count(*) as n
        from lineitem
        group by year(l_shipdate), month(l_shipdate)
        order by y, m
        """
    )
    route = eng.last_route
    assert route is not None, "expected cuboid route for month_series"
    return df.select("y", "m", F.round("sum_qty", 2).alias("sum_qty"), "n")


def cube_routed_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A cuboid query spelled through a WITH clause still routes: the
    digest inlines CTEs with Catalyst's InlineCTE rule, mirroring the
    reference's Calcite frontend (which inlines CTEs before OLAP
    planning — its sql corpus uses WITH spellings freely)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        with flagged as (
            select l_returnflag, sum(l_quantity) as sum_qty, count(*) as n
            from lineitem
            where l_linestatus = 'F'
            group by l_returnflag
        )
        select * from flagged order by l_returnflag
        """
    )
    assert eng.last_route is not None, "expected cuboid route for cube_routed_cte"
    return df.select("l_returnflag", F.round("sum_qty", 2).alias("sum_qty"), "n")


def cube_routed_join_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-context routing (OLAPContext.java:122-182 — one context per
    star-join island): a join of two aggregate subqueries routes EACH side
    onto its own cuboid; the join runs over the served (tiny) results.
    The compare-two-cohorts dashboard shape."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select a.l_returnflag, a.sum_qty, b.n_f
        from (select l_returnflag, sum(l_quantity) as sum_qty
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
        """
    )
    assert len(eng.last_routes) == 2, "expected both islands routed"
    return df.select("l_returnflag", F.round("sum_qty", 2).alias("sum_qty"), "n_f")


def cube_routed_union_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two aggregates, each branch routed onto its own cuboid
    (OLAPUnionRel parity — the reference's whole sql_union corpus runs on
    cubes; UnionPlan.scala:28-44 folds per-context results)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_returnflag as k, sum(l_quantity) as v
        from lineitem group by l_returnflag
        union all
        select l_linestatus as k, sum(l_quantity) as v
        from lineitem group by l_linestatus
        order by k, v
        """
    )
    assert len(eng.last_routes) == 2, "expected both union branches routed"
    return df.select("k", F.round("v", 2).alias("v"))


def cube_routed_agg_over_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation ABOVE a union of routed islands (the year-over-year
    summarize shape): both branches serve from cuboids; the outer aggregate
    re-runs over the served union."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select k, round(sum(v), 2) as total, count(*) as n_branches
        from (
          select l_returnflag as k, sum(l_quantity) as v
          from lineitem where l_linestatus = 'F' group by l_returnflag
          union all
          select l_returnflag as k, sum(l_quantity) as v
          from lineitem where l_linestatus = 'O' group by l_returnflag
        ) u
        group by k
        order by k
        """
    )
    assert len(eng.last_routes) == 2, "expected both union branches routed"
    return df


def cube_routed_island_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projection computed over two routed islands — the share/ratio
    dashboard (``cohort count / total count``)."""
    eng = engine(spark, sf_dir)
    df = eng.sql(
        """
        select a.l_returnflag, round(b.n_f / a.n_all, 4) as f_share
        from (select l_returnflag, count(*) as n_all
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
        """
    )
    assert len(eng.last_routes) == 2, "expected both islands routed"
    return df


_BUCKETED_ENGINES: dict[str, object] = {}


def _bucketed_engine(spark: SparkSession, sf_dir: str):
    """Engine with a BUCKETED-layout cube (CubeDesc.bucket_layouts): the
    base cuboid is written as a bucketed external table on the shard key
    (l_suppkey), so routed re-aggregations keyed on it skip the Exchange
    (KylinFileSourceScanExec.scala:74-135 shard-aware scan parity)."""
    import os
    import tempfile

    from kylin_on_parquet_v2_spark.metadata import (
        CubeDesc,
        DataModel,
        FunctionDesc,
        MeasureDesc,
    )
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    key = os.path.abspath(sf_dir)
    eng = _BUCKETED_ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    from kylin_on_parquet_v2_spark.corpus.base import views

    views(spark, sf_dir)
    # PER-PROCESS storage: bucketed-table registrations live in the session
    # catalog, so a cube reloaded from a previous process would fall back to
    # path reads (correct answers but no exchange elision — the plan assert
    # below would rightly fail). A fresh dir forces the build+registration.
    storage = tempfile.mkdtemp(prefix="kylin_bucketed_cubes_")
    eng = OlapEngine(spark, storage_dir=storage)
    eng.add_model(DataModel(name="bucketed_star", fact_table="lineitem"))
    eng.build_cube(
        CubeDesc(
            name="lineitem_bucketed_cube",
            model_name="bucketed_star",
            dimensions=("l_suppkey", "l_returnflag"),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("sum_qty", FunctionDesc("SUM", "l_quantity")),
            ),
            # base cuboid only: a group-by on l_suppkey alone must
            # re-aggregate — the exchange the bucket spec elides
            cuboid_ids=(3,),
            shard_by="l_suppkey",
            shard_buckets=8,
            bucket_layouts=True,
        )
    )
    _BUCKETED_ENGINES[key] = eng
    return eng


def cube_routed_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed re-aggregation on the shard key of a BUCKETED layout: the
    catalog scan reports HashPartitioning(l_suppkey), so the groupBy runs
    exchange-free (plan-asserted here, not just in tests) and the answer
    equals the plain aggregation."""
    eng = _bucketed_engine(spark, sf_dir)
    df = eng.sql(
        """
        select l_suppkey, sum(l_quantity) as sum_qty, count(*) as n
        from lineitem
        group by l_suppkey
        order by l_suppkey
        """
    )
    assert eng.last_route is not None, "expected bucketed cube route"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(
        "Exchange hashpartitioning" in ln and "l_suppkey" in ln
        for ln in plan.splitlines()
    ), "bucketed layout scan must elide the shard-key exchange"
    return df.select(
        "l_suppkey", F.round("sum_qty", 2).alias("sum_qty"), "n"
    )


_BLOOM_ENGINES: dict[str, object] = {}


def _bloom_engine(spark: SparkSession, sf_dir: str):
    """Engine with a cube declaring PARQUET BLOOM FILTERS on its
    high-cardinality user_id dim (CubeDesc.bloom_filter_dims — reference
    intent: the realtime store's fragment inverted index,
    stream-core/.../storage/columnar/invertindex/*). Layout row groups
    then carry bloom membership for user_id, so a point lookup skips row
    groups that min/max stats cannot (user_id values scatter across every
    row group of the event_type-leading rowkey order)."""
    import os

    from kylin_on_parquet_v2_spark.corpus.base import proc_tmp, views
    from kylin_on_parquet_v2_spark.metadata import (
        CubeDesc,
        DataModel,
        FunctionDesc,
        MeasureDesc,
    )
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine

    key = os.path.abspath(sf_dir)
    eng = _BLOOM_ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    views(spark, sf_dir)
    storage = proc_tmp("bloom_cubes", key.strip("/").replace("/", "_"))
    eng = OlapEngine(spark, storage_dir=storage)
    eng.add_model(DataModel(name="events_bloom_star", fact_table="events"))
    eng.build_cube(
        CubeDesc(
            name="events_bloom_cube",
            model_name="events_bloom_star",
            dimensions=("event_type", "user_id"),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("sum_value", FunctionDesc("SUM", "value")),
            ),
            bloom_filter_dims=("user_id",),
            bloom_filter_ndv={"user_id": 2000},
        )
    )
    _BLOOM_ENGINES[key] = eng
    return eng


def cube_routed_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the bloom-filtered user_id dim, routed onto the
    (event_type, user_id) cuboid: the equality predicate reaches the
    parquet scan as a pushed filter AND a bloom membership probe per row
    group. Results are storage-option-independent — the DuckDB oracle
    proves it."""
    eng = _bloom_engine(spark, sf_dir)
    df = eng.sql(
        """
        select event_type, count(*) as n, sum(value) as sum_value
        from events
        where user_id = 7
        group by event_type
        order by event_type
        """
    )
    assert eng.last_route is not None, "expected bloom-cube route"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan, plan
    return df.select(
        "event_type", "n", F.round("sum_value", 2).alias("sum_value")
    )


_REFRESH_ENGINES: dict[str, object] = {}

#: the deterministic "late data" restatement: one extra row landing in the
#: 2024-01-02 day segment AFTER the cube was built — the oracle appends the
#: same literal row to the raw source
_RESTATED_ROW = (999_999_999, "2024-01-02 12:00:00", 7, "restated", 42.5, "")


def _restated_refresh_engine(
    spark: SparkSession,
    sf_dir: str,
    cache: dict,
    prefix: str,
    dimensions: tuple,
    **desc_kwargs,
):
    """Shared recipe for the refresh fixtures: build a day-segmented events
    cube over the original source, restate the source view with
    ``_RESTATED_ROW`` (one late row in the 2024-01-02 segment) AFTER the
    build, then refresh_segment re-cubes that day in place — other
    segments' bytes untouched (proven in tests/test_segment_refresh).
    ``desc_kwargs`` vary the cube shape (e.g. bucket_layouts + shard_by
    for the bucketed variant)."""
    import os

    from kylin_on_parquet_v2_spark.corpus.base import proc_tmp, views
    from kylin_on_parquet_v2_spark.metadata import (
        CubeDesc,
        DataModel,
        FunctionDesc,
        MeasureDesc,
    )
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine
    from kylin_on_parquet_v2_spark.streaming.segments import _normalize_ts

    key = os.path.abspath(sf_dir)
    eng = cache.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    views(spark, sf_dir)
    base = _normalize_ts(spark.table("events"), "ts").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = f"events_{prefix}_src"
    base.createOrReplaceTempView(src)
    storage = proc_tmp(f"{prefix}_cubes", key.strip("/").replace("/", "_"))
    eng = OlapEngine(spark, storage_dir=storage)
    eng.add_model(
        DataModel(
            name=f"events_{prefix}_star",
            fact_table=src,
            partition_column="ts",
        )
    )
    eng.build_cube(
        CubeDesc(
            name=f"events_{prefix}_cube",
            model_name=f"events_{prefix}_star",
            dimensions=dimensions,
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("sum_value", FunctionDesc("SUM", "value")),
            ),
            segment_granularity="day",
            **desc_kwargs,
        )
    )
    # the restatement lands AFTER the build; the cube serves stale day-2
    # bytes until the refresh swaps the re-cubed segment in
    extra = spark.createDataFrame(
        [_RESTATED_ROW],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    base.unionByName(extra).createOrReplaceTempView(src)
    eng.refresh_segment(f"events_{prefix}_cube", "2024-01-02")
    cache[key] = eng
    return eng


def _refresh_engine(spark: SparkSession, sf_dir: str):
    """Plain-layout refresh fixture (CubeManager.refreshSegment parity)."""
    return _restated_refresh_engine(
        spark, sf_dir, _REFRESH_ENGINES, "refresh", ("event_type",)
    )


_BUCKET_REFRESH_ENGINES: dict[str, object] = {}


def _bucket_refresh_engine(spark: SparkSession, sf_dir: str):
    """Like :func:`_refresh_engine` but the cube stores BUCKETED layouts
    (r12, r11 What's-missing #3): the refresh stages the re-cubed segment
    through a side table with the same bucket spec and swaps the files in,
    so the live table keeps serving shard-key re-aggs exchange-free."""
    return _restated_refresh_engine(
        spark,
        sf_dir,
        _BUCKET_REFRESH_ENGINES,
        "brefresh",
        ("user_id", "event_type"),
        shard_by="user_id",
        shard_buckets=4,
        bucket_layouts=True,
    )


def cube_routed_bucket_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment REFRESH on a BUCKETED cube: the restated row appears exactly
    once AND the shard-key re-aggregation stays exchange-free after the
    swap (the staged files' bucket-id names survive the rename, so the
    live table's HashPartitioning still holds — plan-asserted)."""
    eng = _bucket_refresh_engine(spark, sf_dir)
    df = eng.sql(
        """
        select user_id, count(*) as n, sum(value) as sum_value
        from events_brefresh_src
        group by user_id
        order by user_id
        """
    )
    assert eng.last_route is not None, "expected routed bucketed aggregate"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not any(
        "Exchange hashpartitioning" in ln and "user_id" in ln.split("Exchange")[1][:60]
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ), plan
    return df.select("user_id", "n", F.round("sum_value", 2).alias("sum_value"))


def cube_routed_segment_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate served AFTER a segment REFRESH: the restated late row
    (a new 'restated' event type in day 2024-01-02) appears exactly once,
    every other segment is bit-untouched, and the answer hash-matches the
    oracle computed over source + the same literal restatement."""
    eng = _refresh_engine(spark, sf_dir)
    df = eng.sql(
        """
        select event_type, count(*) as n, sum(value) as sum_value
        from events_refresh_src
        group by event_type
        order by event_type
        """
    )
    assert eng.last_route is not None, "expected routed refresh-cube aggregate"
    return df.select(
        "event_type", "n", F.round("sum_value", 2).alias("sum_value")
    )


QUERIES = {
    "cube_routed_segment_refresh": cube_routed_segment_refresh,
    "cube_routed_bucket_refresh": cube_routed_bucket_refresh,
    "cube_routed_bloom_probe": cube_routed_bloom_probe,
    "cube_routed_bucketed": cube_routed_bucketed,
    "cube_routed_topn_range": cube_routed_topn_range,
    "cube_routed_cte": cube_routed_cte,
    "cube_routed_join_contexts": cube_routed_join_contexts,
    "cube_routed_union_contexts": cube_routed_union_contexts,
    "cube_routed_agg_over_union": cube_routed_agg_over_union,
    "cube_routed_island_ratio": cube_routed_island_ratio,
    "cube_routed_month_series": cube_routed_month_series,
    "cube_routed_dim_minmax": cube_routed_dim_minmax,
    "cube_routed_window_rank": cube_routed_window_rank,
    "cube_routed_window_share": cube_routed_window_share,
    "cube_routed_window_lag": cube_routed_window_lag,
    "cube_routed_window_islands": cube_routed_window_islands,
    "cube_routed_topn_pinned": cube_routed_topn_pinned,
    "cube_routed_grouping_indicator": cube_routed_grouping_indicator,
    "cube_routed_multi_col_distinct": cube_routed_multi_col_distinct,
    "cube_routed_having": cube_routed_having,
    "cube_routed_having_hidden": cube_routed_having_hidden,
    "cube_routed_q1": cube_routed_q1,
    "cube_routed_q1_revenue": cube_routed_q1_revenue,
    "cube_routed_rollup": cube_routed_rollup,
    "cube_routed_bitmap_distinct": cube_routed_bitmap_distinct,
    "cube_routed_topn_measure": cube_routed_topn_measure,
    "cube_routed_percentile_sketch": cube_routed_percentile_sketch,
    "cube_routed_snowflake": cube_routed_snowflake,
    "cube_routed_filter_dim": cube_routed_filter_dim,
    "cube_routed_global": cube_routed_global,
    "cube_routed_segment_prune": cube_routed_segment_prune,
    "cube_routed_derived_dim": cube_routed_derived_dim,
    "cube_routed_topn_rewrite": cube_routed_topn_rewrite,
}

ORACLES = {
    "cube_routed_segment_refresh": """
        with src as (
            select event_type, value from events
            union all
            select 'restated' as event_type, 42.5 as value
        )
        select event_type, count(*) as n, round(sum(value), 2) as sum_value
        from src
        group by event_type
        order by event_type
    """,
    "cube_routed_bucket_refresh": """
        with src as (
            select user_id, value from events
            union all
            select 7 as user_id, 42.5 as value
        )
        select user_id, count(*) as n, round(sum(value), 2) as sum_value
        from src
        group by user_id
        order by user_id
    """,
    "cube_routed_bloom_probe": """
        select event_type, count(*) as n, round(sum(value), 2) as sum_value
        from events
        where user_id = 7
        group by event_type
        order by event_type
    """,
    "cube_routed_topn_range": """
        with daily as (
            select l_shipdate, l_suppkey, sum(l_quantity) as s
            from lineitem
            where l_shipdate >= date '1996-01-01' and l_shipdate <= date '1996-03-31'
            group by 1, 2
        ), lists as (
            select l_suppkey, s,
                   row_number() over (partition by l_shipdate
                                      order by s desc, l_suppkey) as rn
            from daily
        )
        select l_suppkey, round(sum(s), 2) as qty
        from lists
        where rn <= 50
        group by l_suppkey
        order by qty desc, l_suppkey
        limit 10
    """,
    "cube_routed_bucketed": """
        select l_suppkey, round(sum(l_quantity), 2) as sum_qty, count(*) as n
        from lineitem
        group by l_suppkey
        order by l_suppkey
    """,
    "cube_routed_grouping_indicator": """
        select l_returnflag, l_linestatus,
               grouping(l_returnflag) as g_rf,
               grouping(l_linestatus) as g_ls,
               round(sum(l_quantity), 2) as s, count(*) as n
        from lineitem
        group by rollup(l_returnflag, l_linestatus)
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_window_islands": """
        select a.l_returnflag, round(a.sum_qty, 2) as sum_qty, b.n_f,
               rank() over (order by a.sum_qty desc) as qty_rank,
               round(b.n_f / a.n_all, 4) as f_share
        from (select l_returnflag, sum(l_quantity) as sum_qty, count(*) as n_all
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
    """,
    "cube_routed_topn_pinned": """
        select l_suppkey, round(sum(l_quantity), 2) as day_qty
        from lineitem
        where l_shipdate = date '1996-03-15'
        group by l_suppkey
        order by sum(l_quantity) desc, l_suppkey
        limit 10
    """,
    "cube_routed_agg_over_union": """
        select k, round(sum(v), 2) as total, count(*) as n_branches
        from (
          select l_returnflag as k, sum(l_quantity) as v
          from lineitem where l_linestatus = 'F' group by l_returnflag
          union all
          select l_returnflag as k, sum(l_quantity) as v
          from lineitem where l_linestatus = 'O' group by l_returnflag
        ) u
        group by k
        order by k
    """,
    "cube_routed_island_ratio": """
        select a.l_returnflag, round(b.n_f / a.n_all, 4) as f_share
        from (select l_returnflag, count(*) as n_all
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
    """,
    "cube_routed_union_contexts": """
        select k, round(v, 2) as v from (
            select l_returnflag as k, sum(l_quantity) as v
            from lineitem group by l_returnflag
            union all
            select l_linestatus as k, sum(l_quantity) as v
            from lineitem group by l_linestatus
        ) u
        order by k, v
    """,
    "cube_routed_join_contexts": """
        select a.l_returnflag, round(a.sum_qty, 2) as sum_qty, b.n_f
        from (select l_returnflag, sum(l_quantity) as sum_qty
              from lineitem group by l_returnflag) a
        join (select l_returnflag as rf2, count(*) as n_f
              from lineitem where l_linestatus = 'F'
              group by l_returnflag) b
          on a.l_returnflag = b.rf2
        order by a.l_returnflag
    """,
    "cube_routed_cte": """
        with flagged as (
            select l_returnflag, round(sum(l_quantity), 2) as sum_qty,
                   count(*) as n
            from lineitem
            where l_linestatus = 'F'
            group by l_returnflag
        )
        select * from flagged order by l_returnflag
    """,
    "cube_routed_month_series": """
        select year(l_shipdate) as y, month(l_shipdate) as m,
               round(sum(l_quantity), 2) as sum_qty, count(*) as n
        from lineitem
        group by year(l_shipdate), month(l_shipdate)
        order by y, m
    """,
    "cube_routed_dim_minmax": """
        select l_returnflag,
               min(l_shipdate) as first_ship,
               max(l_shipdate) as last_ship,
               count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
    """,
    "cube_routed_window_rank": """
        select r_name, n_name,
               round(sum(l_quantity), 2) as sum_qty,
               rank() over (partition by r_name order by sum(l_quantity) desc) as rnk
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
        group by r_name, n_name
        order by r_name, rnk, n_name
    """,
    "cube_routed_window_share": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               round(sum(l_quantity) / sum(sum(l_quantity)) over (), 6) as share,
               row_number() over (partition by l_returnflag
                                  order by sum(l_quantity) desc) as rn
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_window_lag": """
        select l_returnflag, l_linestatus, count(*) as n,
               lag(count(*)) over (partition by l_returnflag
                                   order by l_linestatus) as prev_n
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_multi_col_distinct": """
        select o_orderstatus,
               count(distinct case when l_returnflag is not null
                                    and l_linestatus is not null
                                   then (l_returnflag, l_linestatus) end) as nd_combo,
               count(*) as n
        from lineitem join orders on l_orderkey = o_orderkey
        group by o_orderstatus
        order by o_orderstatus
    """,
    "cube_routed_having": """
        select p_brand, round(sum(l_quantity), 2) as sum_qty
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        having sum(l_quantity) > 100
        order by p_brand
    """,
    "cube_routed_having_hidden": """
        select p_brand, round(sum(l_quantity), 2) as sum_qty
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        having count(*) > 200
        order by p_brand
    """,
    "cube_routed_q1": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               count(*) as count_order
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_q1_revenue": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               round(sum(l_extendedprice), 2) as sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
               round(avg(l_quantity), 2) as avg_qty,
               round(avg(l_extendedprice), 2) as avg_price,
               round(avg(l_discount), 2) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= date '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_bitmap_distinct": """
        select l_returnflag, count(distinct l_partkey) as nd, count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
    """,
    "cube_routed_topn_measure": """
        select l_suppkey, round(sum(l_quantity), 2) as total_qty
        from lineitem
        group by l_suppkey
        order by sum(l_quantity) desc, l_suppkey
        limit 10
    """,
    "cube_routed_percentile_sketch": """
        with b as (
            select l_returnflag,
                   cast(least(greatest(floor(l_quantity / 0.5), 0), 99) as int) as bin
            from lineitem
        ),
        c as (select l_returnflag, bin, count(*) as n from b group by 1, 2),
        cum as (
            select l_returnflag, bin,
                   sum(n) over (partition by l_returnflag order by bin) as cum,
                   sum(n) over (partition by l_returnflag) as total
            from c
        )
        select l_returnflag,
               round(min(case when cum >= 0.5 * total then (bin + 0.5) * 0.5 end), 2) as p50,
               round(min(case when cum >= 0.9 * total then (bin + 0.5) * 0.5 end), 2) as p90
        from cum
        group by l_returnflag
        order by l_returnflag
    """,
    "cube_routed_rollup": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               count(*) as n
        from lineitem
        group by rollup(l_returnflag, l_linestatus)
        order by l_returnflag, l_linestatus
    """,
    "cube_routed_snowflake": """
        select n_name,
               round(sum(l_extendedprice), 2) as sum_price,
               round(avg(l_extendedprice), 2) as avg_price,
               count(*) as n
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
        group by n_name
        order by n_name
    """,
    "cube_routed_filter_dim": """
        select o_orderpriority,
               count(distinct p_brand) as nd_brand,
               round(sum(l_quantity), 2) as sum_qty
        from lineitem
          join orders on l_orderkey = o_orderkey
          join part on l_partkey = p_partkey
        where o_orderstatus = 'F'
        group by o_orderpriority
        order by o_orderpriority
    """,
    "cube_routed_global": """
        select round(sum(l_extendedprice), 2) as total_price,
               min(l_extendedprice) as min_price,
               max(l_extendedprice) as max_price,
               count(*) as n
        from lineitem
    """,
    "cube_routed_segment_prune": """
        select l_returnflag, round(sum(l_quantity), 2) as sum_qty, count(*) as n
        from lineitem
        where l_shipdate >= date '1995-01-01' and l_shipdate < date '1996-01-01'
        group by l_returnflag
        order by l_returnflag
    """,
    "cube_routed_derived_dim": """
        select n_name, round(sum(l_extendedprice), 2) as sum_price, count(*) as n
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
        where l_shipdate >= date '1997-01-01'
        group by n_name
        order by n_name
    """,
    "cube_routed_topn_rewrite": """
        select p_brand, round(sum(l_extendedprice), 2) as revenue
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
        order by sum(l_extendedprice) desc, p_brand
        limit 5
    """,
}
