"""Property-based dual execution: randomized aggregate queries over the
model must give identical answers routed and pushed down (the strongest form
of the reference's NExecAndComp CompareLevel.SAME harness)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE, TPCH_MODEL
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from tests.conftest import SF_SMOKE

DIMS = list(TPCH_CUBE.dimensions)
MEASURE_EXPRS = [
    "count(*) as n",
    "sum(l_quantity) as sq",
    "sum(l_extendedprice) as sp",
    "min(l_extendedprice) as mn",
    "max(l_extendedprice) as mx",
    "avg(l_quantity) as aq",
]
FILTERS = [
    None,
    "l_returnflag = 'A'",
    "l_linestatus <> 'F'",
    "o_orderstatus in ('F', 'O')",
    "p_brand like 'Brand#1%'",
    "n_name = 'NATION_3' or n_name = 'NATION_7'",
]
# join chains, each a prefix-closed path through the model graph
JOIN_SETS = {
    (): [],
    ("orders",): ["join orders on l_orderkey = o_orderkey"],
    ("part",): ["join part on l_partkey = p_partkey"],
    ("orders", "customer", "nation"): [
        "join orders on l_orderkey = o_orderkey",
        "join customer on o_custkey = c_custkey",
        "join nation on c_nationkey = n_nationkey",
    ],
    ("orders", "customer", "nation", "region"): [
        "join orders on l_orderkey = o_orderkey",
        "join customer on o_custkey = c_custkey",
        "join nation on c_nationkey = n_nationkey",
        "join region on n_regionkey = r_regionkey",
    ],
}
# which columns are reachable for each join chain
REACHABLE = {
    (): {"l_returnflag", "l_linestatus"},
    ("orders",): {"l_returnflag", "l_linestatus", "o_orderpriority", "o_orderstatus"},
    ("part",): {"l_returnflag", "l_linestatus", "p_brand"},
    ("orders", "customer", "nation"): {
        "l_returnflag",
        "l_linestatus",
        "o_orderpriority",
        "o_orderstatus",
        "n_name",
    },
    ("orders", "customer", "nation", "region"): {
        "l_returnflag",
        "l_linestatus",
        "o_orderpriority",
        "o_orderstatus",
        "n_name",
        "r_name",
    },
}

_ENGINE = None
_STORES: dict = {}


@pytest.fixture(scope="module", autouse=True)
def _shared_stores(tpch_cube_store, seg_cube_store):
    # session-built cube templates for _engine (r14 suite-budget fix:
    # property runs cloned byte-identical layouts instead of rebuilding)
    _STORES["tpch"] = tpch_cube_store
    _STORES["seg"] = seg_cube_store


def _engine(spark):
    global _ENGINE
    if _ENGINE is None:
        import tempfile

        from tests.conftest import clone_cube_store

        d = clone_cube_store(_STORES["tpch"], tempfile.mkdtemp(prefix="prop_cubes_"))
        eng = OlapEngine(spark, storage_dir=d)
        eng.register_sources(SF_SMOKE)
        eng.add_model(TPCH_MODEL)
        eng.load_cube(TPCH_CUBE)
        _ENGINE = eng
    return _ENGINE


@st.composite
def agg_query(draw):
    chain = draw(st.sampled_from(sorted(JOIN_SETS, key=len)))
    cols = sorted(REACHABLE[chain])
    group = draw(st.lists(st.sampled_from(cols), min_size=0, max_size=3, unique=True))
    measures = draw(
        st.lists(st.sampled_from(MEASURE_EXPRS), min_size=1, max_size=3, unique=True)
    )
    filt = draw(st.sampled_from([f for f in FILTERS if f is None or _refs_ok(f, cols)]))
    select = ", ".join(group + measures)
    sql = f"select {select} from lineitem " + " ".join(JOIN_SETS[chain])
    if filt:
        sql += f" where {filt}"
    if group:
        sql += " group by " + ", ".join(group)
    return sql


def _refs_ok(filter_sql: str, cols: list[str]) -> bool:
    known = {"l_returnflag", "l_linestatus", "o_orderstatus", "p_brand", "n_name"}
    return all(tok not in filter_sql for tok in known - set(cols))


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=agg_query())
def test_routed_equals_pushdown(spark, sql):
    eng = _engine(spark)
    eng.sql(sql, validate=True)  # raises on any routed/pushdown divergence
    assert eng.last_route is not None, f"expected route for generated query: {sql}"


@st.composite
def segmented_query(draw):
    """Random date-range filters against the month-segmented cube: exercises
    segment-bound folding across operators and granularity edges."""
    lo_m = draw(st.integers(min_value=1, max_value=12))
    lo_y = draw(st.integers(min_value=1992, max_value=1997))
    hi_y = draw(st.integers(min_value=lo_y, max_value=1998))
    hi_m = draw(st.integers(min_value=1, max_value=12))
    op_lo = draw(st.sampled_from([">=", ">"]))
    op_hi = draw(st.sampled_from(["<", "<="]))
    group = draw(
        st.lists(
            st.sampled_from(["l_returnflag", "l_linestatus"]),
            min_size=1,
            max_size=2,
            unique=True,
        )
    )
    sel = ", ".join(group)
    return (
        f"select {sel}, sum(l_quantity) as sq, count(*) as n from lineitem "
        f"where l_shipdate {op_lo} date '{lo_y}-{lo_m:02d}-15' "
        f"and l_shipdate {op_hi} date '{hi_y}-{hi_m:02d}-15' "
        f"group by {', '.join(group)}"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=segmented_query())
def test_segment_pruned_routes_equal_pushdown(spark, sql):
    from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE_SEG, TPCH_MODEL_SEG

    eng = _engine(spark)
    if TPCH_CUBE_SEG.name not in eng.cubes:
        from tests.conftest import clone_cube_store

        clone_cube_store(_STORES["seg"], eng.storage_dir)
        eng.add_model(TPCH_MODEL_SEG)
        eng.load_cube(TPCH_CUBE_SEG)
    eng.sql(sql, validate=True)
    route = eng.last_route
    assert route is not None and route.cube == TPCH_CUBE_SEG.name, sql
    assert route.segment_filters, sql


# Every OVER() ordering must be TOTAL (tie-broken by the full group key):
# lag/row_number over an ordering with duplicate keys is legitimately
# non-deterministic — routed and pushdown can both be right yet differ.
WINDOW_EXPRS = [
    "rank() over (order by {m} desc, {gall}) as rnk",
    "row_number() over (order by {m} desc, {gall}) as rn",
    "lag({m}) over (order by {gall}) as prev",
    "{m} / sum({m}) over () as share",
    "dense_rank() over (partition by {g} order by {m}, {gall}) as dr",
]


@st.composite
def windowed_agg_query(draw):
    """Random window calls stacked over a routable aggregate — any
    divergence between the replayed windows and Spark's own execution of
    the same query is a correctness bug."""
    group = draw(
        st.lists(
            st.sampled_from(["l_returnflag", "l_linestatus"]),
            min_size=1,
            max_size=2,
            unique=True,
        )
    )
    base = draw(st.sampled_from(["sum(l_quantity)", "count(*)", "max(l_extendedprice)"]))
    wins = draw(st.lists(st.sampled_from(WINDOW_EXPRS), min_size=1, max_size=3, unique=True))
    gall = ", ".join(group)
    sel = group + [f"{base} as m"] + [
        w.format(m=base, g=group[0], gall=gall) for w in wins
    ]
    return (
        f"select {', '.join(sel)} from lineitem group by {', '.join(group)}"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=windowed_agg_query())
def test_windowed_routes_equal_pushdown(spark, sql):
    eng = _engine(spark)
    eng.sql(sql, validate=True)
    assert eng.last_route is not None, f"expected route for: {sql}"


GROUP_EXPRS = [
    "substring(l_returnflag, 1, 1)",
    "concat(l_returnflag, '-', l_linestatus)",
    "case when l_returnflag = 'A' then 'x' else 'y' end",
    "upper(l_linestatus)",
]


@st.composite
def group_expr_query(draw):
    """Random scalar expressions of dims in the GROUP BY (the generalized
    time-hierarchy path), mixed with plain dims and min/max-on-dim."""
    gexpr = draw(st.sampled_from(GROUP_EXPRS))
    plain = draw(st.lists(st.sampled_from(["l_returnflag", "l_linestatus"]),
                          min_size=0, max_size=1, unique=True))
    measures = draw(
        st.lists(
            st.sampled_from(
                ["count(*) as n", "sum(l_quantity) as sq",
                 "min(l_linestatus) as mnd", "max(l_returnflag) as mxd"]
            ),
            min_size=1,
            max_size=2,
            unique=True,
        )
    )
    groups = [gexpr] + plain
    sel = [f"{gexpr} as ge"] + plain + measures
    return f"select {', '.join(sel)} from lineitem group by {', '.join(groups)}"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=group_expr_query())
def test_group_expr_routes_equal_pushdown(spark, sql):
    eng = _engine(spark)
    eng.sql(sql, validate=True)
    assert eng.last_route is not None, f"expected route for: {sql}"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=agg_query(), wrap=st.sampled_from(["cte", "derived"]))
def test_wrapped_spellings_route_and_match(spark, sql, wrap):
    """CTE / derived-table spellings of routable aggregates must route to
    the same answer: the digest inlines WithCTE and skips exact-passthrough
    alias layers (and anything less than an exact passthrough falls back
    to pushdown, never mis-routes)."""
    eng = _engine(spark)
    wrapped = (
        f"with t as ({sql}) select * from t"
        if wrap == "cte"
        else f"select * from ({sql}) t"
    )
    eng.sql(wrapped, validate=True)  # raises on any divergence
    assert eng.last_route is not None, f"expected route for: {wrapped}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    chain=st.sampled_from(sorted(JOIN_SETS, key=len)),
    n_group=st.integers(min_value=1, max_value=2),
    op=st.sampled_from(["union all", "union", "intersect", "except"]),
    fa=st.sampled_from(FILTERS[1:3]),
    fb=st.sampled_from(FILTERS[1:3]),
)
def test_setop_spellings_match_pushdown(spark, chain, n_group, op, fa, fb):
    """Set operations over two same-shaped aggregate islands (differing
    filters) must match pushdown whether they route per-branch or not."""
    eng = _engine(spark)
    cols = sorted(REACHABLE[chain])[:n_group]
    sel = ", ".join(cols + ["sum(l_quantity) as sq", "count(*) as n"])
    base = f"select {sel} from lineitem " + " ".join(JOIN_SETS[chain])
    grp = " group by " + ", ".join(cols)
    sql = f"{base} where {fa}{grp} {op} {base} where {fb}{grp}"
    eng.sql(sql, validate=True)  # raises on any divergence
    # per-branch routing expected for these shapes
    assert len(eng.last_routes) == 2, (op, sql)
