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


def _engine(spark):
    global _ENGINE
    if _ENGINE is None:
        eng = OlapEngine(spark, storage_dir="/tmp/kylin_prop_cubes")
        eng.register_sources(SF_SMOKE)
        eng.add_model(TPCH_MODEL)
        eng.build_cube(TPCH_CUBE)
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
        eng.add_model(TPCH_MODEL_SEG)
        eng.build_cube(TPCH_CUBE_SEG)
    eng.sql(sql, validate=True)
    route = eng.last_route
    assert route is not None and route.cube == TPCH_CUBE_SEG.name, sql
    assert route.segment_filters, sql
