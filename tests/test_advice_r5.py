"""Regression tests for round-4 advisor findings (ADVICE.md r4):

1. _split_conjuncts must not arm BETWEEN-pending state on Catalyst's
   FUNCTION spelling ``between(col, lo, hi)`` — doing so swallowed the next
   top-level AND and fused two conjuncts into one (segment folding and
   derived-filter translation then skipped every conjunct after a BETWEEN).
2. Sort digests must capture explicit NULL ordering: ``ORDER BY k ASC NULLS
   LAST`` replayed with Spark's default (nulls first) misplaces NULL-keyed
   rows, and row-set normalization cannot catch ordering divergence.
3. _join_island must reject duplicate output names INSIDE the right island
   at digest time (not via a downstream AnalysisException).
4. _derived_prefilter must compare against the lookup NAME (column_tables
   values are names, not table names) and key its memo by (name, pk, conj).
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from kylin_on_parquet_v2_spark.metadata import (
    AggregationGroup,
    CubeDesc,
    DataModel,
    FunctionDesc,
    JoinDesc,
    JoinTable,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.query.router import (
    _fold_segment_filters,
    _split_conjuncts,
)


def test_split_conjuncts_function_form_between():
    """Catalyst's between(col, lo, hi) call must NOT swallow the next AND."""
    sql = (
        "between(l_shipdate, DATE '1995-01-01', DATE '1996-01-01')"
        " AND (l_linestatus = 'F')"
    )
    parts = _split_conjuncts(sql)
    assert len(parts) == 2, parts
    assert parts[0].startswith("between(")
    assert parts[1] == "l_linestatus = 'F'"


def test_split_conjuncts_infix_between_still_whole():
    sql = "l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-01-01'"
    assert _split_conjuncts(sql) == [sql]
    sql2 = sql + " AND l_linestatus = 'F'"
    parts = _split_conjuncts(sql2)
    assert len(parts) == 2 and parts[0] == sql


def test_fold_function_between_plus_conjunct():
    """Both BETWEEN bounds fold AND the trailing conjunct stays separate
    (pre-fix: the fused part failed the fullmatch -> zero segment pruning)."""
    inst = SimpleNamespace(
        segmented=True,
        model=SimpleNamespace(partition_column="l_shipdate"),
        desc=SimpleNamespace(segment_granularity="day"),
        segment_ranges={},
    )
    digest = SimpleNamespace(
        filter_sql=(
            "between(l_shipdate, DATE '1995-01-01', DATE '1996-01-01')"
            " AND (l_linestatus = 'F')"
        )
    )
    assert _fold_segment_filters(digest, inst) == [
        "__segment__ >= '1995-01-01'",
        "__segment__ <= '1996-01-01'",
    ]


NULLS_MODEL = DataModel(
    name="no_star",
    fact_table="no_sales",
    lookups=(JoinTable("no_dim", JoinDesc(("fk",), ("pk",), "left")),),
)

NULLS_CUBE = CubeDesc(
    name="no_cube",
    model_name="no_star",
    dimensions=("d", "fk"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
    ),
    aggregation_groups=(AggregationGroup(includes=("d", "fk")),),
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    # fk=9 has no no_dim row -> label NULL group under the LEFT lookup
    spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 30.0),
            ("b", 2, 20.0),
            ("b", 3, 5.0),
            ("b", 9, 7.0),
        ],
        "d string, fk int, v double",
    ).createOrReplaceTempView("no_sales")
    spark.createDataFrame(
        [(1, "L1"), (2, "L2"), (3, "L3")], "pk int, label string"
    ).createOrReplaceTempView("no_dim")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("no_cubes")))
    eng.add_model(NULLS_MODEL)
    eng.build_cube(NULLS_CUBE)
    return eng


@pytest.mark.parametrize(
    "ordering", ["label asc nulls last", "label desc nulls first"]
)
def test_routed_sort_honors_explicit_null_ordering(engine, ordering):
    """ORDER BY with NON-default null placement must replay identically on
    the routed path (pre-fix: Spark defaults put the NULL group on the
    wrong end; _normalize() sorting masked it from validate=True)."""
    sql = f"""select label, count(*) as n from no_sales
              left join no_dim on fk = pk group by label
              order by {ordering}"""
    routed = engine.sql(sql)
    assert engine.last_route is not None
    got = [r.label for r in routed.collect()]
    want = [r.label for r in engine.sql(sql, use_cube=False).collect()]
    assert got == want, (ordering, got, want)
    # the NULL group must sit at the declared end
    assert got[-1] is None if "nulls last" in ordering else got[0] is None


def test_join_island_right_side_duplicate_names_refused(engine):
    """Duplicate output names inside the RIGHT island fail the digest (no
    downstream AnalysisException fallback); the query still answers via
    pushdown."""
    sql = """
        select a.d, a.n_a
        from (select d, count(*) as n_a from no_sales group by d) a
        join (select d as d2, sum(v) as s, min(v) as s
              from no_sales group by d) b
          on a.d = b.d2
    """
    from kylin_on_parquet_v2_spark.query.digest import extract_join_digest

    df = engine.spark.sql(sql)
    assert extract_join_digest(df) is None


def test_derived_prefilter_uses_lookup_name(engine):
    """The prefilter translate must fire for lookups resolved by NAME: the
    memo must carry a non-None IN-list for the label conjunct (pre-fix the
    lk.table comparison poisoned the cache with None on any name mismatch,
    and the memo key collided across pk columns)."""
    sql = """select d, count(*) as n from no_sales
             left join no_dim on fk = pk
             where label = 'L2' group by d"""
    engine.sql(sql, validate=True)
    route = engine.last_route
    assert route is not None and route.derived
    inst = engine.cubes[route.cube]
    hits = {
        k: v for k, v in inst.derived_in_cache.items() if k[0] == "no_dim"
    }
    assert hits, "expected a memoized translate attempt"
    assert any(v == [(2,)] for v in hits.values()), hits
    # memo keys carry (name, pk tuple, conjunct)
    assert all(len(k) == 3 and k[1] == ("pk",) for k in hits)


COMP_MODEL = DataModel(
    name="comp_star",
    fact_table="comp_fact",
    lookups=(
        JoinTable("comp_dim", JoinDesc(("fk1", "fk2"), ("pk1", "pk2"), "inner")),
    ),
)

COMP_CUBE = CubeDesc(
    name="comp_cube",
    model_name="comp_star",
    dimensions=("d", "fk1", "fk2"),
    measures=(
        MeasureDesc("_cnt", FunctionDesc("COUNT")),
        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
    ),
    aggregation_groups=(AggregationGroup(includes=("d", "fk1", "fk2")),),
)


@pytest.fixture(scope="module")
def comp_engine(spark, tmp_path_factory):
    spark.createDataFrame(
        [
            ("a", 1, 10, 1.0),
            ("a", 1, 20, 2.0),
            ("a", 2, 10, 3.0),
            ("b", 2, 20, 4.0),
            ("b", 3, 30, 5.0),
        ],
        "d string, fk1 int, fk2 int, v double",
    ).createOrReplaceTempView("comp_fact")
    spark.createDataFrame(
        [
            (1, 10, "X"),
            (1, 20, "Y"),
            (2, 10, "X"),
            (2, 20, "Y"),
            (3, 30, "Z"),
        ],
        "pk1 int, pk2 int, grp string",
    ).createOrReplaceTempView("comp_dim")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("comp_cubes")))
    eng.add_model(COMP_MODEL)
    eng.build_cube(COMP_CUBE)
    return eng


def test_composite_key_derived_prefilter(comp_engine):
    """Round-4 verdict item 8: a filter on a derived column behind a
    COMPOSITE-key lookup translates into per-FK-column IN prefilters on the
    layout scan (coordinate-wise relaxation of the pk-tuple set — sound,
    and each In pushes to Parquet), instead of being skipped entirely."""
    sql = """select d, count(*) as n, sum(v) as s from comp_fact
             join comp_dim on fk1 = pk1 and fk2 = pk2
             where grp = 'X' group by d"""
    df = comp_engine.sql(sql, validate=True)
    route = comp_engine.last_route
    assert route is not None and route.derived, route
    inst = comp_engine.cubes[route.cube]
    hits = {k: v for k, v in inst.derived_in_cache.items() if k[0] == "comp_dim"}
    assert any(v and all(len(t) == 2 for t in v) for v in hits.values()), hits
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(fk1" in plan or "EqualTo(fk1" in plan, plan
    assert "In(fk2" in plan or "EqualTo(fk2" in plan, plan
