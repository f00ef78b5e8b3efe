"""Regression tests for the round-10 advisor findings.

#1 (low): degenerate OR cohort literals ("'|'", all-whitespace members) must
not build an unanalyzable ``IN ()`` predicate — a memberless cohort is an
always-empty cohort, so the intersection short-circuits to empty on BOTH the
routed word-bag path and the pandas pushdown twin; escaped quotes in members
round-trip as valid SQL.
#2 (low): intersect_value over a float/double column is now REJECTED
structurally (IntersectValueTypeError at digest time; ValueError inside the
UDAF for raw-pushdown callers) instead of silently diverging between the
two execution paths.
#3 (low): the INTERSECT_VALUE dictionary decode aliases its join columns to
reserved names, so grouping by a column literally named ``value`` (the
events fixture has one) or ``did`` no longer throws an ambiguity error.
#4 (low): OlapEngine.explain prints bitmap_intersect_value alongside
bitmap_intersect.
"""

from __future__ import annotations

import pytest

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    # same cohort geometry as test_intersect_route, with two traps added:
    # a dim literally named `value` (advisor #3) and a float measure column
    # `fscore` (advisor #2)
    rows = [
        ("x", "view", 1, "red", 1.5),
        ("x", "view", 2, "red", 2.5),
        ("x", "click", 2, "red", 2.5),
        ("y", "view", 3, "blue", 3.5),
        ("y", "click", 4, "blue", 4.5),
        ("z", "view", 5, "red", 5.5),
    ]
    spark.createDataFrame(
        rows, "g string, etype string, uid int, value string, fscore double"
    ).createOrReplaceTempView("ev_r11")
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("r11_cubes")))
    eng.add_model(DataModel(name="ev_r11_star", fact_table="ev_r11"))
    eng.build_cube(
        CubeDesc(
            name="ev_r11_cube",
            model_name="ev_r11_star",
            dimensions=("g", "etype", "value"),
            measures=(
                MeasureDesc("_cnt", FunctionDesc("COUNT")),
                MeasureDesc(
                    "bm_uid", FunctionDesc("COUNT_DISTINCT", "uid", "bitmap")
                ),
            ),
        )
    )
    return eng


# ---- #1: degenerate OR literals ------------------------------------------


def test_cohort_members_degenerate_and_escaped():
    from kylin_on_parquet_v2_spark.cube.dictionary import cohort_members

    # all-empty member lists -> [] (always-empty cohort), not IN ()
    assert cohort_members("'|'") == []
    assert cohort_members("'  |  '") == []
    assert cohort_members("'||'") == []
    # escaped quote survives the split + rebuild as valid SQL
    assert cohort_members("'it''s|x'") == ["'it''s'", "'x'"]
    assert cohort_members("'a|b''c'") == ["'a'", "'b''c'"]


def test_degenerate_or_cohort_routes_to_empty_not_analysis_error(engine):
    # routed: '|' is a memberless cohort, so every intersection with it is
    # empty — count 0 per group, value "" — and the query must ANALYZE
    df = engine.sql(
        "select g, intersect_count(uid, etype, array('view','|')) as vc "
        "from ev_r11 group by g order by g",
        validate=True,
    )
    assert engine.last_route is not None and engine.last_route.bitmap_intersect
    assert {r.g: r.vc for r in df.collect()} == {"x": 0, "y": 0, "z": 0}

    dfv = engine.sql(
        "select intersect_value(uid, etype, array('view','|')) as v from ev_r11",
        validate=True,
    )
    assert engine.last_route is not None and engine.last_route.bitmap_intersect_value
    assert dfv.collect()[0].v == ""


def test_degenerate_or_cohort_pushdown_udaf(spark, engine):
    # pushdown twin (raw spark.sql over the registered UDAF) agrees
    spark.createDataFrame(
        [("view", 1), ("click", 1)], "etype string, uid int"
    ).createOrReplaceTempView("ev_r11_raw")
    row = spark.sql(
        "select intersect_count(uid, etype, array('view','|')) as vc, "
        "intersect_value(uid, etype, array('view','|')) as v from ev_r11_raw"
    ).collect()[0]
    assert (row.vc, row.v) == (0, "")


# ---- #2: float/double rejection ------------------------------------------


def test_intersect_value_float_rejected_at_digest(engine):
    from kylin_on_parquet_v2_spark.query.digest import IntersectValueTypeError

    with pytest.raises(IntersectValueTypeError, match="float|double"):
        engine.sql(
            "select intersect_value(fscore, etype, array('view','click')) as v "
            "from ev_r11"
        )


def test_intersect_value_float_rejected_in_udaf_runtime(spark):
    spark.createDataFrame(
        [("view", 1.5), ("click", 1.5)], "etype string, f double"
    ).createOrReplaceTempView("ev_r11_float")
    with pytest.raises(Exception, match="float-typed column"):
        spark.sql(
            "select intersect_value(f, etype, array('view','click')) as v "
            "from ev_r11_float"
        ).collect()


def test_intersect_count_float_still_allowed(engine):
    # the divergence is a RENDERING hazard specific to intersect_value;
    # intersect_count over the same float column keeps working (cardinality
    # only, no value rendering)
    df = engine.sql(
        "select intersect_count(uid, etype, array('view','click')) as vc "
        "from ev_r11",
        validate=True,
    )
    assert df.collect()[0].vc == 1


# ---- #3: group-by column named `value` / `did` ---------------------------


def test_intersect_value_group_by_column_named_value(engine):
    df = engine.sql(
        "select value, intersect_value(uid, etype, array('view','click')) as iv "
        "from ev_r11 group by value order by value",
        validate=True,
    )
    assert engine.last_route is not None and engine.last_route.bitmap_intersect_value
    assert {r.value: r.iv for r in df.collect()} == {"blue": "", "red": "[2]"}


# ---- #4: explain shows bitmap_intersect_value ----------------------------


def test_explain_reports_intersect_value(engine):
    txt = engine.explain(
        "select g, intersect_value(uid, etype, array('view','click')) as iv "
        "from ev_r11 group by g"
    )
    assert "bitmap_intersect_value={'iv'" in txt


# ---- verdict item 5: hamming filter precedes the pair dedup --------------


def test_perceptual_hamming_filter_before_distinct(spark):
    """The bit_count hamming filter must sit BELOW the pair-dedup exchange
    (filter-then-distinct): the exchange that feeds the distinct aggregate
    partitions on (id_a, id_b, ...) and its input must already be filtered."""
    from kylin_on_parquet_v2_spark.pipeline import multimodal as MM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = MM.dhash_features(MM.synthesize_assets(docs))
    plan = (
        MM.perceptual_neardup_pairs(hashed, max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    dedup_exchange = plan.index("hashpartitioning(id_a")
    ham_filter = plan.index("bit_count")
    # children print below parents: the filter appearing after the dedup
    # exchange in the tree dump means it executes first (deeper in the tree)
    assert ham_filter > dedup_exchange, plan
