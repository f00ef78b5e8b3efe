"""Property-based intersect-family checks: for RANDOM cohort combinations
(including '|' OR-unions), grouped or global, the routed word-bag answer,
the pandas pushdown twin and a plain-Python set computation over the same
rows must all agree — INTERSECT_COUNT and INTERSECT_VALUE alike
(IntersectBitmapCounter / RetentionPartialResult semantics)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

ETYPES = ["view", "click", "buy", "share"]

# 120 deterministic events: user u does etype e iff (u * 7 + ETYPES.index(e) * 13) % 3 != 0
# over groups g0/g1 — dense enough for non-trivial intersections, sparse
# enough that they differ per cohort
ROWS = [
    (f"g{u % 2}", e, u)
    for u in range(30)
    for i, e in enumerate(ETYPES)
    if (u * 7 + i * 13) % 3 != 0
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    spark.createDataFrame(ROWS, "g string, etype string, uid int").createOrReplaceTempView(
        "ip_f"
    )
    eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("ip_cubes")))
    eng.add_model(DataModel(name="ip_star", fact_table="ip_f"))
    eng.build_cube(
        CubeDesc(
            name="ip_cube",
            model_name="ip_star",
            dimensions=("g", "etype"),
            measures=(
                MeasureDesc("_cnt", FunctionDesc("COUNT")),
                MeasureDesc("bm_uid", FunctionDesc("COUNT_DISTINCT", "uid", "bitmap")),
            ),
        )
    )
    return eng


def _py_intersection(cohorts: list[str], group: str | None) -> set[int]:
    """Reference semantics in plain Python over ROWS."""
    inter: set[int] | None = None
    for c in cohorts:
        members = [m.strip() for m in c.split("|") if m.strip()]
        s = {
            u
            for g, e, u in ROWS
            if e in members and (group is None or g == group)
        }
        inter = s if inter is None else inter & s
    return inter or set()


# cohorts: subsets of ETYPES, sometimes joined into one '|' OR-union
_single = st.sampled_from(ETYPES)
_union = st.lists(_single, min_size=2, max_size=3, unique=True).map("|".join)
_cohort = st.one_of(_single, _union)
_cohorts = st.lists(_cohort, min_size=1, max_size=3, unique=True)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cohorts=_cohorts, grouped=st.booleans())
def test_random_cohorts_routed_equals_python_and_pushdown(engine, cohorts, grouped):
    arr = ", ".join(f"'{c}'" for c in cohorts)
    sel = (
        f"intersect_count(uid, etype, array({arr})) as n, "
        f"intersect_value(uid, etype, array({arr})) as v"
    )
    if grouped:
        sql = f"select g, {sel} from ip_f group by g order by g"
    else:
        sql = f"select {sel} from ip_f"
    df = engine.sql(sql, validate=True)  # routed == pandas pushdown
    route = engine.last_route
    assert route is not None and route.bitmap_intersect_value, route
    for r in df.collect():
        group = r["g"] if grouped else None
        exp = _py_intersection(cohorts, group)
        assert r["n"] == len(exp), (cohorts, group)
        exp_v = "[" + ",".join(str(u) for u in sorted(exp)) + "]" if exp else ""
        assert r["v"] == exp_v, (cohorts, group)
