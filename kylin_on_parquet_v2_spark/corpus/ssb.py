"""SSB query flights, cube-routed over the mirrored SSB metadata block.

The 13 Star Schema Benchmark flights (Q1.1–Q4.3, O'Neil et al., "The Star
Schema Benchmark and Augmented Fact Table Indexing") run through
``OlapEngine.sql`` against FOUR competing cubes over one model
(``kylin_on_parquet_v2_spark/ssb.py`` — the mirror of the reference's
``cube_desc/ssb.json`` + ``ssb_cube1..3.json``). Every flight asserts WHICH
cube the realization chooser picked:

- Q1.x  → ``ssb_cube1`` (the only variant carrying the quantity/discount
  joint dims) — served from materialized 3/4-dim cuboids;
- Q2.x  → ``ssb_cube3`` (full cube, cube2 and cube3 all materialize the
  identical {lo_partkey, s_region, d_year} cuboid → equal rows → the
  narrower-measure cube wins the tiebreak), with P_CATEGORY/P_BRAND served
  DERIVED through the lo_partkey host key;
- Q3.x / Q4.x → ``ssb`` (the only cube spanning customer AND supplier),
  re-aggregated from its base cuboid — the join work is still pre-paid.

Each flight is oracle-checked: the DuckDB side replays the exact SSB view
derivations as CTEs (``ssb.ORACLE_CTE``) plus the same flight body.
Constants are adapted to the driver testdata's domains (years 1995–2001,
nations ``NATION_0..24``, cities ``<nation>_C<digit>``).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import BUILD_TIMINGS, proc_tmp
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from kylin_on_parquet_v2_spark.ssb import (
    ALL_SSB_CUBES,
    ORACLE_CTE,
    SSB_MODEL,
    register_ssb_views,
)

_ENGINES: dict[str, OlapEngine] = {}


def ssb_engine(spark: SparkSession, sf_dir: str) -> OlapEngine:
    """Engine with the four SSB cubes built (cached per sf_dir). Separate
    from the TPC-H fixture engine: the SSB block is its own metadata world,
    and flights must compete only among SSB realizations."""
    key = os.path.abspath(sf_dir)
    eng = _ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    storage = proc_tmp("ssb_cubes", key.strip("/").replace("/", "_"))
    eng = OlapEngine(spark, storage_dir=storage)
    eng.register_sources(sf_dir)
    # AFTER register_sources: the derived views read the source views
    register_ssb_views(spark)
    eng.add_model(SSB_MODEL)

    def _timed_build(desc):
        t0 = time.perf_counter()
        eng.build_cube(desc)
        BUILD_TIMINGS[desc.name] = round(time.perf_counter() - t0, 4)

    # four independent cubing jobs over one session — overlapping their many
    # small layout writes is exactly how a deployment schedules them
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(_timed_build, ALL_SSB_CUBES))
    _ENGINES[key] = eng
    return eng


# -- flight bodies (shared Spark/DuckDB; {m} = the measure spelling) ---------

_FLIGHTS: dict[str, dict] = {
    # Q1: one-dim date slices with discount/quantity predicates — the
    # v_revenue computed-column rewrite (model_desc/ssb.json's V_REVENUE)
    "ssb_q1_1": dict(
        body="""
            select {m}
            from v_lineorder join ssb_dates on lo_orderdate = d_datekey
            where d_year = 1996
              and lo_discount between 1 and 3 and lo_quantity < 25
        """,
        measure=("sum(lo_extendedprice * lo_discount)", "revenue"),
        out=(), cube="ssb_cube1",
    ),
    "ssb_q1_2": dict(
        body="""
            select {m}
            from v_lineorder join ssb_dates on lo_orderdate = d_datekey
            where d_yearmonthnum = 199601
              and lo_discount between 4 and 6 and lo_quantity between 26 and 35
        """,
        measure=("sum(lo_extendedprice * lo_discount)", "revenue"),
        out=(), cube="ssb_cube1",
    ),
    "ssb_q1_3": dict(
        body="""
            select {m}
            from v_lineorder join ssb_dates on lo_orderdate = d_datekey
            where d_weeknuminyear = 6 and d_year = 1997
              and lo_discount between 5 and 7 and lo_quantity between 26 and 35
        """,
        measure=("sum(lo_extendedprice * lo_discount)", "revenue"),
        out=(), cube="ssb_cube1",
    ),
    # Q2: part drill (derived P_CATEGORY/P_BRAND through lo_partkey) sliced
    # by supplier region — the multi-cube tie broken toward the narrowest
    "ssb_q2_1": dict(
        body="""
            select d_year, p_brand, {m}
            from v_lineorder
              join ssb_dates on lo_orderdate = d_datekey
              join ssb_part on lo_partkey = p_partkey
              join ssb_supplier on lo_suppkey = s_suppkey
            where p_category = 'MFGR#12' and s_region = 'AMERICA'
            group by d_year, p_brand
        """,
        measure=("sum(lo_revenue)", "lo_revenue"),
        out=("d_year", "p_brand"), cube="ssb_cube3",
    ),
    "ssb_q2_2": dict(
        body="""
            select d_year, p_brand, {m}
            from v_lineorder
              join ssb_dates on lo_orderdate = d_datekey
              join ssb_part on lo_partkey = p_partkey
              join ssb_supplier on lo_suppkey = s_suppkey
            where p_brand between 'MFGR#2221' and 'MFGR#2228' and s_region = 'ASIA'
            group by d_year, p_brand
        """,
        measure=("sum(lo_revenue)", "lo_revenue"),
        out=("d_year", "p_brand"), cube="ssb_cube3",
    ),
    "ssb_q2_3": dict(
        body="""
            select d_year, p_brand, {m}
            from v_lineorder
              join ssb_dates on lo_orderdate = d_datekey
              join ssb_part on lo_partkey = p_partkey
              join ssb_supplier on lo_suppkey = s_suppkey
            where p_brand = 'MFGR#2222' and s_region = 'EUROPE'
            group by d_year, p_brand
        """,
        measure=("sum(lo_revenue)", "lo_revenue"),
        out=("d_year", "p_brand"), cube="ssb_cube3",
    ),
    # Q3: customer × supplier geography — only the full cube spans both
    "ssb_q3_1": dict(
        body="""
            select c_nation, s_nation, d_year, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_region = 'ASIA' and s_region = 'ASIA'
              and d_year between 1995 and 1999
            group by c_nation, s_nation, d_year
        """,
        measure=("sum(lo_revenue)", "revenue"),
        out=("c_nation", "s_nation", "d_year"), cube="ssb",
    ),
    "ssb_q3_2": dict(
        body="""
            select c_city, s_city, d_year, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_nation = 'NATION_3' and s_nation = 'NATION_3'
              and d_year between 1995 and 1999
            group by c_city, s_city, d_year
        """,
        measure=("sum(lo_revenue)", "revenue"),
        out=("c_city", "s_city", "d_year"), cube="ssb",
    ),
    "ssb_q3_3": dict(
        body="""
            select c_city, s_city, d_year, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_city in ('NATION_3_C3', 'NATION_3_C7')
              and s_city in ('NATION_3_C3', 'NATION_3_C8', 'NATION_8_C6')
              and d_year between 1995 and 1999
            group by c_city, s_city, d_year
        """,
        measure=("sum(lo_revenue)", "revenue"),
        out=("c_city", "s_city", "d_year"), cube="ssb",
    ),
    "ssb_q3_4": dict(
        body="""
            select c_city, s_city, d_year, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_city in ('NATION_3_C3', 'NATION_3_C7')
              and s_city in ('NATION_3_C3', 'NATION_3_C8', 'NATION_8_C6')
              and d_yearmonth = 'Mar1999'
            group by c_city, s_city, d_year
        """,
        measure=("sum(lo_revenue)", "revenue"),
        out=("c_city", "s_city", "d_year"), cube="ssb",
    ),
    # Q4: profit drill — the sum(lo_revenue - lo_supplycost) expression
    # rewritten onto the materialized 'profit' computed column
    "ssb_q4_1": dict(
        body="""
            select d_year, c_nation, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_part on lo_partkey = p_partkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_region = 'AMERICA' and s_region = 'AMERICA'
              and p_mfgr in ('MFGR#1', 'MFGR#2')
            group by d_year, c_nation
        """,
        measure=("sum(lo_revenue - lo_supplycost)", "profit"),
        out=("d_year", "c_nation"), cube="ssb",
    ),
    "ssb_q4_2": dict(
        body="""
            select d_year, s_nation, p_category, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_part on lo_partkey = p_partkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_region = 'AMERICA' and s_region = 'AMERICA'
              and d_year in (1997, 1998) and p_mfgr in ('MFGR#1', 'MFGR#2')
            group by d_year, s_nation, p_category
        """,
        measure=("sum(lo_revenue - lo_supplycost)", "profit"),
        out=("d_year", "s_nation", "p_category"), cube="ssb",
    ),
    "ssb_q4_3": dict(
        body="""
            select d_year, s_city, p_brand, {m}
            from v_lineorder
              join ssb_customer on lo_custkey = c_custkey
              join ssb_supplier on lo_suppkey = s_suppkey
              join ssb_part on lo_partkey = p_partkey
              join ssb_dates on lo_orderdate = d_datekey
            where c_region = 'AMERICA' and s_nation = 'NATION_21'
              and d_year in (1997, 1998) and p_category = 'MFGR#14'
            group by d_year, s_city, p_brand
        """,
        measure=("sum(lo_revenue - lo_supplycost)", "profit"),
        out=("d_year", "s_city", "p_brand"), cube="ssb",
    ),
}


def _flight(name: str, spec: dict):
    expr, alias = spec["measure"]
    body = spec["body"]
    out_cols, expect_cube = spec["out"], spec["cube"]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = ssb_engine(spark, sf_dir)
        df = eng.sql(body.format(m=f"{expr} as {alias}"))
        route = eng.last_route
        assert route is not None, f"expected a cube route for {name}"
        assert route.cube == expect_cube, (name, route.cube, route)
        cols = [F.col(c) for c in out_cols] + [F.round(alias, 2).alias(alias)]
        return df.select(*cols).orderBy(*out_cols) if out_cols else df.select(*cols)

    fn.__name__ = name
    fn.__doc__ = f"SSB flight {name[4:].replace('_', '.')} routed onto {expect_cube}."
    return fn


def _oracle(spec: dict) -> str:
    expr, alias = spec["measure"]
    return ORACLE_CTE + spec["body"].format(m=f"round({expr}, 2) as {alias}")


QUERIES = {name: _flight(name, spec) for name, spec in _FLIGHTS.items()}
ORACLES = {name: _oracle(spec) for name, spec in _FLIGHTS.items()}
