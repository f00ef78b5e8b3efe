"""SSB metadata-block mirror: multi-cube competition over one model.

Covers the one routing dimension no other fixture exercises (r8 verdict #1):
FOUR cubes with different aggregation-group configurations over ONE model
(reference ``cube_desc/ssb.json`` + ``ssb_cube1..3.json``) competing for the
same queries, with the realization chooser deciding by measured layout rows
and, at exact ties, by measure width.
"""

from __future__ import annotations

import pytest

from kylin_on_parquet_v2_spark.query.digest import extract_digest
from kylin_on_parquet_v2_spark.query.router import plan_route
from kylin_on_parquet_v2_spark.ssb import SSB_CUBE, SSB_CUBE1, SSB_CUBE2, SSB_CUBE3

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ssb_eng(spark):
    from kylin_on_parquet_v2_spark.corpus.ssb import ssb_engine

    return ssb_engine(spark, SF_SMOKE)


# -- aggregation-group lattice shape (the descriptors' whole point) ----------


def test_mandatory_dim_in_every_cuboid(ssb_eng):
    """mandatory_dims D_YEAR: every non-trivial cuboid carries it."""
    for inst in ssb_eng.cubes.values():
        for c in inst.scheduler.cuboids.values():
            if c.n_dims:
                assert "d_year" in c.dims, (inst.desc.name, c.dims)


def test_hierarchy_prunes_orphan_descendants(ssb_eng):
    """hierarchy_dims C_REGION>C_NATION>C_CITY: no cuboid keeps a city
    without its nation and region ancestors (and likewise for nations)."""
    sched = ssb_eng.cubes["ssb"].scheduler
    for c in sched.cuboids.values():
        dims = set(c.dims)
        if "c_city" in dims:
            assert {"c_nation", "c_region"} <= dims, c.dims
        if "c_nation" in dims:
            assert "c_region" in dims, c.dims


def test_joint_dims_all_or_nothing(ssb_eng):
    """ssb_cube1's LO_QUANTITY/LO_DISCOUNT joint: never one without the
    other in any materialized cuboid."""
    sched = ssb_eng.cubes["ssb_cube1"].scheduler
    seen_pair = False
    for c in sched.cuboids.values():
        has_q, has_d = "lo_quantity" in c.dims, "lo_discount" in c.dims
        assert has_q == has_d, c.dims
        seen_pair = seen_pair or has_q
    assert seen_pair, "joint pair never materialized"


def test_max_combination_caps_lattice(ssb_eng):
    """The lattice stays metadata-sized: only base + capped combinations."""
    for name, cap in (("ssb", 3), ("ssb_cube1", 4), ("ssb_cube2", 4)):
        inst = ssb_eng.cubes[name]
        n_all = len(inst.desc.dimensions)
        for c in inst.scheduler.cuboids.values():
            assert c.n_dims <= cap or c.n_dims == n_all, (name, c.dims)


# -- multi-cube competition ---------------------------------------------------


def _routes_for(eng, sql):
    digest = extract_digest(eng.spark.sql(sql))
    assert digest is not None
    return {
        name: plan_route(digest, inst)
        for name, inst in eng.cubes.items()
        if plan_route(digest, inst) is not None
    }


_Q2_SHAPE = """
    select d_year, p_brand, sum(lo_revenue) as lo_revenue
    from v_lineorder
      join ssb_dates on lo_orderdate = d_datekey
      join ssb_part on lo_partkey = p_partkey
      join ssb_supplier on lo_suppkey = s_suppkey
    where p_category = 'MFGR#12' and s_region = 'AMERICA'
    group by d_year, p_brand
"""

_SUPPLIER_DRILL = """
    select d_year, s_nation, s_city, sum(lo_revenue) as revenue
    from v_lineorder
      join ssb_supplier on lo_suppkey = s_suppkey
      join ssb_dates on lo_orderdate = d_datekey
    where s_region = 'EUROPE'
    group by d_year, s_nation, s_city
"""


def test_q2_tie_broken_by_measure_width(ssb_eng):
    """Q2's {lo_partkey, s_region, d_year} cuboid is materialized by the
    full cube AND both supplier variants with identical row counts; the
    chooser must take the narrowest-measure cube (ssb_cube3)."""
    routes = _routes_for(ssb_eng, _Q2_SHAPE)
    assert {"ssb", "ssb_cube2", "ssb_cube3"} <= set(routes)
    rows = {
        n: ssb_eng.cubes[n].layout_rows[r.cuboid.cuboid_id] for n, r in routes.items()
    }
    assert rows["ssb"] == rows["ssb_cube2"] == rows["ssb_cube3"]
    ssb_eng.sql(_Q2_SHAPE)
    assert ssb_eng.last_route is not None
    assert ssb_eng.last_route.cube == "ssb_cube3"
    # and the route recovers P_CATEGORY/P_BRAND as DERIVED via lo_partkey
    assert [lk.name for lk in ssb_eng.last_route.derived] == ["ssb_part"]


def test_supplier_drill_won_by_measured_rows(ssb_eng):
    """A 4-dim supplier drill: the variants materialize the exact cuboid;
    the full cube (max_combination=3) must fall back to its 11-dim base.
    The chooser picks the variant BECAUSE its layout has fewer rows."""
    routes = _routes_for(ssb_eng, _SUPPLIER_DRILL)
    assert {"ssb", "ssb_cube2", "ssb_cube3"} <= set(routes)
    full = routes["ssb"]
    assert full.cuboid.n_dims == len(SSB_CUBE.dimensions)  # base fallback
    full_rows = ssb_eng.cubes["ssb"].layout_rows[full.cuboid.cuboid_id]
    var_rows = ssb_eng.cubes["ssb_cube3"].layout_rows[
        routes["ssb_cube3"].cuboid.cuboid_id
    ]
    assert routes["ssb_cube3"].cuboid.n_dims == 4
    assert var_rows < full_rows, (var_rows, full_rows)
    ssb_eng.sql(_SUPPLIER_DRILL)
    assert ssb_eng.last_route is not None
    assert ssb_eng.last_route.cube == "ssb_cube3"


def test_q1_served_from_materialized_joint_cuboid(ssb_eng):
    """Q1.1 routes onto ssb_cube1's 3-dim {d_year, quantity, discount}
    cuboid — materialized, not the base-cuboid fallback."""
    ssb_eng.sql(
        """
        select sum(lo_extendedprice * lo_discount) as revenue
        from v_lineorder join ssb_dates on lo_orderdate = d_datekey
        where d_year = 1996 and lo_discount between 1 and 3 and lo_quantity < 25
        """
    )
    route = ssb_eng.last_route
    assert route is not None and route.cube == "ssb_cube1"
    assert set(route.cuboid.dims) == {"d_year", "lo_quantity", "lo_discount"}


def test_q3_only_full_cube_spans_both_geographies(ssb_eng):
    """Customer × supplier flights: the variants must stand aside."""
    routes = _routes_for(
        ssb_eng,
        """
        select c_nation, s_nation, d_year, sum(lo_revenue) as revenue
        from v_lineorder
          join ssb_customer on lo_custkey = c_custkey
          join ssb_supplier on lo_suppkey = s_suppkey
          join ssb_dates on lo_orderdate = d_datekey
        where c_region = 'ASIA' and s_region = 'ASIA'
          and d_year between 1995 and 1999
        group by c_nation, s_nation, d_year
        """,
    )
    assert set(routes) == {"ssb"}


def test_variant_measure_sets_mirror_reference():
    """cube3 is cube2 minus TOTAL_SUPPLYCOST (the reference pair's exact
    delta); the full cube additionally carries the Q4 profit measure."""
    m2 = {m.name for m in SSB_CUBE2.measures}
    m3 = {m.name for m in SSB_CUBE3.measures}
    assert m2 - m3 == {"total_supplycost"}
    assert {m.name for m in SSB_CUBE.measures} - m2 == {"sum_profit"}
    assert {m.name for m in SSB_CUBE1.measures} == m2
