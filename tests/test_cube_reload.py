"""Cube metadata persistence: a NEW engine process reopens built cubes from
cube_meta.json and serves routed queries without re-cubing (reference
CubeManager restart semantics — CubeInstance JSON reloads from the metadata
store, core-cube/.../CubeManager.java)."""

from __future__ import annotations

import dataclasses

import pytest

from kylin_on_parquet_v2_spark.datasets import (
    TPCH_CUBE,
    TPCH_CUBE_SEG,
    TPCH_MODEL,
    TPCH_MODEL_SEG,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def storage(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reload_cubes"))
    eng = OlapEngine(spark, storage_dir=d)
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL)
    eng.add_model(TPCH_MODEL_SEG)
    eng.build_cube(TPCH_CUBE)
    eng.build_cube(TPCH_CUBE_SEG)
    return d


def _fresh_engine(spark, storage):
    eng = OlapEngine(spark, storage_dir=storage)
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL)
    eng.add_model(TPCH_MODEL_SEG)
    return eng


def test_reload_serves_routed_queries(spark, storage):
    eng = _fresh_engine(spark, storage)
    eng.load_cube(TPCH_CUBE)
    eng.load_cube(TPCH_CUBE_SEG)
    eng.sql(
        """select l_returnflag, l_linestatus, sum(l_quantity) as s, count(*) as n
           from lineitem group by l_returnflag, l_linestatus""",
        validate=True,
    )
    assert eng.last_route is not None and eng.last_route.exact


def test_reload_recovers_derived_and_segments(spark, storage):
    """column_tables + snapshots + segment metadata survive the reload:
    derived-dimension recovery and segment pruning still work."""
    eng = _fresh_engine(spark, storage)
    inst = eng.load_cube(TPCH_CUBE_SEG)
    assert inst.segmented and inst.column_tables and inst.snapshots
    eng.sql(
        """select n_name, count(*) as n
           from lineitem
             join orders on l_orderkey = o_orderkey
             join customer on o_custkey = c_custkey
             join nation on c_nationkey = n_nationkey
           group by n_name""",
        validate=True,
    )
    route = eng.last_route
    assert route is not None and route.derived


def test_reload_rejects_stale_desc(spark, storage):
    """A CubeDesc edit (different dims) invalidates persisted layouts —
    load must refuse rather than serve wrong-shaped data."""
    eng = _fresh_engine(spark, storage)
    changed = dataclasses.replace(
        TPCH_CUBE, dimensions=tuple(reversed(TPCH_CUBE.dimensions))
    )
    with pytest.raises(FileNotFoundError):
        eng.load_cube(changed)
    inst = eng.load_cube(changed, build_if_missing=True)  # degrades to build
    assert inst.layouts


def test_load_missing_raises(spark, tmp_path):
    eng = OlapEngine(spark, storage_dir=str(tmp_path))
    eng.register_sources(SF_SMOKE)
    eng.add_model(TPCH_MODEL)
    with pytest.raises(FileNotFoundError):
        eng.load_cube(TPCH_CUBE)


def test_reload_serves_intersect_value(spark, tmp_path):
    """INTERSECT_VALUE after a metadata-only reload: the decode reads the
    PERSISTED global dictionary through the reloaded instance's storage
    paths — no in-memory state from the building process survives. Own
    storage dir: the stale-desc test above rebuilds the shared fixture's
    cube under a CHANGED desc, so its meta no longer matches TPCH_CUBE."""
    d = str(tmp_path / "iv_reload")
    builder_eng = _fresh_engine(spark, d)
    builder_eng.build_cube(TPCH_CUBE)
    eng = _fresh_engine(spark, d)
    eng.load_cube(TPCH_CUBE)
    df = eng.sql(
        """
        select l_linestatus,
               intersect_value(l_partkey, l_returnflag, array('A','R')) as v,
               intersect_count(l_partkey, l_returnflag, array('A','R')) as n
        from lineitem group by l_linestatus order by l_linestatus
        """,
        validate=True,
    )
    route = eng.last_route
    assert route is not None and route.bitmap_intersect_value, route
    for r in df.collect():
        # the rendered list's length must agree with the count twin
        assert (len(r.v.strip("[]").split(",")) if r.v else 0) == r.n
