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
def storage(spark, tpch_cube_store, seg_cube_store, tmp_path_factory):
    # clones of the session-built cubes (r14 suite-budget fix): the reload
    # semantics under test — reopen a dir some OTHER engine built — hold
    # identically for a byte-copy of another engine's build
    from tests.conftest import clone_cube_store

    d = str(tmp_path_factory.mktemp("reload_cubes"))
    clone_cube_store(tpch_cube_store, d)
    clone_cube_store(seg_cube_store, d)
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
    # same cube NAME, different (smaller) shape: load must reject, and the
    # build_if_missing degradation pays a 3-layout build instead of a
    # second 49-layout one (r14 suite budget)
    changed = dataclasses.replace(
        TPCH_CUBE,
        dimensions=tuple(reversed(TPCH_CUBE.dimensions[:2])),
        measures=TPCH_CUBE.measures[:2],
        aggregation_groups=(),
        shard_by=None,
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


def test_reload_serves_intersect_value(spark, tpch_cube_store, tmp_path):
    """INTERSECT_VALUE after a metadata-only reload: the decode reads the
    PERSISTED global dictionary through the reloaded instance's storage
    paths — no in-memory state from the building process survives (the
    files were persisted by the SESSION fixture's engine; this fresh
    engine sees only the cloned dir). Own clone: the stale-desc test
    above rebuilds the module fixture's cube under a CHANGED desc, so
    its meta no longer matches TPCH_CUBE."""
    from tests.conftest import clone_cube_store

    d = clone_cube_store(tpch_cube_store, str(tmp_path / "iv_reload"))
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
