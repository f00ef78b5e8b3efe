"""Parquet bloom filters on declared high-cardinality dims (round-11
verdict item 2; reference intent: the realtime store's per-fragment
inverted index, stream-core/.../storage/columnar/invertindex/*).

Layouts are written rowkey-ordered, so LEADING dims skip row groups via
min/max stats; an equality probe on a NON-leading high-cardinality dim
(values scattered across every row group) scans everything unless the
row groups carry bloom filters. The skipping test measures exactly that:
scan-node output rows (= rows surviving row-group pruning) with vs
without the filter, same data, same probe. The hash test proves results
are unchanged — blooms are a pure storage-level accelerator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.metadata import (
    CubeDesc,
    DataModel,
    FunctionDesc,
    MeasureDesc,
)
from kylin_on_parquet_v2_spark.query.engine import OlapEngine

N = 200_000
PROBE_UID = 123_457


def _scan_output_rows(df) -> int:
    """Rows produced by the parquet scan node AFTER row-group/page pruning
    (the vectorized reader emits every row of surviving row groups; exact
    filtering happens above the scan)."""
    df.collect()

    def walk(node):
        if "Scan" in str(node.getClass().getSimpleName()):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if str(kv._1()) == "numOutputRows":
                    return int(kv._2().value())
        cit = node.children().iterator()
        while cit.hasNext():
            r = walk(cit.next())
            if r is not None:
                return r
        return None

    rows = walk(df._jdf.queryExecution().executedPlan())
    assert rows is not None, "no scan node found"
    return rows


def _fact(spark):
    # uid scattered (multiplicative shuffle) so every row group's uid
    # min/max spans ~the full range: min/max stats cannot skip, only blooms
    return spark.range(N).select(
        (F.col("id") % 37).alias("a"),
        (F.col("id") % 113).alias("b"),
        (F.col("id") * 7919 % N).alias("uid"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    _fact(spark).createOrReplaceTempView("bloom_fact")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)  # many row groups per file
    try:
        out = {}
        for name, bloom in (("bf_on", ("uid",)), ("bf_off", ())):
            eng = OlapEngine(
                spark, storage_dir=str(tmp_path_factory.mktemp(f"{name}_cubes"))
            )
            eng.add_model(DataModel(name=f"{name}_star", fact_table="bloom_fact"))
            eng.build_cube(
                CubeDesc(
                    name=f"{name}_cube",
                    model_name=f"{name}_star",
                    dimensions=("a", "b", "uid"),
                    measures=(
                        MeasureDesc("_cnt", FunctionDesc("COUNT")),
                        MeasureDesc("sum_v", FunctionDesc("SUM", "v")),
                    ),
                    bloom_filter_dims=bloom,
                    bloom_filter_ndv={"uid": N} if bloom else {},
                )
            )
            out[name] = eng
        yield out
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)


def _base_layout(eng, cube):
    inst = eng.cubes[cube]
    base_id = max(inst.layouts)
    return inst.layouts[base_id]


def test_bloom_probe_skips_row_groups(spark, engines):
    """Equality probe on the non-leading uid dim: the bloom-filtered layout
    must scan a small fraction of what the plain layout scans."""
    with_rows = _scan_output_rows(
        spark.read.parquet(_base_layout(engines["bf_on"], "bf_on_cube")).filter(
            F.col("uid") == PROBE_UID
        )
    )
    without_rows = _scan_output_rows(
        spark.read.parquet(_base_layout(engines["bf_off"], "bf_off_cube")).filter(
            F.col("uid") == PROBE_UID
        )
    )
    # plain layout: scattered uid defeats min/max -> reads ~everything
    assert without_rows > N // 2, without_rows
    # bloom layout: only the true group (+ rare false positives) survives
    assert with_rows < without_rows // 10, (with_rows, without_rows)


def test_bloom_results_unchanged(engines):
    """Blooms must not change answers: routed == pushdown on both cubes,
    and both cubes agree with each other."""
    q = (
        f"select uid, count(*) as n, sum(v) as sum_v from bloom_fact "
        f"where uid = {PROBE_UID} group by uid"
    )
    rows = {}
    for name in ("bf_on", "bf_off"):
        eng = engines[name]
        df = eng.sql(q, validate=True)
        assert eng.last_route is not None
        rows[name] = [tuple(r) for r in df.collect()]
    assert rows["bf_on"] == rows["bf_off"] and len(rows["bf_on"]) == 1


def test_merge_preserves_blooms(spark, tmp_path_factory):
    """A merged segmented layout keeps its bloom filters (losing them on
    merge would silently drop the point-lookup skipping)."""
    from kylin_on_parquet_v2_spark.cube.merge import merge_segments

    _fact(spark).withColumn(
        "d",
        F.to_date(
            F.concat(F.lit("2024-0"), (F.col("a") % 3 + 1).cast("string"), F.lit("-01"))
        ),
    ).createOrReplaceTempView("bloom_seg_fact")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    try:
        eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("bfm_cubes")))
        eng.add_model(
            DataModel(
                name="bfm_star", fact_table="bloom_seg_fact", partition_column="d"
            )
        )
        eng.build_cube(
            CubeDesc(
                name="bfm_cube",
                model_name="bfm_star",
                dimensions=("a", "b", "uid"),
                measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
                segment_granularity="month",
                bloom_filter_dims=("uid",),
                bloom_filter_ndv={"uid": N},
            )
        )
        inst = eng.cubes["bfm_cube"]
        segs = inst.segments(spark)
        assert len(segs) >= 2, segs
        merge_segments(spark, inst, segs, segs[-1])
        scanned = _scan_output_rows(
            spark.read.parquet(_base_layout(eng, "bfm_cube")).filter(
                F.col("uid") == PROBE_UID
            )
        )
        assert scanned < N // 10, scanned
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)


def test_compaction_writes_blooms(spark, tmp_path):
    """compact_fragments(bloom_cols=...) produces compacted files whose
    row groups skip on an equality probe."""
    from kylin_on_parquet_v2_spark.streaming.compaction import compact_fragments

    store = str(tmp_path / "store")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    try:
        # 6 fragment files in one closed day dir + a newest dir (skipped)
        for k in range(6):
            _fact(spark).filter(F.col("uid") % 6 == k).write.mode("append").parquet(
                store + "/__segment__=2024-01-01"
            )
        _fact(spark).limit(10).write.mode("append").parquet(
            store + "/__segment__=2024-01-02"
        )
        out = compact_fragments(
            spark,
            store,
            max_fragments=2,
            sort_col="a",
            bloom_cols={"uid": N},
        )
        assert "2024-01-01" in out
        scanned = _scan_output_rows(
            spark.read.parquet(store + "/__segment__=2024-01-01").filter(
                F.col("uid") == PROBE_UID
            )
        )
        assert scanned < N // 10, scanned
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)


def test_bucketed_layout_writes_blooms(spark, tmp_path_factory):
    """bucketBy/saveAsTable layouts must carry the bloom options too — the
    bucketed writer is a separate code path from the dir-partitioned one."""
    _fact(spark).createOrReplaceTempView("bloom_bkt_fact")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    try:
        eng = OlapEngine(spark, storage_dir=str(tmp_path_factory.mktemp("bfb_cubes")))
        eng.add_model(DataModel(name="bfb_star", fact_table="bloom_bkt_fact"))
        eng.build_cube(
            CubeDesc(
                name="bfb_cube",
                model_name="bfb_star",
                dimensions=("a", "b", "uid"),
                measures=(MeasureDesc("_cnt", FunctionDesc("COUNT")),),
                shard_by="a",
                shard_buckets=4,
                bucket_layouts=True,
                bloom_filter_dims=("uid",),
                bloom_filter_ndv={"uid": N},
            )
        )
        scanned = _scan_output_rows(
            spark.read.parquet(_base_layout(eng, "bfb_cube")).filter(
                F.col("uid") == PROBE_UID
            )
        )
        assert scanned < N // 10, scanned
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)
