"""Storage shim tests (round-3 verdict item 9): layout IO must work through
one interface for both bare local paths and URI-scheme paths (object-store
deployability). The Hadoop backend is exercised against ``file:`` URIs —
the same FileSystem API surface s3a/abfs/hdfs implement."""

from __future__ import annotations

import pytest

import os

from kylin_on_parquet_v2_spark import fs as FS


def test_fs_for_dispatch(spark):
    assert isinstance(FS.fs_for("/tmp/x"), FS.LocalFS)
    assert isinstance(FS.fs_for("file:/tmp/x", spark), FS.HadoopFS)
    assert isinstance(FS.fs_for("s3a://bucket/x", spark), FS.HadoopFS)


def test_local_roundtrip(tmp_path):
    fs = FS.LocalFS()
    d = str(tmp_path / "a")
    fs.makedirs(d)
    assert fs.exists(d)
    FS.write_json(os.path.join(d, "m.json"), {"k": 1})
    assert FS.read_json(os.path.join(d, "m.json")) == {"k": 1}
    fs.rename(d, str(tmp_path / "b"))
    assert not fs.exists(d) and fs.exists(str(tmp_path / "b"))
    fs.rmtree(str(tmp_path / "b"))
    assert not fs.exists(str(tmp_path / "b"))


def test_hadoop_backend_on_file_uri(spark, tmp_path):
    fs = FS.HadoopFS(spark)
    d = f"file:{tmp_path}/h/x"
    fs.makedirs(d)
    assert fs.exists(d)
    fs.write_text(d + "/m.json", '{"k": 2}')
    assert FS.read_json(d + "/m.json", spark) == {"k": 2}
    assert "m.json" in fs.listdir(d)
    fs.rename(d + "/m.json", d + "/n.json")
    assert fs.listdir(d) == ["n.json"]
    sizes = dict(fs.file_sizes(d))
    assert len(sizes) == 1 and next(iter(sizes.values())) == len('{"k": 2}')
    fs.rmtree(d)
    assert not fs.exists(d)


def test_parquet_rows_both_backends(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(123).coalesce(1).write.parquet(p)
    assert FS.parquet_rows(p) == 123
    assert FS.parquet_rows(f"file:{p}", spark) == 123
    assert FS.parquet_rows(str(tmp_path / "missing")) is None
    assert FS.dir_bytes(p) > 0
    assert FS.dir_bytes(f"file:{p}", spark) == FS.dir_bytes(p)


def test_cube_build_and_route_on_uri_storage(spark, tmp_path):
    """End-to-end: cube build + routed query with the storage dir addressed
    through the Hadoop FileSystem (file: URI stands in for s3a/abfs) — the
    object-store deployment shape."""
    from kylin_on_parquet_v2_spark.query.engine import OlapEngine
    from kylin_on_parquet_v2_spark.session import register_views
    from tests.conftest import SF_SMOKE

    from kylin_on_parquet_v2_spark.datasets import TPCH_CUBE, TPCH_MODEL

    register_views(spark, SF_SMOKE)
    eng = OlapEngine(spark, storage_dir=f"file:{tmp_path}/cubes")
    eng.add_model(TPCH_MODEL)
    inst = eng.build_cube(TPCH_CUBE)
    assert inst.layout_rows, "footer row counts must work through the shim"
    df = eng.sql(
        """select l_returnflag, sum(l_quantity) as s, count(*) as n
           from lineitem group by l_returnflag order by l_returnflag""",
        validate=True,
    )
    assert eng.last_route is not None
    assert df.count() > 0


def test_hadoop_exclusive_create_classifies_java_exceptions():
    """r13 review: write_text_exclusive must only treat 'file already
    exists' as losing the init race; permission/connectivity failures
    must surface, or a caller would read a stamp that was never written.
    Exercised with stub Java exception objects (no HDFS in the sandbox):
    the classifier walks getClass/getCause and RemoteException payloads."""
    from kylin_on_parquet_v2_spark.fs import HadoopFS

    class _JClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class _JExc:
        def __init__(self, cls_name, cause=None, remote_cls=None):
            self._cls, self._cause, self._remote = cls_name, cause, remote_cls

        def getClass(self):
            return _JClass(self._cls)

        def getCause(self):
            return self._cause

        def getClassName(self):
            return self._remote or ""

    class _PyExc:
        def __init__(self, j):
            self.java_exception = j

    already = _PyExc(_JExc("org.apache.hadoop.fs.FileAlreadyExistsException"))
    assert HadoopFS._is_already_exists(already) is True
    nested = _PyExc(
        _JExc(
            "java.io.IOException",
            cause=_JExc("java.nio.file.FileAlreadyExistsException"),
        )
    )
    assert HadoopFS._is_already_exists(nested) is True
    remote = _PyExc(
        _JExc(
            "org.apache.hadoop.ipc.RemoteException",
            remote_cls="org.apache.hadoop.fs.FileAlreadyExistsException",
        )
    )
    assert HadoopFS._is_already_exists(remote) is True
    denied = _PyExc(
        _JExc("org.apache.hadoop.security.AccessControlException")
    )
    assert HadoopFS._is_already_exists(denied) is False
    # a cause CYCLE must not loop forever
    a = _JExc("java.io.IOException")
    a._cause = a
    assert HadoopFS._is_already_exists(_PyExc(a)) is False


def test_local_write_text_is_atomic_and_tmp_hidden(tmp_path, monkeypatch):
    """r13: write_text publishes via dot-tmp + rename, so a crash mid-write
    never truncates the previous content (cube meta / hybrid cover are
    overwritten in place), and listdir never surfaces the in-flight temp."""
    import os

    from kylin_on_parquet_v2_spark import fs as FS

    local = FS.LocalFS()
    p = str(tmp_path / "meta.json")
    local.write_text(p, "v1")
    assert local.read_text(p) == "v1"
    # no temp residue, and a planted dotfile is hidden from listdir
    (tmp_path / ".meta.json.tmp~").write_text("partial")
    assert local.listdir(str(tmp_path)) == ["meta.json"]
    (tmp_path / ".meta.json.tmp~").unlink()

    # crash between the tmp write and the rename: old content survives
    def boom(src, dst):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        local.write_text(p, "v2")
    monkeypatch.undo()
    assert local.read_text(p) == "v1"
    local.write_text(p, "v2")
    assert local.read_text(p) == "v2"
