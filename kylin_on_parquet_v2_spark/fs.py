"""Layout-storage filesystem shim.

All driver-side layout/metadata IO — parquet row counts from footers,
segment-dir listing, merge staging/swap, meta JSON — goes through this one
interface so a deployment whose ``storage_dir`` is an object store
(``s3a://``, ``abfs://``, ``hdfs://``) works unchanged: paths carrying a URI
scheme route through the Hadoop FileSystem of the active SparkSession's JVM,
bare paths use the local OS. (DataFrame reads/writes already accept any
scheme natively — only the driver-side bookkeeping needed the shim.)

Reference parity: the reference engine does all layout IO through
``HadoopUtil.getWorkingFileSystem`` (``kylin.env.hdfs-working-dir`` is
HDFS/S3 in production); ``PathManager`` composes the same
``{storage}/{cube}/cuboid=...`` scheme this repo uses.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from collections.abc import Iterator

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://|^file:/")


class LocalFS:
    """POSIX implementation — the test/bench path."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        # dotfiles hidden, matching file_sizes (and the Hadoop local FS):
        # they are checksum sidecars or in-flight ``.{name}.tmp~`` publishes,
        # never addressable content — a ledger/fragment listing must not
        # surface a crashed write_text's temp file as an entry
        return [n for n in os.listdir(path) if not n.startswith(".")]

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def remove(self, path: str) -> None:
        """Delete a single file; absent is fine (idempotent un-commit)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def file_sizes(self, path: str) -> Iterator[tuple[str, int]]:
        # skip dotfiles (.crc checksum sidecars etc.) to match the Hadoop
        # local FileSystem, whose ChecksumFileSystem hides them; '_'-prefixed
        # entries (__segment__= dirs, 0-byte _SUCCESS) stay visible on both
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(".")]
            for f in files:
                if f.startswith("."):
                    continue
                p = os.path.join(root, f)
                yield p, os.path.getsize(p)

    def parquet_file_rows(self, path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        """Atomic publish (write dot-tmp sibling, rename over): a crash
        mid-write must never truncate the PREVIOUS content — cube meta and
        the hybrid cover file are overwritten in place, and open('w')
        destroys the old version before the new one is durable. The tmp
        name is dot-prefixed so listdir/file_sizes never surface it."""
        d, name = os.path.split(path)
        tmp = os.path.join(d, f".{name}.tmp~")
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def write_text_exclusive(self, path: str, text: str) -> bool:
        """Create-exclusive write: returns False (writing nothing) when the
        file already exists — the loser of an init race must observe the
        winner's content, never overwrite it."""
        try:
            with open(path, "x") as fh:
                fh.write(text)
            return True
        except FileExistsError:
            return False


class HadoopFS:
    """Hadoop FileSystem implementation (s3a/abfs/hdfs/file URIs) through
    the active SparkSession's JVM — no extra Python deps; parquet footers
    are read with parquet-hadoop (already on Spark's classpath)."""

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("HadoopFS needs an active SparkSession")
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._path(path).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return bool(self._fs(path).exists(self._path(path)))

    def listdir(self, path: str) -> list[str]:
        stats = self._fs(path).listStatus(self._path(path))
        # same dotfile convention as LocalFS.listdir (in-flight write_text
        # temps must never surface as entries)
        return [
            name
            for st in stats
            if not (name := st.getPath().getName()).startswith(".")
        ]

    def isdir(self, path: str) -> bool:
        return bool(self._fs(path).getFileStatus(self._path(path)).isDirectory())

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def rmtree(self, path: str) -> None:
        self._fs(path).delete(self._path(path), True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs(src).rename(self._path(src), self._path(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def remove(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def file_sizes(self, path: str) -> Iterator[tuple[str, int]]:
        it = self._fs(path).listFiles(self._path(path), True)
        while it.hasNext():
            st = it.next()
            yield st.getPath().toString(), int(st.getLen())

    def parquet_file_rows(self, path: str) -> int:
        jvm = self._jvm
        in_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            self._path(path), self._conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(in_file)
        try:
            return int(reader.getRecordCount())
        finally:
            reader.close()

    def read_text(self, path: str) -> str:
        stream = self._fs(path).open(self._path(path))
        try:
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
            )
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        """Publish via dot-tmp sibling + delete + rename (Hadoop rename
        refuses an existing destination, so a delete precedes it). Crash
        windows leave either the OLD file (pre-delete) or no file plus the
        complete tmp (between delete and rename) — never a truncated file;
        every reader of these artifacts fails loudly on absence. Object
        stores degrade per their rename semantics, the same caveat as
        write_text_exclusive."""
        p = self._path(path)
        fsys = self._fs(path)
        tmp = self._jvm.org.apache.hadoop.fs.Path(
            p.getParent(), "." + p.getName() + ".tmp~"
        )
        out = fsys.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        fsys.delete(p, False)
        if not fsys.rename(tmp, p):
            raise OSError(f"atomic publish failed: {tmp} -> {path}")

    def write_text_exclusive(self, path: str, text: str) -> bool:
        """Create-exclusive write (overwrite=false): False when the file
        already exists. On HDFS the namenode arbitrates the race; object
        stores without atomic create degrade to check-then-create, the
        same guarantee the caller had before."""
        from py4j.protocol import Py4JJavaError

        try:
            out = self._fs(path).create(self._path(path), False)
        except Py4JJavaError as exc:
            # only "already exists" means we lost the race — permission /
            # connectivity / namenode failures must surface, or the caller
            # would read a file that was never created
            if not self._is_already_exists(exc):
                raise
            return False
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

    @staticmethod
    def _is_already_exists(exc) -> bool:
        """True when the wrapped Java exception (or its cause chain /
        RemoteException payload) is a FileAlreadyExistsException."""
        j = getattr(exc, "java_exception", None)
        seen = 0
        while j is not None and seen < 8:
            name = str(j.getClass().getName())
            if "FileAlreadyExistsException" in name:
                return True
            if name.endswith("RemoteException"):
                try:
                    if "FileAlreadyExistsException" in str(j.getClassName()):
                        return True
                except Exception:
                    pass
            j = j.getCause()
            seen += 1
        return False


def fs_for(path: str, spark=None) -> LocalFS | HadoopFS:
    """Backend for ``path``: URI scheme -> Hadoop FS, bare path -> local."""
    if _SCHEME_RE.match(path):
        return HadoopFS(spark)
    return LocalFS()


# -- layout-level helpers (shared by build / merge / routing cost) ----------


def parquet_rows(path: str, spark=None) -> int | None:
    """Total rows under a layout dir from parquet FOOTER metadata — no data
    scan, no Spark job (cheap even for thousands of layouts). ``None`` on
    failure: 'unknown' stays distinguishable from a MEASURED 0 rows."""
    try:
        fs = fs_for(path, spark)
        if not fs.exists(path):
            # a missing layout must read as UNKNOWN, not measured-empty —
            # 0 would make cost-based routing prefer a nonexistent layout
            return None
        total = 0
        for p, _sz in fs.file_sizes(path):
            if p.endswith(".parquet"):
                total += fs.parquet_file_rows(p)
        return total
    except Exception:
        return None


def dir_bytes(path: str, spark=None) -> int:
    """Total on-disk bytes under ``path`` (0 if absent)."""
    fs = fs_for(path, spark)
    if not fs.exists(path):
        return 0
    return sum(sz for _p, sz in fs.file_sizes(path))


def read_json(path: str, spark=None) -> dict:
    return json.loads(fs_for(path, spark).read_text(path))


def write_json(path: str, obj: dict, spark=None) -> None:
    fs_for(path, spark).write_text(path, json.dumps(obj, indent=2))
