"""Filesystem primitives for streaming state stores, scheme-routed.

The generation-dir + CURRENT-pointer stores (``joinview.py``,
``dedup_stream.py``) need five tiny operations: read a pointer file,
atomically replace it, test a directory, list a directory, delete a
tree. Two interchangeable backends provide them:

- ``PosixStateFS`` -- the fast path for bare local paths: ``os.replace``
  is the atomic pointer swap (rename(2) semantics).
- ``HadoopStateFS`` -- any scheme'd URI (``file:``, ``hdfs:``, ``s3a:``,
  ...), routed through the JVM Hadoop ``FileSystem`` /``FileContext``
  APIs already on Spark's classpath. The atomic step is
  ``FileContext.rename(tmp, ptr, Options.Rename.OVERWRITE)`` -- the
  documented atomic primitive on HDFS, and plain rename(2) under the
  ``file:`` scheme. (On S3 rename is copy+delete, not atomic; there the
  swap degrades to read-committed-pointer -- readers still see the old
  or the new pointer CONTENT, because the pointer is replaced, never
  appended. Production S3 deployments should front the pointer with a
  conditional-put object store or a catalog, which is exactly what this
  seam exists to plug in.)

``for_path`` picks the backend from the path spelling, so a caller that
worked on ``/tmp/state`` keeps the zero-overhead POSIX route while
``file:/tmp/state`` or ``hdfs://nn/state`` exercises the Hadoop route
with no caller changes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def is_scheme_path(path: str) -> bool:
    """True when ``path`` names a Hadoop-FS URI rather than a bare local
    path (``file:/x``, ``file:///x``, ``hdfs://nn/x``, ``s3a://b/x``)."""
    head = path.split("/", 1)[0]
    return head.endswith(":") or "://" in path


def for_path(spark: SparkSession, path: str):
    """Pick the backend for ``path``: Hadoop for scheme'd URIs, POSIX
    for bare local paths."""
    return HadoopStateFS(spark) if is_scheme_path(path) else PosixStateFS()


class PosixStateFS:
    """Local-filesystem backend (the original joinview primitives)."""

    def read_text(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write_text_atomic(self, path: str, content: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic: readers see old or new, never neither

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_names(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class HadoopStateFS:
    """Hadoop ``FileSystem`` backend, driven over py4j. One instance per
    sink; per-call overhead is a handful of JVM round-trips per EPOCH
    (pointer read/replace + a dir listing), nothing per row."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gw = spark.sparkContext._gateway

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, jpath):
        return jpath.getFileSystem(self._conf)

    def read_text(self, path: str) -> str | None:
        p = self._path(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            # commons-io ships with Spark; FSDataInputStream is an InputStream
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, content: str) -> None:
        dst = self._path(path)
        tmp = self._path(path + ".tmp")
        fs = self._fs(dst)
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
            out.hflush()
        finally:
            out.close()
        # FileContext.rename(..., OVERWRITE): atomic replace on HDFS/file:
        fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri(), self._conf
        )
        opts = self._gw.new_array(self._jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, dst, opts)

    def is_dir(self, path: str) -> bool:
        p = self._path(path)
        fs = self._fs(p)
        try:
            return fs.getFileStatus(p).isDirectory()
        except Exception:  # FileNotFoundException surfaces as Py4JJavaError
            return False

    def list_names(self, path: str) -> list[str]:
        p = self._path(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return []
        return [s.getPath().getName() for s in fs.listStatus(p)]

    def delete(self, path: str) -> None:
        p = self._path(path)
        fs = self._fs(p)
        try:
            fs.delete(p, True)
        except Exception:
            pass  # best-effort sweep, mirrors rmtree(ignore_errors=True)
