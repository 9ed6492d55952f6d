"""Filesystem facade for state-commit plumbing.

The state stores (streaming/statestore.py, streaming/ivm.py,
streaming/dedup.py) implement a table-format commit protocol: write a
fresh version dir, fsync a small manifest/COMMIT file, atomically swap a
pointer. On a laptop those are ``os``-level calls; on a 100 TB cluster
the state root lives on HDFS (or an object store behind an HDFS-compatible
layer), and the identical protocol must run through the Hadoop FileSystem
API — the same seam Delta/Iceberg commit through.

``get_fs(path)`` picks the implementation from the path itself:

- scheme-less paths (``/tmp/state``) -> :class:`LocalStateFS`, plain
  ``os``/``shutil`` — no JVM round-trips on the hot local path;
- URI paths (``file:///...``, ``hdfs://nn/...``, ``s3a://bucket/...``) ->
  :class:`HadoopStateFS`, the active SparkSession's Hadoop FileSystem via
  py4j. Driver-side metadata only (manifests are one line, COMMIT files a
  JSON list); bulk data always moves through Spark's own parquet IO.

Atomicity contract (what the commit protocol actually relies on):

- ``replace`` (pointer swap onto an existing file) must be atomic —
  POSIX rename locally, ``FileContext.rename(OVERWRITE)`` on Hadoop
  (atomic on HDFS; plain S3 lacks atomic rename, where the pointer swap
  belongs in a coordination service exactly as Delta does with its S3
  LogStore — this facade is the single place to plug that in);
- ``rename`` of a fresh version/fold dir to a non-existing destination
  must be atomic (POSIX / HDFS both are);
- ``write_text_atomic`` durably writes a small file via tmp + fsync
  (``hsync``/``hflush`` on Hadoop streams) + replace.
"""

from __future__ import annotations

import os
import shutil
import uuid


def get_fs(path: str):
    """LocalStateFS for bare paths, HadoopStateFS for URI paths."""
    if "://" in path or path.startswith("file:/"):
        return HadoopStateFS(path)
    return LocalStateFS()


class LocalStateFS:
    """``os``-backed implementation for scheme-less local paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def is_file(self, path: str) -> bool:
        return os.path.isfile(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        """Recursive delete; missing paths are a no-op."""
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)


class HadoopStateFS:
    """Hadoop FileSystem implementation (active SparkSession's JVM).

    Every call is driver-side metadata (exists/list/rename/one-line
    files); py4j round-trip cost is irrelevant next to the Spark jobs the
    protocol brackets. The FileContext handle provides the
    rename-OVERWRITE the pointer swap needs (plain FileSystem.rename
    refuses an existing destination on HDFS)."""

    def __init__(self, path: str) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"HadoopStateFS({path!r}) needs an active SparkSession "
                "(the Hadoop FileSystem lives in its JVM)"
            )
        self._jvm = spark._jvm
        self._gateway = spark._sc._gateway
        self._hconf = spark._jsc.hadoopConfiguration()
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        self._fs = jpath.getFileSystem(self._hconf)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jpath.toUri(), self._hconf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def _status(self, path: str):
        try:
            return self._fs.getFileStatus(self._p(path))
        except Exception:  # Py4JJavaError(FileNotFoundException)
            return None

    def is_dir(self, path: str) -> bool:
        st = self._status(path)
        return st is not None and bool(st.isDirectory())

    def is_file(self, path: str) -> bool:
        st = self._status(path)
        return st is not None and bool(st.isFile())

    def listdir(self, path: str) -> list[str]:
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._p(path))
        ]

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str) -> None:
        # Missing path / concurrent delete is the same no-op as local —
        # but ONLY not-found shapes are swallowed: a permission or IO
        # failure during state GC must surface loudly, not pass silently
        # (round-6 review: the blanket except hid those). HDFS signals
        # not-found as either a false return or a FileNotFoundException
        # depending on the FileSystem implementation.
        try:
            self._fs.delete(self._p(path), True)
        except Exception as e:
            if "FileNotFoundException" in str(e) or not self.exists(path):
                return
            raise

    def rename(self, src: str, dst: str) -> None:
        # FileSystem.rename signals failure inconsistently (false on HDFS,
        # FileNotFoundException via the local copy-fallback); the commit
        # protocol distinguishes ENOENT (a concurrent recoverer won the
        # race) from anything else, so map both shapes faithfully.
        try:
            ok = self._fs.rename(self._p(src), self._p(dst))
        except Exception as e:
            if not self.exists(src):
                raise FileNotFoundError(src) from e
            raise
        if not ok:
            if not self.exists(src):
                raise FileNotFoundError(src)
            raise OSError(f"rename failed: {src} -> {dst}")

    def replace(self, src: str, dst: str) -> None:
        overwrite = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        opts = self._gateway.new_array(
            self._jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = overwrite
        self._fc.rename(self._p(src), self._p(dst), opts)

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0

    def read_text(self, path: str) -> str:
        try:
            stream = self._fs.open(self._p(path))
        except Exception as e:  # FileNotFoundException and friends
            raise FileNotFoundError(path) from e
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 4096, False
            )
            return baos.toString("UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
            try:
                out.hsync()  # durable on HDFS; local/raw streams may not
            except Exception:
                out.hflush()
        finally:
            out.close()
        self.replace(tmp, path)
