"""Atomic versioned parquet state store for the CDC upsert sink.

Why this exists: an in-place ``mode("overwrite")`` of the live state dir
deletes the old files before the new ones are fully written — a crash in
that window loses the entire materialized table. The reference has the
same CLASS of loss window (slot auto-ack every 10 s regardless of sink
success, src/database/postgresql/PostgresOperation.ts:24-29); SURVEY §3.1
promises our engine closes it completely, which requires the SINK side to
be crash-atomic too, not just the offset side.

Design (the classic table-format commit protocol, cf. Delta/Iceberg's
manifest pointer, reduced to its essence):

- every committed state is a fresh, never-mutated version directory
  ``<root>/v-<batch>-<uuid>/`` — the live version is never overwritten,
  so there is no read-while-overwrite hazard on replay either;
- a one-line manifest file ``<root>/_CURRENT`` names the live version;
  publishing = write ``_CURRENT.tmp`` + ``os.replace`` (atomic on POSIX):
  a crash before the replace leaves the old manifest -> old complete
  state; a crash after leaves the new manifest -> new complete state.
  There is no instant at which a reader can observe a partial table;
- replays after a crash (checkpoint offset not yet committed) write a NEW
  version dir and re-publish — idempotent because the upsert merge is
  (same (key, lsn) wins);
- old versions are garbage-collected after publish, keeping the previous
  one as a manual-recovery escape hatch.

Scale note: the manifest is one rename on the driver regardless of data
size; version dirs hold ordinary partitioned parquet. On object stores
without atomic rename the same protocol runs against a small DB/DynamoDB
pointer (exactly how Delta commits on S3) — the store isolates that
choice behind ``publish``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_CURRENT"
_KEEP_VERSIONS = 2


class AtomicStateStore:
    """Versioned parquet state under ``root`` with an atomic manifest."""

    def __init__(self, root: str) -> None:
        self.root = root

    # -- read side -----------------------------------------------------------

    def current_version(self) -> str | None:
        try:
            with open(os.path.join(self.root, _MANIFEST)) as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        return name or None

    def read(self, spark: SparkSession) -> DataFrame | None:
        """The live committed state, or None if nothing was committed yet."""
        version = self.current_version()
        if version is None:
            return None
        return spark.read.parquet(os.path.join(self.root, version))

    # -- write side ----------------------------------------------------------

    def commit(self, df: DataFrame, label: str) -> str:
        """Write ``df`` as a new version and atomically publish it.

        ``label`` (e.g. the micro-batch id) is embedded in the version name
        for operator forensics; a uuid suffix keeps replayed labels from
        colliding with the live version dir.
        """
        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        self._publish(version)
        self._gc()
        return version

    def _publish(self, version: str) -> None:
        tmp = os.path.join(self.root, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(version + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.root, _MANIFEST))

    def _gc(self) -> None:
        """Drop all but the newest ``_KEEP_VERSIONS`` version dirs (never
        the live one). mtime order is only advisory — the manifest, not GC
        order, defines correctness."""
        live = self.current_version()
        dirs = [
            d for d in os.listdir(self.root)
            if d.startswith("v-") and d != live
            and os.path.isdir(os.path.join(self.root, d))
        ]
        dirs.sort(key=lambda d: os.path.getmtime(os.path.join(self.root, d)))
        for d in dirs[: max(0, len(dirs) - (_KEEP_VERSIONS - 1))]:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
