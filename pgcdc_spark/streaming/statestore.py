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
  publishing = write tmp + fsync + atomic replace (POSIX rename locally,
  FileContext.rename(OVERWRITE) on HDFS — see pgcdc_spark/fs.py):
  a crash before the replace leaves the old manifest -> old complete
  state; a crash after leaves the new manifest -> new complete state.
  There is no instant at which a reader can observe a partial table;
- replays after a crash (checkpoint offset not yet committed) write a NEW
  version dir and re-publish — idempotent because the upsert merge is
  (same (key, lsn) wins);
- old versions are garbage-collected after publish, keeping the previous
  one as a manual-recovery escape hatch.

Scale note: the manifest is one rename on the driver regardless of data
size; version dirs hold ordinary partitioned parquet. All metadata IO
routes through pgcdc_spark/fs.py, so a state root may be a local path OR
an HDFS/file: URI — the protocol is identical. On object stores without
atomic rename the pointer swap belongs in a small DB/DynamoDB service
(exactly how Delta commits on S3); fs.py is the single seam to plug that
in.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..fs import get_fs

_MANIFEST = "_CURRENT"
_KEEP_VERSIONS = 2
#: exactly-once label window: the manifest retains this many applied
#: labels. A label older than the oldest retained entry of a FULL window
#: is ambiguous (it may have been applied and evicted) — merge() fails
#: loudly instead of silently re-applying (which would re-run
#: on_transition and double-count derived IVM deltas).
_APPLIED_WINDOW = 64


def version_label(version: str) -> str:
    """The commit label embedded in a ``v-<label>-<uuid8>`` version name.

    Strips the ``v-`` prefix and the trailing 8-hex uuid rather than
    splitting on ``-``: labels may themselves contain dashes (date-based
    labels, composite ids), and a naive ``split("-")[1]`` silently
    returned only the first fragment (round-6 review: the MinMax replay
    gate never fired for such labels)."""
    return version[2:].rsplit("-", 1)[0]


class AtomicStateStore:
    """Versioned parquet state under ``root`` with an atomic manifest."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._fs = None  # lazy: HadoopStateFS needs an active session

    @property
    def fs(self):
        if self._fs is None:
            self._fs = get_fs(self.root)
        return self._fs

    # -- read side -----------------------------------------------------------

    def current_version(self) -> str | None:
        try:
            name = self.fs.read_text(os.path.join(self.root, _MANIFEST)).strip()
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
        for operator forensics (recover it with :func:`version_label`); a
        uuid suffix keeps replayed labels from colliding with the live
        version dir.
        """
        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, version))
        self._publish(version)
        self._gc()
        return version

    def _publish(self, version: str) -> None:
        self.fs.write_text_atomic(
            os.path.join(self.root, _MANIFEST), version + "\n"
        )

    def _gc(self) -> None:
        """Drop all but the newest ``_KEEP_VERSIONS`` version dirs (never
        the live one). mtime order is only advisory — the manifest, not GC
        order, defines correctness."""
        live = self.current_version()
        dirs = [
            d for d in self.fs.listdir(self.root)
            if d.startswith("v-") and d != live
            and self.fs.is_dir(os.path.join(self.root, d))
        ]
        dirs.sort(key=lambda d: self.fs.mtime(os.path.join(self.root, d)))
        for d in dirs[: max(0, len(dirs) - (_KEEP_VERSIONS - 1))]:
            self.fs.delete(os.path.join(self.root, d))


class BucketedStateStore(AtomicStateStore):
    """Key-hash bucketed variant: merges rewrite only TOUCHED buckets.

    AtomicStateStore.commit rewrites the whole table per micro-batch —
    crash-atomic but O(total state), the one genuine 100 TB scale-killer
    in the streaming sink (a 100 TB materialized table cannot be rewritten
    per batch; the reference's whole job is continuous incremental
    forwarding, /root/reference/src/main.ts:69-90). Here the state is hash
    partitioned into ``n_buckets`` buckets on the upsert key
    (``pmod(xxhash64(keys), n_buckets)``) and a merge costs
    O(touched buckets + batch), not O(state):

    - each version dir holds ONLY the buckets that merge rewrote, laid out
      as ``v-<label>-<uuid>/__bucket=<k>/*.parquet`` (``partitionBy``);
    - the manifest (same atomic ``_CURRENT`` pointer swap as the base
      class) is now JSON: ``{"n_buckets": N, "buckets": {"<k>":
      "<version-dir>"}}`` — per bucket, which version dir is live. This is
      the essence of an Iceberg/Delta manifest: commit = swap one pointer
      to a file list, untouched buckets keep pointing at their old files
      (which is also WHY Spark's metastore ``bucketBy`` tables
      (sources.write_bucketed) aren't used here: a metastore table has one
      live location — it cannot atomically publish "bucket 3 from version
      A, bucket 7 from version B");
    - crash mid-merge: the manifest still names only complete old
      versions, so readers see the previous state; the replayed batch
      re-merges idempotently (same (key, lsn) wins);
    - version dirs no longer referenced by any bucket are GC'd after
      publish;
    - read fan-in (distinct live version dirs) is bounded: when it exceeds
      ``compact_after``, merge folds the whole state into one version —
      amortized O(state / compact_after) per batch, the classic LSM
      compaction trade.

    The per-batch driver work is one ``distinct().collect()`` of touched
    bucket ids — bounded by ``n_buckets`` integers, metadata not data.
    Size ``n_buckets`` so a bucket ≪ executor memory at the target scale
    (e.g. 100 TB state / 8192 buckets ≈ 12 GB per bucket before columnar
    compression; more buckets = finer rewrites, more small files between
    compactions).
    """

    BUCKET_COL = "__bucket"
    HISTORY = "_HISTORY"

    def __init__(self, root: str, n_buckets: int = 64, compact_after: int = 16,
                 history_keep: int = 8) -> None:
        super().__init__(root)
        self.n_buckets = n_buckets
        self.compact_after = compact_after
        #: manifests retained for time travel (read_asof); version dirs
        #: referenced by any retained manifest survive GC, so disk holds
        #: at most history_keep superseded bucket generations.
        self.history_keep = history_keep

    # -- manifest ------------------------------------------------------------

    def current_manifest(self) -> dict | None:
        raw = self.current_version()  # base class: the _CURRENT line
        if raw is None:
            return None
        if not raw.startswith("{"):
            raise ValueError(
                f"{self.root} holds a non-bucketed (legacy) state manifest; "
                "read it with AtomicStateStore or migrate via merge()"
            )
        man = json.loads(raw)
        # the manifest, not the constructor, owns n_buckets once committed
        self.n_buckets = int(man["n_buckets"])
        return man

    def bucket_expr(self, keys: list[str]) -> F.Column:
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(self.n_buckets)).cast(
            "int"
        )

    # -- read side -----------------------------------------------------------

    def read_buckets(
        self, spark: SparkSession, bucket_ids: list[int] | None,
        manifest: dict | None = None,
    ) -> DataFrame | None:
        """Union of the live files of ``bucket_ids`` (None = all buckets),
        with the ``__bucket`` column retained. Returns None when no listed
        bucket has live data. Grouped per version dir so each read keeps
        parquet schema/pushdown and the fan-in is (distinct versions), not
        (buckets). ``manifest`` overrides the live one (time travel)."""
        man = manifest if manifest is not None else self.current_manifest()
        if man is None:
            return None
        buckets: dict[str, str] = man["buckets"]
        if bucket_ids is not None:
            wanted = {str(b) for b in bucket_ids}
            buckets = {b: v for b, v in buckets.items() if b in wanted}
        if not buckets:
            return None
        by_version: dict[str, list[str]] = {}
        for b, v in buckets.items():
            by_version.setdefault(v, []).append(b)
        parts = []
        for version, bs in sorted(by_version.items()):
            base = os.path.join(self.root, version)
            paths = [os.path.join(base, f"{self.BUCKET_COL}={b}") for b in sorted(bs)]
            parts.append(spark.read.option("basePath", base).parquet(*paths))
        # allowMissingColumns: versions written before an additive schema
        # evolution lack the new columns; they read as NULL (cdc/evolution
        # discipline)
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)

    def read(self, spark: SparkSession) -> DataFrame | None:
        df = self.read_buckets(spark, None)
        return None if df is None else df.drop(self.BUCKET_COL)

    def lookup(
        self, spark: SparkSession, keys: list[str], values: list[tuple]
    ) -> DataFrame | None:
        """Point/batch lookup: live rows for the given key tuples, reading
        ONLY the buckets those keys hash to.

        This is the read-side payoff of key-hash bucketing: a 100 TB state
        table answers "what is the current image of these K keys" by
        opening at most K buckets (~state/n_buckets each), not by scanning
        the table. Bucket ids are computed driver-side with the same
        xxhash64 expression the merge uses (one tiny local job, no scan);
        tombstones are filtered (a deleted key returns no row).

        ``values`` must carry the SAME types as the state's key columns
        (xxhash64 is type-sensitive: hashing an int32 probe against an
        int64 key would route to the wrong bucket). Python ints map to
        LongType, matching the engine's long keys."""
        if not values:
            return None
        man = self.current_manifest()
        if man is None:
            return None
        probe = spark.createDataFrame(values, schema=list(keys))
        wanted = sorted(
            r[0]
            for r in probe.select(self.bucket_expr(keys).alias("b")).distinct().collect()
        )
        df = self.read_buckets(spark, wanted)
        if df is None:
            return None
        return (
            # bounded: caller's probe key set (point-lookup API)
            df.join(F.broadcast(probe), on=list(keys), how="left_semi")
            .filter(F.col("op") != "D")
            .drop(self.BUCKET_COL)
        )

    # -- time travel -----------------------------------------------------------

    def history(self) -> list[dict]:
        """Retained publish history, oldest first: ``[{"label": ...,
        "manifest": {...}}, ...]`` (one entry per merge/compact publish,
        bounded by ``history_keep``)."""
        try:
            raw = self.fs.read_text(os.path.join(self.root, self.HISTORY))
        except FileNotFoundError:
            return []
        return [json.loads(line) for line in raw.splitlines() if line.strip()]

    def read_asof(self, spark: SparkSession, label: str) -> DataFrame | None:
        """The committed state AS OF ``label``: the newest retained
        publish whose label is <= ``label`` (numeric compare when both
        sides parse as ints, else exact match only) — the table-format
        "VERSION AS OF" verb, served straight from retained manifests;
        no data is copied or reconstructed.

        Raises when ``label`` predates the retained window (a silent
        None would read as "empty state")."""
        entries = self.history()
        if not entries:
            return None

        def key(x: str) -> tuple:
            try:
                return (0, int(x), "")
            except ValueError:
                return (1, 0, x)

        eligible = [e for e in entries if key(e["label"]) <= key(label)]
        if not eligible:
            raise ValueError(
                f"label {label!r} predates the retained history window "
                f"(oldest retained: {entries[0]['label']!r}, "
                f"history_keep={self.history_keep})"
            )
        man = max(eligible, key=lambda e: key(e["label"]))["manifest"]
        df = self.read_buckets(spark, None, manifest=man)
        return None if df is None else df.drop(self.BUCKET_COL)

    def _append_history(self, label: str, manifest: dict) -> None:
        entries = self.history()
        entries.append({"label": label, "manifest": manifest})
        entries = entries[-self.history_keep:]
        self.fs.write_text_atomic(
            os.path.join(self.root, self.HISTORY),
            "".join(json.dumps(e) + "\n" for e in entries),
        )

    # -- write side ----------------------------------------------------------

    def applied_labels(self) -> list[str]:
        man = self.current_manifest()
        return list(man.get("applied", [])) if man else []

    def merge(
        self,
        batch: DataFrame,
        keys: list[str],
        order_by: list[str],
        label: str,
        op_col: str = "op",
        on_transition=None,
    ) -> str | None:
        """Merge a change batch into the state, rewriting only the buckets
        the batch touches; returns the new version dir (None for an empty
        batch). Tombstones are kept (keep_deletes) so reordered batches
        cannot resurrect deleted keys — identical semantics to the
        full-rewrite path, per bucket.

        Exactly-once by label: applied labels are recorded in the manifest
        (bounded window), and a merge whose label is already applied is a
        NO-OP. This is what lets derived artifacts (the IVM delta log,
        streaming/ivm.py) hook the state TRANSITION via ``on_transition``:
        a foreachBatch replay after a successful publish must not re-run
        the hook against the post-merge state (it would derive a zero
        delta and clobber the real one) — the label skip makes the whole
        (hook + merge + publish) unit replay-exactly-once, while a replay
        after a crash BEFORE publish recomputes both against the identical
        previous state.

        ``on_transition(current, new_state, touched)`` runs before the
        manifest publish; ``current`` is the pre-merge content of the
        touched buckets (None on first batch), ``new_state`` their
        post-merge content (tombstones included). Its writes must be
        idempotent per label (e.g. overwrite a per-label partition)."""
        from ..cdc.upsert import latest_state

        spark = batch.sparkSession
        man = self.current_manifest()
        applied_now = man.get("applied", []) if man else []
        if label in applied_now:
            return None
        if len(applied_now) >= _APPLIED_WINDOW:
            # Structured-streaming replays only resend the most recent
            # batch, so landing here means something upstream replayed far
            # beyond the retained window — re-applying would be silent
            # double-counting for on_transition consumers.
            # Non-numeric labels have no order: an evicted label is
            # INDISTINGUISHABLE from a never-applied one, so silently
            # re-merging would be exactly the double-count this guard
            # exists to prevent (round-6 review — the old path fell
            # through and re-merged). Numeric, monotone labels are the
            # supported regime for windows deeper than _APPLIED_WINDOW.
            # The incoming label and the retained entries are converted
            # SEPARATELY so the error names the actual offender (round-7
            # review: a legacy non-numeric entry inside the window used
            # to be reported as "non-numeric label <numeric label>").
            try:
                label_n = int(label)
            except ValueError:
                raise ValueError(
                    f"non-numeric label {label!r} with a full "
                    f"{_APPLIED_WINDOW}-entry applied window: evicted labels "
                    "cannot be detected without a total order; use numeric "
                    "monotone labels (batch ids) or raise _APPLIED_WINDOW"
                ) from None
            try:
                oldest = min(int(x) for x in applied_now)
            except ValueError:
                bad = [x for x in applied_now if not str(x).lstrip("-").isdigit()]
                raise ValueError(
                    f"non-numeric entries {bad!r} in the full "
                    f"{_APPLIED_WINDOW}-entry applied window: the retained "
                    "labels have no total order, so eviction of "
                    f"{label!r} cannot be ruled out; rebuild the window "
                    "with numeric monotone labels or raise _APPLIED_WINDOW"
                ) from None
            if label_n < oldest:
                raise ValueError(
                    f"label {label!r} is older than the oldest retained "
                    f"applied label ({oldest}) in a full "
                    f"{_APPLIED_WINDOW}-entry window: cannot tell whether "
                    "it was already applied; refusing to re-merge"
                )
        # Pin the bucketed batch: it drives TWO actions (touched-bucket
        # probe + the merge write), and under foreachBatch every action
        # re-executes the SOURCE plan — unpinned, that is a second read
        # of the upstream (a second Kafka fetch at scale).
        b = batch.withColumn(self.BUCKET_COL, self.bucket_expr(keys)).persist()
        try:
            touched = sorted(
                r[0] for r in b.select(self.BUCKET_COL).distinct().collect()
            )
            if not touched:
                return None
            current = self.read_buckets(spark, touched)
            combined = b if current is None else current.unionByName(
                b, allowMissingColumns=True
            )
            new_state = latest_state(
                combined, keys=keys, order_by=list(order_by), op_col=op_col,
                keep_deletes=True,
            )
            version = f"v-{label}-{uuid.uuid4().hex[:8]}"
            target = os.path.join(self.root, version)
            # Cluster by bucket before the partitionBy write: without it
            # every write task holds rows of MANY buckets (the merge
            # upstream is hash-partitioned by key, not bucket), so each
            # task opens one parquet writer per bucket it sees — task
            # count x touched buckets small files per version, and the
            # serial open/close per file dominates the commit. Clustered,
            # a bucket's rows land in one task: one full-size file per
            # bucket (guide §6 output sizing), written in parallel across
            # tasks instead of sprayed. Same trade at 100 TB: the rewrite
            # of k touched buckets is k writers on k tasks. The partition
            # COUNT is explicit (one per touched bucket): a column-only
            # repartition is AQE-coalesced back to ~1 writer at small
            # batch sizes, re-serializing the file creates (measured
            # 1.4 -> 0.9 s per merge at the bench shape).
            new_state = new_state.repartition(
                max(1, len(touched)), F.col(self.BUCKET_COL))
            new_state.write.mode("overwrite").partitionBy(self.BUCKET_COL).parquet(
                target
            )
            if on_transition is not None:
                # Serve the hook from the files just written instead of the
                # live window plan: each consumer action would otherwise
                # re-run the whole merge computation (and with multiple
                # views, several times over).
                written_state = spark.read.option("basePath", target).parquet(target)
                on_transition(current, written_state, touched)
        finally:
            b.unpersist()
        written = {
            d.split("=", 1)[1]
            for d in self.fs.listdir(target)
            if d.startswith(self.BUCKET_COL + "=")
        }
        buckets = dict(man["buckets"]) if man else {}
        for t in touched:
            if str(t) in written:
                buckets[str(t)] = version
            else:  # merged away entirely (e.g. post-compaction empty bucket)
                buckets.pop(str(t), None)
        applied = (self.applied_labels() + [label])[-_APPLIED_WINDOW:]
        self._publish_manifest(buckets, applied, label=label)
        if len(set(buckets.values())) > self.compact_after:
            self.compact(spark, label=f"{label}c")
        return version

    def compact(self, spark: SparkSession, label: str) -> str | None:
        """Fold every live bucket into one fresh version (bounds read
        fan-in). O(state) — amortized away by ``compact_after``."""
        full = self.read_buckets(spark, None)
        if full is None:
            return None
        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.root, version)
        # same bucket-clustered write as merge(): one writer per bucket
        full = full.repartition(self.n_buckets, F.col(self.BUCKET_COL))
        full.write.mode("overwrite").partitionBy(self.BUCKET_COL).parquet(target)
        written = {
            d.split("=", 1)[1]
            for d in self.fs.listdir(target)
            if d.startswith(self.BUCKET_COL + "=")
        }
        self._publish_manifest({b: version for b in written}, self.applied_labels(),
                               label=label)
        return version

    def rebucket(
        self, spark: SparkSession, keys: list[str], new_n_buckets: int, label: str
    ) -> str | None:
        """Rewrite the whole state under a new bucket count — the
        operational answer to "the table grew 10x and each bucket no
        longer fits an executor". One O(state) job (a compaction with a
        different hash fan-out), atomically published: readers see either
        the old bucketing or the new one, and the manifest owns
        ``n_buckets`` from then on. ``keys`` must be the same upsert keys
        every merge uses — the bucket column is derived, not stored."""
        if new_n_buckets < 1:
            raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
        full = self.read(spark)  # drops the old bucket column
        # capture BEFORE switching: applied_labels() re-reads the manifest,
        # which resets self.n_buckets to the committed value
        applied = self.applied_labels()
        self.n_buckets = new_n_buckets
        if full is None:
            return None
        rebucketed = full.withColumn(self.BUCKET_COL, self.bucket_expr(keys))
        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.root, version)
        # same bucket-clustered write as merge(): one writer per bucket
        rebucketed = rebucketed.repartition(
            new_n_buckets, F.col(self.BUCKET_COL))
        rebucketed.write.mode("overwrite").partitionBy(self.BUCKET_COL).parquet(target)
        written = {
            d.split("=", 1)[1]
            for d in self.fs.listdir(target)
            if d.startswith(self.BUCKET_COL + "=")
        }
        self._publish_manifest({b: version for b in written}, applied, label=label)
        return version

    def _publish_manifest(
        self, buckets: dict[str, str], applied: list[str] | None = None,
        label: str | None = None,
    ) -> None:
        manifest = {
            "n_buckets": self.n_buckets,
            "buckets": buckets,
            "applied": applied if applied is not None else self.applied_labels(),
        }
        self._publish(json.dumps(manifest))
        if label is not None:
            self._append_history(label, manifest)
        referenced = set(buckets.values())
        for e in self.history():
            referenced |= set(e["manifest"]["buckets"].values())
        self._gc_unreferenced(referenced)

    def _gc_unreferenced(self, referenced: set[str]) -> None:
        for d in self.fs.listdir(self.root):
            if (
                d.startswith("v-")
                and d not in referenced
                and self.fs.is_dir(os.path.join(self.root, d))
            ):
                self.fs.delete(os.path.join(self.root, d))


def open_state_store(root: str) -> AtomicStateStore:
    """The store that matches what's on disk: bucketed when the manifest
    is JSON, legacy single-version otherwise (defaults to bucketed for
    empty/new roots)."""
    store = BucketedStateStore(root)
    raw = store.current_version()
    if raw is not None and not raw.startswith("{"):
        return AtomicStateStore(root)
    return store
