"""Structured-Streaming CDC pipeline: source -> transform -> upsert sink.

The reference's R1->R8 path (LogicalReplicationService subscribe ->
per-event callback -> Kafka producer, src/main.ts:69-99) rebuilt on
Structured Streaming:

- source: ``readStream`` over a directory of envelope JSON lines (the
  deterministic test replay; a Kafka source is the same code with
  ``format("kafka")`` + ``F.col("value").cast("string")``);
- transform: the identical batch functions from cdc/transform.py — one
  code path for batch and streaming;
- sink: ``foreachBatch`` merging each micro-batch into a parquet state
  table via cdc/upsert.py.

Delivery semantics: offsets live in the checkpoint and advance only after
the batch's sink write commits — exactly the sink-confirmed ack the
reference designed but disabled (manual ack dead code at
PostgresLogicalPg.ts:44-55, call commented at src/main.ts:75; the shipped
10 s auto-ack, PostgresOperation.ts:24-29, can LOSE data on sink failure).
Here a failed batch is replayed from the checkpoint, and the upsert merge
is idempotent (same (key, lsn) wins), so the pipeline is effectively
exactly-once to the materialized table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..cdc.envelope import STUDENT_SCHEMA, parse_envelope
from ..cdc.transform import apply_pipeline
from ..cdc.upsert import latest_state
from .statestore import BucketedStateStore, open_state_store


def read_envelope_stream(
    spark: SparkSession,
    source_dir: str,
    row_schema: StructType = STUDENT_SCHEMA,
    max_files_per_trigger: int = 10,
    split_key_updates_on: list[str] | None = None,
) -> DataFrame:
    """``split_key_updates_on=keys`` routes key-changing UPDATEs (old
    image present, key differs) as DELETE(old key)+INSERT(new image)
    inside the stream — the REPLICA IDENTITY defense
    (cdc/transform.split_key_updates), identical logical plan per
    micro-batch, no extra state."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    env = parse_envelope(raw, "value", row_schema)
    if split_key_updates_on:
        from ..cdc.transform import split_key_updates

        env = split_key_updates(env, keys=list(split_key_updates_on))
    return apply_pipeline(env)


def read_wal2json_stream(
    spark: SparkSession,
    source_dir: str,
    row_schema: StructType,
    format_version: int = 2,
    max_files_per_trigger: int = 10,
    split_key_updates_on: list[str] | None = None,
    source_table: tuple[str, str] | None = None,
) -> DataFrame:
    """wal2json JSON lines (a directory fed by any slot-tailing shipper:
    pg_recvlogical, a Lambda, a sidecar) -> the standard change stream.
    The batch parsers (cdc/wal2json.py) are pure narrow JVM work —
    from_json / posexplode / try_cast, no aggregation — so the identical
    logical plan runs per micro-batch under Structured Streaming: one
    code path, two modes, the same contract as read_envelope_stream.
    ``format_version`` selects the wire layout — 1 (one transaction
    document per line, ordered change array) or 2 (one object per
    change, the modern default). ``source_table=(schema, table)`` is
    the multi-table-slot guard, plumbed to the parser (r13 review: the
    serving path must be able to scope exactly like the batch path —
    foreign rows dropped, foreign v2 truncates inert). Compose with
    start_upsert_stream for the materialized table."""
    from ..cdc.wal2json import parse_wal2json, parse_wal2json_v2

    if format_version not in (1, 2):
        raise ValueError(f"wal2json format_version must be 1 or 2, "
                         f"got {format_version!r}")
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    parse = parse_wal2json if format_version == 1 else parse_wal2json_v2
    env = parse(raw, row_schema, source_table=source_table)
    if split_key_updates_on:
        from ..cdc.transform import split_key_updates

        env = split_key_updates(env, keys=list(split_key_updates_on))
    return apply_pipeline(env)


def start_upsert_stream(
    changes: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_by: list[str] = ("lsn",),
    n_buckets: int = 64,
) -> StreamingQuery:
    """foreachBatch sink: merge each micro-batch into the bucketed parquet
    state, rewriting ONLY the key-hash buckets the batch touches.

    Crash-atomic: each merge commits fresh per-bucket files and atomically
    repoints the store manifest (statestore.BucketedStateStore) — a crash
    mid-write leaves the previous complete state live, and the replayed
    batch re-merges idempotently. This (offsets advance only after sink
    success + an atomic sink commit) fully closes the reference's
    ack-before-send loss window (PostgresOperation.ts:24-29).

    Scale note: per batch the merge cost is O(touched buckets + batch),
    not O(total state) — at 100 TB state a micro-batch touching k keys
    reads and rewrites at most k buckets (~state/n_buckets each), which is
    the same touched-partition contract as a Delta/Iceberg MERGE INTO.
    The dedup logic (latest image per key, deletes win, tombstones kept)
    lives in cdc/upsert.py and is identical at every scale.
    """
    store = BucketedStateStore(state_dir, n_buckets=n_buckets)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # No isEmpty() pre-check (r13): it is an EXTRA action per batch
        # that re-executes the source parse before store.merge persists
        # the batch; merge already no-ops on empty batches (its
        # touched-bucket probe collects [] from the persisted frame).
        # keep_deletes inside store.merge: tombstones stay in the stored
        # state so merge order cannot resurrect a deleted key (file-stream
        # batches are NOT guaranteed to arrive in filename order);
        # read_state filters them.
        store.merge(
            batch_df, keys=list(keys), order_by=list(order_by), label=str(batch_id)
        )

    return (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the materialized table: live rows only (tombstones filtered).
    Reads bucketed and legacy single-version stores alike."""
    df = open_state_store(state_dir).read(spark)
    if df is None:
        raise FileNotFoundError(f"no committed state under {state_dir}")
    return df.filter(F.col("op") != "D")


def materialize_batch(
    envelope_df: DataFrame, keys: list[str], order_by: list[str] = ("lsn",)
) -> DataFrame:
    """Batch twin of the streaming pipeline (snapshot bootstrap, §3.2)."""
    changes = apply_pipeline(envelope_df)
    return latest_state(changes, keys=list(keys), order_by=list(order_by), op_col="op")


def snapshot_then_stream(
    snapshot: DataFrame,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    snapshot_lsn: str = "0/0",
    row_schema: StructType = STUDENT_SCHEMA,
) -> StreamingQuery:
    """The CDC bootstrap the reference designed and then disabled
    (snapshot import commented out at src/main.ts:164-179, which left its
    snapshot/stream LSN-consistency problem unsolved): batch-load the
    current table image, THEN tail the change stream from the slot.

    Consistency comes from the upsert merge's total order. Pass the TRUE
    LSN the snapshot was taken at as ``snapshot_lsn``: snapshot images then
    outrank every pre-snapshot change (a replayed/overlapping delivery of
    an older change cannot regress the state) while post-snapshot changes
    outrank the snapshot. The "0/0" default is only safe when the stream
    is guaranteed to start strictly after the snapshot with no replay
    overlap — with it, ANY delivered change outranks the snapshot image.

    Restart-safe: the snapshot is written only on first bootstrap (no
    existing checkpoint). On restart the existing state — which already
    reflects committed batches — is kept, and the stream resumes from the
    checkpoint; re-seeding the snapshot would silently roll those batches
    back.
    """
    import os

    spark = snapshot.sparkSession
    if not os.path.exists(os.path.join(checkpoint_dir, "offsets")):
        image = (
            snapshot.withColumn("op", F.lit("I")).withColumn("lsn", F.lit(snapshot_lsn))
        )
        # merge() dedups to latest-per-key (keep_deletes) and seeds the
        # same bucketed layout the stream's incremental merges target.
        BucketedStateStore(state_dir).merge(
            image, keys=list(keys), order_by=["lsn"], label="snapshot"
        )
    changes = read_envelope_stream(spark, source_dir, row_schema)
    return start_upsert_stream(changes, state_dir, checkpoint_dir, keys=list(keys))
