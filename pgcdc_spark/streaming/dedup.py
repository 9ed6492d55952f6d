"""Streaming incremental near-dup detection: arriving document batches
are checked against the standing corpus via persisted LSH state.

This is the streaming twin of queries/llm_extra.dedup_incremental_new_docs
and the piece that makes dedup an INGESTION operator instead of a nightly
job: the corpus's MinHash band signatures and shingle sets are maintained
as parquet state (partitioned by arrival batch), and each micro-batch
costs O(batch + collisions) — never O(corpus):

1. batch docs -> band signatures + shingle sets (the same
   queries/llm_dedup.minhash_bands / shingle_sets code, so collision
   semantics are IDENTICAL to the batch pipeline);
2. candidates = batch bands ⋈ state bands on (band, sig), plus in-batch
   collisions (bucket-local pair expansion);
3. exact shingle-Jaccard verification on candidate pairs only, against
   the stored shingle arrays;
4. per-doc verdict (duplicate-of-earlier: earlier batch, or same batch
   with smaller doc_id — a total order, so replays are deterministic);
5. batch bands/shingles/verdicts append as ``batch=<id>`` partitions —
   OVERWRITTEN on checkpoint replay, so a crashed batch re-runs
   idempotently (same mechanism as the bucketed state store's
   versioned-manifest commit, statestore.py);
6. the bands/sets state tables COMPACT once their partition fan-in
   exceeds ``compact_after``: every partition older than the current
   batch folds into a unique negative ``batch=<min-1>`` base (safe because structured streaming only
   ever replays the newest batch, and every older id still satisfies the
   ``batch < batch_id`` replay filter). Crash-atomic via the same
   hidden-dir + fsync'd manifest protocol as the IVM log — the COMMIT
   flag records the exact victim partitions so recovery can finish the
   swap. Verdicts are an output log (arrival batch is meaningful), so
   they are never folded.

At 100 TB the state tables are the real (bucketed, compacted) corpus
index; the shapes here — partition-pruned prior-state reads, bucket
joins, candidate-gated verification — are exactly what survives that
scale-up.

Filesystem contract: like statestore.py (whose rename-based commit this
module's batch-partition overwrite mirrors), state metadata routes
through pgcdc_spark/fs.py — a local path or an HDFS/file: URI both work;
the protocol needs fs.py's atomic-rename contract (HDFS yes, bare S3
no — plug a coordination pointer at that seam).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..fs import get_fs
from .compactlog import commit_and_publish, new_scratch, recover_compaction
from ..queries.llm_dedup import minhash_bands, shingle_sets

BANDS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("sig", StringType()),
    ]
)

SETS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sh", ArrayType(StringType())),
    ]
)


_LEGACY_PUBLISH = "batch=0"  # pre-unique-name layout recovery


def _recover_compaction(root: str, writer: bool = False) -> None:
    """Crash recovery — protocol and round-6 TOCTOU rationale in
    streaming/compactlog.py (shared with ivm.py): folds publish under
    unique monotone-decreasing negative ``batch=<min-1>`` names from
    epoch-scoped scratch dirs, so no victims list ever names live state."""
    recover_compaction(root, _LEGACY_PUBLISH, writer=writer)


def _compact_state_table(spark: SparkSession, root: str, keep_from: int) -> None:
    """Fold every ``batch=<id>`` partition with id < ``keep_from`` into
    a unique negative ``batch=<min-1>`` base. Reading the leaf dirs
    directly drops the directory-encoded partition column, so the fold
    is schema-stable."""
    import os

    fs = get_fs(root)
    _recover_compaction(root, writer=True)
    dirs = [d for d in fs.listdir(root) if d.startswith("batch=")]
    victims = sorted(d for d in dirs if int(d.split("=", 1)[1]) < keep_from)
    if len(victims) < 2:
        return
    scratch = new_scratch(root)
    folded = spark.read.parquet(*[os.path.join(root, d) for d in victims])
    folded.write.mode("overwrite").parquet(os.path.join(scratch, "base"))
    # COMMIT (victims + unique publish name) fsync'd before any victim
    # delete; the finish is idempotent under concurrent recoverers.
    # Publish ids are UNIQUE NEGATIVE BIGINTs derived from the state
    # itself: min(existing ids) - 1 is strictly below EVERY id currently
    # on disk, and since each fold's name was itself below everything
    # that existed at its time, names decrease monotonically and can
    # never collide with any past name a stale victims list might hold
    # (a clock-derived name could, under wall-clock step-back across
    # restarts — ADVICE r7). Negative also keeps folds inside every
    # future victim window and surviving the `batch < batch_id` replay
    # filter. Recovery ran above, so `dirs` is the complete post-recovery
    # id set.
    fold_id = min(int(d.split("=", 1)[1]) for d in dirs) - 1
    commit_and_publish(root, scratch, victims, f"batch={fold_id}")


def _read_prior(
    spark: SparkSession, path: str, schema: StructType, batch_id: int
) -> DataFrame:
    """All state partitions from batches BEFORE ``batch_id``. A replayed
    batch's own leftover partition is excluded by the partition filter
    (pruned at plan time), which is what makes replay idempotent.

    Only the no-state-yet case (first batch: directory absent) maps to an
    empty frame; a present-but-unreadable store RAISES — silently treating
    corrupted state as empty would mis-verdict every arriving doc as
    novel."""
    if not get_fs(path).is_dir(path):
        return spark.createDataFrame([], schema)
    _recover_compaction(path)
    df = spark.read.schema(
        StructType(list(schema.fields) + [StructField("batch", LongType())])
    ).parquet(path)
    return df.filter(F.col("batch") < batch_id).drop("batch")


def _jaccard(sha: F.Column, shb: F.Column) -> F.Column:
    common = F.size(F.array_intersect(sha, shb))
    return common.cast("double") / (
        F.size(sha) + F.size(shb) - common
    ).cast("double")


def start_dedup_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    compact_after: int = 16,
) -> StreamingQuery:
    """Start the incremental dedup query over a streaming `documents`
    frame (columns incl. ``doc_id``, ``text``).

    Emits one verdict row per arriving doc under ``state_dir/verdicts``:
    ``(doc_id, is_dup, match_doc_id, match_jaccard, batch)`` where
    ``is_dup`` means a verified near-duplicate of a doc seen EARLIER
    (previous batch, or same batch with smaller doc_id)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_dedup_batch(batch_df, batch_id, state_dir,
                          threshold=threshold, compact_after=compact_after)

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merge_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    threshold: float = 0.5,
    compact_after: int = 16,
) -> None:
    """One micro-batch of the incremental dedup maintenance — the
    foreachBatch body of ``start_dedup_stream``, exposed so a composed
    ingest pipeline (streaming/ingest.py: ONE CDC source, dedup + ANN
    maintainers sharing its batch ids / checkpoint) can drive the same
    state fold without a second readStream over the source."""
    spark = batch_df.sparkSession
    batch = batch_df.persist()
    pinned = [batch]
    try:
        if not batch.head(1):
            return
        bands_new = minhash_bands(batch).persist()
        sets_new = shingle_sets(batch).persist()
        pinned += [bands_new, sets_new]
        bands_old = _read_prior(spark, f"{state_dir}/bands", BANDS_SCHEMA, batch_id)
        sets_old = _read_prior(spark, f"{state_dir}/sets", SETS_SCHEMA, batch_id)

        # cross-boundary candidates: batch x standing corpus, bucket join
        cross = (
            bands_new.alias("n")
            .join(
                bands_old.alias("o"),
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.sig") == F.col("o.sig")),
            )
            .select(
                F.col("n.doc_id").alias("new_id"),
                F.col("o.doc_id").alias("old_id"),
            )
        )
        # in-batch candidates: same-bucket pairs, earlier doc_id wins
        within = (
            bands_new.alias("a")
            .join(
                bands_new.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("new_id"),
                F.col("b.doc_id").alias("old_id"),
            )
        )
        cands = cross.union(within).distinct()

        all_sets = sets_old.unionByName(sets_new)
        sa = sets_new.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sha"))
        sb = all_sets.select(F.col("doc_id").alias("old_id"), F.col("sh").alias("shb"))
        best = (
            cands.join(sa, "new_id")
            .join(sb, "old_id")
            .select("new_id", "old_id", _jaccard(F.col("sha"), F.col("shb")).alias("j"))
            .groupBy("new_id")
            .agg(F.max(F.struct("j", (-F.col("old_id")).alias("no"), "old_id")).alias("m"))
            .select("new_id", F.col("m.j").alias("j"), F.col("m.old_id").alias("old_id"))
        )
        dup = F.col("j") >= threshold
        verdicts = (
            batch.select("doc_id")
            .join(best, F.col("doc_id") == F.col("new_id"), "left")
            .select(
                "doc_id",
                F.coalesce(dup, F.lit(False)).alias("is_dup"),
                F.when(dup, F.col("old_id")).alias("match_doc_id"),
                F.when(dup, F.col("j")).alias("match_jaccard"),
            )
        )
        # deterministic per-batch partitions; replay overwrites in place
        verdicts.write.mode("overwrite").parquet(
            f"{state_dir}/verdicts/batch={batch_id}"
        )
        bands_new.write.mode("overwrite").parquet(
            f"{state_dir}/bands/batch={batch_id}"
        )
        sets_new.write.mode("overwrite").parquet(
            f"{state_dir}/sets/batch={batch_id}"
        )
        n_parts = sum(
            1 for d in get_fs(state_dir).listdir(f"{state_dir}/bands")
            if d.startswith("batch=")
        )
        if n_parts > compact_after:
            # fold everything older than THIS batch (the only id the
            # engine can still replay) into batch=0
            _compact_state_table(spark, f"{state_dir}/bands", batch_id)
            _compact_state_table(spark, f"{state_dir}/sets", batch_id)
    finally:
        for df in pinned:
            df.unpersist()


def read_verdicts(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(f"{state_dir}/verdicts")
