"""Streaming corpus-level line dedup: arriving document batches are
rewritten against a standing first-owner line state.

This is the streaming twin of queries/llm_text.docs_line_dedup — the
piece that makes C4/RefinedWeb boilerplate removal an INGESTION operator
instead of a nightly rewrite job. The corpus's surviving line hashes are
maintained as parquet state (one row per distinct line: its md5 plus the
(doc_id, line_idx) of the occurrence that owns it), and each micro-batch
rewrites only the ARRIVING documents:

1. batch docs -> narrow occurrence stream (doc_id, line_idx, md5) via
   the SAME queries/llm_text.line_occurrences projection as the batch
   query, so the unit tokenizer has exactly one home;
2. within-batch first occurrences by (doc_id, line_idx) rank, then an
   anti-check against prior state on the hash: an occurrence survives
   iff its line was never seen in an earlier batch NOR earlier within
   this batch — arrival-order keep-first;
3. each arriving doc is reassembled from its surviving lines
   (llm_text.reassemble_clean_text — one home for the rewrite rule) and
   emitted as a verdict row (doc_id, n_lines, n_removed, text_clean);
4. the batch's newly-owned lines append as a ``batch=<id>`` partition —
   OVERWRITTEN on checkpoint replay, so a crashed batch re-runs
   idempotently (the streaming/dedup.py mechanism, shared helpers);
5. the lines state COMPACTS once partition fan-in exceeds
   ``compact_after`` via the shared crash-atomic fold protocol
   (streaming/compactlog.py).

SEMANTICS vs the batch query: the batch query is ORDER-canonical (global
first in (doc_id, line_idx) order); the stream is ARRIVAL-canonical
(first batch to present a line owns it, (doc_id, line_idx) breaking ties
within a batch). When ingestion is doc_id-ordered — the append/CDC case —
the two coincide EXACTLY (pytest-pinned: an ordered-chunk stream
reproduces docs_line_dedup byte-for-byte, text included). Under
out-of-order arrival the stream is still deterministic per arrival
schedule, which is the only meaningful contract an ingestion dedup can
offer — a nightly batch pass over the accumulated corpus converges both
to the order-canonical answer.

At 100 TB the lines state is the real corpus line index. Everything that
moves per batch is O(batch) except the prior-state membership probe,
which here is a full-state shuffle join on the hash — the same shape
streaming/dedup.py accepts for its band state. The upgrade path when the
state outgrows a per-batch scan is the bucketed key-value store
(streaming/statestore.py): bucket the lines table by hash prefix and
probe only the buckets the batch's hashes touch, exactly the
touched-bucket contract the CDC upsert store already proves.

Filesystem contract: state metadata routes through pgcdc_spark/fs.py —
local paths and HDFS/file: URIs both work; the compaction protocol needs
fs.py's atomic-rename contract (HDFS yes, bare S3 no — plug a
coordination pointer at that seam).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..fs import get_fs
from ..queries.llm_text import (
    line_occurrences,
    reassemble_clean_text,
    tokenize_docs,
)
from .dedup import _compact_state_table, _read_prior

LINES_SCHEMA = StructType(
    [
        StructField("lh", StringType()),
        StructField("doc_id", LongType()),
        StructField("line_idx", LongType()),
    ]
)


def start_line_dedup_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    compact_after: int = 16,
) -> StreamingQuery:
    """Start the incremental line-dedup query over a streaming
    `documents` frame (columns incl. ``doc_id``, ``text``).

    Emits one verdict row per arriving doc under ``state_dir/verdicts``:
    ``(doc_id, n_lines, n_removed, text_clean, batch)`` — the document
    rewritten against the corpus seen so far. A NULL-text doc still
    emits its row (0 lines, NULL text_clean); duplicate doc_ids within
    one trigger are collapsed deterministically first (see
    merge_line_dedup_batch)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_line_dedup_batch(
            batch_df, batch_id, state_dir, compact_after=compact_after
        )

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merge_line_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    compact_after: int = 16,
) -> None:
    """One micro-batch of the incremental line-dedup maintenance — the
    foreachBatch body of ``start_line_dedup_stream``, exposed so a
    composed ingest pipeline (streaming/ingest.py pattern: one source,
    several maintainers sharing its batch ids) can drive the same state
    fold without a second readStream over the source."""
    spark = batch_df.sparkSession
    # Duplicate doc_ids inside one trigger (a replayed re-insert) would
    # tie the ownership window and double-count the per-doc aggregates:
    # collapse to ONE deterministic row per doc first (max text — there
    # is no version column on a raw documents feed, so a lexicographic
    # total order is the only deterministic latest-proxy available; a
    # CDC-versioned feed should be materialized through the upsert sink
    # BEFORE this maintainer, which then sees unique docs per batch).
    batch = (
        batch_df.groupBy("doc_id")
        .agg(F.max("text").alias("text"))
        .persist()
    )
    pinned = [batch]
    try:
        if not batch.head(1):
            return
        base = tokenize_docs(batch)
        occ = line_occurrences(base)
        prior = _read_prior(
            spark, f"{state_dir}/lines", LINES_SCHEMA, batch_id
        ).select("lh", F.lit(True).alias("_seen"))
        wnd = Window.partitionBy("lh").orderBy("doc_id", "line_idx")
        # survivors: within-batch first AND never seen in a prior batch.
        # The state side is corpus-scaled — shuffle-hash, never broadcast
        # (the r12 audit rule). flagged feeds BOTH writes below — persist
        # it so the prior-state scan + window run once per batch, and so
        # the second write never re-reads {state_dir}/lines while writing
        # into it.
        flagged = (
            occ.withColumn("rn", F.row_number().over(wnd))
            .join(prior.hint("shuffle_hash"), "lh", "left")
            .withColumn(
                "keep", (F.col("rn") == 1) & F.col("_seen").isNull()
            )
            .persist()
        )
        pinned.append(flagged)
        perdoc = flagged.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
            F.sort_array(
                F.collect_list(F.when(F.col("keep"), F.col("line_idx")))
            ).alias("kept"),
        )
        # LEFT join + coalesce: a doc whose text is NULL produces no
        # occurrences, but the contract is one verdict row per arriving
        # doc — it surfaces as (0 lines, 0 removed, NULL text_clean)
        # instead of silently vanishing.
        verdicts = base.join(perdoc.hint("shuffle_hash"), "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.when(
                F.col("kept").isNotNull(), reassemble_clean_text()
            ).alias("text_clean"),
        )
        # deterministic per-batch partitions; replay overwrites in place
        verdicts.write.mode("overwrite").parquet(
            f"{state_dir}/verdicts/batch={batch_id}"
        )
        new_owned = flagged.filter(F.col("keep")).select(
            "lh", "doc_id", "line_idx"
        )
        new_owned.write.mode("overwrite").parquet(
            f"{state_dir}/lines/batch={batch_id}"
        )
        n_parts = sum(
            1
            for d in get_fs(state_dir).listdir(f"{state_dir}/lines")
            if d.startswith("batch=")
        )
        if n_parts > compact_after:
            _compact_state_table(spark, f"{state_dir}/lines", batch_id)
    finally:
        for df in pinned:
            df.unpersist()


def read_line_verdicts(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(f"{state_dir}/verdicts")
