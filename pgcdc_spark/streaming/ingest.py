"""Composed training-data ingest: ONE CDC stream, FOUR maintainers.

The realistic ingest topology for a training corpus under logical
replication (reference pipeline R1->R8, ``src/main.ts:54-90``): each
change envelope carries a document row (doc_id, text, embedding), and a
single micro-batch feed keeps BOTH serving artifacts current —

- the incremental near-dup state (streaming/dedup.py): every newly
  INSERTED document is checked against the standing corpus LSH state and
  receives its keep/drop verdict at ingest time (insert detection is
  pre-fold: a doc inserted and updated within one micro-batch is still
  adjudicated, on its folded final text). Dedup verdicts are
  first-seen decisions: an UPDATE to a document's text does not re-open
  its verdict (re-adjudicating history would retroactively flip earlier
  keep decisions mid-training-run), and a DELETE leaves the verdict log
  intact (it is an audit history, not a view) — the lifecycle of the
  *vector* is the ANN index's job;
- the persisted ANN index (streaming/annstream.py maintenance path):
  inserts/updates are assigned + PQ-encoded against the frozen
  quantizer, deletes tombstone by idmap lookup — the index tracks the
  full I/U/D lifecycle.

One ``readStream`` + one checkpoint drive both folds inside one
foreachBatch, so the two artifacts advance in lockstep on the SAME batch
ids: a crash replays one micro-batch into both maintainers, each of
which is idempotent under replay (dedup: per-batch partition overwrite;
ANN: applied-label gate). That shared-checkpoint discipline is the point
of composing them here rather than running two independent streams over
the source — there is no window where one artifact has applied a batch
the other has not *and* the checkpoint has moved past it.

Batch-equivalence and restart/replay are pinned in
tests/test_ingest_stream.py: after an insert/update/delete changelog
with a mid-stream restart, the ANN index answers probes bit-identical to
a full rebuild over the final corpus, and the verdict log equals the
solo dedup stream's over the same insert batches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def decode_and_fold(batch_df: DataFrame, row_schema: StructType):
    """ONE decode pass per micro-batch, shared by every maintainer.

    Parses + pipelines the envelope text ONCE and persists both the
    per-row frame and the per-key fold; each maintainer then reads the
    cached frames (InMemoryTableScan), never re-scanning the batch or
    re-running from_json N times. Plan-pinned by
    tests/test_plans.py::test_ingest_decode_shared_across_maintainers —
    removing either persist() regresses the composed stream to
    one-decode-per-maintainer, exactly the N-pass shape the pin exists
    to forbid. Caller unpersists both (see merge's finally)."""
    from ..cdc.envelope import parse_envelope
    from ..cdc.transform import apply_pipeline
    from ..cdc.upsert import latest_state

    rows = apply_pipeline(
        parse_envelope(batch_df, "value", row_schema)
    ).persist()
    folded = latest_state(
        rows, keys=["doc_id"], order_by=["lsn"], keep_deletes=True
    ).persist()
    return rows, folded


def start_training_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    dedup_state_dir: str,
    index_root: str,
    row_schema: StructType,
    max_files_per_trigger: int = 10,
    threshold: float = 0.5,
    dedup_compact_after: int = 16,
    ann_compact_after: int = 16,
    text_index_dir: str | None = None,
    drift_dir: str | None = None,
) -> StreamingQuery:
    """Drive the dedup state at ``dedup_state_dir`` AND the AnnIndex at
    ``index_root`` from one file-stream of CDC envelopes whose row images
    hold (doc_id: long, text: string, embedding: array<double>).

    ``text_index_dir`` (optional) additionally maintains the inverted
    text index there — a PostingsView (term/tf postings + doc lengths,
    the BM25 statistics) fed the SAME batches under the same batch-id
    label: three serving artifacts (near-dup state, ANN index, text
    index), one CDC feed, one checkpoint. The postings maintainer tracks
    the full I/U/D lifecycle like the ANN index (an update re-derives
    the doc's token deltas from the state transition's before-image).

    ``drift_dir`` (optional) additionally maintains the corpus
    distribution monitor there — the doc-length histogram view
    (AggView keyed by width_bucket, the r8 drift monitor): an update
    whose new text crosses a bucket boundary retracts the old bucket
    and adds the new one through the same state-transition fold. This
    is the ingest-time answer to "did today's feed shift the corpus?"
    — maintained for the price of the delta scan, never a corpus
    rescan."""
    import os

    from ..operators.annindex import AnnIndex
    from .annstream import apply_ann_batch
    from .dedup import merge_dedup_batch
    from .ivm import AggView, PostingsView, apply_agg_view_batch
    from .statestore import BucketedStateStore

    idx = AnnIndex(index_root)
    postings_view = PostingsView("post") if text_index_dir else None
    postings_store = (
        BucketedStateStore(os.path.join(text_index_dir, "state"), n_buckets=16)
        if text_index_dir else None
    )
    drift_view = (
        AggView("drift", group_cols=["bucket"], sum_col="doclen")
        if drift_dir else None
    )
    drift_store = (
        BucketedStateStore(os.path.join(drift_dir, "state"), n_buckets=16)
        if drift_dir else None
    )

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        rows, folded = decode_and_fold(batch_df, row_schema)
        try:
            if not folded.head(1):
                return
            # dedup: first-seen docs only (see module doc).  "First seen"
            # is detected on the PRE-fold rows — a doc inserted and then
            # updated within the SAME micro-batch folds to op='U', so
            # filtering the folded frame on op=='I' would permanently
            # skip its verdict (round-8 review finding).  Instead: any
            # doc with an 'I' envelope in this batch is new to the
            # corpus; adjudicate its FOLDED final text (insert-then-
            # delete in one batch folds to 'D' and is correctly skipped
            # — the doc never existed at any batch boundary).  The
            # maintainer's own empty-batch guard makes insert-free
            # batches no-ops without burning a state partition.
            inserted = rows.filter(F.col("op") == "I").select("doc_id").distinct()
            merge_dedup_batch(
                folded.filter(F.col("op") != "D")
                .join(inserted, "doc_id", "left_semi")
                .select("doc_id", "text"),
                batch_id,
                dedup_state_dir,
                threshold=threshold,
                compact_after=dedup_compact_after,
            )
            # ANN: the full I/U/D lifecycle, doc_id as the vector id
            ups = folded.filter(F.col("op") != "D").select(
                F.col("doc_id").alias("vec_id"), "embedding"
            )
            dels = folded.filter(F.col("op") == "D").select(
                F.col("doc_id").alias("vec_id")
            )
            apply_ann_batch(
                spark, idx, ups, dels, str(batch_id),
                compact_after=ann_compact_after,
            )
            if postings_view is not None:
                # text index: same batch, own state store + delta log,
                # replay-gated by ITS store's applied label
                apply_agg_view_batch(
                    postings_store, postings_view,
                    os.path.join(text_index_dir, f"view_{postings_view.name}"),
                    folded.select("lsn", "op", "doc_id", "text"),
                    label=str(batch_id), keys=["doc_id"], order_by=["lsn"],
                )
            if drift_view is not None:
                # drift monitor: doc-length histogram, bucket assignment
                # row-local so it rides the same folded frame
                apply_agg_view_batch(
                    drift_store, drift_view,
                    os.path.join(drift_dir, f"view_{drift_view.name}"),
                    folded.select(
                        "lsn", "op", "doc_id",
                        F.length("text").cast("double").alias("doclen"),
                        F.width_bucket(
                            F.length("text").cast("double"),
                            F.lit(0.0), F.lit(2000.0), F.lit(8),
                        ).alias("bucket"),
                    ),
                    label=str(batch_id), keys=["doc_id"], order_by=["lsn"],
                )
        finally:
            folded.unpersist()
            rows.unpersist()

    return (
        raw.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
