"""CDC-driven maintenance of the persisted ANN index.

The missing integration between the CDC pipeline (R1-R13 surface) and
the serving-side ANN artifact (operators/annindex.py): a stream of
embedding-row change envelopes (insert/update/delete — e.g. a pgvector
table under logical replication) keeps the IVF-PQ index current, one
micro-batch at a time, in the streaming/ivm.py maintainer mold.

Per micro-batch:

1. parse the CDC envelopes and run the standard transformer pipeline
   (control-message filter, checked image extraction with deletes kept);
2. fold the batch to its LATEST state per vec_id by LSN (max_by — a key
   changed twice in one batch applies once, with its final image);
3. route upserts and tombstones into ``AnnIndex.append``: new/changed
   vectors are assigned + PQ-encoded against the index's frozen
   quantizer, deletes tombstone through their frozen assignment —
   O(batch + touched cells), never O(corpus);
4. the FIRST non-empty batch bootstraps the index (``build``), training
   the deterministic quantizer on it — the FAISS contract (train once on
   an initial sample, ``add`` forever after). If that batch holds no
   quantizer donor rows, ``build`` REFUSES to commit (degenerate
   quantizer guard) and the streaming query fails loudly — committing an
   empty centroid/codebook table would silently index nothing forever,
   and deferring would drop the batch's rows on the floor; the operator
   must be bootstrapped from a training-capable initial snapshot.

Replay idempotence: the batch label rides in the index version's
manifest (``applied`` window) and the manifest swap is atomic, so a
label is recorded iff its batch's cells are visible; a structured-
streaming replay of the last micro-batch after a crash is an exact
no-op (pinned in tests/test_operators.py, restart/replay suite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def apply_ann_batch(
    spark: SparkSession,
    idx,  # operators.annindex.AnnIndex
    ups: DataFrame,
    dels: DataFrame,
    label: str,
    compact_after: int = 16,
) -> None:
    """One micro-batch of ANN index maintenance: bootstrap build on the
    first batch with rows (quantizer trained once — FAISS contract),
    then label-gated append (upserts + id-routed tombstones) and
    auto-compaction once the cellmap spans more than ``compact_after``
    version layers. Exposed so the composed ingest pipeline
    (streaming/ingest.py) shares the exact maintenance code path with
    ``start_ann_index_stream``."""
    if idx.current_version() is None:
        # bootstrap: train the quantizer on the first batch
        # (delete-only first batches have nothing to index)
        if ups.head(1):
            idx.build(ups, label=label)
        return
    if label in idx.meta().get("applied", []):
        return  # replayed micro-batch
    have_ups = bool(ups.head(1))
    have_dels = bool(dels.head(1))
    if have_ups or have_dels:
        idx.append(
            ups if have_ups else None,
            deletes=dels if have_dels else None,
            label=label,
        )
    if len(set(idx.meta()["cellmap"].values())) > compact_after:
        idx.compact(spark, label=f"fold-{label}")


def start_ann_index_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_root: str,
    row_schema: StructType,
    max_files_per_trigger: int = 10,
    compact_after: int = 16,
) -> StreamingQuery:
    """Drive the AnnIndex at ``index_root`` from a file-stream of CDC
    envelopes whose row images hold (vec_id: long, embedding:
    array<double>). Same harness shape as ivm.start_join_view_stream:
    one source, one checkpoint, foreachBatch maintenance.

    ``compact_after``: once the live cellmap spans more than this many
    version layers, the maintainer folds the chain into one
    self-contained layer (AnnIndex.compact — the dedup-stream
    compact_after discipline), bounding probe fan-in under continuous
    appends. The fold is label-gated like any append, so a replay after
    a crash mid-fold is a no-op."""
    from ..cdc.envelope import parse_envelope
    from ..cdc.transform import apply_pipeline
    from ..cdc.upsert import latest_state
    from ..operators.annindex import AnnIndex

    idx = AnnIndex(index_root)

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = apply_pipeline(parse_envelope(batch_df, "value", row_schema))
        # one image per key: the index holds state, not a changelog
        folded = latest_state(
            rows, keys=["vec_id"], order_by=["lsn"], keep_deletes=True
        ).persist()
        try:
            if not folded.head(1):
                return
            ups = folded.filter(F.col("op") != "D").select("vec_id", "embedding")
            # tombstones are routed by the index's idmap lookup — only the
            # key is needed, so a partial/absent before-image (REPLICA
            # IDENTITY DEFAULT) cannot mis-aim a delete
            dels = folded.filter(F.col("op") == "D").select("vec_id")
            apply_ann_batch(
                spark, idx, ups, dels, str(batch_id),
                compact_after=compact_after,
            )
        finally:
            folded.unpersist()

    return (
        raw.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
