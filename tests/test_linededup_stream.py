"""Streaming line dedup: ordered-stream == batch equivalence, idempotent
replay, and the arrival-canonical semantics under out-of-order chunks.

The truth model for the ordered case is the BATCH query itself
(docs_line_dedup): when chunk boundaries are ascending doc_id ranges the
arrival-order keep-first and the order-canonical keep-first coincide, so
the stream must reproduce the batch rewrite byte-for-byte — text
included. The out-of-order case pins the divergence on purpose: the
first BATCH to present a line owns it.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pgcdc_spark.queries import all_queries
from pgcdc_spark.streaming.linededup import (
    read_line_verdicts,
    start_line_dedup_stream,
)

QS = all_queries()


def _write_ordered_chunks(spark, sf_dir, src, n_chunks=3):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    width = (n + n_chunks - 1) // n_chunks
    # ascending doc_id RANGES — chunk id monotone in doc_id, so stream
    # arrival order equals the batch query's (doc_id, line_idx) order
    chunked = docs.withColumn(
        "chunk", (F.col("doc_id") / width).cast("int")
    )
    for i in range(n_chunks):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.parquet(f"{src}/part_{i}")
        )
    return docs


def test_ordered_stream_reproduces_batch_rewrite(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "src")
    docs = _write_ordered_chunks(spark, sf_smoke, src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_line_dedup_stream(stream, state, ckpt).awaitTermination(240)

    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in read_line_verdicts(spark, state).collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in QS["docs_line_dedup"].fn(spark, sf_smoke).collect()
    }
    assert set(got) == set(want)
    mismatch = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not mismatch, f"{len(mismatch)} rewrites differ: {list(mismatch.items())[:3]}"
    n_batches = (
        read_line_verdicts(spark, state).select("batch").distinct().count()
    )
    assert n_batches >= 2, "stream collapsed into one batch; equivalence untested"


def test_line_dedup_replay_is_idempotent(spark, sf_smoke, tmp_path):
    """Re-running over the same checkpoint (no new files) must not change
    verdicts, and the lines state must hold each hash exactly once."""
    src = str(tmp_path / "src")
    docs = _write_ordered_chunks(spark, sf_smoke, src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_line_dedup_stream(stream(), state, ckpt).awaitTermination(240)
    first = sorted(
        (r["doc_id"], r["n_removed"], r["text_clean"])
        for r in read_line_verdicts(spark, state).collect()
    )
    start_line_dedup_stream(stream(), state, ckpt).awaitTermination(240)
    second = sorted(
        (r["doc_id"], r["n_removed"], r["text_clean"])
        for r in read_line_verdicts(spark, state).collect()
    )
    assert first == second
    assert len(first) == docs.count(), "replay duplicated or dropped verdicts"
    lines = spark.read.parquet(f"{state}/lines")
    assert lines.count() == lines.select("lh").distinct().count(), (
        "a line hash is owned twice in state"
    )


def test_out_of_order_arrival_is_arrival_canonical(spark, tmp_path):
    """A line first PRESENTED by a later-id doc in an earlier batch is
    owned by that doc: the batch query would keep doc 1's copy, the
    stream keeps doc 10's — the documented divergence, pinned."""
    shared = " ".join(f"s{i}" for i in range(8))
    uniq = " ".join(f"u{i}" for i in range(8))
    schema = "doc_id long, text string"
    d10 = spark.createDataFrame([(10, shared)], schema)
    d1 = spark.createDataFrame([(1, shared + " " + uniq)], schema)
    src = str(tmp_path / "src")
    d10.coalesce(1).write.parquet(f"{src}/part_0")  # arrives FIRST
    d1.coalesce(1).write.parquet(f"{src}/part_1")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(d10.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_line_dedup_stream(stream, state, ckpt).awaitTermination(240)
    got = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in read_line_verdicts(spark, state).collect()
    }
    assert got[10] == (0, shared)
    assert got[1] == (1, uniq)


def test_null_text_doc_still_emits_verdict(spark, tmp_path):
    """A NULL-text doc produces no occurrences, but the one-verdict-per-
    arriving-doc contract holds: (0 lines, 0 removed, NULL text_clean)."""
    schema = "doc_id long, text string"
    line = " ".join(f"w{i}" for i in range(8))
    batch = spark.createDataFrame([(1, line), (2, None)], schema)
    d = spark.createDataFrame([(1, line)], schema)  # schema donor
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/part_0")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_line_dedup_stream(stream, state, ckpt).awaitTermination(240)
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in read_line_verdicts(spark, state).collect()
    }
    assert got[1] == (1, 0, line)
    assert got[2] == (0, 0, None)


def test_duplicate_doc_id_in_batch_collapses_deterministically(spark, tmp_path):
    """Two versions of one doc inside a single trigger collapse to ONE
    verdict row computed from the deterministic winner (max text), not
    two rows with a merged keep-list."""
    la = " ".join(f"a{i}" for i in range(8))
    lb = " ".join(f"b{i}" for i in range(8))
    schema = "doc_id long, text string"
    batch = spark.createDataFrame([(1, la), (1, lb)], schema)
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/part_0")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_line_dedup_stream(stream, state, ckpt).awaitTermination(240)
    rows = read_line_verdicts(spark, state).collect()
    assert len(rows) == 1
    r = rows[0]
    winner = max(la, lb)
    assert (r["doc_id"], r["n_lines"], r["n_removed"], r["text_clean"]) == (
        1, 1, 0, winner
    )
    lines = spark.read.parquet(f"{state}/lines")
    assert lines.count() == 1  # only the winner's line owned
