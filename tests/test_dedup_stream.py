"""Streaming incremental dedup: batch-equivalence, idempotent replay,
and O(batch) state reads.

The truth model: a doc is a duplicate iff it has a VERIFIED (exact
shingle-Jaccard >= 0.5) LSH candidate partner seen earlier — previous
chunk, or same chunk with a smaller doc_id. That is computed here with
the BATCH pipeline (verified_candidate_pairs) and must match what the
stream materializes chunk by chunk.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pgcdc_spark.queries.llm_dedup import verified_candidate_pairs
from pgcdc_spark.cache import release_shared
from pgcdc_spark.streaming.dedup import read_verdicts, start_dedup_stream

_THRESHOLD = 0.5


def _chunks_of_documents(spark, sf_dir, n_chunks=3):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunk = (F.col("doc_id") % n_chunks).cast("int")
    return docs, docs.withColumn("chunk", chunk)


def _expected_verdicts(spark, docs, chunked):
    """Batch-side truth: best earlier verified partner per doc."""
    pairs = verified_candidate_pairs(docs, _THRESHOLD).collect()
    release_shared()
    chunk_of = {r["doc_id"]: r["chunk"] for r in chunked.collect()}
    best: dict[int, tuple[float, int]] = {}
    for p in pairs:
        for me, other in ((p["doc_a"], p["doc_b"]), (p["doc_b"], p["doc_a"])):
            earlier = (chunk_of[other] < chunk_of[me]) or (
                chunk_of[other] == chunk_of[me] and other < me
            )
            if not earlier:
                continue
            j = p["jaccard"]
            cur = best.get(me)
            # tie-break: higher j, then smaller partner id
            if cur is None or (j, -other) > (cur[0], -cur[1]):
                best[me] = (j, other)
    out = {}
    for d in chunk_of:
        b = best.get(d)
        if b and b[0] >= _THRESHOLD:
            out[d] = (True, b[1], b[0])
        else:
            out[d] = (False, None, None)
    return out


def test_stream_dedup_matches_batch_truth(spark, sf_smoke, tmp_path):
    docs, chunked = _chunks_of_documents(spark, sf_smoke)
    src = str(tmp_path / "src")
    for i in range(3):
        (chunked.filter(F.col("chunk") == i).drop("chunk")
         .coalesce(1).write.parquet(f"{src}/part_{i}"))
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    q = start_dedup_stream(stream, state, ckpt, threshold=_THRESHOLD)
    q.awaitTermination(240)

    got = {
        r["doc_id"]: (r["is_dup"], r["match_doc_id"], r["match_jaccard"])
        for r in read_verdicts(spark, state).collect()
    }
    want = _expected_verdicts(spark, docs, chunked)
    assert set(got) == set(want)
    mismatch = {d: (got[d], want[d]) for d in want if got[d][:2] != want[d][:2]}
    assert not mismatch, f"{len(mismatch)} verdicts differ: {list(mismatch.items())[:5]}"
    n_batches = read_verdicts(spark, state).select("batch").distinct().count()
    assert n_batches >= 2, "stream collapsed into one batch; equivalence untested"


def test_stream_dedup_replay_is_idempotent(spark, sf_smoke, tmp_path):
    """Re-running over the same checkpoint (no new files) must not change
    verdicts or duplicate state partitions."""
    docs, chunked = _chunks_of_documents(spark, sf_smoke)
    src = str(tmp_path / "src")
    for i in range(3):
        (chunked.filter(F.col("chunk") == i).drop("chunk")
         .coalesce(1).write.parquet(f"{src}/part_{i}"))
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    start_dedup_stream(stream(), state, ckpt).awaitTermination(240)
    first = sorted(
        (r["doc_id"], r["is_dup"]) for r in read_verdicts(spark, state).collect()
    )
    start_dedup_stream(stream(), state, ckpt).awaitTermination(240)
    second = sorted(
        (r["doc_id"], r["is_dup"]) for r in read_verdicts(spark, state).collect()
    )
    assert first == second
    docs_n = docs.count()
    assert len(first) == docs_n, "replay duplicated or dropped verdict rows"


def test_prior_state_read_partition_prunes(spark, tmp_path):
    """The O(batch) contract's read side: _read_prior must push the
    `batch < id` predicate into PartitionFilters so a replayed batch's
    own leftover partition (and nothing newer) is pruned at plan time,
    not filtered after a full state scan."""
    import pyspark.sql.functions as F

    from pgcdc_spark.streaming.dedup import BANDS_SCHEMA, _read_prior

    base = str(tmp_path / "bands")
    for b in range(3):
        (spark.createDataFrame([(b * 10, b, f"sig{b}")], BANDS_SCHEMA)
         .write.mode("overwrite").parquet(f"{base}/batch={b}"))
    prior = _read_prior(spark, base, BANDS_SCHEMA, batch_id=2)
    plan = prior._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1][:120]
    assert "batch" in pf, f"batch predicate not in partition filters: {pf}"
    got = sorted(r["doc_id"] for r in prior.collect())
    assert got == [0, 10], "replayed partition (batch=2) leaked into prior state"


def test_stream_dedup_compaction_folds_state_and_preserves_verdicts(
    spark, sf_smoke, tmp_path
):
    """With compact_after=2 over 4 chunks the bands/sets fan-in folds to
    batch=0 + newest, and verdicts still match the batch truth — the
    fold must be invisible to the replay filter and the bucket joins."""
    import os

    docs, chunked = _chunks_of_documents(spark, sf_smoke, n_chunks=4)
    src = str(tmp_path / "src")
    for i in range(4):
        (chunked.filter(F.col("chunk") == i).drop("chunk")
         .coalesce(1).write.parquet(f"{src}/part_{i}"))
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part_*")
    )
    q = start_dedup_stream(stream, state, ckpt, threshold=_THRESHOLD,
                           compact_after=2)
    q.awaitTermination(240)

    band_parts = sorted(d for d in os.listdir(f"{state}/bands")
                        if d.startswith("batch="))
    assert len(band_parts) <= 3 and any(
        d.startswith("batch=-") for d in band_parts
    ), band_parts  # unique publish name batch=-<ns>

    got = {
        r["doc_id"]: (r["is_dup"], r["match_doc_id"])
        for r in read_verdicts(spark, state).collect()
    }
    want = _expected_verdicts(spark, docs, chunked)
    mismatch = {d: (got[d], want[d][:2]) for d in want if got[d] != want[d][:2]}
    assert not mismatch, f"{len(mismatch)} verdicts differ post-compaction"
    # verdict log keeps true arrival batches (never folded)
    n_verdict_batches = read_verdicts(spark, state).select("batch").distinct().count()
    assert n_verdict_batches >= 3


def test_dedup_state_compaction_crash_recovery(spark, tmp_path):
    """COMMIT present -> recovery deletes exactly the recorded victims and
    publishes the fold; no COMMIT -> the half-written fold is discarded."""
    import json
    import os
    import shutil

    from pgcdc_spark.streaming.dedup import (
        BANDS_SCHEMA,
        _compact_state_table,
        _read_prior,
    )

    base = str(tmp_path / "bands")
    for b in range(4):
        (spark.createDataFrame([(b, b, f"s{b}")], BANDS_SCHEMA)
         .write.mode("overwrite").parquet(f"{base}/batch={b}"))

    # simulate a crash AFTER the fold + COMMIT, before the victim delete:
    victims = ["batch=0", "batch=1", "batch=2"]
    folded = spark.read.parquet(*[f"{base}/{v}" for v in victims])
    folded.write.mode("overwrite").parquet(f"{base}/_compact/base")
    with open(f"{base}/_compact/COMMIT", "w") as f:
        json.dump(victims, f)
    prior = _read_prior(spark, base, BANDS_SCHEMA, batch_id=10)  # triggers recovery
    assert sorted(r["doc_id"] for r in prior.collect()) == [0, 1, 2, 3]
    parts = sorted(d for d in os.listdir(base) if d.startswith("batch="))
    # legacy fixed-name COMMIT (bare array) publishes under the legacy name
    assert parts == ["batch=0", "batch=3"]
    assert not os.path.isdir(f"{base}/_compact")

    # no COMMIT: a READER leaves the scratch alone (it may belong to an
    # in-flight compactor — round-6 review) and still reads correctly;
    # the WRITER discards its own stale scratch
    os.makedirs(f"{base}/_compact/base", exist_ok=True)
    with open(f"{base}/_compact/base/junk", "w") as f:
        f.write("partial")
    prior2 = _read_prior(spark, base, BANDS_SCHEMA, batch_id=10)
    assert sorted(r["doc_id"] for r in prior2.collect()) == [0, 1, 2, 3]
    assert os.path.isdir(f"{base}/_compact")

    # a direct compact (writer) discards the stale scratch and folds
    _compact_state_table(spark, base, keep_from=4)
    parts2 = sorted(d for d in os.listdir(base) if d.startswith("batch="))
    assert len(parts2) == 1 and parts2[0].startswith("batch=-"), parts2
    assert not os.path.isdir(f"{base}/_compact")
    published = parts2[0]

    # post-rename crash window of the LEGACY layout (round-6 review,
    # HIGH): a fixed-name _compact whose bare-array COMMIT lists the
    # published partition as a victim, base already renamed out. The new
    # protocol can't produce this (publish names are unique and never
    # victims), but pre-upgrade state must still recover losslessly.
    shutil.rmtree(f"{base}/_compact", ignore_errors=True)
    os.makedirs(f"{base}/_compact")
    with open(f"{base}/_compact/COMMIT", "w") as f:
        json.dump([published], f)
    prior3 = _read_prior(spark, base, BANDS_SCHEMA, batch_id=10)
    assert sorted(r["doc_id"] for r in prior3.collect()) == [0, 1, 2, 3]
    assert sorted(d for d in os.listdir(base) if d.startswith("batch=")) == [published]
    assert not os.path.isdir(f"{base}/_compact")
