"""Composed ingest: ONE CDC stream drives the dedup state, the ANN
index, AND the inverted text index (streaming/ingest.py), with a
mid-stream restart.

Truth model: after an insert/update/delete changelog,

- the maintained ANN index must answer probes BIT-IDENTICAL to a full
  rebuild over the final corpus state (donors stay in the bootstrap
  batch, so the frozen quantizer is the full-corpus quantizer);
- the dedup verdict log must equal the SOLO dedup stream's log over the
  same insert batches (verdicts are first-seen decisions; updates and
  deletes do not re-open them);
- the postings view (term/tf + doc lengths) must equal a recompute over
  the final text state — updates swap a doc's token multiset, deletes
  retract it.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROW_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("embedding", ArrayType(DoubleType())),
])

_DELTA = lambda d: d % 100 == 2 and d % 53 != 1 and d % 127 != 1  # noqa: E731
_UPDATE_IDS = (20, 33)
_DELETE_IDS = (45, 71)


def _env(lsn: int, tag: str, doc_id: int, text: str, emb: list[float]) -> str:
    img = {"doc_id": doc_id, "text": text, "embedding": emb}
    e = {"lsn": f"0/{lsn:06X}", "tag": tag, "table": "documents"}
    e["old" if tag == "delete" else "new"] = img
    return json.dumps(e)


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    from pgcdc_spark.catalog import load

    (docs,) = load(spark, sf_smoke, "documents")
    (emb,) = load(spark, sf_smoke, "embeddings")
    rows = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id", "text",
            F.col("embedding").cast("array<double>").alias("e"),
        )
        .collect()
    )
    return {
        int(r["doc_id"]): (r["text"], [float(x) for x in r["e"]])
        for r in rows
    }


def test_one_stream_two_maintainers_with_restart(spark, tmp_path, corpus):
    from pgcdc_spark.operators.annindex import AnnIndex
    from pgcdc_spark.streaming.dedup import read_verdicts, start_dedup_stream
    from pgcdc_spark.streaming.ingest import start_training_ingest_stream
    from pgcdc_spark.streaming.ivm import PostingsView, read_postings_view

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    dstate = str(tmp_path / "dedup")
    root = str(tmp_path / "annidx")
    tindex = str(tmp_path / "textidx")
    drift = str(tmp_path / "drift")
    os.makedirs(src)

    base_ids = [d for d in sorted(corpus) if not _DELTA(d)]
    delta_ids = [d for d in sorted(corpus) if _DELTA(d)]
    assert delta_ids
    for d in (*_UPDATE_IDS, *_DELETE_IDS):
        assert d in base_ids and d >= 8 and d % 53 != 1 and d % 127 != 1

    lsn = iter(range(1, 10_000))

    def _write(name, lines, mtime):
        p = os.path.join(src, name)
        with open(p, "w") as f:
            f.write("\n".join(lines))
        os.utime(p, (mtime, mtime))

    def run():
        q = start_training_ingest_stream(
            spark, src, ckpt, dstate, root, ROW_SCHEMA,
            max_files_per_trigger=1, ann_compact_after=1,
            text_index_dir=tindex, drift_dir=drift,
        )
        q.awaitTermination(300)

    # phase 1: bootstrap inserts only, then STOP (mid-stream restart point)
    _write("c0.jsonl",
           [_env(next(lsn), "insert", d, *corpus[d]) for d in base_ids],
           1_700_000_000)
    run()
    idx = AnnIndex(root)
    v_boot = idx.current_version()
    assert v_boot is not None

    # phase 2 (after restart on the same checkpoint): delta inserts, then
    # updates (text AND embedding change) + tombstones
    _write("c1.jsonl",
           [_env(next(lsn), "insert", d, *corpus[d]) for d in delta_ids],
           1_700_000_001)
    _write("c2.jsonl",
           [_env(next(lsn), "update", d,
                 corpus[d][0] + " amended", [x + 1.0 for x in corpus[d][1]])
            for d in _UPDATE_IDS]
           + [_env(next(lsn), "delete", d, *corpus[d]) for d in _DELETE_IDS],
           1_700_000_002)
    run()

    # --- ANN half: maintained index == full rebuild over final state ---
    final = {d: e for d, (t, e) in corpus.items()}
    for d in _UPDATE_IDS:
        final[d] = [x + 1.0 for x in final[d]]
    for d in _DELETE_IDS:
        del final[d]
    full = AnnIndex(str(tmp_path / "full"))
    full.build(
        spark.createDataFrame(
            sorted(final.items()), "vec_id long, embedding array<double>"
        ),
        label="full",
    )
    queries = spark.createDataFrame(
        [(d, corpus[d][1]) for d in sorted(corpus) if d < 8],
        "qid long, e array<double>",
    )
    got = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    want = sorted(map(tuple, full.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got == want

    # --- dedup half: verdict log == solo dedup stream over the same
    # insert batches (c0 -> batch 0, c1 -> batch 1; c2 has no inserts) ---
    solo_src = str(tmp_path / "solo_src")
    for i, ids in enumerate((base_ids, delta_ids)):
        (spark.createDataFrame(
            [(d, corpus[d][0]) for d in ids], "doc_id long, text string")
         .coalesce(1).write.parquet(f"{solo_src}/part_{i}"))
    solo_state = str(tmp_path / "solo_state")
    docs_stream = (
        spark.readStream
        .schema(StructType([StructField("doc_id", LongType()),
                            StructField("text", StringType())]))
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{solo_src}/part_*")
    )
    start_dedup_stream(
        docs_stream, solo_state, str(tmp_path / "solo_ckpt")
    ).awaitTermination(300)

    def verdicts(state):
        return sorted(
            (r["doc_id"], r["is_dup"], r["match_doc_id"], r["batch"])
            for r in read_verdicts(spark, state).collect()
        )

    composed, solo = verdicts(dstate), verdicts(solo_state)
    assert composed == solo
    assert {b for (_, _, _, b) in composed} == {0, 1}  # c2 wrote no verdicts

    # --- text-index half: maintained postings == recompute over the
    # final text state (updates changed texts, deletes removed docs) ---
    final_text = {d: t for d, (t, _e) in corpus.items()}
    for d in _UPDATE_IDS:
        final_text[d] = final_text[d] + " amended"
    for d in _DELETE_IDS:
        del final_text[d]
    want_post = {}
    for d, t in final_text.items():
        toks = t.split(" ")
        for tok in set(toks):
            want_post[(tok, d)] = toks.count(tok)
        want_post[(" DL", d)] = len(toks)
    got_post = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in read_postings_view(spark, tindex, PostingsView("post")).collect()
    }
    assert got_post == want_post

    # --- drift-monitor half: maintained doc-length histogram ==
    # recompute over the final text state (the c2 updates lengthen two
    # docs — bucket-crossing retractions run when they cross 250-char
    # boundaries; the deletes retract entirely) ---
    from pgcdc_spark.streaming.ivm import AggView, read_agg_view

    def _bucket(n: int) -> int:  # python mirror of width_bucket(0,2000,8)
        return 9 if n >= 2000 else int(n * 8 / 2000) + 1

    want_hist: dict[int, list] = {}
    for t in final_text.values():
        agg = want_hist.setdefault(_bucket(len(t)), [0.0, 0])
        agg[0] += float(len(t))
        agg[1] += 1
    drift_view = AggView("drift", group_cols=["bucket"], sum_col="doclen")

    def hist():
        return {
            r["bucket"]: [r["sum_doclen"], r["n_rows"]]
            for r in read_agg_view(spark, drift, drift_view).collect()
        }

    assert hist() == want_hist

    # --- replay: rerun with no new files — all artifacts untouched ---
    v_before = idx.current_version()
    before = verdicts(dstate)
    run()
    assert idx.current_version() == v_before
    assert verdicts(dstate) == before
    assert {
        (r["term"], r["doc_id"]): r["tf"]
        for r in read_postings_view(spark, tindex, PostingsView("post")).collect()
    } == want_post
    assert hist() == want_hist


def test_same_batch_insert_update_still_gets_dedup_verdict(spark, tmp_path):
    """Round-8 review regression: a doc INSERTED and UPDATED within one
    micro-batch folds to op='U' — the old folded-op filter skipped its
    dedup verdict forever.  Insert detection must be pre-fold, with the
    verdict adjudicated on the folded FINAL text; an insert-then-delete
    in one batch stays skipped (the doc never existed at a boundary)."""
    from pgcdc_spark.operators.annindex import AnnIndex
    from pgcdc_spark.streaming.dedup import read_verdicts
    from pgcdc_spark.streaming.ingest import start_training_ingest_stream
    from pgcdc_spark.streaming.ivm import PostingsView, read_postings_view

    src = str(tmp_path / "src")
    os.makedirs(src)
    emb = lambda d: [float(d % 5), float(d % 7), 1.0]  # noqa: E731
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven twelve"
    base = {d: (f"base document number {d} " + " ".join(
        f"w{(d * 7 + i) % 31}" for i in range(12)), emb(d))
        for d in range(1, 9)}  # vec_id 1 donates centroids AND codebook

    lines = [_env(i + 1, "insert", d, *base[d]) for i, d in enumerate(base)]
    # doc 11: I then U in the SAME batch -> folded op 'U', final text t2
    lines.append(_env(100, "insert", 11, t1, emb(11)))
    lines.append(_env(101, "update", 11, t2, emb(11)))
    # doc 12: I then D in the SAME batch -> folded op 'D', never existed
    lines.append(_env(102, "insert", 12, "ephemeral doc " + t1, emb(12)))
    lines.append(_env(103, "delete", 12, "ephemeral doc " + t1, emb(12)))
    with open(os.path.join(src, "c0.jsonl"), "w") as f:
        f.write("\n".join(lines))
    os.utime(os.path.join(src, "c0.jsonl"), (1_700_000_000,) * 2)
    # batch 1: doc 13 duplicates doc 11's FINAL text (dup iff the state
    # holds t2); doc 14 duplicates the PRE-update text t1 (novel iff the
    # state does NOT hold t1)
    with open(os.path.join(src, "c1.jsonl"), "w") as f:
        f.write("\n".join([_env(200, "insert", 13, t2, emb(13)),
                           _env(201, "insert", 14, t1, emb(14))]))
    os.utime(os.path.join(src, "c1.jsonl"), (1_700_000_001,) * 2)

    start_training_ingest_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "dedup"),
        str(tmp_path / "annidx"), ROW_SCHEMA, max_files_per_trigger=1,
        text_index_dir=str(tmp_path / "textidx"),
    ).awaitTermination(300)

    v = {r["doc_id"]: (r["is_dup"], r["match_doc_id"], r["batch"])
         for r in read_verdicts(spark, str(tmp_path / "dedup")).collect()}
    assert v[11] == (False, None, 0)          # adjudicated despite the fold
    assert 12 not in v                        # insert-then-delete: skipped
    assert v[13] == (True, 11, 1)             # matches the FOLDED text t2
    assert v[14][0] is False                  # t1 never entered the state

    # ANN + postings agree: doc 11 present, doc 12 absent
    idx = AnnIndex(str(tmp_path / "annidx"))
    ids = {r["neighbor_id"] for r in idx.probe(
        spark,
        spark.createDataFrame([(0, emb(11))], "qid long, e array<double>"),
        nprobe=99, k=99).select("neighbor_id").collect()}
    assert 11 in ids and 12 not in ids
    post_docs = {r["doc_id"] for r in read_postings_view(
        spark, str(tmp_path / "textidx"), PostingsView("post")).collect()}
    assert 11 in post_docs and 12 not in post_docs
