"""CDC stream -> persisted ANN index maintenance (streaming/annstream.py).

Batch-equivalence: after streaming insert/update/delete envelopes through
the maintainer, probes from the maintained index must be BIT-IDENTICAL
to a full rebuild over the final corpus state (the quantizer donors stay
in the bootstrap batch and untouched, so the frozen quantizer IS the
full-corpus quantizer). Restart/replay: re-running the stream on the
same checkpoint with no new files leaves the index version untouched,
and a forced replay of the last batch label is an exact no-op.
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
    StructField,
    StructType,
)

ROW_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
])

# donors (centroids vec%53==1, codebook vec%127==1) and probe queries
# (vec<8) must stay in the bootstrap batch and never change
_DELTA_IDS = lambda vid: vid % 100 == 2 and vid % 53 != 1 and vid % 127 != 1
_UPDATE_IDS = (20, 33)
_DELETE_IDS = (45, 71)


def _env(lsn: int, tag: str, vec_id: int, emb: list[float]) -> str:
    img = {"vec_id": vec_id, "embedding": emb}
    e = {"lsn": f"0/{lsn:06X}", "tag": tag, "table": "embeddings"}
    e["old" if tag == "delete" else "new"] = img
    return json.dumps(e)


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    from pgcdc_spark.catalog import load

    (emb,) = load(spark, sf_smoke, "embeddings")
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    return {int(r["vec_id"]): [float(x) for x in r["e"]] for r in rows}


def test_cdc_stream_maintains_ann_index(spark, tmp_path, corpus):
    from pgcdc_spark.operators.annindex import AnnIndex
    from pgcdc_spark.streaming.annstream import start_ann_index_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "annidx")
    os.makedirs(src)

    base_ids = [v for v in sorted(corpus) if not _DELTA_IDS(v)]
    delta_ids = [v for v in sorted(corpus) if _DELTA_IDS(v)]
    assert delta_ids and _UPDATE_IDS and _DELETE_IDS
    for v in (*_UPDATE_IDS, *_DELETE_IDS):
        assert v in base_ids and v >= 8 and v % 53 != 1 and v % 127 != 1

    lsn = iter(range(1, 10_000))
    files = {
        # bootstrap: the full base corpus (donors included)
        "c0.jsonl": [_env(next(lsn), "insert", v, corpus[v]) for v in base_ids],
        # incremental inserts
        "c1.jsonl": [_env(next(lsn), "insert", v, corpus[v]) for v in delta_ids],
        # updates (changed embeddings) + tombstones, plus an in-batch
        # double-change: vec 20 updates twice, last LSN wins
        "c2.jsonl": (
            [_env(next(lsn), "update", 20, [x + 9.0 for x in corpus[20]])]
            + [_env(next(lsn), "update", v, [x + 1.0 for x in corpus[v]])
               for v in _UPDATE_IDS]
            + [_env(next(lsn), "delete", v, corpus[v]) for v in _DELETE_IDS]
        ),
    }
    for i, (name, lines) in enumerate(sorted(files.items())):
        p = os.path.join(src, name)
        with open(p, "w") as f:
            f.write("\n".join(lines))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    def run():
        # compact_after=1: every batch that leaves the cellmap spanning
        # >1 version triggers a fold, so the stream exercises append AND
        # compaction; probe equivalence below proves both preserve codes
        q = start_ann_index_stream(
            spark, src, ckpt, root, ROW_SCHEMA, max_files_per_trigger=1,
            compact_after=1,
        )
        q.awaitTermination(240)

    run()
    idx = AnnIndex(root)
    m = idx.meta()
    assert set(m["applied"]) >= {"1", "2"}  # appends recorded
    assert len(set(m["cellmap"].values())) == 1  # compaction folded the chain

    # final corpus state after the changelog
    final = dict(corpus)
    for v in _UPDATE_IDS:
        final[v] = [x + 1.0 for x in final[v]]
    for v in _DELETE_IDS:
        del final[v]
    full = AnnIndex(str(tmp_path / "full"))
    full.build(
        spark.createDataFrame(
            [(v, e) for v, e in sorted(final.items())],
            "vec_id long, embedding array<double>",
        ),
        label="full",
    )
    queries = spark.createDataFrame(
        [(v, corpus[v]) for v in sorted(corpus) if v < 8],
        "qid long, e array<double>",
    )
    got = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    want = sorted(map(tuple, full.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got == want  # stream-maintained == full rebuild, bit-identical

    # restart on the same checkpoint, no new files: version untouched
    v_before = idx.current_version()
    run()
    assert idx.current_version() == v_before

    # forced replay of an applied label: exact no-op
    dummy = spark.createDataFrame([(999_983, corpus[8])],
                                  "vec_id long, embedding array<double>")
    assert idx.append(dummy, label=sorted(m["applied"])[-1]) == v_before
    assert idx.current_version() == v_before

    # a NEW late file continues maintenance after restart
    late_id = 999_931
    p = os.path.join(src, "c3.jsonl")
    with open(p, "w") as f:
        f.write(_env(9_999, "insert", late_id, corpus[9]))
    os.utime(p, (1_700_000_010, 1_700_000_010))
    run()
    assert idx.current_version() != v_before
    ids_now = {
        r[0]
        for c in idx.meta()["cellmap"]
        for r in idx._read_cells(spark, idx.meta(), [int(c)])
        .select("vec_id").distinct().collect()
    }
    assert late_id in ids_now and not (ids_now & set(_DELETE_IDS))
