"""Incremental materialized-view maintenance: the delta log must track
inserts, updates (including group moves), and deletes exactly; replays
must never double-count; compaction must preserve the view."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pgcdc_spark.streaming.ivm import (
    AggView,
    compact_view,
    read_agg_view,
    start_upsert_stream_with_view,
)
from pgcdc_spark.streaming.pipeline import read_envelope_stream
from pgcdc_spark.streaming.statestore import BucketedStateStore

ROW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("val", DoubleType()),
    ]
)

VIEW = AggView("by_grp", group_cols=["grp"], sum_col="val")


def _env(lsn, tag, img=None):
    e = {"lsn": f"0/{lsn:04X}", "tag": tag}
    if tag == "delete":
        e["old"] = img
    elif img is not None:
        e["new"] = img
    return json.dumps(e)


CHUNKS = [
    [
        _env(1, "insert", {"id": 1, "grp": "A", "val": 10.0}),
        _env(2, "insert", {"id": 2, "grp": "A", "val": 5.0}),
        _env(3, "insert", {"id": 3, "grp": "B", "val": 7.0}),
    ],
    [
        _env(4, "update", {"id": 1, "grp": "A", "val": 20.0}),
        _env(5, "delete", {"id": 2, "grp": "A", "val": 5.0}),
    ],
    [
        # group move: B's row migrates to A
        _env(6, "update", {"id": 3, "grp": "A", "val": 9.0}),
    ],
]


def _run(spark, tmp_path, sub):
    src = str(tmp_path / f"src{sub}")
    os.makedirs(src, exist_ok=True)
    for i, lines in enumerate(CHUNKS):
        with open(os.path.join(src, f"c{i}.jsonl"), "w") as f:
            f.write("\n".join(lines))
    state = str(tmp_path / f"state{sub}")
    ckpt = str(tmp_path / f"ckpt{sub}")
    changes = read_envelope_stream(spark, src, ROW_SCHEMA, max_files_per_trigger=1)
    q = start_upsert_stream_with_view(changes, state, ckpt, keys=["id"], view=VIEW)
    q.awaitTermination(240)
    return src, state, ckpt


def _view_rows(spark, state):
    return {
        r["grp"]: (r["sum_val"], r["n_rows"])
        for r in read_agg_view(spark, state, VIEW).collect()
    }


def test_view_tracks_insert_update_delete_and_group_move(spark, tmp_path):
    _, state, _ = _run(spark, tmp_path, "a")
    got = _view_rows(spark, state)
    # final state: id1 (A, 20), id3 (A, 9); id2 deleted; B emptied out
    assert got == {"A": (29.0, 2)}
    # the view must equal a full groupBy over the materialized state
    st = BucketedStateStore(os.path.join(state, "state")).read(spark)
    truth = {
        r["grp"]: (r["s"], r["n"])
        for r in st.filter(F.col("op") != "D")
        .groupBy("grp")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == truth
    # three batches -> three delta partitions
    droot = os.path.join(state, "view_by_grp")
    assert len([d for d in os.listdir(droot) if d.startswith("delta_batch=")]) == 3


def test_view_replay_never_double_counts(spark, tmp_path):
    src, state, ckpt = _run(spark, tmp_path, "b")
    before = _view_rows(spark, state)
    # restart over the same checkpoint with no new data: no-op
    changes = read_envelope_stream(spark, src, ROW_SCHEMA, max_files_per_trigger=1)
    q = start_upsert_stream_with_view(changes, state, ckpt, keys=["id"], view=VIEW)
    q.awaitTermination(240)
    assert _view_rows(spark, state) == before

    # a replayed label against the ALREADY-PUBLISHED state must be a no-op
    # even when foreachBatch hands the batch back (simulated direct call):
    store = BucketedStateStore(os.path.join(state, "state"))
    batch = spark.createDataFrame(
        [("0/0006", "U", 3, "A", 9.0)], "lsn string, op string, id long, grp string, val double"
    )
    calls = []
    out = store.merge(
        batch, keys=["id"], order_by=["lsn"], label="2",
        on_transition=lambda c, n, t: calls.append(1),
    )
    assert out is None and calls == [], "applied label re-ran the transition hook"


def test_view_compaction_preserves_contents(spark, tmp_path):
    _, state, _ = _run(spark, tmp_path, "c")
    before = _view_rows(spark, state)
    compact_view(spark, state, VIEW)
    droot = os.path.join(state, "view_by_grp")
    assert os.listdir(droot) == ["delta_batch=base"]
    assert _view_rows(spark, state) == before
