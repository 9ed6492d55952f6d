"""Streaming semantics tests: the CDC file-stream -> foreachBatch upsert
pipeline (same assertions as the batch golden test, through readStream),
then watermark/window behavior on replayed event data.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from pgcdc_spark.streaming.pipeline import (
    read_envelope_stream,
    read_state,
    start_upsert_stream,
)
from pgcdc_spark.streaming.windows import (
    session_counts,
    streaming_dedup,
    tumbling_counts,
)
from tests.test_cdc import EXPECTED, fixture_lines


def _write_chunks(dirpath: str, lines: list[str], chunks: int = 3) -> None:
    os.makedirs(dirpath, exist_ok=True)
    per = max(1, len(lines) // chunks)
    for i in range(0, len(lines), per):
        with open(os.path.join(dirpath, f"chunk_{i:04d}.jsonl"), "w") as f:
            f.write("\n".join(lines[i : i + per]))


def test_stream_upsert_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, fixture_lines())

    changes = read_envelope_stream(spark, src, max_files_per_trigger=1)
    q = start_upsert_stream(changes, state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    state = read_state(spark, state_dir)
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in state.collect()}
    assert rows == EXPECTED


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Sink-confirmed offsets: a second run over the same checkpoint must
    not re-apply (or lose) anything; new files still get picked up."""
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    lines = fixture_lines()
    _write_chunks(src, lines[:8])

    q = start_upsert_stream(read_envelope_stream(spark, src), state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    # "restart": new query, same checkpoint, remaining events arrive
    with open(os.path.join(src, "late.jsonl"), "w") as f:
        f.write("\n".join(lines[8:]))
    q2 = start_upsert_stream(read_envelope_stream(spark, src), state_dir, ckpt, keys=["id"])
    q2.awaitTermination(120)

    state = read_state(spark, state_dir)
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in state.collect()}
    assert rows == EXPECTED


def test_stream_upsert_crash_mid_commit_recovers(spark, tmp_path, monkeypatch):
    """Kill the sink BETWEEN writing the new version dir and publishing the
    manifest: the previous complete state must stay live (no partial table
    ever visible), and a plain restart must converge to the full result."""
    from pgcdc_spark.streaming import statestore
    from pgcdc_spark.streaming.statestore import AtomicStateStore

    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    lines = fixture_lines()
    _write_chunks(src, lines[:8], chunks=1)

    q = start_upsert_stream(read_envelope_stream(spark, src), state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)
    before = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
              for r in read_state(spark, state_dir).collect()}
    assert before  # first batch committed

    # Arm the crash: data write succeeds, manifest publish dies.
    real_publish = AtomicStateStore._publish

    def exploding_publish(self, version):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(statestore.AtomicStateStore, "_publish", exploding_publish)
    with open(os.path.join(src, "late.jsonl"), "w") as f:
        f.write("\n".join(lines[8:]))
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q2 = start_upsert_stream(read_envelope_stream(spark, src), state_dir, ckpt, keys=["id"])
    with pytest.raises(StreamingQueryException):
        q2.awaitTermination(120)

    # Old state still live and complete — the crash was invisible to readers.
    after_crash = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
                   for r in read_state(spark, state_dir).collect()}
    assert after_crash == before

    # Plain restart (no fault): failed batch replays from the checkpoint.
    monkeypatch.setattr(statestore.AtomicStateStore, "_publish", real_publish)
    q3 = start_upsert_stream(read_envelope_stream(spark, src), state_dir, ckpt, keys=["id"])
    q3.awaitTermination(120)
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in read_state(spark, state_dir).collect()}
    assert rows == EXPECTED


def test_statestore_replay_same_label_no_clobber(spark, tmp_path):
    """Re-committing the same batch label (crash-after-publish replay) must
    produce a NEW version dir — never overwrite the live one in place."""
    from pgcdc_spark.streaming.statestore import AtomicStateStore

    store = AtomicStateStore(str(tmp_path / "st"))
    os.makedirs(store.root, exist_ok=True)
    df1 = spark.createDataFrame([(1, "a")], "id LONG, v STRING")
    v1 = store.commit(df1, label="0")
    df2 = store.read(spark).unionByName(
        spark.createDataFrame([(2, "b")], "id LONG, v STRING")
    )
    v2 = store.commit(df2, label="0")  # replayed batch id
    assert v1 != v2
    assert {r["id"] for r in store.read(spark).collect()} == {1, 2}


def _bucket_files(store, manifest):
    """bucket id -> set of live parquet file paths, via the manifest."""
    out = {}
    for b, v in manifest["buckets"].items():
        d = os.path.join(store.root, v, f"{store.BUCKET_COL}={b}")
        out[b] = {os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")}
    return out


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The incremental-merge contract: a batch touching one key rewrites
    exactly that key's bucket; every other bucket keeps pointing at its
    old version dir and its old files stay on disk untouched."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(str(tmp_path / "st"), n_buckets=8)
    base = spark.createDataFrame(
        [(i, f"{i:03d}", "I", f"v{i}") for i in range(20)],
        "id LONG, lsn STRING, op STRING, v STRING",
    )
    store.merge(base, keys=["id"], order_by=["lsn"], label="0")
    man0 = store.current_manifest()
    files0 = _bucket_files(store, man0)
    assert len(man0["buckets"]) > 1  # 20 keys spread over several buckets

    batch = spark.createDataFrame(
        [(7, "100", "U", "updated")], "id LONG, lsn STRING, op STRING, v STRING"
    )
    store.merge(batch, keys=["id"], order_by=["lsn"], label="1")
    man1 = store.current_manifest()

    changed = {b for b, v in man1["buckets"].items() if man0["buckets"].get(b) != v}
    assert len(changed) == 1  # exactly the bucket holding id=7
    for b, v in man0["buckets"].items():
        if b in changed:
            continue
        assert man1["buckets"][b] == v  # untouched bucket: same version...
        for p in files0[b]:
            assert os.path.exists(p)  # ...and the same files, not rewritten

    rows = {r["id"]: r["v"] for r in store.read(spark).filter("op <> 'D'").collect()}
    assert len(rows) == 20 and rows[7] == "updated" and rows[3] == "v3"


def test_bucketed_store_compaction_bounds_fanin_and_gcs(spark, tmp_path):
    """Version fan-in stays bounded by compact_after (LSM-style fold) and
    version dirs no longer referenced by any bucket are deleted
    (history_keep=1: no time-travel window pinning old versions)."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(str(tmp_path / "st"), n_buckets=4, compact_after=2,
                               history_keep=1)
    for i in range(6):
        batch = spark.createDataFrame(
            [(i, f"{i:03d}", "I", f"v{i}")], "id LONG, lsn STRING, op STRING, v STRING"
        )
        store.merge(batch, keys=["id"], order_by=["lsn"], label=str(i))
    man = store.current_manifest()
    assert len(set(man["buckets"].values())) <= store.compact_after
    on_disk = {d for d in os.listdir(store.root) if d.startswith("v-")}
    assert on_disk == set(man["buckets"].values())  # unreferenced dirs GC'd
    rows = {r["id"]: r["v"] for r in store.read(spark).collect()}
    assert rows == {i: f"v{i}" for i in range(6)}


def test_bucketed_store_rebucket_preserves_state_and_reroutes(spark, tmp_path):
    """rebucket rewrites the table under a new hash fan-out: contents
    identical, manifest owns the new n_buckets, merges and pruned lookups
    keep working against the new layout."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(str(tmp_path / "st"), n_buckets=4)
    base = spark.createDataFrame(
        [(i, f"{i:03d}", "I", f"v{i}") for i in range(30)],
        "id LONG, lsn STRING, op STRING, v STRING",
    )
    store.merge(base, keys=["id"], order_by=["lsn"], label="0")
    before = {r["id"]: r["v"] for r in store.read(spark).collect()}

    store.rebucket(spark, keys=["id"], new_n_buckets=16, label="rb")
    man = store.current_manifest()
    assert man["n_buckets"] == 16
    assert len(man["buckets"]) > 4  # 30 keys spread across the finer layout
    assert {r["id"]: r["v"] for r in store.read(spark).collect()} == before

    # a FRESH handle (constructor default 64) follows the manifest, and
    # both merge and pruned lookup route by the committed bucketing
    store2 = BucketedStateStore(str(tmp_path / "st"))
    store2.merge(
        spark.createDataFrame([(7, "100", "U", "updated")],
                              "id LONG, lsn STRING, op STRING, v STRING"),
        keys=["id"], order_by=["lsn"], label="1",
    )
    got = store2.lookup(spark, ["id"], [(7,), (8,)])
    assert {r["id"]: r["v"] for r in got.collect()} == {7: "updated", 8: "v8"}


def test_bucketed_store_point_lookup_prunes_buckets(spark, tmp_path):
    """lookup() must read ONLY the buckets the probed keys hash to —
    inputFiles of the returned frame stay inside those bucket dirs — and
    return current images with tombstones filtered."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(str(tmp_path / "st"), n_buckets=8)
    base = spark.createDataFrame(
        [(i, f"{i:03d}", "I", f"v{i}") for i in range(40)],
        "id LONG, lsn STRING, op STRING, v STRING",
    )
    store.merge(base, keys=["id"], order_by=["lsn"], label="0")
    store.merge(
        spark.createDataFrame([(7, "100", "D", "v7")],
                              "id LONG, lsn STRING, op STRING, v STRING"),
        keys=["id"], order_by=["lsn"], label="1",
    )

    got = store.lookup(spark, ["id"], [(3,), (7,), (11,)])
    rows = {r["id"]: r["v"] for r in got.collect()}
    assert rows == {3: "v3", 11: "v11"}  # 7 is tombstoned

    wanted = {
        r[0] for r in
        spark.createDataFrame([(3,), (7,), (11,)], "id LONG")
        .select(store.bucket_expr(["id"]).alias("b")).distinct().collect()
    }
    for f in got.inputFiles():
        assert any(f"{store.BUCKET_COL}={b}/" in f for b in wanted), f
    # and it is a strict subset of the full state's files (pruning real)
    assert len(got.inputFiles()) < len(store.read(spark).inputFiles())

    assert store.lookup(spark, ["id"], []) is None


def test_bucketed_store_time_travel_read_asof(spark, tmp_path):
    """read_asof(label) reconstructs the committed state at any retained
    publish straight from manifest history — across merges, after
    compaction, and with a loud failure beyond the retained window."""
    import pytest

    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(str(tmp_path / "st"), n_buckets=4,
                               compact_after=3, history_keep=8)
    snapshots = {}
    for i in range(5):
        rows = [(i, f"{i:03d}", "I", f"v{i}")]
        if i == 3:  # batch 3 also updates key 0
            rows.append((0, "900", "U", "v0-updated"))
        batch = spark.createDataFrame(
            rows, "id LONG, lsn STRING, op STRING, v STRING"
        )
        store.merge(batch, keys=["id"], order_by=["lsn"], label=str(i))
        snapshots[str(i)] = {
            r["id"]: r["v"] for r in store.read(spark).filter("op <> 'D'").collect()
        }

    # exact-label reads reproduce every retained snapshot (compaction
    # happened along the way at compact_after=3 and must not corrupt them)
    for lbl, want in snapshots.items():
        got = {r["id"]: r["v"]
               for r in store.read_asof(spark, lbl).filter("op <> 'D'").collect()}
        assert got == want, f"as-of {lbl}"
    assert snapshots["2"][0] == "v0" and snapshots["4"][0] == "v0-updated"

    # between-labels semantics: newest publish <= requested label
    got35 = {r["id"]: r["v"]
             for r in store.read_asof(spark, "35").filter("op <> 'D'").collect()}
    assert got35 == snapshots["4"]

    # beyond the retained window: loud failure, not silent empty state
    tight = BucketedStateStore(str(tmp_path / "st2"), n_buckets=4, history_keep=2)
    for i in range(4):
        b = spark.createDataFrame([(i, f"{i:03d}", "I", f"v{i}")],
                                  "id LONG, lsn STRING, op STRING, v STRING")
        tight.merge(b, keys=["id"], order_by=["lsn"], label=str(i))
    with pytest.raises(ValueError, match="predates the retained history"):
        tight.read_asof(spark, "0")


def _event_stream(spark, tmp_path, rows):
    """rows: (event_id, iso_ts, user_id, event_type, value)"""
    src = str(tmp_path / "events_src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([rows[: len(rows) // 2], rows[len(rows) // 2 :]]):
        with open(os.path.join(src, f"ev_{i}.jsonl"), "w") as f:
            for r in chunk:
                f.write(json.dumps({"event_id": r[0], "ts": r[1], "user_id": r[2],
                                    "event_type": r[3], "value": r[4]}) + "\n")
    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        .withColumn("ts_utc", F.to_timestamp("ts"))
    )


EVENTS = [
    (1, "2024-01-01 00:01:00", 1, "click", 1.0),
    (2, "2024-01-01 00:04:00", 1, "click", 2.0),
    (3, "2024-01-01 00:12:00", 2, "view", 3.0),
    (4, "2024-01-01 00:13:00", 1, "click", 4.0),
    (5, "2024-01-01 00:55:00", 2, "view", 5.0),   # new session for user 2
    (6, "2024-01-01 01:02:00", 1, "click", 6.0),
    (7, "2024-01-01 00:02:00", 3, "late", 7.0),    # late event within watermark
]


def _run_to_memory(df, name: str, output_mode: str):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_tumbling_window_counts(spark, tmp_path):
    ev = _event_stream(spark, tmp_path, EVENTS)
    agg = tumbling_counts(ev, "ts_utc", "10 minutes", "2 hours")
    _run_to_memory(agg, "tumbling_t", "complete")
    got = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 3),  # events 1,2 + late event 7
        ("2024-01-01 00:10:00", 2),
        ("2024-01-01 00:50:00", 1),
        ("2024-01-01 01:00:00", 1),
    }


def test_session_window_counts(spark, tmp_path):
    ev = _event_stream(spark, tmp_path, EVENTS)
    agg = session_counts(ev, "ts_utc", "30 minutes", "2 hours")
    _run_to_memory(agg, "session_t", "complete")
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_t").collect()
    }
    # user 1: events at 00:01,00:04,00:13 one session; 01:02 second session
    assert (1, 3) in got and (1, 1) in got
    # user 2: 00:12 and 00:55 are separate sessions
    assert got >= {(2, 1), (3, 1)}


def test_streaming_dedup(spark, tmp_path):
    doubled = EVENTS + EVENTS  # at-least-once duplication
    ev = _event_stream(spark, tmp_path, doubled)
    dd = streaming_dedup(ev, ["event_id"], "ts_utc", "2 hours")
    _run_to_memory(dd, "dedup_t", "append")
    n = spark.sql("SELECT COUNT(DISTINCT event_id) c FROM dedup_t").collect()[0]["c"]
    total = spark.sql("SELECT COUNT(*) c FROM dedup_t").collect()[0]["c"]
    assert n == len(EVENTS)
    assert total == len(EVENTS)


# --- streaming joins --------------------------------------------------------

from pgcdc_spark.streaming.joins import (  # noqa: E402
    stream_static_enrich,
    stream_stream_interval_join,
)


def test_stream_static_enrich(spark, tmp_path):
    ev = _event_stream(spark, tmp_path, EVENTS)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id LONG, tier STRING"
    )
    out = stream_static_enrich(ev.select("event_id", "user_id"), dim, "user_id")
    _run_to_memory(out, "enrich_t", "append")
    got = {(r["event_id"], r["tier"])
           for r in spark.sql("SELECT * FROM enrich_t").collect()}
    # left join: user 3 has no dim row -> null tier survives
    assert got == {(1, "gold"), (2, "gold"), (4, "gold"), (6, "gold"),
                   (3, "silver"), (5, "silver"), (7, None)}


def _named_event_stream(spark, tmp_path, rows, name):
    src = str(tmp_path / f"{name}_src")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "part0.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({"event_id": r[0], "ts": r[1], "user_id": r[2],
                                "event_type": r[3], "value": r[4]}) + "\n")
    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    return (
        spark.readStream.schema(schema).json(src)
        .withColumn("ts_utc", F.to_timestamp("ts"))
    )


def test_stream_stream_interval_join(spark, tmp_path):
    clicks = [
        (1, "2024-01-01 00:01:00", 1, "click", 1.0),
        (2, "2024-01-01 00:30:00", 2, "click", 2.0),
    ]
    buys = [
        (10, "2024-01-01 00:05:00", 1, "buy", 9.0),   # 4 min after click 1 -> joins
        (11, "2024-01-01 00:50:00", 2, "buy", 8.0),   # 20 min after click 2 -> outside bound
        (12, "2024-01-01 00:00:30", 1, "buy", 7.0),   # BEFORE click 1 -> outside [0, +10m]
    ]
    l = _named_event_stream(spark, tmp_path, clicks, "clicks").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("uid"),
        F.col("ts_utc").alias("click_ts"))
    r = _named_event_stream(spark, tmp_path, buys, "buys").select(
        F.col("event_id").alias("buy_id"), F.col("user_id").alias("uid"),
        F.col("ts_utc").alias("buy_ts"))
    joined = stream_stream_interval_join(
        l, r, key="uid", left_ts="click_ts", right_ts="buy_ts",
        watermark="2 hours", upper="INTERVAL 10 MINUTES",
    ).select("click_id", "buy_id")
    _run_to_memory(joined, "ssj_t", "append")
    got = {(row["click_id"], row["buy_id"])
           for row in spark.sql("SELECT * FROM ssj_t").collect()}
    assert got == {(1, 10)}


# --- snapshot-then-stream bootstrap (SURVEY.md §3.2) ------------------------

def test_snapshot_then_stream_bootstrap(spark, tmp_path):
    """Snapshot rows load first (as lsn 0/0 insert images), then the change
    stream overlays them: updates win over snapshot, deletes remove
    snapshot keys, and a change REPLAYED from before the snapshot cannot
    resurrect anything (the snapshot image outranks nothing — but a
    delete at a higher lsn always outranks the snapshot)."""
    from pgcdc_spark.streaming.pipeline import snapshot_then_stream
    from tests.test_cdc import ROW, _env

    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    mk = lambda i, **kw: {**ROW, "id": i, **kw}  # noqa: E731
    # snapshot: ids 1..3 present at bootstrap time
    snapshot = spark.createDataFrame(
        [mk(1), mk(2), mk(3, first_name="Snap")],
        "id LONG, first_name STRING, last_name STRING, date_of_birth STRING,"
        " status_id LONG",
    )
    # stream after the snapshot LSN: update 1, delete 2, insert 4
    with open(os.path.join(src, "changes.jsonl"), "w") as f:
        f.write("\n".join([
            _env(20, "update", new=mk(1, last_name="Changed")),
            _env(21, "delete", old=mk(2)),
            _env(22, "insert", new=mk(4, first_name="New")),
        ]))

    q = snapshot_then_stream(snapshot, src, state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    state = read_state(spark, state_dir)
    rows = {r["id"]: (r["first_name"], r["last_name"]) for r in state.collect()}
    assert rows == {
        1: ("Ada", "Changed"),
        3: ("Snap", "Lovelace"),
        4: ("New", "Lovelace"),
    }


# --- kafka source/sink builders (no broker in container) --------------------

def test_kafka_builders(spark):
    from pgcdc_spark.streaming.kafka import kafka_source_options

    opts = kafka_source_options("hosts:9092", "cdc", max_offsets_per_trigger=500)
    assert opts["subscribe"] == "cdc"
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "500"


def test_snapshot_then_stream_restart_keeps_applied_changes(spark, tmp_path):
    """Re-invoking the bootstrap with an existing checkpoint must NOT
    re-seed the snapshot: the state already reflects committed batches and
    the stream will not replay them."""
    from pgcdc_spark.streaming.pipeline import snapshot_then_stream
    from tests.test_cdc import ROW, _env

    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    mk = lambda i, **kw: {**ROW, "id": i, **kw}  # noqa: E731
    snapshot = spark.createDataFrame(
        [mk(1)],
        "id LONG, first_name STRING, last_name STRING, date_of_birth STRING,"
        " status_id LONG",
    )
    with open(os.path.join(src, "c1.jsonl"), "w") as f:
        f.write(_env(20, "update", new=mk(1, last_name="Applied")))
    q = snapshot_then_stream(snapshot, src, state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    # crash/restart: same dirs, same (stale) snapshot, no new files
    q2 = snapshot_then_stream(snapshot, src, state_dir, ckpt, keys=["id"])
    q2.awaitTermination(120)

    rows = {r["id"]: r["last_name"] for r in read_state(spark, state_dir).collect()}
    assert rows == {1: "Applied"}, "restart rolled back an applied change"


def test_sliding_window_sum(spark, tmp_path):
    from pgcdc_spark.streaming.windows import sliding_value_sum

    ev = _event_stream(spark, tmp_path, EVENTS)
    agg = sliding_value_sum(ev, "ts_utc", "10 minutes", "5 minutes", "2 hours")
    _run_to_memory(agg, "sliding_t", "complete")
    got = {(str(r["window_start"]), r["sum_value"])
           for r in spark.sql("SELECT * FROM sliding_t").collect()}
    # events 1 (00:01, v=1) + 2 (00:04, v=2) + late 7 (00:02, v=7) land in
    # windows [23:55,00:05) and [00:00,00:10)
    assert ("2024-01-01 00:00:00", 10.0) in got
    assert ("2023-12-31 23:55:00", 10.0) in got


def test_watermark_drops_late_event(spark, tmp_path):
    """An event older than the advanced watermark arriving in a LATER
    micro-batch is dropped from the aggregation (append mode emits each
    finalized window exactly once, without the late row)."""
    from pgcdc_spark.streaming.windows import tumbling_counts

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    schema = "event_id LONG, ts STRING"
    # Semantics note (empirically verified): a late row arriving while its
    # window is STILL IN STATE merges into it — dropping only applies once
    # the watermark has evicted the window. Hence three batches: advance
    # the watermark, let eviction happen, THEN deliver the late row.
    batches = [
        # a: [00:00,00:10) gets 1 event; 03:00 sets next watermark to 02:30
        [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 03:00:00")],
        # b: eviction pass — emits [00:00,00:10) x1; watermark -> 05:30
        [(4, "2024-01-01 06:00:00")],
        # c: 00:06 is behind the 05:30 watermark AND its window is evicted
        # -> dropped with no re-emission; [03:00,03:10) finalizes x1
        [(3, "2024-01-01 00:06:00")],
    ]
    import time

    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for eid, ts in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts}) + "\n")
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    ev = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .json(src).withColumn("ts_utc", F.to_timestamp("ts")))
    agg = tumbling_counts(ev, "ts_utc", "10 minutes", "30 minutes")
    _run_to_memory(agg, "late_t", "append")
    got = {(str(r["window_start"]), r["n_events"])
           for r in spark.sql("SELECT * FROM late_t").collect()}
    # the late event 3 must NOT appear: [00:00,00:10) stays at count 1
    assert got == {("2024-01-01 00:00:00", 1), ("2024-01-01 03:00:00", 1)}


def test_streaming_dedup_within_watermark_restamped(spark, tmp_path):
    """Redelivered events with a DIFFERENT (re-stamped) event time must
    still dedup on the key — the case plain dropDuplicates cannot catch."""
    from pgcdc_spark.streaming.windows import streaming_dedup_within_watermark

    restamped = [
        (eid, ts.replace(":00", ":30", 1), uid, et, v)  # +30s on redelivery
        for (eid, ts, uid, et, v) in EVENTS
    ]
    ev = _event_stream(spark, tmp_path, EVENTS + restamped)
    dd = streaming_dedup_within_watermark(ev, ["event_id"], "ts_utc", "2 hours")
    _run_to_memory(dd, "dedup_wm_t", "append")
    n = spark.sql("SELECT COUNT(DISTINCT event_id) c FROM dedup_wm_t").collect()[0]["c"]
    total = spark.sql("SELECT COUNT(*) c FROM dedup_wm_t").collect()[0]["c"]
    assert n == len(EVENTS)
    assert total == len(EVENTS)


def test_observed_metrics_per_batch_and_totals(spark, tmp_path):
    """observe() metrics must arrive via the listener for every completed
    micro-batch and sum to the fixture's known op histogram — computed
    inside the running plan (no second pass over the batch)."""
    import time

    from pgcdc_spark.streaming.metrics import attach_collector, observe_cdc_metrics

    src = str(tmp_path / "src")
    lines = fixture_lines()
    _write_chunks(src, lines)

    collector = attach_collector(spark)
    try:
        changes = observe_cdc_metrics(
            read_envelope_stream(spark, src, max_files_per_trigger=1)
        )
        q = (changes.writeStream.format("memory").queryName("obs_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        # listener bus delivers asynchronously after query termination
        deadline = time.time() + 30
        want_rows = sum(
            1 for l in lines if '"insert"' in l or '"update"' in l or '"delete"' in l
        )
        while time.time() < deadline:
            if collector.totals().get("n_rows", 0) >= want_rows:
                break
            time.sleep(0.5)
        totals = collector.totals()
        per_op = {"I": 0, "U": 0, "D": 0}
        for l in lines:
            for tag, op in (("insert", "I"), ("update", "U"), ("delete", "D")):
                if f'"{tag}"' in l:
                    per_op[op] += 1
        assert totals["n_rows"] == want_rows
        assert totals["n_inserts"] == per_op["I"]
        assert totals["n_updates"] == per_op["U"]
        assert totals["n_deletes"] == per_op["D"]
        batches = collector.snapshot()
        assert len(batches) >= 2, "per-batch granularity lost (one batch only)"
        def _norm(lsn):
            hi, lo = lsn.split("/")
            return f"{hi.upper().zfill(8)}/{lo.upper().zfill(8)}"

        assert totals["max_lsn"] == max(
            _norm(json.loads(l)["lsn"]) for l in lines
            if json.loads(l)["tag"] in ("insert", "update", "delete")
        )
    finally:
        spark.streams.removeListener(collector)


def test_sortable_lsn_orders_variable_width_hex(spark):
    """Raw string max picks '0/F' over '0/16B3748' (lexicographic trap);
    the normalized form orders numerically. Non-pg shapes pass through."""
    import pyspark.sql.functions as F

    from pgcdc_spark.streaming.metrics import sortable_lsn

    df = spark.createDataFrame(
        [("0/F",), ("0/16B3748",)], "lsn string"
    )
    raw_max = df.agg(F.max("lsn")).collect()[0][0]
    assert raw_max == "0/F"  # the trap this fixes
    norm_max = df.agg(F.max(sortable_lsn(F.col("lsn")))).collect()[0][0]
    assert norm_max == "00000000/016B3748"

    passthrough = spark.createDataFrame([("t0042",)], "lsn string")
    got = passthrough.select(sortable_lsn(F.col("lsn")).alias("s")).collect()[0]["s"]
    assert got == "t0042"


def test_wal2json_v2_stream_to_upsert_state(spark, tmp_path):
    """wal2json format_version=2 lines through the file stream -> the
    standard upsert sink: per-micro-batch the SAME parse plan as batch
    (narrow JVM ops), so the materialized state must equal the batch
    materialization of the same lines — including a key-changing update
    routed via split_key_updates and a cross-micro-batch delete. v1 and
    v2 streams of the same changelog land the identical state."""
    import json as _json

    from pyspark.sql.types import LongType, StructField, StructType

    from pgcdc_spark.streaming.pipeline import read_wal2json_stream

    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])

    def col(n, v):
        return {"name": n, "type": "bigint", "value": v}

    v2 = [
        {"action": "B", "lsn": "0/1"},
        {"action": "I", "schema": "s", "table": "t", "lsn": "0/2",
         "columns": [col("id", 1), col("v", 10)]},
        {"action": "I", "schema": "s", "table": "t", "lsn": "0/3",
         "columns": [col("id", 2), col("v", 20)]},
        {"action": "C", "lsn": "0/4"},
        # key change 1 -> 3 (identity carries the old key)
        {"action": "U", "schema": "s", "table": "t", "lsn": "0/A",
         "columns": [col("id", 3), col("v", 11)],
         "identity": [col("id", 1)]},
        {"action": "D", "schema": "s", "table": "t", "lsn": "0/10",
         "identity": [col("id", 2)]},
        {"action": "I", "schema": "s", "table": "t", "lsn": "0/11",
         "columns": [col("id", 4), col("v", 40)]},
        # FOREIGN table in the same slot, same column names: the
        # source_table scope plumbed through the streaming reader must
        # keep it out of t's state (r13 review)
        {"action": "I", "schema": "s", "table": "zz", "lsn": "0/12",
         "columns": [col("id", 99), col("v", 990)]},
    ]
    lines = [_json.dumps(x) for x in v2]
    src = str(tmp_path / "src")
    _write_chunks(src, lines, chunks=3)

    changes = read_wal2json_stream(
        spark, src, schema, format_version=2, max_files_per_trigger=1,
        split_key_updates_on=["id"], source_table=("s", "t"))
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = start_upsert_stream(changes, state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    got = {r["id"]: r["v"] for r in read_state(spark, state_dir).collect()}
    assert got == {3: 11, 4: 40}

    # batch twin over the same lines: identical state
    from pgcdc_spark.cdc.transform import apply_pipeline, split_key_updates
    from pgcdc_spark.cdc.upsert import latest_state
    from pgcdc_spark.cdc.wal2json import parse_wal2json_v2

    raw = spark.createDataFrame([(x,) for x in lines], "value string")
    env = split_key_updates(
        parse_wal2json_v2(raw, schema, source_table=("s", "t")),
        keys=["id"])
    batch = {r["id"]: r["v"]
             for r in latest_state(apply_pipeline(env), keys=["id"],
                                   order_by=["lsn"]).collect()}
    assert batch == got

    # format_version is validated up front
    try:
        read_wal2json_stream(spark, src, schema, format_version=3)
        raise AssertionError("format_version=3 must be rejected")
    except ValueError:
        pass


def test_pysource_replay_row_granular_batches(spark, tmp_path):
    """The custom Python DataSource replays envelopes rowsPerBatch at a
    time through real offsets: the full upsert pipeline lands the same
    state as the file stream, across multiple micro-batches, and a
    checkpoint restart is a no-op."""
    from pgcdc_spark.cdc.envelope import parse_envelope
    from pgcdc_spark.cdc.transform import apply_pipeline
    from pgcdc_spark.streaming.pysource import register_replay_source

    register_replay_source(spark)
    src = str(tmp_path / "pysrc")
    lines = fixture_lines()
    _write_chunks(src, lines)
    state_dir = str(tmp_path / "pystate")
    ckpt = str(tmp_path / "pyckpt")

    def run():
        raw = (
            spark.readStream.format("pgcdc_replay")
            .option("path", src).option("rowsPerBatch", 3).load()
        )
        changes = apply_pipeline(parse_envelope(raw, "value"))
        q = start_upsert_stream(changes, state_dir, ckpt, keys=["id"])
        q.awaitTermination(240)

    # An availableNow pass over a simple Python stream reader drains one
    # prefetched 3-row slice; looping restarts therefore exercises offset
    # resume on EVERY batch boundary, not just once.
    import math

    n_lines = sum(1 for l in lines if l.strip())
    n_batches = math.ceil(n_lines / 3)
    assert n_batches >= 3
    for _ in range(n_batches):
        run()
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in read_state(spark, state_dir).collect()}
    assert rows == EXPECTED

    run()  # one more restart on the drained checkpoint: nothing changes
    rows2 = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
             for r in read_state(spark, state_dir).collect()}
    assert rows2 == EXPECTED


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a click with no buy inside the
    interval emits its null-padded row only once the watermark passes its
    join window; a click whose window the watermark has NOT yet passed is
    withheld (append-mode contract)."""
    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"

    def chunked_stream(name, chunks):
        src = str(tmp_path / f"{name}_src")
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(chunks):
            with open(os.path.join(src, f"part{i}.jsonl"), "w") as f:
                for r in rows:
                    f.write(json.dumps({"event_id": r[0], "ts": r[1],
                                        "user_id": r[2], "event_type": r[3],
                                        "value": r[4]}) + "\n")
        return (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .json(src).withColumn("ts_utc", F.to_timestamp("ts"))
        )

    clicks = chunked_stream("lo_clicks", [
        [(1, "2024-01-01 00:01:00", 1, "click", 1.0),
         (2, "2024-01-01 00:30:00", 2, "click", 2.0)],   # 2 never matches
        [(3, "2024-01-01 06:00:00", 3, "click", 3.0)],   # watermark pusher
        [(4, "2024-01-01 12:00:00", 4, "click", 4.0)],   # flush trigger
    ])
    buys = chunked_stream("lo_buys", [
        [(10, "2024-01-01 00:05:00", 1, "buy", 9.0)],    # joins click 1
        [(11, "2024-01-01 06:00:00", 99, "buy", 8.0)],
        [(12, "2024-01-01 12:00:00", 99, "buy", 7.0)],
    ])
    l = clicks.select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("uid"),
                      F.col("ts_utc").alias("click_ts"))
    r = buys.select(F.col("event_id").alias("buy_id"),
                    F.col("user_id").alias("uid2"),
                    F.col("ts_utc").alias("buy_ts"))
    joined = stream_stream_interval_join(
        l, r.withColumnRenamed("uid2", "uid"), key="uid",
        left_ts="click_ts", right_ts="buy_ts",
        watermark="1 minute", upper="INTERVAL 10 MINUTES", how="left_outer",
    ).select("click_id", "buy_id")
    _run_to_memory(joined, "ssj_lo_t", "append")
    got = {(row["click_id"], row["buy_id"])
           for row in spark.sql("SELECT * FROM ssj_lo_t").collect()}
    # click 1 matched; click 2 expired unmatched -> null row; clicks 3/4
    # may still be inside their windows at stream end and stay withheld
    assert (1, 10) in got and (2, None) in got, got
    # click 3 may or may not have been flushed (depends on whether a batch
    # ran after the watermark passed 06:10); click 4's window cannot have
    # expired by stream end, so append mode MUST withhold it
    assert (4, None) not in got, got


def test_pgoutput_binary_stream_to_upsert_state(spark, tmp_path):
    """R1 end-to-end on the BINARY wire format: a file stream of raw
    pgoutput payloads decoded IN-FLIGHT (decode_pgoutput is a plain
    DataFrame transform, so it composes with readStream unchanged; the
    relation registry is passed statically — discovery's bounded collect
    belongs to the bootstrap phase, not the stream), then the standard
    filter -> extract -> bucketed-upsert sink. Final state must equal
    the batch decode of the same messages, including a cross-file
    update and a delete."""
    from pgcdc_spark.cdc.pgoutput import (
        decode_pgoutput, encode_delete, encode_insert, encode_update)
    from pgcdc_spark.cdc.transform import apply_pipeline
    from pgcdc_spark.streaming.pipeline import read_state, start_upsert_stream
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType)

    src = str(tmp_path / "src")
    rels = {1: ["id", "v"]}
    row_schema = StructType([StructField("id", LongType()),
                             StructField("v", LongType())])
    f0 = [(1, encode_insert(1, [10, 100])),
          (2, encode_insert(1, [11, 110])),
          (3, encode_insert(1, [12, 120]))]
    f1 = [(4, encode_update(1, [11, 999])),          # update across files
          (5, encode_delete(1, [12, 120])),          # delete across files
          (6, b"\x00garbled")]                       # dead-letter survives
    bin_schema = StructType([StructField("lsn", LongType()),
                             StructField("payload", BinaryType())])
    for i, rows in enumerate((f0, f1)):
        (spark.createDataFrame([(l, bytearray(p)) for l, p in rows], bin_schema)
         .coalesce(1).write.parquet(f"{src}/f{i}"))

    stream = (
        spark.readStream.schema(bin_schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/f*")
    )
    changes = apply_pipeline(decode_pgoutput(stream, row_schema, relations=rels))
    q = start_upsert_stream(
        changes, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        keys=["id"], n_buckets=4,
    )
    q.awaitTermination(300)

    got = sorted(
        (r["id"], r["v"])
        for r in read_state(spark, str(tmp_path / "state")).collect()
    )
    assert got == [(10, 100), (11, 999)]


def test_pgoutput_toast_stream_fold(spark, tmp_path):
    """TOAST end-to-end under streaming: a file stream of binary
    pgoutput payloads where an update marks a column unchanged ('u'),
    decoded in-flight with track_unchanged and folded micro-batch by
    micro-batch through merge_toast_batch. The carry must cross the
    micro-batch boundary: the value arrives in file 0, the 'u' marker
    in file 1, and the final state still holds the stored value, while
    a genuine NULL assignment in file 1 really nulls its column."""
    from pgcdc_spark.cdc.pgoutput import (
        UNCHANGED_TOAST, decode_pgoutput, encode_delete, encode_insert,
        encode_update)
    from pgcdc_spark.cdc.transform import extract_images, filter_control_messages
    from pgcdc_spark.cdc.upsert import merge_toast_batch, toast_state
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType)

    src = str(tmp_path / "src")
    rels = {1: ["id", "v"]}
    row_schema = StructType([StructField("id", LongType()),
                             StructField("v", LongType())])
    f0 = [(1, encode_insert(1, [10, 100])),
          (2, encode_insert(1, [11, 110])),
          (3, encode_insert(1, [12, 120]))]
    f1 = [(4, encode_update(1, [11, UNCHANGED_TOAST])),  # carry across files
          (5, encode_update(1, [10, None])),             # genuine NULL
          (6, encode_delete(1, [12, None], old_kind=b"K"))]
    bin_schema = StructType([StructField("lsn", LongType()),
                             StructField("payload", BinaryType())])
    for i, rows in enumerate((f0, f1)):
        (spark.createDataFrame([(l, bytearray(p)) for l, p in rows], bin_schema)
         .coalesce(1).write.parquet(f"{src}/f{i}"))

    stream = (
        spark.readStream.schema(bin_schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/f*")
    )
    changes = (
        decode_pgoutput(stream, row_schema, relations=rels,
                        track_unchanged=True)
        .transform(filter_control_messages)
        .transform(extract_images)
        .select("lsn", "op", "unchanged", "image.*")
    )

    holder = {"state": None}

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        local = spark.createDataFrame(batch_df.collect(), batch_df.schema)
        if holder["state"] is None:
            holder["state"] = toast_state(
                local, ["id"], ["lsn"], ["v"],
                keep_deletes=True, emit_carry_meta=True,
            ).localCheckpoint()
        else:
            holder["state"] = merge_toast_batch(
                holder["state"], local, ["id"], ["lsn"], ["v"]
            ).localCheckpoint()

    q = (changes.writeStream.foreachBatch(fold)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    import pyspark.sql.functions as F
    got = sorted(
        (r["id"], r["v"])
        for r in holder["state"].filter(F.col("op") != "D").collect()
    )
    assert got == [(10, None), (11, 110)]


def test_stream_key_change_routing(spark, tmp_path):
    """Key-changing UPDATEs in the STREAM (old image present, key
    differs) must retire the old key in the materialized state — the
    REPLICA IDENTITY defense running per micro-batch, with the insert
    and the migration landing in DIFFERENT batches."""
    from pyspark.sql.types import LongType, StructField, StructType

    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])

    lines = [
        json.dumps({"lsn": "000000000001", "tag": "insert",
                    "new": {"id": 1, "v": 10}}),
        json.dumps({"lsn": "000000000002", "tag": "insert",
                    "new": {"id": 2, "v": 20}}),
        # batch boundary: the migration arrives later
        json.dumps({"lsn": "000000000003", "tag": "update",
                    "new": {"id": 11, "v": 15},
                    "old": {"id": 1, "v": 10}}),   # key 1 -> 11
        json.dumps({"lsn": "000000000004", "tag": "update",
                    "new": {"id": 2, "v": 25},
                    "old": {"id": 2, "v": 20}}),   # same-key: no split
    ]
    _write_chunks(src, lines, chunks=2)

    changes = read_envelope_stream(
        spark, src, row_schema=schema, max_files_per_trigger=1,
        split_key_updates_on=["id"],
    )
    q = start_upsert_stream(changes, state_dir, ckpt, keys=["id"])
    q.awaitTermination(120)

    state = {r["id"]: r["v"] for r in read_state(spark, state_dir).collect()}
    assert state == {11: 15, 2: 25}, "old key 1 must be retired in-stream"


def test_xlogdata_frame_stream_to_upsert_state(spark, tmp_path):
    """The full live-socket model under streaming: a file stream of RAW
    COPY frames (XLogData 'w' wrappers + keepalive 'k' noise), unwrapped
    JVM-side in-flight (unwrap_xlogdata is a plain transform, so it
    composes with readStream unchanged), decoded with a schema INFERRED
    from the Relation message's type OIDs at bootstrap, and merged into
    the bucketed state. No side lsn column, no hand-written schema."""
    from pgcdc_spark.cdc.pgoutput import (
        decode_pgoutput, discover_relation_schemas, encode_delete,
        encode_insert, encode_keepalive, encode_relation, encode_update,
        encode_xlogdata, unwrap_xlogdata)
    from pgcdc_spark.cdc.transform import apply_pipeline
    from pgcdc_spark.streaming.pipeline import read_state, start_upsert_stream
    from pyspark.sql.types import BinaryType, StructField, StructType

    src = str(tmp_path / "src")
    rel = encode_relation(1, "public", "t", ["id", "v"],
                          typoids=[20, 20], key_cols=["id"])
    f0 = [encode_xlogdata(0, rel),
          encode_xlogdata(1, encode_insert(1, [10, 100])),
          encode_keepalive(2),
          encode_xlogdata(3, encode_insert(1, [11, 110]))]
    f1 = [encode_xlogdata(4, encode_update(1, [11, 999])),
          encode_xlogdata(5, encode_delete(1, [10, None], old_kind=b"K")),
          encode_keepalive(6)]
    frame_schema = StructType([StructField("frame", BinaryType())])
    for i, frames in enumerate((f0, f1)):
        (spark.createDataFrame([(bytearray(p),) for p in frames], frame_schema)
         .coalesce(1).write.parquet(f"{src}/f{i}"))

    # bootstrap: schema + relations inferred from the landed capture
    batch = unwrap_xlogdata(spark.read.parquet(f"{src}/f*"))
    names, inferred, keys = discover_relation_schemas(batch)[1]
    assert keys == ["id"]

    stream = (
        spark.readStream.schema(frame_schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/f*")
    )
    changes = apply_pipeline(
        decode_pgoutput(unwrap_xlogdata(stream), inferred,
                        relations={1: names})
    )
    q = start_upsert_stream(
        changes, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        keys=keys, n_buckets=4,
    )
    q.awaitTermination(300)

    got = sorted(
        (r["id"], r["v"])
        for r in read_state(spark, str(tmp_path / "state")).collect()
    )
    assert got == [(11, 999)]


def test_rocksdb_state_store_provider(spark, tmp_path):
    """Spark 4 ships the RocksDB state-store provider — the
    large-state path (state spills to local disk instead of living on
    the executor heap, the 100 TB posture for stateful streaming).
    The stateful upsert must produce identical results under it."""
    from pgcdc_spark.streaming.stateful import streaming_latest_state

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        _write_chunks(src, fixture_lines())
        changes = read_envelope_stream(spark, src, max_files_per_trigger=1)
        out = streaming_latest_state(changes, keys=["id"])
        _run_to_memory(out, "rocks_t", "update")
        latest: dict[int, tuple] = {}
        for r in spark.sql("SELECT * FROM rocks_t").collect():
            if r["id"] not in latest or r["lsn"] > latest[r["id"]][0]:
                latest[r["id"]] = (r["lsn"], r["op"], json.loads(r["row_json"]))
        live = {k: (v[2]["first_name"], v[2]["last_name"],
                    int(v[2]["status_id"]))
                for k, v in latest.items() if v[1] != "D"}
        assert live == EXPECTED
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def test_publication_filter_stream_transitions_across_batches(spark, tmp_path):
    """PG 15 publication row-filter routing under STREAMING (VERDICT r10
    item 7): the batch query (cdc_publication_filter_state) proves the
    decode semantics; this twin proves the filter-TRANSITION routing
    holds across micro-batch boundaries. A publication (id, v) WHERE
    v >= 50 ships transition-routed frames — the boundary UPDATEs land
    in a LATER file than the state they transition:

      file 0: id=1 INSERT v=60 (in), id=3 INSERT v=80 (in);
              id=2 INSERT v=40 suppressed (never reaches the slot)
      file 1: id=1 UPDATE 60->30  LEAVES  -> key-only DELETE frame
              id=2 UPDATE 40->70  ENTERS  -> INSERT frame
              id=3 UPDATE 80->90  stays   -> plain UPDATE frame

    Final upserted state must be exactly the filter-satisfying rows —
    no ghost row for id=1 (the delete crossed the batch boundary), id=2
    present even though its history started outside the publication —
    and the unpublished column (absent from the Relation's column list)
    reads NULL in every image."""
    from pgcdc_spark.cdc.pgoutput import (
        decode_pgoutput, encode_delete, encode_insert, encode_relation,
        encode_update)
    from pgcdc_spark.cdc.transform import apply_pipeline
    from pgcdc_spark.streaming.pipeline import read_state, start_upsert_stream
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType)

    src = str(tmp_path / "src")
    # the Relation frame carries ONLY the published column list
    rel = encode_relation(1, "public", "t", ["id", "v"])
    f0 = [(0, rel),
          (1, encode_insert(1, [1, 60])),
          (2, encode_insert(1, [3, 80]))]   # id=2 v=40: suppressed
    f1 = [(3, encode_delete(1, [1, None], old_kind=b"K")),  # 60->30 leaves
          (4, encode_insert(1, [2, 70])),                   # 40->70 enters
          (5, encode_update(1, [3, 90]))]                   # stays in
    bin_schema = StructType([StructField("lsn", LongType()),
                             StructField("payload", BinaryType())])
    for i, rows in enumerate((f0, f1)):
        (spark.createDataFrame([(l, bytearray(p)) for l, p in rows], bin_schema)
         .coalesce(1).write.parquet(f"{src}/f{i}"))

    # TABLE schema still has the unpublished column
    row_schema = StructType([StructField("id", LongType()),
                             StructField("v", LongType()),
                             StructField("note", StringType())])
    stream = (
        spark.readStream.schema(bin_schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/f*")
    )
    changes = apply_pipeline(
        decode_pgoutput(stream, row_schema, relations={1: ["id", "v"]})
    )
    q = start_upsert_stream(
        changes, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        keys=["id"], n_buckets=4,
    )
    q.awaitTermination(300)

    state = read_state(spark, str(tmp_path / "state")).collect()
    got = sorted((r["id"], r["v"], r["note"]) for r in state)
    assert got == [(2, 70, None), (3, 90, None)]
