"""applyInPandasWithState CDC latest-state operator (streaming/stateful.py):
the state-store twin of the foreachBatch upsert — emits a compacted
changelog (one row per key whose state changed per micro-batch).
"""

from __future__ import annotations

import json

from pgcdc_spark.streaming.pipeline import read_envelope_stream
from pgcdc_spark.streaming.stateful import streaming_latest_state
from tests.test_cdc import EXPECTED, fixture_lines
from tests.test_streaming import _run_to_memory, _write_chunks


def _final_state(spark, view: str):
    """Replay the update-mode changelog: last emission per key wins."""
    rows = spark.sql(f"SELECT * FROM {view}").collect()
    # memory sink in update mode appends each batch's updates; batches are
    # ordered, and within a key lsn is monotone — max lsn is the final word.
    latest: dict[int, tuple] = {}
    for r in rows:
        key = r["id"]
        if key not in latest or r["lsn"] > latest[key][0]:
            latest[key] = (r["lsn"], r["op"], r["row_json"])
    return latest


def test_stateful_latest_state_matches_golden(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_chunks(src, fixture_lines(), chunks=4)

    changes = read_envelope_stream(spark, src, max_files_per_trigger=1)
    out = streaming_latest_state(changes, keys=["id"], order_col="lsn")
    _run_to_memory(out, "stateful_t", "update")

    latest = _final_state(spark, "stateful_t")
    live = {
        k: json.loads(v[2]) for k, (lsn, op, *v2) in latest.items()
        for v in [latest[k]] if op != "D"
    }
    got = {
        k: (row["first_name"], row["last_name"], int(row["status_id"]))
        for k, row in live.items()
    }
    assert got == EXPECTED
    # deleted key 2 must surface as a delete event, not vanish silently
    assert latest[2][1] == "D"


def test_stateful_idempotent_replay(spark, tmp_path):
    """Same events delivered twice (at-least-once): stale lsn values are
    ignored, so the compacted result is unchanged and no duplicate
    emissions with an older lsn appear after a newer one."""
    src = str(tmp_path / "src")
    lines = fixture_lines()
    _write_chunks(src, lines + lines, chunks=6)

    changes = read_envelope_stream(spark, src, max_files_per_trigger=1)
    out = streaming_latest_state(changes, keys=["id"], order_col="lsn")
    _run_to_memory(out, "stateful_replay_t", "update")

    latest = _final_state(spark, "stateful_replay_t")
    got = {
        k: tuple(json.loads(v)[c] for c in ("first_name", "last_name"))
        for k, (lsn, op, v) in latest.items()
        if op != "D"
    }
    assert got == {k: (fn, ln) for k, (fn, ln, _) in EXPECTED.items()}


# --- cross-batch session windows --------------------------------------------

def test_streaming_sessions_bridge_batches(spark, tmp_path):
    """A session whose events span two micro-batches must come out as ONE
    session; a gap >= G must close the session and open a new one."""
    import json as _json
    import os

    from pgcdc_spark.streaming.stateful import streaming_sessions

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    G = 60_000_000  # 60 s gap in us
    # batch 1: u1 events at t=0s,10s ; u2 event at t=0s
    # batch 2: u1 at t=20s (same session) and t=200s (new session); u2 none
    batches = [
        [(1, 0), (1, 10_000_000), (2, 0)],
        [(1, 20_000_000), (1, 200_000_000)],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for uid, ts in rows:
                f.write(_json.dumps({"user_id": uid, "ts_us": ts}) + "\n")

    ev = spark.readStream.schema("user_id LONG, ts_us LONG") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = streaming_sessions(ev, keys=["user_id"], ts_us_col="ts_us", gap_us=G)
    _run_to_memory(out, "sessions_t", "update")

    rows = spark.sql("SELECT * FROM sessions_t").collect()
    closed = {(r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
              for r in rows if r["closed"]}
    open_latest = {}
    for r in rows:
        if not r["closed"]:
            open_latest[r["user_id"]] = (
                r["session_start_us"], r["session_end_us"], r["n_events"])
    # u1's first session bridged the batch boundary: 0..20s, 3 events
    assert closed == {(1, 0, 20_000_000, 3)}
    assert open_latest[1] == (200_000_000, 200_000_000, 1)
    assert open_latest[2] == (0, 0, 1)


# --- transformWithStateInPandas (state-v2) running stats ----------------------

def test_transform_with_state_running_stats(spark, tmp_path):
    """Counts/sums accumulate across micro-batches; only touched keys emit;
    last emission per key equals the global aggregate."""
    import json as _json
    import os

    import pytest

    # The state-v2 python worker speaks protobuf to the JVM; without the
    # google.protobuf package the operator cannot run in this container.
    pytest.importorskip("google.protobuf.descriptor")

    from pgcdc_spark.streaming.stateful import streaming_running_stats

    src = str(tmp_path / "tws_src")
    os.makedirs(src, exist_ok=True)
    batches = [
        [(1, 10.0, 100), (1, 5.0, 200), (2, 1.0, 150)],
        [(1, 2.5, 300)],
        [(2, 4.0, 50), (3, 7.0, 999)],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for uid, amt, ts in rows:
                f.write(_json.dumps({"user_id": uid, "amount": amt, "ts_us": ts}) + "\n")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = spark.readStream.schema("user_id LONG, amount DOUBLE, ts_us LONG") \
            .option("maxFilesPerTrigger", 1).json(src)
        out = streaming_running_stats(
            ev, keys=["user_id"], amount_col="amount", ts_us_col="ts_us"
        )
        _run_to_memory(out, "tws_stats_t", "update")
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    rows = spark.sql("SELECT * FROM tws_stats_t").collect()
    final: dict[int, tuple] = {}
    for r in rows:  # memory sink appends per batch; later rows supersede
        final[r["user_id"]] = (r["n_events"], r["total"], r["min_ts_us"], r["max_ts_us"])
    assert final[1] == (3, 17.5, 100, 300)
    assert final[2] == (2, 5.0, 50, 150)
    assert final[3] == (1, 7.0, 999, 999)
    # update mode: key 1 must have emitted more than once (cross-batch growth)
    assert sum(1 for r in rows if r["user_id"] == 1) >= 2


def test_streaming_ewma_matches_sequential_fold(spark, tmp_path):
    """Cross-batch EWMA: the O(1)-per-key stateful accumulator folded
    over 3 micro-batches must be BIT-IDENTICAL to the sequential fold
    over the full series (0.5 multiplications are exact; the fold order
    is the same), and a replayed duplicate must not re-fold."""
    import os

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType)

    from pgcdc_spark.streaming.stateful import streaming_ewma

    rows = [(u, i, 1_000_000 + i * 1000, float((u * 31 + i * 17) % 97) / 7.0)
            for u in (1, 2) for i in range(30)]
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("value", DoubleType()),
    ])
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 3 time-ordered chunks + a replay of chunk 1's rows inside chunk 2
    chunks = [[r for r in rows if r[1] < 10],
              [r for r in rows if 10 <= r[1] < 20],
              [r for r in rows if 10 <= r[1] < 20]  # duplicate delivery
              + [r for r in rows if r[1] >= 20]]
    for i, ch in enumerate(chunks):
        (spark.createDataFrame([(u, e, t, v) for u, e, t, v in ch], schema)
         .coalesce(1).write.parquet(f"{src}/c{i}"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/c*"))
    out = streaming_ewma(stream)
    _run_to_memory(out, "ewma_t", "update")

    got = {}
    for r in spark.sql("SELECT * FROM ewma_t").collect():
        if r["user_id"] not in got or r["n_obs"] > got[r["user_id"]][0]:
            got[r["user_id"]] = (r["n_obs"], r["ewma"])

    for u in (1, 2):
        vals = [v for uu, i, t, v in rows if uu == u]
        e = vals[0]
        for x in vals[1:]:
            e = 0.5 * x + 0.5 * e
        assert got[u][0] == 30
        assert got[u][1] == e, "must be bit-identical to the sequential fold"
