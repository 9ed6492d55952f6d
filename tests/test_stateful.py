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
