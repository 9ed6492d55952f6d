"""Golden CDC-envelope tests (SURVEY.md §5.2): the filter/extract/upsert
pipeline materialized from a pgoutput-shaped change log, batch-first.

Covers the scenarios FIXTURES.md A3 requires: begin/commit framing,
inserts, multiple updates per key (last-image-wins), deletes preserved
(the reference drops them — src/mapping/customMapper.ts:19), relation
messages filtered, out-of-order delivery (order-insensitivity given lsn).
"""

from __future__ import annotations

import json
import random

import pytest

from pgcdc_spark.cdc.envelope import parse_envelope
from pgcdc_spark.cdc.transform import apply_pipeline
from pgcdc_spark.streaming.pipeline import materialize_batch

ROW = {"id": 1, "first_name": "Ada", "last_name": "Lovelace",
       "date_of_birth": "1990-01-01", "status_id": 1}


def _env(lsn: int, tag: str, new=None, old=None) -> str:
    return json.dumps({"lsn": f"0/{lsn:07X}", "tag": tag, "new": new, "old": old})


def fixture_lines() -> list[str]:
    mk = lambda i, **kw: {**ROW, "id": i, **kw}  # noqa: E731
    lines = [
        _env(1, "begin"),
        _env(2, "relation"),
        _env(3, "insert", new=mk(1)),
        _env(4, "insert", new=mk(2, first_name="Grace")),
        _env(5, "commit"),
        _env(6, "begin"),
        _env(7, "update", new=mk(1, last_name="Byron")),
        _env(8, "insert", new=mk(3, first_name="Alan")),
        _env(9, "delete", old=mk(2, first_name="Grace")),
        _env(10, "update", new=mk(1, last_name="King", status_id=2)),
        _env(11, "commit"),
        _env(12, "insert", new=mk(4, first_name="Edsger")),
        _env(13, "delete", old=mk(4, first_name="Edsger")),
        _env(14, "insert", new=mk(4, first_name="Barbara")),  # re-insert after delete
    ]
    return lines


EXPECTED = {
    1: ("Ada", "King", 2),       # two updates, last image wins
    3: ("Alan", "Lovelace", 1),
    4: ("Barbara", "Lovelace", 1),  # delete then re-insert
    # id 2 deleted -> absent
}


def _materialize(spark, lines):
    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    return materialize_batch(parse_envelope(raw), keys=["id"], order_by=["lsn"])


def test_golden_materialization(spark):
    state = _materialize(spark, fixture_lines())
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in state.collect()}
    assert rows == EXPECTED


def test_control_messages_filtered(spark):
    raw = spark.createDataFrame([(l,) for l in fixture_lines()], ["value"])
    changes = apply_pipeline(parse_envelope(raw))
    tags = {r["op"] for r in changes.select("op").distinct().collect()}
    assert tags == {"I", "U", "D"}
    assert changes.count() == 9  # 5 inserts + 2 updates + 2 deletes


def test_deletes_preserved_not_dropped(spark):
    """The reference silently forwards only new-images; our pipeline must
    emit delete events with the old image."""
    raw = spark.createDataFrame([(_env(1, "delete", old=ROW),)], ["value"])
    changes = apply_pipeline(parse_envelope(raw))
    row = changes.collect()[0]
    assert row["op"] == "D"
    assert row["first_name"] == "Ada"


def test_upsert_order_insensitive(spark):
    """Shuffled log materializes identically (keyed by lsn) — the property
    SURVEY.md §5.2.4 requires."""
    lines = fixture_lines()
    rng = random.Random(7)
    for _ in range(3):
        shuffled = lines[:]
        rng.shuffle(shuffled)
        state = _materialize(spark, shuffled)
        rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
                for r in state.collect()}
        assert rows == EXPECTED


def test_corrupt_lines_dead_lettered(spark):
    lines = [*fixture_lines(), "this is not json", '{"lsn": 5}']
    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    parsed = parse_envelope(raw)
    corrupt = parsed.filter(parsed["_corrupt"].isNotNull()).count()
    # from_json yields null struct only for unparseable text; the partial
    # JSON decodes with null fields and is later dropped by extract.
    assert corrupt == 1
    state = materialize_batch(parsed, keys=["id"], order_by=["lsn"])
    assert {r["id"] for r in state.collect()} == set(EXPECTED)


@pytest.mark.parametrize("dup_factor", [2])
def test_upsert_idempotent_replay(spark, dup_factor):
    """Replaying the same log (at-least-once delivery) changes nothing."""
    lines = fixture_lines() * dup_factor
    state = _materialize(spark, lines)
    rows = {r["id"]: (r["first_name"], r["last_name"], r["status_id"])
            for r in state.collect()}
    assert rows == EXPECTED
