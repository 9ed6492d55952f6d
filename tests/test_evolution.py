"""Online additive schema evolution (cdc/evolution.py).

The reference is schema-blind: it filters out pgoutput `relation`
messages (src/mapping/customMapper.ts:12-13) and hard-casts images to a
fixed model (src/mapping/customMapper.ts:22), so an upstream ALTER TABLE
ADD COLUMN silently disappears. These tests drive the evolving parse +
merge path: discovery of new image columns, STRING promotion, and
union-by-name materialization where pre-evolution rows read NULL.
"""

from __future__ import annotations

import json

from pyspark.sql.types import StringType, StructField

from pgcdc_spark.cdc.envelope import STUDENT_SCHEMA, parse_envelope
from pgcdc_spark.cdc.evolution import (
    discover_image_columns,
    evolve_row_schema,
    merge_batch_evolving,
    parse_envelope_evolving,
)
from pgcdc_spark.cdc.transform import apply_pipeline

ROW = {"id": 1, "first_name": "Ada", "last_name": "Lovelace",
       "date_of_birth": "1990-01-01", "status_id": 1}


def _env(lsn: int, tag: str, new=None, old=None) -> str:
    return json.dumps({"lsn": f"0/{lsn:07X}", "tag": tag, "new": new, "old": old})


def _raw(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], ["value"])


def test_discovery_finds_new_and_old_image_keys(spark):
    lines = [
        _env(1, "insert", new={**ROW, "email": "ada@example.com"}),
        _env(2, "delete", old={**ROW, "nickname": "countess"}),
    ]
    cols = discover_image_columns(_raw(spark, lines))
    assert "email" in cols and "nickname" in cols
    assert set(f.name for f in STUDENT_SCHEMA.fields) <= set(cols)


def test_evolve_is_additive_and_idempotent(spark):
    evolved = evolve_row_schema(STUDENT_SCHEMA, ["email", "id", "first_name"])
    # existing fields keep order and type
    assert evolved.fields[: len(STUDENT_SCHEMA.fields)] == STUDENT_SCHEMA.fields
    assert evolved.fields[-1] == StructField("email", StringType())
    # re-evolving with the same discovery changes nothing
    again = evolve_row_schema(evolved, ["email", "id"])
    assert again == evolved


def test_evolving_parse_admits_unknown_columns(spark):
    lines = [
        _env(1, "insert", new=ROW),
        _env(2, "insert", new={**ROW, "id": 2, "email": "g@example.com"}),
    ]
    parsed, schema = parse_envelope_evolving(_raw(spark, lines))
    assert "email" in [f.name for f in schema.fields]
    rows = {r["new"]["id"]: r["new"] for r in parsed.collect()}
    assert rows[2]["email"] == "g@example.com"
    assert rows[1]["email"] is None  # pre-evolution row reads NULL
    assert rows[1]["first_name"] == "Ada"  # known columns keep typed path


def test_merge_evolving_unions_by_name_and_compacts(spark):
    # batch 1: old schema; materialize state
    state = apply_pipeline(parse_envelope(_raw(spark, [
        _env(1, "insert", new=ROW),
        _env(2, "insert", new={**ROW, "id": 2, "first_name": "Grace"}),
    ])))
    # batch 2: schema grew an email column upstream
    lines2 = [
        _env(3, "update", new={**ROW, "id": 2, "first_name": "Grace",
                               "email": "grace@navy.mil"}),
        _env(4, "delete", old={**ROW}),
    ]
    parsed2, _ = parse_envelope_evolving(_raw(spark, lines2))
    batch = apply_pipeline(parsed2)
    merged = merge_batch_evolving(state, batch, keys=["id"], order_by=["lsn"])
    live = {r["id"]: r for r in merged.filter("op != 'D'").collect()}
    assert set(live) == {2}  # id 1 deleted by the evolved batch
    assert live[2]["email"] == "grace@navy.mil"
    # tombstone retained for id 1 (no resurrection on later merges)
    assert merged.filter("op = 'D'").count() == 1


def test_no_discovery_when_schema_unchanged(spark):
    lines = [_env(1, "insert", new=ROW)]
    parsed, schema = parse_envelope_evolving(_raw(spark, lines))
    assert schema == STUDENT_SCHEMA
    assert parsed.select("new.*").columns == [f.name for f in STUDENT_SCHEMA.fields]


def test_type_widening_detected_and_values_survive(spark):
    """An upstream ALTER COLUMN TYPE (status_id starts carrying labels):
    the typed parse would NULL the labels; widening re-declares the
    column STRING and BOTH eras' values survive — integers as their
    decimal strings, labels verbatim."""
    from pgcdc_spark.cdc.evolution import discover_widened_columns

    lines = [
        _env(1, "insert", new=ROW),  # status_id = 1 (int era)
        _env(2, "update", new={**ROW, "status_id": "active"}),  # label era
    ]
    raw = _raw(spark, lines)
    assert discover_widened_columns(raw) == ["status_id"]

    parsed, schema = parse_envelope_evolving(raw)
    widened = {f.name: f.dataType for f in schema.fields}["status_id"]
    assert isinstance(widened, StringType)
    vals = {r["lsn"]: r["new"]["status_id"] for r in parsed.collect()}
    assert vals == {"0/0000001": "1", "0/0000002": "active"}

    # widening can be declined (strict mode): labels NULL out instead
    parsed_strict, schema_strict = parse_envelope_evolving(raw, widen_types=False)
    assert schema_strict == STUDENT_SCHEMA
    strict_vals = {r["lsn"]: r["new"]["status_id"] for r in parsed_strict.collect()}
    assert strict_vals["0/0000002"] is None


def test_merge_evolving_aligns_widened_types(spark):
    """State materialized in the int era merges with a widened batch:
    common columns with diverged types cast to STRING on both sides, and
    the compaction picks the right per-key winners."""
    state = apply_pipeline(parse_envelope(_raw(spark, [
        _env(1, "insert", new=ROW),
        _env(2, "insert", new={**ROW, "id": 2, "status_id": 7}),
    ])))
    lines2 = [_env(3, "update", new={**ROW, "status_id": "inactive"})]
    parsed2, _ = parse_envelope_evolving(_raw(spark, lines2))
    batch = apply_pipeline(parsed2)
    merged = merge_batch_evolving(state, batch, keys=["id"], order_by=["lsn"])
    live = {r["id"]: r["status_id"] for r in merged.filter("op != 'D'").collect()}
    assert live == {1: "inactive", 2: "7"}
    assert dict(merged.dtypes)["status_id"] == "string"
