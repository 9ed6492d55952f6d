"""Debezium JSON -> engine envelope adapter (the real-world CDC on-ramp).

The reference subscribes to a raw pgoutput slot (src/database/postgresql/
PostgresLogicalPg.ts:30-42); in production the same change feed almost
always arrives as Debezium-formatted Kafka messages. This module is the
pure mapping from Debezium's change-event envelope to the engine envelope
(cdc/envelope.py), so the whole existing pipeline — filter, image
extraction, schema-checked parse, tombstone-aware upsert — runs unchanged
on a Debezium topic:

    raw = read_kafka_envelopes(...)            # or any JSON-lines source
    changes = apply_pipeline(parse_debezium(raw, row_schema=my_schema))
    start_upsert_stream(changes, ...)

Field mapping (Debezium's documented envelope -> ours):

    payload.after        -> new        (row image for c/u/r)
    payload.before       -> old        (row image for d)
    payload.op           -> tag        c->insert, u->update, d->delete,
                                       r->insert (snapshot read is an
                                       upsertable image), t/m pass through
                                       as truncate/message and drop at
                                       image extraction (no row image)
    payload.source.lsn   -> lsn        zero-padded to 20 digits so the
                                       engine's lexicographic lsn order
                                       equals Debezium's numeric LSN order
    malformed line       -> _corrupt   dead-letter column, as in
                                       parse_envelope

Both converter layouts are accepted: schemas.enable=true wraps the change
in {"schema":..., "payload":{...}}; schemas.enable=false sends the payload
fields at the top level. Debezium's post-delete tombstone (a null value)
carries no op and no images, so it falls out at image extraction — the
actual delete was already applied from the 'd' event.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .envelope import STUDENT_SCHEMA

_LSN_PAD = 20

# Only the source fields the engine consumes, plus stable identifiers
# worth keeping for lineage; unknown extra fields are ignored by from_json.
_SOURCE_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("connector", StringType()),
        StructField("name", StringType()),
        StructField("ts_ms", LongType()),
        StructField("snapshot", StringType()),
        StructField("db", StringType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("txId", LongType()),
        StructField("lsn", LongType()),
    ]
)


def debezium_payload_schema(row_schema: StructType = STUDENT_SCHEMA) -> StructType:
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("source", _SOURCE_SCHEMA),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
        ]
    )


def _tag_expr(op: F.Column) -> F.Column:
    return (
        F.when(op == "c", "insert")
        .when(op == "u", "update")
        .when(op == "d", "delete")
        .when(op == "r", "insert")  # snapshot read: an upsertable image
        .when(op == "t", "truncate")
        .when(op == "m", "message")
        .otherwise(op)
    )


def parse_debezium(
    raw: DataFrame,
    json_col: str = "value",
    row_schema: StructType = STUDENT_SCHEMA,
) -> DataFrame:
    """Parse Debezium JSON lines into engine envelope columns
    ``(lsn, tag, new, old, _corrupt)`` — directly feedable to
    cdc/transform.apply_pipeline."""
    payload = debezium_payload_schema(row_schema)
    # One schema covering both layouts: the wrapped payload field AND the
    # unwrapped payload fields at the root. Whichever layout a line uses,
    # the other side parses as nulls; `payload.op` presence picks.
    schema = StructType(
        [StructField("payload", payload)]
        + list(payload.fields)
        + [StructField("_corrupt", StringType())]
    )
    parsed = raw.withColumn(
        "_dbz",
        F.from_json(
            F.col(json_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    wrapped = F.col("_dbz.payload.op").isNotNull()
    pick = lambda f: F.when(wrapped, F.col(f"_dbz.payload.{f}")).otherwise(  # noqa: E731
        F.col(f"_dbz.{f}")
    )
    return parsed.select(
        F.lpad(pick("source.lsn").cast("string"), _LSN_PAD, "0").alias("lsn"),
        _tag_expr(pick("op")).alias("tag"),
        pick("after").alias("new"),
        pick("before").alias("old"),
        F.col("_dbz._corrupt").alias("_corrupt"),
    )
