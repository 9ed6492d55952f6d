"""Kafka source/sink — the reference's R1 ingest and R8 egress surface.

The reference subscribes a LogicalReplicationService and forwards each row
change to Azure Event Hub through the Kafka protocol (producer construction
src/main.ts:54-67, send src/main.ts:69-90; Event Hub namespace/topic
terraform/main.tf:71-81). Here the same endpoints are Structured Streaming
``format("kafka")`` sources/sinks, which replaces the reference's
at-most-once delivery (10 s LSN auto-ack regardless of sink success,
src/database/postgresql/PostgresOperation.ts:24-29) with checkpointed
offsets that only advance after the sink commits.

Container note: the Spark Kafka connector jar and a broker are not
available in this environment, so these builders are exercised up to
option construction in tests; ``.load()``/``.start()`` against a real
broker is the only untested step (it is the documented public API).

Event Hub specifics (from the reference's SAS connection string,
src/main.ts:57-60): pass ``sasl_jaas`` built from the connection string,
``security.protocol=SASL_SSL``, ``sasl.mechanism=PLAIN`` — standard
Event-Hubs-over-Kafka settings; no Azure-specific code needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for a Kafka readStream; split out for testability (a broker
    is required only at ``.load()``)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # Fail loudly if the broker expired offsets out from under the
        # checkpoint instead of silently skipping a gap.
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if extra:
        opts.update(extra)
    return opts


def read_kafka_envelopes(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    row_schema: StructType | None = None,
    **kwargs,
) -> DataFrame:
    """CDC envelope stream from a Kafka topic (R1 as a Spark source).

    Kafka rows arrive as (key, value, topic, partition, offset, ts); the
    JSON envelope is in ``value``. Parsing goes through the SAME
    ``parse_envelope`` used by the file-stream source — including its
    ``_corrupt`` dead-letter column, so a malformed payload surfaces with
    its raw bytes instead of silently nulling out. ``row_schema`` is the
    ROW image schema (same parameter as the file source), not the
    envelope schema.
    """
    from ..cdc.envelope import STUDENT_SCHEMA, parse_envelope

    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kwargs).items():
        reader = reader.option(k, v)
    raw = reader.load().select(
        F.col("value").cast("string").alias("value"),
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
    )
    return parse_envelope(raw, "value", row_schema or STUDENT_SCHEMA)


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """R8 as a Spark sink: serialize rows to JSON and publish. The
    checkpoint ties source offsets to acknowledged sends — the
    sink-confirmed ack the reference designed but left dead
    (PostgresLogicalPg.ts:44-55, call site commented at src/main.ts:75).
    """
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
