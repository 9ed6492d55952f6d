"""CDC state materialization exercised through the driver oracle.

The engine's core stateful operator (cdc/upsert.py — real I/U/D semantics,
fixing the reference's silent delete drop at src/mapping/customMapper.ts:19)
applied to the `events` table re-read as a change log:

  key      = user_id
  order    = (ts, event_id)        -- the LSN analogue
  op       = 'D' if event_type = 'error' else 'U'

so the materialized state is "latest image per user, unless the user's
latest change is a delete". The oracle expresses the same semantics as a
window query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..cdc.upsert import latest_state
from . import query

# DuckDB sees the ns parquet timestamps truncated to us, so ordering uses
# us precision on both sides (ties then broken identically by event_id).
_UPSERT_ORACLE = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_upsert_state", oracle=_UPSERT_ORACLE, tags=("cdc", "upsert"))
def cdc_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    changes = events.withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    ).withColumn("ts_us", F.expr("ts div 1000"))
    state = latest_state(changes, keys=["user_id"], order_by=["ts_us", "event_id"], op_col="op")
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


_CHANGELOG_ORACLE = """
SELECT
  user_id,
  COUNT(*) AS n_changes,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_deletes,
  MIN(epoch_us(ts)) AS first_change_us,
  MAX(epoch_us(ts)) AS last_change_us
FROM events
GROUP BY user_id
"""


@query("cdc_changelog_stats", oracle=_CHANGELOG_ORACLE, tags=("cdc", "agg"))
def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_deletes"),
        F.min(F.expr("ts div 1000")).alias("first_change_us"),
        F.max(F.expr("ts div 1000")).alias("last_change_us"),
    )


# --- Debezium envelope adapter, driven through the oracle gate ---------------
# The events table re-serialized as Debezium-shaped change events (payload.
# before/after/op/source.lsn — the wire format a production CDC feed
# actually arrives in), then parsed by cdc/debezium.parse_debezium and
# materialized by the SAME upsert operator as cdc_upsert_state. Deletes
# travel Debezium-style: image in `before`, `after` null. Half the rows
# use the schemas.enable=true wrapped layout and half the flat layout, so
# both converter configurations are exercised in one query.

_DBZ_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_debezium_state", oracle=_DBZ_ORACLE, tags=("cdc", "debezium"))
def cdc_debezium_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.debezium import parse_debezium
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    payload = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.lit("pg").alias("connector"),
            F.col("event_id").alias("lsn"),
        ).alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
    )
    raw = events.select(
        F.when(
            F.col("event_id") % 2 == 0,
            F.to_json(F.struct(payload.alias("payload"))),  # wrapped layout
        )
        .otherwise(F.to_json(payload))  # flat layout
        .alias("value")
    )
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(parse_debezium(raw, row_schema=row_schema))
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- evolving CDC state (online additive schema evolution, driver-checked) ---
# The events table re-read as an envelope stream whose upstream schema
# GROWS mid-stream: changes with event_id >= _EVOLVE_CUTOFF carry an
# extra `k` column (extracted from props) in their row image, earlier
# changes do not — the ALTER TABLE ADD COLUMN scenario the reference is
# blind to (it filters out pgoutput `relation` messages and hard-casts
# images, src/mapping/customMapper.ts:12-22). The engine path under test
# is cdc/evolution.py: map-keyed column discovery (the one sanctioned
# metadata collect), STRING promotion, checked evolving parse, then the
# standard tombstone-aware upsert. Pre-evolution survivors read NULL k.

_EVOLVE_CUTOFF = 500

_EVOLVING_ORACLE = f"""
SELECT user_id, value AS last_value, k AS last_k
FROM (
  SELECT user_id, value,
         CASE WHEN event_id >= {_EVOLVE_CUTOFF}
              THEN json_extract_string(props, '$.k') END AS k,
         event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_evolving_state", oracle=_EVOLVING_ORACLE, tags=("cdc", "evolution"))
def cdc_evolving_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.evolution import parse_envelope_evolving
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(
        F.col("user_id"),
        F.col("value"),
        F.when(F.col("event_id") >= _EVOLVE_CUTOFF,
               F.get_json_object("props", "$.k")).alias("k"),
    )
    # lsn = zero-padded event_id so string order == numeric order.
    raw = events.select(
        F.to_json(
            F.struct(
                F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn"),
                F.when(is_del, F.lit("delete")).otherwise(F.lit("update")).alias("tag"),
                F.when(~is_del, img).alias("new"),
                F.when(is_del, img).alias("old"),
            )
        ).alias("value")
    )
    base = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    parsed, _schema = parse_envelope_evolving(raw, base_schema=base)
    changes = apply_pipeline(parsed)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("k").alias("last_k"),
    ).orderBy("user_id")
