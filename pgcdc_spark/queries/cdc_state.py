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
