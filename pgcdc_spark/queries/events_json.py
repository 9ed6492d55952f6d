"""JSON + event-time queries over the `events` table (SURVEY.md §2.2).

`events.props` plays the role of the CDC envelope payload (the reference
parses wal2json-shaped messages, src/database/postgresql/
PostgresLogicalPg.ts:21); here the JSON functions are exercised batch-side.
`events.ts` is exact int64 nanoseconds (see catalog.py) — time buckets are
computed with integer arithmetic so Spark and the ns-native oracle agree
bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

# --- JSON extraction --------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  value
FROM events
WHERE event_type IN ('purchase', 'signup')
  AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


@query("events_json_extract", oracle=_JSON_ORACLE, tags=("json",))
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_id", "event_type", k.alias("k"), "value")
        .filter(F.col("k") >= 50)
    )


# --- from_json with explicit schema (checked parse — R7 done right) ---------

_FROM_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_from_json_agg", oracle=_FROM_JSON_ORACLE, tags=("json", "agg"))
def events_from_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (vs the reference's unchecked
    `as Student` cast, src/mapping/customMapper.ts:22): mismatches become
    NULL instead of corrupt rows."""
    (events,) = load(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", "k BIGINT"))
    return (
        parsed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("p.k")).cast("long").alias("sum_k"))
        .orderBy("event_type")
    )


# --- integer-exact hourly rollup -------------------------------------------

_HOURLY_ORACLE = """
SELECT
  epoch_ns(ts) // 3600000000000 AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("events_hourly_rollup", oracle=_HOURLY_ORACLE, tags=("agg", "time"))
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.expr("ts div 3600000000000").alias("hour_bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


# --- tumbling window via F.window (batch twin of the streaming agg) ---------

_TUMBLING_ORACLE = """
SELECT
  strftime(make_timestamp((epoch_ns(ts) // 21600000000000) * 21600000000),
           '%Y-%m-%d %H:%M:%S') AS window_start,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


@query("events_window_tumbling", oracle=_TUMBLING_ORACLE, tags=("window", "time"))
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts_utc", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


# --- sliding window (overlap factor 2) --------------------------------------

_SLIDING_ORACLE = """
SELECT
  strftime(make_timestamp(
    (epoch_ns(ts) // 10800000000000) * 10800000000 - k.k * 10800000000),
    '%Y-%m-%d %H:%M:%S') AS window_start,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users
FROM events, (SELECT UNNEST(range(0, 2)) AS k) k
GROUP BY 1
"""


@query("events_window_sliding", oracle=_SLIDING_ORACLE, tags=("window", "time"))
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour windows sliding every 3 hours: each event lands in exactly 2
    windows (w/s = 2). F.window expands rows window-wise BEFORE the agg —
    the same shape the oracle mirrors with an explicit k in {0,1} unnest."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts_utc", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


# --- native session windows (batch twin of the streaming session agg) --------
# window_sessionize (queries/windows.py) builds sessions MANUALLY with
# the gaps-and-islands window idiom; this is the same walk through
# Spark's NATIVE session_window operator — the batch twin of the
# streaming session aggregation in streaming/windows.py, so the driver
# hash-checks the operator the stream actually uses. Boundary semantics
# differ between the two constructions and are pinned here: native
# session windows are [t, t+gap) intervals MERGED ON OVERLAP, so two
# events exactly gap apart do NOT merge (delta >= gap splits), whereas
# the manual idiom's `delta > gap` splits — the oracle mirrors the
# native rule with `>=`. window.end is last-event + gap by definition.
# Scale shape: session assignment is a per-key sort inside one shuffle
# on user_id (Spark plans UpdatingSessionsExec + merging agg) — same
# single-shuffle class as the manual window, with the merge done by the
# operator instead of two window passes.

_SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_NATIVE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) >= {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts_us, value,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_SESSION_GAP_US} AS session_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
"""


@query("events_session_window_native", oracle=_SESSION_NATIVE_ORACLE,
       tags=("events", "window", "session"))
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    # ts_utc is the catalog's canonical µs timestamp (catalog.py attaches
    # it with the vintage handling) — reuse it, don't re-derive.
    ev = events.select("user_id", F.col("ts_utc").alias("t"), "value")
    return (
        ev.groupBy(
            "user_id", F.session_window("t", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
