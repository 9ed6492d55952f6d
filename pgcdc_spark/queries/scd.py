"""SCD Type-2 (versioned-history) CDC materialization queries.

``latest_state`` (cdc/upsert.py) lands the changelog as a Type-1 upsert —
current image only. The OTHER standard landing shape is Type-2: every
change becomes a version row with a validity interval, enabling
point-in-time ("as of T") queries over the dimension's history. The
reference cannot produce this at all (it forwards latest images and drops
deletes, src/mapping/customMapper.ts:19-23); here it is one windowed
operator (cdc/upsert.scd2_history) over the same changelog the upsert
queries use (events re-read as a change log: key user_id, order
(ts_us, event_id), delete when event_type = 'error').

Scale shape: one hash shuffle on the key, one per-key local sort; the
point-in-time lookup is a partition-prunable filter over the history
table (valid_from <= T < valid_to), not a join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..cdc.upsert import scd2_history
from . import query

# 2024-01-16T00:00:00Z in epoch-us — mid-range of the events table.
_AS_OF_US = 1_705_363_200_000_000

_SCD2_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
w AS (
  SELECT *, LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
              AS valid_to_us
  FROM c
)
SELECT user_id, event_id AS version_event_id, ts_us AS valid_from_us,
       valid_to_us, (valid_to_us IS NULL) AS is_current, value
FROM w WHERE op = 'U'
"""


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    hist = scd2_history(changes, keys=["user_id"], order_by=["ts_us", "event_id"])
    return hist.select(
        "user_id",
        F.col("event_id").alias("version_event_id"),
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
        "value",
    )


@query("cdc_scd2_history", oracle=_SCD2_ORACLE, tags=("cdc", "scd2"))
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Type-2 history: one validity-interval row per non-delete
    change; deletes terminate the prior version without opening one."""
    return _history(spark, sf_dir)


_PIT_ORACLE = f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
w AS (
  SELECT *, LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
              AS valid_to_us
  FROM c
)
SELECT user_id, event_id AS version_event_id, value,
       ts_us AS valid_from_us, valid_to_us
FROM w
WHERE op = 'U'
  AND ts_us <= {_AS_OF_US}
  AND (valid_to_us IS NULL OR valid_to_us > {_AS_OF_US})
"""


@query("cdc_scd2_point_in_time", oracle=_PIT_ORACLE, tags=("cdc", "scd2"))
def cdc_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State of the dimension AS OF a fixed timestamp: the version whose
    interval covers T, per key. A filter over the history — with the
    history table partitioned/z-ordered on valid_from, this prunes to
    the files overlapping T at any scale."""
    hist = _history(spark, sf_dir)
    return hist.filter(
        (F.col("valid_from_us") <= _AS_OF_US)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > _AS_OF_US))
    ).select(
        "user_id", "version_event_id", "value", "valid_from_us", "valid_to_us"
    )
