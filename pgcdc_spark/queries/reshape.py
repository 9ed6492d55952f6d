"""Reshape operators: unpivot (wide->long) and date-spine gap filling.

Neither exists in the reference (it has no queries at all beyond SELECT *,
src/utilities/query.ts:13); both are table-stakes for analytics over the
materialized CDC state and map to pure built-ins:

- unpivot: ``stack()`` — a generator expression, no shuffle at all; the
  following agg is the usual partial+final pair;
- gap filling: ``sequence()`` + ``explode`` builds the date spine from the
  observed [min, max] — the spine is |days| x |types| rows (tiny), so it
  broadcasts against the per-day counts and the fact table shuffles once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

# --- unpivot lineitem measures ----------------------------------------------

_UNPIVOT_ORACLE = """
WITH long AS (
  SELECT l_returnflag, 'quantity' AS measure,
         CAST(l_quantity AS DECIMAL(18,4)) AS v FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,4))
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', CAST(l_discount AS DECIMAL(18,4)) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', CAST(l_tax AS DECIMAL(18,4)) FROM lineitem
)
SELECT l_returnflag, measure,
       COUNT(*) AS n,
       CAST(SUM(v) AS DOUBLE) AS total
FROM long
GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


@query("unpivot_measures", oracle=_UNPIVOT_ORACLE, tags=("reshape", "unpivot"))
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long via stack(): 4 measure columns become (measure, v) rows
    inside the scan stage (generator, no shuffle), then one grouped agg."""
    (li,) = load(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.expr(
            "stack(4,"
            " 'quantity', CAST(l_quantity AS DECIMAL(18,4)),"
            " 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,4)),"
            " 'discount', CAST(l_discount AS DECIMAL(18,4)),"
            " 'tax', CAST(l_tax AS DECIMAL(18,4))"
            ") AS (measure, v)"
        ),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("double").alias("total"))
        .orderBy("l_returnflag", "measure")
    )


# --- date-spine gap filling --------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
),
spine AS (
  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.day, t.event_type, COALESCE(c.n, 0) AS n
FROM spine s
CROSS JOIN types t
LEFT JOIN counts c ON c.day = s.day AND c.event_type = t.event_type
ORDER BY s.day, t.event_type
"""


@query("events_gapfill_spine", oracle=_GAPFILL_ORACLE, tags=("reshape", "timeseries"))
def events_gapfill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts per event type with missing (day, type) cells filled
    with 0. The spine (|days| x |types|) is generated from one global agg
    and broadcast; the events table shuffles once for its own groupBy."""
    (ev,) = load(spark, sf_dir, "events")
    days = ev.agg(
        F.min(F.to_date("ts_utc")).alias("d0"), F.max(F.to_date("ts_utc")).alias("d1")
    ).select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    types = ev.select("event_type").distinct()
    counts = (
        ev.groupBy(F.to_date("ts_utc").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        # bounded: fixed date spine
        F.broadcast(days)
        .crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("day", "event_type")
    )


# --- pivot (long -> wide via RelationalGroupedDataset.pivot) -----------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("pivot_status_counts", oracle=_PIVOT_ORACLE, tags=("reshape", "pivot"))
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True pivot operator (inverse of unpivot_measures). Pivot values are
    given EXPLICITLY — with an inferred value set Spark first runs a
    distinct job over the pivot column, a hidden extra pass at 100 TB.
    Compiles to the same single-shuffle conditional agg as CASE/FILTER."""
    (orders,) = load(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    ).orderBy("o_orderpriority")
