"""Window-function queries (SURVEY.md §2.2): ranking, analytic (lag/lead),
frames (rows/range), ntile, sessionization.

Every window partitions by a real key (customer, user) — no global
single-partition windows, which would serialize at scale. Order keys
always end in a unique tiebreaker so results are deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from . import query

# --- ranking: top-k per group ----------------------------------------------

_TOPK_ORACLE = """
SELECT * FROM (
  SELECT
    o_custkey,
    o_orderkey,
    o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
    DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders
) WHERE rn <= 3
"""


@query("window_topk_per_group", oracle=_TOPK_ORACLE, tags=("window", "topk"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- analytic: lag / lead / first / last ------------------------------------

_LAG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  o_totalprice,
  LAG(o_totalprice) OVER w AS prev_price,
  LEAD(o_totalprice) OVER w AS next_price,
  FIRST_VALUE(o_orderkey) OVER w AS first_order,
  o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("window_lag_lead", oracle=_LAG_ORACLE, tags=("window", "analytic"))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("first_order"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias("price_delta"),
    )


# --- frames: running total + moving average (rowsBetween) -------------------

_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / CAST(COUNT(*)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg3
FROM orders
"""


@query("window_running_frames", oracle=_RUNNING_ORACLE, tags=("window", "frames"))
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    ob = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = ob.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = ob.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w_run).cast("double").alias("running_spend"),
        (
            F.sum(dec).over(w_mov).cast("double")
            / F.count(F.lit(1)).over(w_mov).cast("double")
        ).alias("moving_avg3"),
    )


# --- range frame on a numeric ordering --------------------------------------

_RANGE_ORACLE = """
SELECT
  c_nationkey,
  c_custkey,
  c_acctbal,
  COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1000
FROM customer
"""


@query("window_range_between", oracle=_RANGE_ORACLE, tags=("window", "frames"))
def window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal"))
        .rangeBetween(-1000, Window.currentRow)
    )
    return cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("peers_within_1000"),
    )


# --- ntile ------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT
  c_mktsegment,
  c_custkey,
  NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
FROM customer
"""


@query("window_ntile", oracle=_NTILE_ORACLE, tags=("window",))
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cust.select(
        "c_mktsegment", "c_custkey", F.ntile(4).over(w).alias("bal_quartile")
    )


# --- sessionization (gap-based) over the event stream -----------------------
# The batch twin of streaming session windows: new session when the gap to
# the previous event (same user) exceeds 30 min. Pure window algebra —
# lag -> flag -> running sum -> group — one shuffle on user_id.

# NOTE: DuckDB reads the ns-precision parquet timestamps truncated to us,
# so both sides work at us precision (Spark: ts div 1000).
_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id,
    epoch_us(ts) AS ts_us,
    event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT
    user_id,
    ts_us,
    event_id,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT
  user_id,
  session_idx,
  COUNT(*) AS n_events,
  MIN(ts_us) AS session_start_us,
  MAX(ts_us) AS session_end_us
FROM sessions
GROUP BY user_id, session_idx
"""


@query("window_sessionize", oracle=_SESSION_ORACLE, tags=("window", "session"))
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    gap_us = 30 * 60 * 1_000_000
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


# --- rank distributions: percent_rank / cume_dist / nth_value ---------------

_RANKDIST_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume,
  NTH_VALUE(o_orderkey, 3) OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS third_cheapest_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@query("window_rank_distributions", oracle=_RANKDIST_ORACLE, tags=("window", "rank"))
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist are pure rank arithmetic over a TOTAL order
    (o_totalprice ties broken by key), so the doubles are exact integer
    ratios — bit-identical across engines with no rounding needed."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp_ntz"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("o_orderkey", 3).over(wfull).alias("third_cheapest_key"),
        )
    )
