"""Event-sequence analytics over `events`: ordered funnel conversion and
weekly cohort retention.

The reference has no analytical surface (SURVEY.md §2.1); these are the
two staple product-analytics shapes every event store answers, both pure
aggregations:

- funnel: how many users performed signup -> click -> purchase IN ORDER
  (each step strictly after the previous one's first occurrence);
- cohort retention: users grouped by first-seen week, counted by how
  many weeks later they were active.

Scale notes: both reduce events to per-user aggregates FIRST (map-side
combinable min/conditional-min), so the heavy shuffle carries one row
per (user, key), never raw events; the funnel's step-2/3 conditions use
conditional aggregation over a single pass instead of self-joins.
Weeks are computed from the int64 epoch-ns ts by integer arithmetic
(7*24h buckets anchored at the unix epoch) — identical on both engines,
no calendar/timezone dependence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

_WEEK_NS = 7 * 24 * 3600 * 1_000_000_000

# Funnel steps, in order. A user converts step k iff min ts of step-k
# events that occur AFTER their step-(k-1) conversion time exists.
# Two-phase conditional aggregation would need the previous step's time
# while scanning — so phase 1 computes first-signup per user, phase 2
# joins it back (user-level, map-side combinable) and conditionally
# aggregates clicks/purchases. The join is per-user (already reduced).

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s1.t_signup
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t_click
  GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM s1) AS n_signup,
  (SELECT COUNT(*) FROM s2) AS n_signup_click,
  (SELECT COUNT(*) FROM s3) AS n_signup_click_purchase
"""


@query("events_funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("events", "funnel"))
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel: signup -> click -> purchase.

    Each phase is a per-user aggregate joined forward to gate the next
    phase's conditional min — the standard funnel shape that stays
    per-user-linear at any event volume (no window over the whole event
    stream, no self-join of raw events)."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", F.col("ts").alias("t"))
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_signup"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_signup_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_signup_click_purchase"))
        )
    )


_COHORT_ORACLE = f"""
WITH first_seen AS (
  SELECT user_id, MIN(epoch_ns(ts)) // {_WEEK_NS} AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         epoch_ns(e.ts) // {_WEEK_NS} - f.cohort_week AS weeks_later
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cohort_week, weeks_later, COUNT(*) AS n_active_users
FROM activity
GROUP BY cohort_week, weeks_later
"""


@query("events_cohort_retention", oracle=_COHORT_ORACLE, tags=("events", "cohort"))
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: for each first-seen week, how
    many of its users were active k weeks later.

    The per-user first-seen week is one aggregate; the activity join is
    per-user against that reduced table; DISTINCT collapses to one row
    per (user, week-offset) before the final count — every shuffle
    carries per-user or per-cell rows. Epoch-anchored integer week
    buckets keep both engines calendar-free."""
    (events,) = load(spark, sf_dir, "events")
    # exact int64 division (`div`), never doubles: epoch-ns magnitudes
    # exceed double's 2^53 integer range
    week = F.expr(f"ts div {_WEEK_NS}")
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("t0"))
    first_seen = first_seen.select(
        "user_id", F.expr(f"t0 div {_WEEK_NS}").alias("cohort_week")
    )
    activity = (
        events.select("user_id", week.alias("w"))
        .join(first_seen, "user_id")
        .select("user_id", "cohort_week", (F.col("w") - F.col("cohort_week")).alias("weeks_later"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_later").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


# --- event-sequence transition matrix ----------------------------------------
# The Markov-chain view of user behavior (session flow analysis, the
# input to next-event prediction baselines): per ordered user timeline,
# count event_type -> next event_type transitions and normalize rows
# into probabilities. One lag window per user (single shuffle on
# user_id), one partial-agg count, one broadcast of the per-source
# totals. The (ts, event_id) order key is total, so both engines see
# identical timelines; probabilities are exact integer ratios in
# double division.

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT from_type, SUM(n) AS total FROM t GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / tot.total AS p
FROM t JOIN tot USING (from_type)
"""


@query("events_markov_transitions", oracle=_TRANSITIONS_ORACLE,
       tags=("funnel", "sequence", "markov"))
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type -> next event_type transition counts and probabilities
    over per-user timelines (ts, event_id total order)."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        # bounded: one row per event_type (fixed enum)
        t.join(F.broadcast(tot), "from_type")
        .select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.col("total")).alias("p"),
        )
    )
