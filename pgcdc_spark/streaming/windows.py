"""Streaming window/watermark operators (SURVEY.md §2.2 streaming table).

Thin, tested compositions over Structured Streaming built-ins: tumbling /
sliding / session windows with watermarks, and watermarked streaming
dedup. The reference has no event-time processing at all (per-event
passthrough, src/main.ts:69-90); these are the engine's additions that
make the CDC feed aggregatable.

State-store scale notes: watermarks bound state size (late rows beyond
the delay are dropped); session windows keep one open session per key;
dropDuplicates keeps one entry per key within the watermark horizon.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    *group_cols: str,
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"),
                *group_cols, "n_events")
    )


def sliding_value_sum(
    events: DataFrame,
    ts_col: str = "ts_utc",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "sum_value", "n_events")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col(key), F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_utc",
    watermark: str = "30 minutes",
) -> DataFrame:
    return events.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col])


def streaming_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_utc",
    watermark: str = "30 minutes",
) -> DataFrame:
    """At-least-once redelivery dedup (Spark 4
    ``dropDuplicatesWithinWatermark``): unlike ``streaming_dedup``, the
    event time is NOT part of the key, so a redelivered message whose
    timestamp was re-stamped (the reference's auto-ack redelivery window —
    src/database/postgresql/PostgresOperation.ts:24-29 — re-reads wal
    messages after a crash, and brokers re-stamp ingestion time) still
    collapses onto the first delivery, as long as it arrives within the
    watermark delay. Per-key state is evicted once the watermark passes —
    bounded state at 100 TB, sized by delay x key-arrival rate."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
