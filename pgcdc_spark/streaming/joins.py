"""Streaming joins (SURVEY.md §2.2 streaming table).

- stream-static enrichment: the reference's latent FK join R13
  (students.status_id -> status, terraform/setup_database.sql:14 — never
  executed in its code) done live on the change stream. The dimension is
  broadcast: each micro-batch enriches map-side with no shuffle and no
  streaming state.
- stream-stream interval join: both sides watermarked, equi-key plus a
  time-bound condition. The time bound is what makes 100 TB/day feasible:
  it lets the state store evict rows once the watermark passes
  ``upper_bound``, so state is O(key-rate x window), not O(stream).

The reference cannot express either (single-table passthrough); these are
engine additions on public Structured Streaming semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a (small) static dimension via broadcast join.

    Catalyst re-resolves the dimension per micro-batch, so a reloaded
    dim table is picked up without restarting the query.
    """
    # bounded: dimension table by API contract
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 10 MINUTES",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where ``right_ts`` falls within
    ``[left_ts - lower, left_ts + upper]``.

    Both sides carry a watermark; the interval condition gives the state
    store an eviction bound on BOTH sides (required for outer variants,
    and what keeps inner-join state finite).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.expr(f"{left_ts} - {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + {upper}"))
    )
    return lw.join(rw, cond, how)
