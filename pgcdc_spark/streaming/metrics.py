"""Pipeline observability: per-micro-batch metrics via ``observe()`` +
a ``StreamingQueryListener``.

The reference's only observability is console logging per event
(``console.log`` in the data callback and send path, src/main.ts:72-88)
— unstructured, per-row, and lost on exit. The Spark-native contract:
declare named aggregate metrics ON the streaming DataFrame with
``DataFrame.observe`` (computed incrementally inside the running plan —
zero extra passes, no collect), and receive them per completed
micro-batch through the listener's ``QueryProgressEvent``. The same
``observe`` call works untouched on the batch twin (metrics arrive via
``QueryExecutionListener``), keeping the one-code-path-for-both rule.

At scale this replaces the two bad options — a second aggregation job
over each batch (2x read), or driver-side counters (not distributed) —
with map-side accumulators the engine already maintains.
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: Default metric-set name used by :func:`observe_cdc_metrics`.
CDC_METRICS = "cdc_metrics"


def sortable_lsn(col: F.Column) -> F.Column:
    """Normalize a pg-style ``HIGH/LOW`` hex LSN to a fixed-width form
    whose LEXICOGRAPHIC order matches its numeric order.

    Raw pgoutput LSNs are variable-width hex (``0/F`` compares
    lexicographically GREATER than ``0/16B3748``), so ``max(lsn)`` over
    raw strings can mis-report offset progress; each 32-bit half pads to
    8 uppercase hex digits (``00000000/0000000F``), the same fix the
    Mongo adapter applies to resume tokens (cdc/mongo.py). Non-pg-shaped
    lsn strings pass through unchanged — callers with other encodings
    must supply their own fixed-width form."""
    parts = F.split(col, "/")
    norm = F.concat_ws(
        "/",
        F.lpad(F.upper(parts[0]), 8, "0"),
        F.lpad(F.upper(parts[1]), 8, "0"),
    )
    return F.when(F.size(parts) == 2, norm).otherwise(col)


def observe_cdc_metrics(changes: DataFrame, name: str = CDC_METRICS) -> DataFrame:
    """Attach the standard CDC health metrics to an envelope-change frame
    (post ``apply_pipeline``: columns ``op``, ``lsn``, image struct).

    Metrics: row count, per-op-kind counts (inserts/updates/deletes), and
    the max lsn seen (normalized via :func:`sortable_lsn` so variable-
    width pg hex LSNs order correctly) — enough to alert on delete
    storms, empty batches, and offset progress without a second job.

    Caveat: with a ``foreachBatch`` sink, every ACTION the batch function
    runs re-executes the source plan including the observe node, so a
    multi-action merge (e.g. the bucketed state store's touched-bucket
    probe + write) inflates the counters. Attach observe to queries with
    native single-action sinks, or ``persist()`` the batch frame first."""
    return changes.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_updates"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        F.max(sortable_lsn(F.col("lsn"))).alias("max_lsn"),
    )


class MetricsCollector(StreamingQueryListener):
    """Collects observed-metric rows per completed micro-batch.

    Thread-safe append-only log: listener callbacks fire on Spark's
    listener-bus thread. ``snapshot()`` returns ``[(batch_id, {metric:
    value})]`` in completion order."""

    def __init__(self, name: str = CDC_METRICS) -> None:
        self._name = name
        self._lock = threading.Lock()
        self._log: list[tuple[int, dict]] = []

    # StreamingQueryListener interface -------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        row = event.progress.observedMetrics.get(self._name)
        if row is not None:
            with self._lock:
                self._log.append((event.progress.batchId, row.asDict()))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # consumer side --------------------------------------------------------
    def snapshot(self) -> list[tuple[int, dict]]:
        with self._lock:
            return list(self._log)

    def totals(self) -> dict:
        """Sum the counter metrics across batches (max for ``max_lsn``)."""
        out: dict = {}
        for _, m in self.snapshot():
            for k, v in m.items():
                if v is None:
                    continue
                if k == "max_lsn":
                    out[k] = v if k not in out or out[k] is None else max(out[k], v)
                else:
                    out[k] = out.get(k, 0) + v
        return out


def attach_collector(
    spark: SparkSession, name: str = CDC_METRICS
) -> MetricsCollector:
    """Register a collector on the session's listener bus; caller owns
    detaching via ``spark.streams.removeListener(collector)``."""
    collector = MetricsCollector(name)
    spark.streams.addListener(collector)
    return collector
