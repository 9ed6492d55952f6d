"""Catalog: load the driver-provided parquet tables as DataFrames/views.

Replaces the reference's snapshot path (SELECT * streamed row-by-row into a
driver-side array, src/database/postgresql/PostgresOperation.ts:69-86) with
distributed parquet scans that stay on executors — no collect anywhere.

Scale notes (100 TB posture):
- Scans are plain ``spark.read.parquet`` so Catalyst applies column pruning
  and predicate pushdown into the parquet reader; callers filter/select on
  the returned DataFrame and the scan narrows automatically.
- ``events.ts`` is canonicalized to int64 epoch-ns on load regardless of
  the file's physical type (ns-int64 or us-timestamp vintage); ``ts_utc``
  (us-precision TIMESTAMP) is derived for window/date functions. Queries
  that must match the DuckDB oracle bit-for-bit use the int64 form
  (oracle: ``epoch_ns(ts)``, which accepts TIMESTAMP too).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from .session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives either as int64 epoch-ns (ns-precision parquet read
        # via nanosAsLong) or as a us-precision timestamp, depending on
        # dataset vintage. Canonicalize to int64 epoch-ns so every
        # downstream operator and every oracle expression (epoch_ns(ts)
        # works on both BIGINT-free timestamps) sees one representation.
        if not isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
        df = df.withColumn("ts_utc", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load selected tables; ``t_orders, t_li = load(spark, d, "orders", "lineitem")``."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before a CPU-heavy stage.

    A small file is one input split, so an expensive map stage (shingling,
    hashing, decoding) would run on ONE core no matter how many are idle.
    When the scan has fewer splits than the session's parallelism,
    repartition up to it; when the input already has enough splits — the
    100 TB case, where re-shuffling raw data would be the bottleneck —
    this is a no-op. The adaptive gate is the point: callers declare
    "compute-heavy per byte" once and the plan stays right at every scale.

    The split count is estimated from the scan's file list and sizes
    (ceil(bytes / maxPartitionBytes) per file) — deliberately NOT
    ``df.rdd.getNumPartitions()``, which forces an RDD conversion and a
    physical plan per call. The estimate ignores Spark's small-file
    packing, i.e. it can only OVERcount splits; overcounting skips the
    repartition, which errs toward the no-op side that is correct at
    scale. Non-file plans and non-local filesystems also skip — a huge
    remote input has ample splits already.
    """
    spark = df.sparkSession
    n = target or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    import math
    import os
    from urllib.parse import urlparse

    mpb_raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    mpb = int("".join(ch for ch in mpb_raw if ch.isdigit()) or "134217728")
    splits = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            return df
        try:
            size = os.path.getsize(parsed.path)
        except OSError:
            return df
        splits += max(1, math.ceil(size / mpb))
        if splits >= n:
            return df
    return df.repartition(n)


# --- DDL surface (reference R10: src/utilities/query.ts:3-16) ---------------
# The reference keeps CREATE/DROP TABLE strings it pushes verbatim to
# PostgreSQL (plus publication/slot DDL, which belongs to the upstream DB
# and has no engine analogue). Here DDL goes through the Spark catalog so
# created tables are immediately queryable by name in spark.sql.


def create_table(spark: SparkSession, name: str, schema_ddl: str,
                 partition_by: list[str] | None = None) -> None:
    """CREATE TABLE with an explicit column DDL string (checked schema —
    the engine-wide rule; see sources.py). ``partition_by`` picks the
    directory-pruning key for readers."""
    part = f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING parquet{part}")


def create_table_as(spark: SparkSession, name: str, df: DataFrame,
                    mode: str = "overwrite") -> None:
    """CTAS: materialize a DataFrame as a named catalog table."""
    df.write.mode(mode).format("parquet").saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


# --- statistics / cost-based optimization ------------------------------------


def analyze_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    prefix: str = "stats_",
    column_stats: bool = True,
) -> list[str]:
    """Register tables in the warehouse catalog WITH statistics so the
    cost-based optimizer can reorder joins (SURVEY §4.2 'join reordering:
    CBO with stats').

    Temp views cannot carry stats, so each table is CTAS'd into the
    catalog as ``{prefix}{name}`` and ANALYZE TABLE collects row counts
    (+ per-column NDV/min/max with ``column_stats``). Enable
    ``spark.sql.cbo.enabled`` and ``spark.sql.cbo.joinReorder.enabled``
    to activate reordering; tests/test_plans.py pins a 3-way star join
    whose join order provably flips with stats present. At 100 TB this is
    a scheduled ANALYZE after ingest — AQE covers runtime re-planning,
    but only stats let the optimizer pick the join ORDER up front.
    """
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    names = []
    for n in tables:
        name = f"{prefix}{n}"
        # A previous session may have left the managed location on disk
        # without a catalog entry — CREATE then fails LOCATION_ALREADY_EXISTS.
        drop_table(spark, name)
        if warehouse:
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        load_table(spark, sf_dir, n).write.mode("overwrite").saveAsTable(name)
        suffix = " FOR ALL COLUMNS" if column_stats else ""
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{suffix}")
        names.append(name)
    return names
