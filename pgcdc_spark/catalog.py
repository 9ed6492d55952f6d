"""Catalog: load the driver-provided parquet tables as DataFrames/views.

Replaces the reference's snapshot path (SELECT * streamed row-by-row into a
driver-side array, src/database/postgresql/PostgresOperation.ts:69-86) with
distributed parquet scans that stay on executors — no collect anywhere.

Scale notes (100 TB posture):
- Scans are plain ``spark.read.parquet`` so Catalyst applies column pruning
  and predicate pushdown into the parquet reader; callers filter/select on
  the returned DataFrame and the scan narrows automatically.
- ``events.ts`` is ns-precision int64 (Spark has no ns timestamp type).
  We keep the exact int64 ``ts`` column and add ``ts_utc`` (us-precision
  TIMESTAMP_NTZ) for window/date functions. Queries that must match the
  DuckDB oracle bit-for-bit use the int64 form (oracle: ``epoch_ns(ts)``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
        # ts is int64 nanoseconds since epoch; derive a usable timestamp.
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
    When the scan has fewer partitions than the session's parallelism,
    repartition up to it; when the input already has enough splits — the
    100 TB case, where re-shuffling raw data would be the bottleneck —
    this is a no-op. The adaptive gate is the point: callers declare
    "compute-heavy per byte" once and the plan stays right at every scale.
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


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
