"""Batch sources/sinks beyond parquet (SURVEY.md §2.2 sources table).

Replaces the reference's two ingestion paths with distributed reads:

- R2 snapshot scan (SELECT * buffered row-by-row into a driver array,
  src/database/postgresql/PostgresOperation.ts:69-86): `read_jdbc` with
  range partitioning — N executors each pull a key range; nothing is
  collected to the driver.
- R3 ad-hoc passthrough (src/database/postgresql/PostgresPg.ts:5-14):
  `spark.sql` over views registered by catalog.register_views.

Every reader takes an EXPLICIT schema: schema inference reads the data
twice and can silently mistype columns — the engine treats the schema as
part of the contract (the checked analogue of the reference's io-ts
intent, src/model/student.ts:3-9, which it then bypassed with an
unchecked cast).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .session import configure_session


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    configure_session(spark)
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        # Dead-letter discipline matches cdc/envelope.py: bad lines null
        # out, and mode can be overridden to FAILFAST by callers.
        .option("mode", options.pop("mode", "PERMISSIVE"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> DataFrame:
    configure_session(spark)
    reader = spark.read.format("json").schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    **options: str,
) -> DataFrame:
    """Distributed JDBC snapshot (R2). With a numeric `partition_column`
    (typically the PK) the scan issues `num_partitions` range queries in
    parallel; without one it degrades to a single-connection read, which
    is only acceptable for dimension tables. Untested in this container
    (no live database) — the code path mirrors spark.read.jdbc docs."""
    configure_session(spark)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("range partitioning needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """ORC scan (columnar sibling of parquet; Spark's reader is vectorized
    and pushes filters/projections the same way). Schema optional here —
    ORC files embed a strict schema, unlike CSV/JSON — but passing one
    still enforces the contract at read time."""
    configure_session(spark)
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Parquet sink; `partition_by` chooses the pruning key for readers
    (e.g. an event-date column so date filters skip whole directories)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED catalog table: rows are hash-distributed into
    ``n_buckets`` files by ``bucket_cols`` at WRITE time, so a later join
    or aggregation on those columns needs NO shuffle — the single biggest
    lever for a fact table joined repeatedly on the same key at 100 TB
    (pay the shuffle once at ingest, never again). ``sort_cols`` presorts
    within buckets so sort-merge joins skip their sort too.

    Requires a catalog (``saveAsTable``) — bucketing metadata cannot live
    in bare parquet paths. See tests/test_sources.py for the no-Exchange
    plan proof.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modality_from_extension: bool = True,
) -> DataFrame:
    """Ingest a directory tree of raw media files via Spark's built-in
    ``binaryFile`` source: one row per file with (path, modificationTime,
    length, content: binary) — the on-ramp that turns an object-store
    prefix of images/audio into the (doc_id, modality, payload) shape
    the multimodal operators consume. Partition-parallel: each file is
    read by the task that owns it, no driver involvement, and
    ``pathGlobFilter`` prunes non-matching files at listing time.

    ``modality_from_extension`` adds the modality column by extension
    (ppm -> image, wav -> audio, else text) and a stable ``doc_id``
    (xxhash64 of the path) so the result plugs directly into
    ``multimodal.extract_features``."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if not modality_from_extension:
        return df
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("path"),
        F.when(ext.isin("ppm", "pbm", "pgm", "png", "jpg", "jpeg"), "image")
        .when(ext.isin("wav", "flac", "mp3"), "audio")
        .otherwise("text")
        .alias("modality"),
        F.col("content").alias("payload"),
        F.col("length").cast("long").alias("n_bytes"),
    )


def read_avro(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Avro scan (row-oriented interchange format, the usual Kafka Connect
    payload encoding). Spark ships Avro as an EXTERNAL module
    (spark-avro jar) which this container does not bundle — the reader
    raises Spark's standard deploy hint when absent; on a real cluster
    (`--packages org.apache.spark:spark-avro_2.13:<ver>`) it lights up
    unchanged. Gated test in tests/test_sources.py."""
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink — same external-module gate as read_avro."""
    df.write.mode(mode).format("avro").save(path)
