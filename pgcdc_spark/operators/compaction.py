"""Small-file compaction: rewrite a directory of many small files into
size-targeted ones.

Why this is a first-class operator at 100 TB: streaming sinks,
fine-grained partitioning, and per-batch state versions all shed files
far smaller than a parquet row group. Every downstream scan then pays
per-file open/footer costs and the scheduler pays per-split overhead —
a table of 10 M x 1 MB files is dramatically slower to read than the
same bytes in 80 K x 128 MB files. The fix is the standard maintenance
rewrite (Delta OPTIMIZE / Iceberg rewrite_data_files), built here from
public primitives:

- total input bytes come from the Hadoop FileSystem API (works on any
  FS Spark can read, not just local paths);
- output file count = ceil(bytes / target_file_bytes); round-robin
  ``repartition(n)`` balances the files within ±1 row of each other;
- optionally ``sort_by`` re-sorts within output files so row-group
  min-max stats stay narrow (pairs with operators/zorder.py, whose
  layout a naive round-robin rewrite would destroy);
- the rewrite lands in a NEW directory — swapping it live is the
  caller's commit decision (e.g. the state store's manifest publish),
  keeping this operator side-effect-free on the source.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of ``path`` via the Hadoop FileSystem API."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())


def plan_output_files(total_bytes: int, target_file_bytes: int) -> int:
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be > 0, got {target_file_bytes}")
    return max(1, math.ceil(total_bytes / target_file_bytes))


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    fmt: str = "parquet",
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``src`` (parquet/orc dir) into ``dst`` with files sized
    toward ``target_file_bytes``; returns the planned output file count.

    Sizing uses the SOURCE's on-disk bytes — post-rewrite files compress
    slightly differently, but the estimate is what every production
    compactor uses (exact sizing would need a second write pass)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    n = plan_output_files(dir_bytes(spark, src), target_file_bytes)
    df: DataFrame = spark.read.format(fmt).load(src)
    out = df.repartition(n)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").format(fmt).save(dst)
    return n
