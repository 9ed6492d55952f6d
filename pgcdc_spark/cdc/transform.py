"""CDC transform pipeline: filter -> extract -> checked image, with real
I/U/D semantics.

Re-expresses the reference's mapper (src/mapping/customMapper.ts):
- R4 filter (ts :12-13): drop transaction-control/metadata tags
  (`begin`, `commit`, `relation`);
- R5 extraction (ts :19-23): the reference takes Option(new) and thereby
  SILENTLY DROPS deletes (they carry only `old`). Here deletes are kept:
  op = I/U/D and the image is `new` for I/U, `old` for D;
- R6 transformer registry (ts :27-29): `DataFrame.transform`-chainable
  pure functions, the Spark-native extension point.

The same functions run batch and streaming (Structured Streaming executes
the identical logical plan per micro-batch) — one code path, two modes.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CONTROL_TAGS = ("begin", "commit", "relation", "truncate",
                "truncate_other", "message", "origin", "type")

Transformer = Callable[[DataFrame], DataFrame]


def filter_control_messages(df: DataFrame) -> DataFrame:
    """R4: keep only row-change messages.

    Drops pgoutput transaction-control tags AND MongoDB change-stream
    control operationTypes (drop/rename/dropDatabase/invalidate, which
    _tag_expr passes through verbatim) — this filter, not the
    null-image fallthrough in extract_images, is the sanctioned drop
    point for control traffic from every adapter."""
    from .mongo import CONTROL_OPERATIONS

    return df.filter(~F.col("tag").isin(*CONTROL_TAGS, *CONTROL_OPERATIONS))


def drop_pre_truncate(df: DataFrame) -> DataFrame:
    """Apply TRUNCATE semantics to the envelope stream: every change
    ordered at or before the LAST truncate that names this table is
    void (the table was emptied). Fully declarative — the truncate
    watermark is a 1-row aggregate broadcast against the stream, no
    driver scalar; lsn strings are zero-padded so string order is WAL
    order. Truncates of OTHER tables (tag 'truncate_other') are inert.
    Run BEFORE filter_control_messages (which drops the truncate rows
    themselves as control traffic)."""
    wm = df.filter(F.col("tag") == "truncate").agg(
        F.max("lsn").alias("__trunc_lsn")
    )
    return (
        df.crossJoin(F.broadcast(wm))
        .filter(F.col("__trunc_lsn").isNull()
                | (F.col("lsn") > F.col("__trunc_lsn")))
        .drop("__trunc_lsn")
    )


def extract_images(df: DataFrame) -> DataFrame:
    """R5 fixed: op column + the correct image per op (deletes preserved)."""
    op = (
        F.when(F.col("tag") == "insert", "I")
        .when(F.col("tag") == "update", "U")
        .when(F.col("tag") == "delete", "D")
    )
    image = F.when(F.col("tag") == "delete", F.col("old")).otherwise(F.col("new"))
    return (
        df.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .withColumn("image", image)
        .filter(F.col("image").isNotNull())
    )


def flatten_image(df: DataFrame) -> DataFrame:
    """Surface the image struct as top-level columns next to (lsn, op)."""
    return df.select("lsn", "op", "image.*")


DEFAULT_PIPELINE: tuple[Transformer, ...] = (
    filter_control_messages,
    extract_images,
    flatten_image,
)


def apply_pipeline(df: DataFrame, transformers: tuple[Transformer, ...] = DEFAULT_PIPELINE) -> DataFrame:
    """The reference's ordered Transformer list (customMapper.ts:27-29),
    Spark-style: chained pure DataFrame -> DataFrame functions."""
    for t in transformers:
        df = df.transform(t)
    return df
