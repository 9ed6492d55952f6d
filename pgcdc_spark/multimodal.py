"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas pipelines (mapInPandas).

Design (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a ``modality`` tag and a metadata struct. All
Spark-side plumbing — schema, partition sizing, batch iteration, feature
schema — is real and tested; the actual codec calls are stubbed behind
``NotImplementedError`` because no image/audio libraries exist in this
container (decode_payload(..., fake=True) provides a deterministic
stand-in so the pipeline is testable end-to-end).

Scale notes:
- payloads never pass through Python row-at-a-time: mapInPandas moves
  whole Arrow batches; tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
  for payload size (e.g. 256 rows/batch at ~4 MB images);
- repartition by size-class before decode so one straggler partition of
  large videos doesn't serialize the stage;
- feature vectors come back as ``array<float>`` ready for the similarity
  ops (queries/llm_similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MM_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> Any:
    """Decode an opaque payload. Real codecs are not available in this
    environment — STUB. ``fake=True`` returns a deterministic byte-level
    stand-in so the distributed pipeline can be exercised."""
    if fake:
        return payload  # treat raw bytes as the "decoded" object
    raise NotImplementedError(
        f"no codec for modality={modality!r} in this environment; "
        "plug in PIL/torchaudio/decord here on a real cluster"
    )


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic 8-dim feature from md5 bytes — stands in for an
    encoder forward pass."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(mm: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, modality, payload).

    The Arrow batch shape is the real deliverable: each pandas DataFrame
    chunk is decoded column-wise, one output row per input row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_payload(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": [_fake_feature(d) for d in decoded],
                }
            )

    return mm.mapInPandas(run, schema=MM_FEATURE_SCHEMA)


def documents_as_multimodal(docs: DataFrame) -> DataFrame:
    """Adapt the `documents` table into the multimodal shape (text bytes as
    the opaque payload) — the test stand-in for an image/audio table."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
    )
