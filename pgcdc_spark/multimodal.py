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
    BinaryType,
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


# --- resize (per-row transform) ---------------------------------------------

MM_RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(mm: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize image payloads to (width, height) — mapInPandas, 1 row in ->
    1 row out. The fake path truncates/zero-pads the payload to
    ``width*height`` bytes (deterministic), standing in for a real
    PIL.Image.resize; the Arrow plumbing (binary in, binary out, typed
    dims) is the tested deliverable."""

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                decoded = decode_payload(p, m, fake=fake)
                raw = bytes(decoded)
                out.append(raw[:target].ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return mm.mapInPandas(run, schema=MM_RESIZED_SCHEMA)


# --- frame sampling (1 -> N expansion) --------------------------------------

MM_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    mm: DataFrame, frame_bytes: int = 16, every_n: int = 2, max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Sample every ``every_n``-th frame (up to ``max_frames``) from video
    payloads — the 1->N expansion shape (a UDTF in SQL terms) through
    mapInPandas: output batches need NOT align row-for-row with input
    batches, only with the declared schema. The fake path treats the
    payload as fixed-size byte frames, standing in for a real
    decord/ffmpeg frame decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["modality"]):
                raw = bytes(decode_payload(p, m, fake=fake))
                all_frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                for k, fr in enumerate(all_frames[::every_n][:max_frames]):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return mm.mapInPandas(run, schema=MM_FRAME_SCHEMA)
