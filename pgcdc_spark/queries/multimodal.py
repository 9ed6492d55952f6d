"""Multimodal-column queries: binary payload metadata (oracle-checked) and
the Arrow-batched feature-extraction pipeline (rows-only check; the
pandas-UDF path has no SQL equivalent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..multimodal import documents_as_multimodal, extract_features
from . import query

_META_ORACLE = """
SELECT
  doc_id,
  'text' AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS payload_hash,
  CAST(CEIL(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
FROM documents
"""


@query("mm_binary_meta", oracle=_META_ORACLE, tags=("llm", "multimodal"))
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — the part of multimodal
    processing that is pure relational algebra and must stay JVM-side."""
    (docs,) = load(spark, sf_dir, "documents")
    mm = documents_as_multimodal(docs)
    return mm.select(
        "doc_id",
        "modality",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_hash"),
        F.ceil(F.octet_length("payload") / F.lit(256.0)).cast("long").alias("n_chunks"),
    )


@query("mm_extract_features", oracle=None, tags=("llm", "multimodal", "pandas-udf"))
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode/encode pipeline, dispatched through
    the codec REGISTRY (the 'text' modality resolves to the registered
    deterministic FakeBytesCodec — a cluster user registers PIL/torchaudio
    instead). Rows-only driver check; exact values asserted in pytest."""
    (docs,) = load(spark, sf_dir, "documents")
    return extract_features(documents_as_multimodal(docs), fake=False)


@query("mm_resize", oracle=None, tags=("llm", "multimodal", "pandas-udf"))
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake resize to 16x8 "pixels" (truncate/pad payload to
    128 bytes) through mapInPandas. Rows-only driver check (DuckDB has no
    md5 over BLOB); exact bytes are asserted in tests/test_llm.py."""
    from ..multimodal import resize_images

    (docs,) = load(spark, sf_dir, "documents")
    resized = resize_images(documents_as_multimodal(docs), width=16, height=8)
    return resized.select(
        "doc_id", "modality", "width", "height",
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )


@query("mm_frame_sample", oracle=None, tags=("llm", "multimodal", "pandas-udf"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd 16-byte "frame" (max 4) per payload — the 1->N UDTF shape
    through mapInPandas. Rows-only driver check; exact frame bytes are
    asserted in tests/test_llm.py."""
    from ..multimodal import sample_frames

    (docs,) = load(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_multimodal(docs))
    return frames.select(
        "doc_id", "frame_idx",
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )
