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
    """Arrow-batched mapInPandas feature extraction over a MIXED-modality
    corpus (text / PPM image / PCM-WAV audio by doc_id % 3), dispatched
    through the codec REGISTRY in one pass: rasters get channel-stat
    features, waveforms get duration/RMS/peak/ZCR features, text bytes the
    deterministic stand-in. A cluster user swaps PIL/torchaudio codecs in
    through the same seam. Rows-only driver check; exact decode/feature
    values asserted in pytest (tests/test_llm.py)."""
    from ..multimodal import documents_as_mixed_multimodal

    (docs,) = load(spark, sf_dir, "documents")
    return extract_features(documents_as_mixed_multimodal(docs), fake=False)


# The audio corpus is synthesized arithmetically from doc_id
# (multimodal._synth_audio: n_in = 160 + (doc_id % 7) * 16 samples at
# 8000 Hz, 1 + (doc_id % 2) channels), so the relational contract of
# decode -> linear resample to 3000 Hz -> 16-bit WAV re-encode is exactly
# recomputable in SQL: n_out = n_in * 3000 // 8000, RIFF size = 44 bytes
# of header + n_out * channels * 2 of PCM.
_AUDIO_RESAMPLE_ORACLE = """
SELECT
  doc_id,
  CAST(3000 AS BIGINT) AS sample_rate,
  CAST(((160 + (doc_id % 7) * 16) * 3000) // 8000 AS BIGINT) AS n_samples,
  CAST(1 + (doc_id % 2) AS BIGINT) AS channels,
  CAST((((160 + (doc_id % 7) * 16) * 3000) // 8000) * 1000000 // 3000 AS BIGINT)
    AS duration_us,
  CAST(44 + (((160 + (doc_id % 7) * 16) * 3000) // 8000) * (1 + (doc_id % 2)) * 2
    AS BIGINT) AS payload_bytes
FROM documents
WHERE doc_id % 3 = 2
"""


@query("mm_audio_resample", oracle=_AUDIO_RESAMPLE_ORACLE,
       tags=("llm", "multimodal", "pandas-udf"))
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode -> linear resample -> WAV re-encode through the
    registry; the emitted metadata (sample count, channels, duration, and
    the re-encoded RIFF byte size) comes from the actual decoded payloads,
    while the oracle recomputes every value arithmetically from doc_id —
    any codec/resampler framing bug breaks the hash match. Exact waveform
    values are pinned in pytest."""
    from ..multimodal import documents_as_mixed_multimodal, resample_audio

    (docs,) = load(spark, sf_dir, "documents")
    mixed = documents_as_mixed_multimodal(docs)
    out = resample_audio(mixed, target_rate=3000)
    return out.filter(F.col("modality") == "audio").select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "channels",
        "duration_us",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
    )


# Resized-PPM size: header "P6\n16 8\n255\n" (12 bytes) + 16*8*3 raster.
# Audio passes through untouched (original synth WAV framing); text pads
# to width*height bytes. Every byte count is recomputable from doc_id /
# the text column, so the Arrow resize pipeline earns a full value-hash
# oracle — a codec or framing regression breaks the match.
_RESIZE_ORACLE = """
SELECT
  doc_id,
  CASE CAST(doc_id % 3 AS INTEGER)
    WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'text' END AS modality,
  CASE WHEN doc_id % 3 = 2 THEN NULL ELSE CAST(16 AS BIGINT) END AS width,
  CASE WHEN doc_id % 3 = 2 THEN NULL ELSE CAST(8 AS BIGINT) END AS height,
  CAST(CASE CAST(doc_id % 3 AS INTEGER)
    WHEN 1 THEN 12 + 16 * 8 * 3
    WHEN 2 THEN 44 + (160 + (doc_id % 7) * 16) * (1 + (doc_id % 2)) * 2
    ELSE 128 END AS BIGINT) AS n_bytes
FROM documents
"""


@query("mm_resize", oracle=_RESIZE_ORACLE, tags=("llm", "multimodal", "pandas-udf"))
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over the MIXED corpus through the codec registry: PPM images
    get a real nearest-neighbor resample re-encoded at 16x8, text pads to
    the raster byte budget, waveforms pass through untouched. Exact bytes
    asserted in tests/test_llm.py; the oracle pins the per-modality
    framing arithmetic."""
    from ..multimodal import documents_as_mixed_multimodal, resize_images

    (docs,) = load(spark, sf_dir, "documents")
    mixed = documents_as_mixed_multimodal(docs)
    resized = resize_images(mixed, width=16, height=8, fake=False)
    return resized.select(
        "doc_id", "modality",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )


# Frames are 16-byte chunks of the text payload, every 2nd chunk, max 4:
# frame k (k = 0..3) covers bytes [32k, 32k+16) and exists iff 32k < L.
_FRAME_ORACLE = """
SELECT d.doc_id, k.k AS frame_idx,
       CAST(LEAST(16, d.len - 32 * k.k) AS BIGINT) AS frame_bytes
FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents) d
JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) k ON 32 * k.k < d.len
"""


@query("mm_frame_sample", oracle=_FRAME_ORACLE,
       tags=("llm", "multimodal", "pandas-udf"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd 16-byte "frame" (max 4) per payload — the 1->N UDTF shape
    through mapInPandas, value-hash-checked against the chunking
    arithmetic. Exact frame bytes are asserted in tests/test_llm.py."""
    from ..multimodal import sample_frames

    (docs,) = load(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_multimodal(docs))
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )
