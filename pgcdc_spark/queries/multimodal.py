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


# Full value-hash oracle for the mixed-modality feature pipeline. Every
# feature is arithmetically recomputable from doc_id / the text column
# because (a) payloads are synthesized from doc_id (multimodal._synth_image
# / _synth_audio), and (b) the engine computes statistics via EXACT integer
# sums before float division (image_feature / audio analysis), so the
# decode -> feature float64 values are bit-identical to the SQL recompute
# in the same IEEE operation order. The trailing REAL cast replicates the
# engine's float64 -> float32 Arrow narrowing; widening back to DOUBLE is
# exact on both sides.
def _txt_feature_cols() -> str:
    tmpl = ("CAST(CAST(((strpos('0123456789abcdef', substr(hx, {a}, 1)) - 1) * 16"
            " + (strpos('0123456789abcdef', substr(hx, {b}, 1)) - 1)) / 255.0"
            " AS REAL) AS DOUBLE) AS f{i}")
    return ",\n    ".join(tmpl.format(a=2 * i + 1, b=2 * i + 2, i=i) for i in range(8))


def _img_stat_cols() -> str:
    mean = ("CAST(CAST(MAX(CASE WHEN c = {c} THEN (CAST(s1 AS DOUBLE) / (w * h))"
            " / 255.0 END) AS REAL) AS DOUBLE) AS f{i}")
    std = ("CAST(CAST(MAX(CASE WHEN c = {c} THEN sqrt(greatest("
           "CAST(s2 AS DOUBLE) / (w * h)"
           " - (CAST(s1 AS DOUBLE) / (w * h)) * (CAST(s1 AS DOUBLE) / (w * h)),"
           " 0.0)) / 255.0 END) AS REAL) AS DOUBLE) AS f{i}")
    cols = [mean.format(c=c, i=c) for c in range(3)]
    cols += [std.format(c=c, i=c + 3) for c in range(3)]
    return ",\n    ".join(cols)


_FEATURES_ORACLE = f"""
WITH
grid AS (
  SELECT x, y, c FROM (SELECT unnest(range(0, 6)) AS x),
                      (SELECT unnest(range(0, 4)) AS y),
                      (SELECT unnest(range(0, 3)) AS c)
),
series AS (SELECT unnest(range(0, 512)) AS i),
txt AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE doc_id % 3 = 0
),
txt_f AS (
  SELECT doc_id, 'text' AS modality, n_bytes,
    {_txt_feature_cols()}
  FROM txt
),
img_docs AS (
  SELECT doc_id, CAST(4 + doc_id % 3 AS BIGINT) AS w,
         CAST(3 + doc_id % 2 AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 = 1
),
img_stats AS (
  SELECT d.doc_id, d.w, d.h, g.c,
         SUM((d.doc_id * 7 + g.x * 13 + g.y * 29 + g.c * 3) % 256) AS s1,
         SUM(((d.doc_id * 7 + g.x * 13 + g.y * 29 + g.c * 3) % 256)
           * ((d.doc_id * 7 + g.x * 13 + g.y * 29 + g.c * 3) % 256)) AS s2
  FROM img_docs d JOIN grid g ON g.x < d.w AND g.y < d.h
  GROUP BY d.doc_id, d.w, d.h, g.c
),
img_f AS (
  SELECT doc_id, 'image' AS modality,
    CAST(11 + any_value(w) * any_value(h) * 3 AS BIGINT) AS n_bytes,
    {_img_stat_cols()},
    CAST(CAST(any_value(h) / 4096.0 AS REAL) AS DOUBLE) AS f6,
    CAST(CAST(any_value(w) / 4096.0 AS REAL) AS DOUBLE) AS f7
  FROM img_stats GROUP BY doc_id
),
aud_docs AS (
  SELECT doc_id, CAST(160 + (doc_id % 7) * 16 AS BIGINT) AS n,
         CAST(1 + doc_id % 2 AS BIGINT) AS ch
  FROM documents WHERE doc_id % 3 = 2
),
aud_samp AS (
  SELECT a.doc_id, a.n, a.ch, s.i,
         (((a.doc_id * 31 + s.i * 17) % 2003) - 1001) * 16 AS p
  FROM aud_docs a JOIN series s ON s.i < a.n * a.ch
),
aud_agg AS (
  SELECT doc_id, any_value(n) AS n, any_value(ch) AS ch,
         SUM(p) AS s1, SUM(p * p) AS s2, MAX(ABS(p)) AS pk
  FROM aud_samp GROUP BY doc_id
),
aud_ch0 AS (
  SELECT doc_id, (p < 0) AS neg,
         LAG(p < 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev_neg
  FROM aud_samp WHERE i % ch = 0
),
aud_zcr AS (
  SELECT doc_id, SUM(CASE WHEN neg != prev_neg THEN 1 ELSE 0 END) AS changes
  FROM aud_ch0 WHERE prev_neg IS NOT NULL GROUP BY doc_id
),
aud_f AS (
  SELECT g.doc_id, 'audio' AS modality,
    CAST(44 + g.n * g.ch * 2 AS BIGINT) AS n_bytes,
    CAST(CAST(CAST(g.n AS DOUBLE) / 8000 AS REAL) AS DOUBLE) AS f0,
    CAST(CAST(sqrt((CAST(g.s2 AS DOUBLE) / 1073741824.0) / (g.n * g.ch))
      AS REAL) AS DOUBLE) AS f1,
    CAST(CAST(CAST(g.pk AS DOUBLE) / 32768.0 AS REAL) AS DOUBLE) AS f2,
    CAST(CAST(CAST(z.changes AS DOUBLE) / (g.n - 1) AS REAL) AS DOUBLE) AS f3,
    CAST(CAST((CAST(g.s1 AS DOUBLE) / 32768.0) / (g.n * g.ch) AS REAL)
      AS DOUBLE) AS f4,
    CAST(CAST(CAST(g.ch AS DOUBLE) / 8.0 AS REAL) AS DOUBLE) AS f5,
    CAST(CAST(8000.0 / 48000.0 AS REAL) AS DOUBLE) AS f6,
    CAST(CAST(least(1.0, CAST(g.n AS DOUBLE) / 1000000.0) AS REAL) AS DOUBLE) AS f7
  FROM aud_agg g JOIN aud_zcr z USING (doc_id)
)
SELECT * FROM txt_f
UNION ALL SELECT * FROM img_f
UNION ALL SELECT * FROM aud_f
"""


@query("mm_extract_features", oracle=_FEATURES_ORACLE,
       tags=("llm", "multimodal", "pandas-udf"))
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over a MIXED-modality
    corpus (text / PPM image / PCM-WAV audio by doc_id % 3), dispatched
    through the codec REGISTRY in one pass: rasters get channel-stat
    features, waveforms get duration/RMS/peak/ZCR features, text bytes the
    deterministic md5 stand-in. A cluster user swaps PIL/torchaudio codecs
    in through the same seam.

    Driver artifact: the 8-dim ``array<float>`` feature is unpacked into
    scalar ``f0..f7`` doubles (exact float32 -> float64 widening) so the
    driver can canonicalize and value-hash the result against the full SQL
    oracle above — every decoded feature value is bit-checked, not just
    row counts. Typed-array exactness is separately pinned in pytest
    (tests/test_llm.py)."""
    from ..multimodal import FEATURE_DIM, documents_as_mixed_multimodal

    (docs,) = load(spark, sf_dir, "documents")
    feats = extract_features(documents_as_mixed_multimodal(docs), fake=False)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        *[F.col("feature")[i].cast("double").alias(f"f{i}")
          for i in range(FEATURE_DIM)],
    )


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


# Dead-letter quarantine through the driver gate (VERDICT r6 item 7):
# corruption is ARITHMETICALLY derived from doc_id, so DuckDB can predict
# exactly which rows land in the dead-letter split —
#   doc_id % 5 == 1 -> payload truncated to its first 6 bytes: the strict
#     PPM/WAV codecs raise ValueError (image/audio rows quarantine); the
#     byte-level text stand-in cannot fail, so truncated TEXT rows stay
#     good (asserting that distinction is the point: quarantine must be
#     per-failure, not per-corruption);
#   doc_id % 5 == 3 -> modality relabeled 'video', which has no
#     registered codec: NotImplementedError quarantines the row whatever
#     its payload holds.
# n_bytes is computed POST-corruption on both sides, so the hash also
# pins that good rows flow through unharmed.
_QUARANTINE_ORACLE = """
SELECT
  doc_id,
  CASE WHEN doc_id % 5 = 3 THEN 'video'
       WHEN doc_id % 3 = 1 THEN 'image'
       WHEN doc_id % 3 = 2 THEN 'audio'
       ELSE 'text' END AS modality,
  CAST(CASE WHEN doc_id % 5 = 1 THEN LEAST(orig_bytes, 6) ELSE orig_bytes END
    AS BIGINT) AS n_bytes,
  (doc_id % 5 = 3 OR (doc_id % 5 = 1 AND doc_id % 3 <> 0)) AS quarantined
FROM (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 1
           THEN 11 + (4 + doc_id % 3) * (3 + doc_id % 2) * 3
         WHEN doc_id % 3 = 2
           THEN 44 + (160 + (doc_id % 7) * 16) * (1 + doc_id % 2) * 2
         ELSE octet_length(encode(text)) END AS orig_bytes
  FROM documents
) t
"""


@query("mm_quarantine_deadletter", oracle=_QUARANTINE_ORACLE,
       tags=("llm", "multimodal", "pandas-udf", "quarantine"))
def mm_quarantine_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_features(on_error='quarantine') over a mixed corpus with
    deterministic corruption: truncated binaries and an unregistered
    modality become dead-letter rows (error column set, NULL feature)
    while every good row — including corrupt-but-undecodable-proof text —
    flows through unharmed. One bad blob must not kill a 100 TB stage;
    the oracle predicts the exact dead-letter set from doc_id."""
    from ..multimodal import documents_as_mixed_multimodal

    (docs,) = load(spark, sf_dir, "documents")
    mm = documents_as_mixed_multimodal(docs).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 3, F.lit("video"))
        .otherwise(F.col("modality")).alias("modality"),
        F.when(F.col("doc_id") % 5 == 1, F.expr("substring(payload, 1, 6)"))
        .otherwise(F.col("payload")).alias("payload"),
    )
    feats = extract_features(mm, fake=False, on_error="quarantine")
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        F.col("error").isNotNull().alias("quarantined"),
    )


# --- binaryFile ingestion, end-to-end ----------------------------------------
# Drives sources.read_binary_files (the object-store on-ramp) under the
# driver's oracle gate: a deterministic fixture TREE of real media files
# (text/.txt, PPM/.ppm, WAV/.wav — the same doc_id-derived payloads as
# documents_as_mixed_multimodal, written executor-side once per corpus)
# is listed with a pathGlobFilter, decoded through the codec registry,
# and featurized; the oracle recomputes every feature arithmetically
# from doc_id, so a green row proves listing -> glob pruning -> binary
# read -> modality typing -> codec decode -> feature extraction
# end-to-end, value-exact. A decoy non-matching file in the tree proves
# the glob prunes at listing time (it never reaches the plan).

_MM_FS_FORMAT = "v1"
_INGEST_MOD = 13  # ingest the doc_id % 13 == 0 slice (~8% of the corpus)


def _mm_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per corpus content-fingerprint) the media-file
    fixture tree under the system temp root. Files are written by the
    EXECUTORS via mapInPandas — the same write topology as any
    distributed sink (each task writes the files of its partition; in
    local mode that is the local tempdir, on a cluster it would be a
    shared mount / object store). The driver only checks/writes the
    _READY marker."""
    import hashlib
    import os
    import shutil
    import tempfile

    p = os.path.join(sf_dir, "documents.parquet")
    paths = [p]
    if os.path.isdir(p):
        paths = [
            os.path.join(base, f)
            for base, _d, files in os.walk(p)
            for f in files
        ]
    h = hashlib.md5(sf_dir.encode())
    for f in sorted(paths):
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    root = os.path.join(
        tempfile.gettempdir(), f"pgcdc_spark_mmfs_{_MM_FS_FORMAT}",
        h.hexdigest()[:16],
    )
    ready = os.path.join(root, "_READY")
    if os.path.exists(ready):
        return root
    # Publish-by-rename: build the whole tree in a builder-unique scratch
    # dir and atomically rename it into place, so _READY can only ever be
    # observed inside a COMPLETE tree.  The old check-then-rmtree-then-
    # write-in-place was racy under concurrent drivers (parallel pytest
    # workers, sweep+bench): one builder's rmtree could shred another's
    # half-written files and the marker then cached the corrupt tree
    # forever (round-8 review).  With rename, exactly one builder wins;
    # losers discard their scratch and serve the winner's tree.
    import uuid as _uuid

    build = f"{root}.tmp-{_uuid.uuid4().hex[:8]}"
    os.makedirs(build, exist_ok=True)

    from ..multimodal import documents_as_mixed_multimodal

    (docs,) = load(spark, sf_dir, "documents")
    mm = documents_as_mixed_multimodal(
        docs.filter(F.col("doc_id") % _INGEST_MOD == 0)
    )
    ext = {"text": "txt", "image": "ppm", "audio": "wav"}

    def write(batches):
        import pandas as pd

        n = 0
        for pdf in batches:
            for doc_id, mod, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                name = f"doc_{int(doc_id)}.{ext[mod]}"
                with open(os.path.join(build, name), "wb") as f:
                    f.write(bytes(payload))
                n += 1
        yield pd.DataFrame({"n": [n]})

    mm.mapInPandas(write, "n long").count()
    # decoy: a file the doc_* glob must prune at LISTING time
    with open(os.path.join(build, "decoy.skip"), "wb") as f:
        f.write(b"not media")
    with open(os.path.join(build, "_READY"), "w") as f:
        f.write("ok")
    try:
        os.rename(build, root)
    except OSError:
        if os.path.exists(ready):  # another builder won with a full tree
            shutil.rmtree(build, ignore_errors=True)
            return root
        # a half-built root from the PRE-rename layout (no marker):
        # replace it and retry once; a second failure is a real error
        shutil.rmtree(root, ignore_errors=True)
        os.rename(build, root)
    return root


_INGEST_ORACLE = f"""
SELECT * FROM ({_FEATURES_ORACLE}) WHERE doc_id % {_INGEST_MOD} = 0
"""


@query("mm_binary_ingest", oracle=_INGEST_ORACLE,
       tags=("llm", "multimodal", "binary-file", "pandas-udf"))
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile ingestion end-to-end: glob-pruned listing of a real
    media-file tree -> (path, content) rows -> doc_id from the filename,
    modality from the extension -> registry codec decode -> Arrow
    feature extraction. Same per-value oracle arithmetic as
    mm_extract_features, restricted to the ingested slice — the hash
    match covers the bytes that actually round-tripped through the
    filesystem, not a synthesized in-plan payload."""
    from ..multimodal import FEATURE_DIM
    from ..sources import read_binary_files

    fixture = _mm_fixture_dir(spark, sf_dir)
    files = read_binary_files(spark, fixture, glob="doc_*")
    mm = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.", 1)
        .cast("long").alias("doc_id"),
        "modality",
        "payload",
    )
    feats = extract_features(mm, fake=False)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        *[F.col("feature")[i].cast("double").alias(f"f{i}")
          for i in range(FEATURE_DIM)],
    )
