"""LLM-data-operator semantics tests (beyond the driver's oracle gate):

- LSH ANN vs brute-force cosine: recall on the true top-k (the oracle can
  check brute force bit-for-bit, but only a cross-validation shows the
  bucketed variant actually approximates it);
- MinHash/LSH candidate quality: candidate pairs have high true Jaccard
  on band-collision, exact duplicates always collide;
- SimHash: identical docs get identical signatures; signature fits 16 bits;
- quality/fingerprint determinism: same input -> same output across runs.

Run at sf0.001 (600 docs / 200 vectors) for speed.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pgcdc_spark.queries import all_queries

QS = all_queries()


def _df(name, spark, sf):
    return QS[name].fn(spark, sf)


# --- ANN vs brute force ------------------------------------------------------


def test_lsh_ann_recall_vs_brute_force(spark, sf_smoke):
    brute = {
        (r["qid"], r["neighbor_id"])
        for r in _df("emb_cosine_topk", spark, sf_smoke).collect()
    }
    ann = {
        (r["qid"], r["neighbor_id"])
        for r in _df("emb_lsh_ann_topk", spark, sf_smoke).collect()
    }
    assert ann, "ANN returned nothing"
    # Every ANN hit must be a genuine in-bucket neighbor of the query
    # (subset-of-universe sanity) and recall of the true top-k should be
    # well above chance. 6 hyperplanes / 64 buckets on ~200 vectors gives
    # sparse buckets; require >= 30% recall (chance is ~top_k/n ~ 5%).
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.3, f"ANN recall suspiciously low: {recall:.2f}"


def test_ann_self_excluded(spark, sf_smoke):
    for name in ("emb_cosine_topk", "emb_lsh_ann_topk"):
        bad = _df(name, spark, sf_smoke).filter(F.col("qid") == F.col("neighbor_id"))
        assert bad.count() == 0, name


def test_cosine_bounds_and_ranks(spark, sf_smoke):
    df = _df("emb_cosine_topk", spark, sf_smoke)
    rows = df.collect()
    assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)
    # ranks are 1..k, strictly ordered by cosine desc within each qid
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


# --- dedup family ------------------------------------------------------------


def test_exact_duplicates_always_minhash_collide(spark, sf_smoke):
    """Docs with identical text (n_copies > 1 in exact dedup) must appear
    as MinHash candidate pairs — identical shingle sets collide in every
    band."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    dup_groups = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        # single-token texts have no 2-shingles; skip those
        .filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .collect()
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _df("dedup_minhash_lsh", spark, sf_smoke).collect()
    }
    missed = []
    for g in dup_groups:
        ids = sorted(g["ids"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if (ids[i], ids[j]) not in pairs:
                    missed.append((ids[i], ids[j]))
    assert not missed, f"exact dups missing from LSH candidates: {missed[:5]}"


def test_minhash_pairs_ordered_and_distinct(spark, sf_smoke):
    df = _df("dedup_minhash_lsh", spark, sf_smoke)
    assert df.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert df.count() == df.distinct().count()


def test_bpe_merge_fold_greedy_overlap(spark):
    """The BPE merge fold consumes its right symbol: overlapping
    candidates (only possible when l = r) merge alternately left-to-
    right — 'aaaa' under pair (a,a) becomes [aa, aa], 'aaa' becomes
    [aa, a], and a merged symbol never re-merges within the pass."""
    from pgcdc_spark.queries.llm_text import _BPE_MERGE_FOLD
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(list("aaaa"), "a", "a"),
         (list("aaa"), "a", "a"),
         (list("abab"), "a", "b"),
         (list("xy"), "a", "b")],
        "syms array<string>, pl string, pr string",
    )
    got = [r[0] for r in df.select(SF.expr(_BPE_MERGE_FOLD)).collect()]
    assert got == [["aa", "aa"], ["aa", "a"], ["ab", "ab"], ["x", "y"]]


def test_lsh_buckets_stay_small_by_construction(spark, sf_smoke):
    """Scale-regression pin for the r10 finding: bigram shingles over
    this corpus family's tiny vocabulary gave unrelated long documents
    J~0.15, and the r=2 banding turned that into O(n)-sized LSH buckets
    and a QUADRATIC candidate blowup at 10x scale (6.4M pairs, max
    bucket 1461). The trigram + r=4 parameterization keeps buckets
    small BY CONSTRUCTION — this pin fails loudly if a future
    shingle/banding change re-admits the background-similarity mass
    (measured today: max bucket 4 at n=500, 13 at n=5000; candidate
    pairs ~0.1-0.3 per doc)."""
    from pgcdc_spark.catalog import load
    from pgcdc_spark.queries.llm_dedup import (
        minhash_bands, minhash_candidate_pairs)

    (docs,) = load(spark, sf_smoke, "documents")
    n = docs.count()
    buckets = minhash_bands(docs).groupBy("band", "sig").count()
    max_bucket = buckets.agg(F.max("count")).collect()[0][0]
    n_pairs = minhash_candidate_pairs(docs).count()
    # generous 4x headroom over today's measurements, still orders of
    # magnitude below the broken regime (max bucket ~0.3*n, pairs ~n^2)
    assert max_bucket <= max(16, 0.01 * n), (n, max_bucket)
    assert n_pairs <= 2 * n, (n, n_pairs)


def test_simhash_signature_properties(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    sig = _df("dedup_simhash", spark, sf_smoke)
    rows = sig.collect()
    assert all(0 <= r["simhash"] < (1 << 16) for r in rows)
    # identical text -> identical signature
    joined = (
        docs.select("doc_id", "text")
        .join(sig, "doc_id")
        .groupBy("text")
        .agg(F.countDistinct("simhash").alias("nsig"))
        .filter(F.col("nsig") > 1)
    )
    assert joined.count() == 0


def test_jaccard_threshold_and_symmetry(spark, sf_smoke):
    df = _df("dedup_ngram_jaccard", spark, sf_smoke)
    rows = df.collect()
    assert all(r["jaccard"] >= 0.8 - 1e-12 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


# --- determinism across invocations -----------------------------------------


def test_fingerprint_and_quality_deterministic(spark, sf_smoke):
    for name in ("docs_fingerprint", "docs_quality_score"):
        a = sorted(map(tuple, _df(name, spark, sf_smoke).collect()))
        b = sorted(map(tuple, _df(name, spark, sf_smoke).collect()))
        assert a == b, name


# --- multimodal resize / frame sampling -------------------------------------

def test_mm_resize_exact_bytes(spark):
    from pgcdc_spark.multimodal import documents_as_multimodal, resize_images

    docs = spark.createDataFrame(
        [(1, "short"), (2, "x" * 300)], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: bytes(r["payload"])
           for r in resize_images(documents_as_multimodal(docs), 16, 8).collect()}
    assert out[1] == b"short" + b"\0" * (128 - 5)      # padded
    assert out[2] == b"x" * 128                         # truncated
    assert all(len(p) == 128 for p in out.values())


def test_mm_frame_sample_expansion(spark):
    from pgcdc_spark.multimodal import documents_as_multimodal, sample_frames

    # 96 bytes -> frames of 16 -> 6 frames -> every 2nd -> idx 0,1,2 (cap 4)
    docs = spark.createDataFrame(
        [(1, "ABCDEFGHIJKLMNOP" * 6), (2, "tiny")], "doc_id LONG, text STRING"
    )
    rows = sample_frames(documents_as_multimodal(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    assert [i for i, _ in sorted(by_doc[1])] == [0, 1, 2]
    assert sorted(by_doc[1])[0][1] == b"ABCDEFGHIJKLMNOP"
    assert by_doc[2] == [(0, b"tiny")]  # single partial frame


def test_cc_clusters_consistent_with_pairs(spark, sf_smoke):
    """Every candidate pair's endpoints land in the same cluster; the
    representative is the cluster minimum; singletons are their own
    cluster; membership counts add up to the doc count."""
    from pgcdc_spark.queries.llm_dedup import dedup_cc_clusters, dedup_minhash_lsh

    comp = dedup_cc_clusters(spark, sf_smoke).cache()
    pairs = dedup_minhash_lsh(spark, sf_smoke)

    a = comp.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca"))
    b = comp.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb"))
    split_edges = (
        pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("ca") != F.col("cb"))
    )
    assert split_edges.count() == 0

    n_docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert comp.count() == n_docs
    # representative = min(doc_id) of the cluster, exactly one per cluster
    reps = comp.filter("is_representative")
    assert reps.count() == comp.select("cluster_id").distinct().count()
    bad_rep = comp.groupBy("cluster_id").agg(F.min("doc_id").alias("lo")).filter(
        F.col("lo") != F.col("cluster_id")
    )
    assert bad_rep.count() == 0
    # n_members agrees with the actual group sizes
    sz = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("actual"), F.first("n_members").alias("claimed")
    )
    assert sz.filter(F.col("actual") != F.col("claimed")).count() == 0
    comp.unpersist()


def test_quantize_codes_in_range_and_reversible_ranks(spark, sf_smoke):
    """int8 codes stay in [0, 255]; each dimension's min maps to 0 and max
    to 255 (the quantizer hits the full range per dimension)."""
    from pgcdc_spark.queries.llm_similarity import emb_quantize_int8

    out = emb_quantize_int8(spark, sf_smoke)
    codes = out.select(
        F.explode(F.split("codes", ":").cast("array<int>")).alias("c")
    )
    stats = codes.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).first()
    assert stats.lo == 0
    assert stats.hi == 255


# --- sequence packing --------------------------------------------------------


def test_pack_sequences_conserves_tokens(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    expected = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("toks"),
        F.count(F.lit(1)).alias("docs"),
    ).first()
    packs = _df("docs_pack_sequences", spark, sf_smoke)
    got = packs.agg(
        F.sum("pack_tokens").alias("toks"), F.sum("n_docs").alias("docs")
    ).first()
    assert got.toks == expected.toks and got.docs == expected.docs
    assert packs.filter(F.col("pack_id") < 0).count() == 0


def test_short_docs_do_not_crash_ngram_queries(spark, tmp_path):
    """1-token and empty docs must not error the bigram/trigram queries
    (sequence(1, 0) counts DOWN through 0; element_at(w, 0) raises).
    Fixture docs are all >=10 tokens, so this needs its own tiny table."""
    sf = str(tmp_path)
    rows = [
        (0, "", "en", "src1", 0),
        (1, "one", "en", "src1", 3),
        (2, "two tokens", "en", "src1", 10),
        (3, "exactly three tokens here", "en", "src0", 24),
        (4, "a longer document with plenty of tokens to form trigrams", "en", "src2", 57),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.parquet(f"{sf}/documents.parquet")

    bigrams = _df("docs_top_bigrams", spark, sf).collect()
    assert {r["bigram"] for r in bigrams} >= {"two tokens"}
    # must not raise; doc 0/1 contribute no bigrams
    assert all(r["n"] >= 1 for r in bigrams)

    decontam = _df("docs_decontam_overlap", spark, sf).collect()
    assert isinstance(decontam, list)  # no runtime error is the assertion


def test_verified_pairs_cover_all_candidates(spark, sf_smoke):
    """dedup_verified_pairs must emit exactly the LSH candidate list (one
    row per candidate, verified or not) with exact shingle Jaccard."""
    cand = {(r["doc_a"], r["doc_b"])
            for r in _df("dedup_minhash_lsh", spark, sf_smoke).collect()}
    rows = _df("dedup_verified_pairs", spark, sf_smoke).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == cand
    assert len(rows) == len(cand)
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["verified"] == (r["jaccard"] >= 0.5)


def test_codec_registry_dispatch_and_unregistered_raise(spark):
    """A user-registered codec must be the one mapInPandas executes (the
    snapshot ships in the closure); an unregistered modality must raise
    the plug-in hint, not silently no-op."""
    import pytest

    from pgcdc_spark import multimodal as mm
    from pgcdc_spark.multimodal import extract_features, register_codec

    class UpperCodec:
        def decode(self, payload: bytes) -> bytes:
            return payload.upper()

    df = spark.createDataFrame(
        [(1, "shout", bytearray(b"abc")), (2, "shout", bytearray(b"xyz"))],
        "doc_id LONG, modality STRING, payload BINARY",
    )
    with pytest.raises(Exception, match="no codec registered"):
        extract_features(df, fake=False).collect()

    register_codec("shout", UpperCodec())
    try:
        rows = {r["doc_id"]: r["n_bytes"]
                for r in extract_features(df, fake=False).collect()}
        assert rows == {1: 3, 2: 3}
        # the feature comes from the DECODED (uppercased) bytes: prove the
        # custom codec ran by comparing against the fake (identity) path
        import hashlib
        feat = {r["doc_id"]: r["feature"]
                for r in extract_features(df, fake=False).collect()}
        expected = [b / 255.0 for b in hashlib.md5(b"ABC").digest()[:8]]
        assert feat[1] == pytest.approx(expected)
    finally:
        mm._REGISTRY.pop("shout", None)


# --- shared-subplan (persist) lifecycle --------------------------------------


def test_verified_pairs_releases_persisted_blocks(spark, sf_smoke):
    """verified_candidate_pairs persists two shared subplans; after the
    consuming action, cache.release_shared() must leave ZERO persisted
    RDD blocks behind (delta vs whatever earlier tests pinned) — the
    bench/driver loop must not accumulate blocks across invocations."""
    from pgcdc_spark.cache import release_shared

    release_shared()  # drop anything a prior test leaked
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    df = _df("dedup_verified_pairs", spark, sf_smoke)
    assert df.count() >= 0  # the consuming action
    released = release_shared()
    assert released == 2  # pairs + gated shingle sets
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    assert after <= before  # nothing new left pinned


def test_hll_sketch_bounds_and_union_merge(spark, sf_correct):
    """HLL_4 at default lgK=12 has ~1.6% relative standard error; pin a
    conservative 5% bound against exact distinct counts, and prove the
    stored per-type sketches union to the same estimate as a direct
    global sketch (mergeability is the whole point of storing sketches)."""
    out = {
        r["event_type"]: r["n_users_est"]
        for r in all_queries()["sketch_hll_distinct"].fn(spark, sf_correct).collect()
    }
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(out[et] - n) <= max(0.05 * n, 2.0), (et, out[et], n)
    global_exact = events.select("user_id").distinct().count()
    assert abs(out["__all__"] - global_exact) <= max(0.05 * global_exact, 2.0)
    # direct one-level sketch over all rows == two-level union of stored
    # per-type sketches (register-maxima merge is associative)
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert out["__all__"] == direct


def _ppm_bytes(w, h, pixel_fn):
    body = bytes(
        c for y in range(h) for x in range(w) for c in pixel_fn(x, y)
    )
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + body


def test_ppm_codec_real_decode_features_and_resize(spark):
    """The registry carries REAL decoders: a pure-numpy PPM codec decodes
    to HxWx3, features are true channel statistics, and resize is a real
    nearest-neighbor resample re-encoded as PPM — all through the same
    Arrow mapInPandas plumbing as the stubs."""
    import numpy as np

    from pgcdc_spark.multimodal import (
        PpmImageCodec,
        extract_features,
        register_codec,
        registered_codecs,
        resize_images,
    )

    register_codec("image", PpmImageCodec())  # default, re-registered for isolation
    try:
        # 4x2: left half red, right half blue
        img1 = _ppm_bytes(4, 2, lambda x, y: (255, 0, 0) if x < 2 else (0, 0, 255))
        # 2x2 uniform gray
        img2 = _ppm_bytes(2, 2, lambda x, y: (128, 128, 128))
        mm = spark.createDataFrame(
            [(1, "image", bytearray(img1)), (2, "image", bytearray(img2))],
            "doc_id long, modality string, payload binary",
        )
        feats = {r["doc_id"]: r["feature"]
                 for r in extract_features(mm, fake=False).collect()}
        # doc 1: mean red = mean blue = 127.5/255, green 0; std identical R/B
        assert abs(feats[1][0] - 0.5) < 1e-6  # R mean
        assert feats[1][1] == 0.0             # G mean
        assert abs(feats[1][2] - 0.5) < 1e-6  # B mean
        assert abs(feats[1][3] - 0.5) < 1e-6  # R std (values are 0 or 255)
        # doc 2: uniform -> std 0, mean 128/255
        assert abs(feats[2][0] - 128.0 / 255.0) < 1e-6
        assert feats[2][3] == 0.0 and feats[2][4] == 0.0 and feats[2][5] == 0.0

        resized = {r["doc_id"]: bytes(r["payload"])
                   for r in resize_images(mm, 2, 2, fake=False).collect()}
        # doc 1 at 2x2 keeps one red and one blue column
        dec = PpmImageCodec().decode(resized[1])
        assert dec.shape == (2, 2, 3)
        assert (dec[:, 0] == [255, 0, 0]).all() and (dec[:, 1] == [0, 0, 255]).all()

        # corrupt payloads fail loudly at the decode site
        import pytest as _pytest

        bad = spark.createDataFrame(
            [(3, "image", bytearray(b"P6\n4 2\n255\nshort"))],
            "doc_id long, modality string, payload binary",
        )
        with _pytest.raises(Exception, match="truncated"):
            extract_features(bad, fake=False).collect()
    finally:
        # "image" is a DEFAULT registry entry now — restore, don't pop
        from pgcdc_spark import multimodal as _mm

        _mm._REGISTRY["image"] = PpmImageCodec()
        assert "image" in registered_codecs()


def _square_wave_wav():
    """1 channel, 8000 Hz, 800 samples alternating +0.5 / -0.5."""
    import numpy as np

    from pgcdc_spark.multimodal import DecodedAudio, encode_wav

    s = np.where(np.arange(800) % 2 == 0, 0.5, -0.5).reshape(-1, 1)
    return encode_wav(DecodedAudio(s, 8000))


def test_wav_codec_decode_roundtrip_and_features(spark):
    """The second real codec: WAV/PCM decodes bit-exactly, features are
    true waveform statistics, and corrupt payloads fail loudly — all
    through the same registry + Arrow mapInPandas seam as the image path."""
    import numpy as np
    import pytest

    from pgcdc_spark.multimodal import (
        DecodedAudio,
        WavAudioCodec,
        encode_wav,
        extract_features,
    )

    codec = WavAudioCodec()

    # bit-exact encode->decode round trip (16-bit PCM grid values)
    pcm = (np.arange(-100, 100).reshape(-1, 2)) / 32768.0
    back = codec.decode(encode_wav(DecodedAudio(pcm, 44100)))
    assert back.sample_rate == 44100 and back.n_channels == 2
    assert np.array_equal(back.samples, pcm)

    # feature values on a known square wave: duration 0.1s, rms=peak=0.5,
    # every consecutive pair flips sign -> zcr 799/799 = 1.0, mean 0
    sq = _square_wave_wav()
    silence = encode_wav(DecodedAudio(np.zeros((400, 1)), 8000))
    mm = spark.createDataFrame(
        [(1, "audio", bytearray(sq)), (2, "audio", bytearray(silence))],
        "doc_id long, modality string, payload binary",
    )
    feats = {r["doc_id"]: r["feature"]
             for r in extract_features(mm, fake=False).collect()}
    dur, rms, peak, zcr, mean = feats[1][:5]
    assert dur == pytest.approx(0.1)
    assert rms == pytest.approx(0.5) and peak == pytest.approx(0.5)
    assert zcr == pytest.approx(1.0) and mean == pytest.approx(0.0)
    assert feats[2][1] == 0.0 and feats[2][2] == 0.0  # silence: rms=peak=0

    # strict parser: corrupt payloads raise at the decode site
    with pytest.raises(ValueError, match="RIFF"):
        codec.decode(b"not a wav")
    with pytest.raises(ValueError, match="truncated"):
        codec.decode(sq[:60])  # data chunk declares more bytes than remain
    with pytest.raises(ValueError, match="missing"):
        codec.decode(sq[:40])  # cut between chunks: no data chunk at all
    # 8-bit float format id rejected
    bad_fmt = bytearray(sq)
    bad_fmt[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="PCM only"):
        codec.decode(bytes(bad_fmt))


def test_wav_linear_resample_exact_values():
    """Downsample 2:1 of a linear ramp hits the exact source samples;
    upsample interpolates midpoints exactly (linear signal)."""
    import numpy as np

    from pgcdc_spark.multimodal import DecodedAudio, resample_linear

    ramp = (np.arange(16, dtype=np.float64) / 32.0).reshape(-1, 1)
    aud = DecodedAudio(ramp, 8000)

    down = resample_linear(aud, 4000)
    assert down.n_samples == 8 and down.sample_rate == 4000
    assert np.array_equal(down.samples[:, 0], ramp[::2, 0])

    up = resample_linear(aud, 16000)
    assert up.n_samples == 32
    # position k maps to source k/2; odd k = midpoint of a linear ramp,
    # except past the last source sample where interp clamps
    expect = np.minimum(np.arange(32) / 2.0, 15.0) / 32.0
    assert np.allclose(up.samples[:, 0], expect)


def test_mixed_modality_single_pass_dispatch(spark, sf_smoke):
    """documents_as_mixed_multimodal + extract_features: one mapInPandas
    pass dispatches text -> md5 stand-in, image -> channel stats, audio ->
    waveform stats, keyed purely by the decoded object type."""
    from pgcdc_spark.multimodal import (
        WavAudioCodec,
        audio_feature,
        documents_as_mixed_multimodal,
        extract_features,
        _synth_audio,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    mixed = documents_as_mixed_multimodal(docs)
    by_mod = {r["modality"]: r["n"] for r in
              mixed.groupBy("modality").count().withColumnRenamed("count", "n").collect()}
    assert set(by_mod) == {"text", "image", "audio"}

    feats = extract_features(mixed, fake=False)
    rows = feats.collect()
    assert len(rows) == docs.count()
    sample = {r["doc_id"]: r for r in rows}
    # pick one audio doc and recompute its feature locally from the synth
    aud_id = next(r["doc_id"] for r in rows if r["modality"] == "audio")
    expected = audio_feature(WavAudioCodec().decode(_synth_audio(int(aud_id))))
    got = list(sample[aud_id]["feature"])
    # feature column is array<float>: float32 storage, so ~1e-6 tolerance
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, expected)), (got, expected)
    # and an image doc routes through the raster branch (8-dim, last two
    # are h/4096, w/4096 -> tiny but nonzero)
    img_id = next(r["doc_id"] for r in rows if r["modality"] == "image")
    img_feat = list(sample[img_id]["feature"])
    assert len(img_feat) == 8 and img_feat[6] > 0 and img_feat[7] > 0


def test_extract_features_quarantine_dead_letters(spark):
    """on_error='quarantine': corrupt payloads (strict-codec ValueError)
    and unregistered modalities (NotImplementedError) become dead-letter
    rows — NULL feature + the failure message — while good rows carry
    their exact features; default mode still fails the stage; bugs
    (non-ValueError/NotImplementedError) are never swallowed."""
    import pytest

    from pgcdc_spark.multimodal import (
        MM_FEATURE_Q_SCHEMA,
        PpmImageCodec,
        extract_features,
        image_feature,
        _synth_image,
    )

    good_ppm = _synth_image(1)
    mm = spark.createDataFrame(
        [
            (1, "image", bytearray(good_ppm)),
            (2, "image", bytearray(b"P6\n4 2\n255\nshort")),   # truncated raster
            (3, "video", bytearray(b"\x00\x01")),               # no codec
            (4, "text", bytearray(b"hello")),
        ],
        "doc_id long, modality string, payload binary",
    )

    out = extract_features(mm, fake=False, on_error="quarantine")
    assert out.schema == MM_FEATURE_Q_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4

    # good rows unharmed, exact features
    want = image_feature(PpmImageCodec().decode(good_ppm))
    assert rows[1]["error"] is None
    assert rows[1]["feature"] == pytest.approx(want, abs=1e-6)
    assert rows[4]["error"] is None and rows[4]["feature"] is not None

    # dead letters: NULL feature + typed message
    assert rows[2]["feature"] is None and "ValueError" in rows[2]["error"]
    assert "truncated" in rows[2]["error"]
    assert rows[3]["feature"] is None and "NotImplementedError" in rows[3]["error"]
    assert "no codec registered" in rows[3]["error"]

    # default mode still raises on the same inputs
    with pytest.raises(Exception, match="truncated"):
        extract_features(mm.filter("doc_id = 2"), fake=False).collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_features(mm, fake=False, on_error="bogus")


def test_sharded_assignment_equivalence(spark, sf_correct):
    """The shuffle-sharded coarse-quantizer assignment (the
    past-the-broadcast-bound fallback, VERDICT r11 'what's wrong' #1) is
    row-for-row IDENTICAL to the broadcast path: same pairs scored
    exactly once, same exact-double argmax, same lowest-cid tiebreak.
    Plan shape: the centroid join is a pinned ShuffledHashJoin — no
    BroadcastHashJoin anywhere, since the whole point is the quantizer
    not fitting a broadcast."""
    import contextlib
    import io

    from pgcdc_spark.catalog import load
    from pgcdc_spark.queries.llm_similarity import ivf_cell_assignments

    (emb,) = load(spark, sf_correct, "embeddings")
    base = ivf_cell_assignments(emb).select("vec_id", "cid")
    shard = ivf_cell_assignments(emb, assignment_shards=4)
    got = shard.select("vec_id", "cid")
    assert {(r["vec_id"], r["cid"]) for r in base.collect()} == {
        (r["vec_id"], r["cid"]) for r in got.collect()
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        shard.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # n_shards=1 (or None) keeps the broadcast path — the fallback is
    # opt-in past the documented |C| x d x 8B threshold
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        ivf_cell_assignments(emb, assignment_shards=1).explain("formatted")
    assert "BroadcastHashJoin" in buf2.getvalue() or \
        "BroadcastNestedLoopJoin" in buf2.getvalue()


def test_sharded_probe_path_equivalence(spark, sf_correct):
    """The k>1 (PROBE) form of the sharded assignment — what
    AnnIndex.probe runs when the index was built past the broadcast
    budget — returns the same (id, cell) rows as the broadcast
    nearest-cells, and its quantizer join is still the pinned shuffle
    join (an index whose quantizer outgrew the broadcast at build time
    must not re-ship it as one at serving time)."""
    import contextlib
    import io

    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.functions.vectors import norm_fold_expr
    from pgcdc_spark.queries.llm_similarity import (
        ivf_centroids, nearest_cells, nearest_cells_sharded)

    (emb,) = load(spark, sf_correct, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"))
    cent = ivf_centroids(base)
    q = base.filter("vec_id < 16")
    for nprobe in (2, 3):
        want = {(r["vec_id"], r["cid"]) for r in
                nearest_cells(q, cent, "vec_id", nprobe).collect()}
        sharded = nearest_cells_sharded(q, cent, "vec_id", 4, k=nprobe)
        assert {(r["vec_id"], r["cid"])
                for r in sharded.collect()} == want and want
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sharded.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan


def test_ivf_probe_profile_internal_consistency(spark, sf_smoke):
    """The operating curve's two cost models must agree: the cheap
    pre-pair bound (cell sizes joined to probed cells) equals the
    MATERIALIZED candidate count at every (query, nprobe) level, and
    recall@k is non-decreasing in nprobe (probing more cells can only
    add candidates)."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.functions.vectors import norm_fold_expr
    from pgcdc_spark.queries.llm_similarity import (
        _N_QUERIES, _PROFILE_NPROBES, ivf_cell_assignments, ivf_centroids)
    from pgcdc_spark.queries import all_queries

    prof = {(r["qid"], r["nprobe"]): r
            for r in all_queries()["emb_ivf_probe_profile"]
            .fn(spark, sf_smoke).collect()}

    # independent materialized count: assignment joined to ranked cells
    (emb,) = load(spark, sf_smoke, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"))
    cent = ivf_centroids(base)
    asg = ivf_cell_assignments(emb).select("vec_id", "cid")
    from pyspark.sql import Window

    from pgcdc_spark.functions.vectors import dot_fold_expr
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
        F.col("n").alias("qn"))
    scored = q.crossJoin(F.broadcast(cent)).select(
        "qid", "cid",
        (dot_fold_expr("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("c"))
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("cid"))
    probe = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max(_PROFILE_NPROBES)).select("qid", "cid", "rn")
    cand = asg.join(probe, "cid").filter(F.col("vec_id") != F.col("qid"))
    for p in _PROFILE_NPROBES:
        got = {r["qid"]: r["n"] for r in cand.filter(F.col("rn") <= p)
               .groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()}
        for qid, n in got.items():
            assert prof[(qid, p)]["n_candidates"] == n, (qid, p)
    # recall monotone in nprobe
    qids = {k[0] for k in prof}
    for qid in qids:
        seq = [prof[(qid, p)]["recall_at_k"] for p in _PROFILE_NPROBES]
        assert seq == sorted(seq), (qid, seq)


# --- corpus-level line dedup (C4/RefinedWeb keep-first) ---------------------


def test_line_dedup_matches_first_occurrence_model(spark, sf_smoke):
    """Independent dict-model replay of the keep-first rule: walk all
    (doc_id, line_idx) occurrences in global order, keep a line's first
    occurrence only, and rebuild every document — the engine's rewrite
    must match the model doc-for-doc (counts AND reassembled text)."""
    out = {r["doc_id"]: r for r in _df("docs_line_dedup", spark, sf_smoke).collect()}
    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    W = 8
    occ = []
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        w = r["text"].split(" ")
        for i in range(0, len(w), W):
            occ.append((r["doc_id"], i // W, " ".join(w[i : i + W])))
    seen: set[str] = set()
    model: dict[int, dict] = {}
    for doc_id, idx, line in occ:  # already in (doc_id, line_idx) order
        m = model.setdefault(doc_id, {"n_lines": 0, "kept": []})
        m["n_lines"] += 1
        if line not in seen:
            seen.add(line)
            m["kept"].append(line)
    assert set(out) == set(model)
    for doc_id, m in model.items():
        got = out[doc_id]
        assert got["n_lines"] == m["n_lines"], doc_id
        assert got["n_removed"] == m["n_lines"] - len(m["kept"]), doc_id
        assert got["text_clean"] == " ".join(m["kept"]), doc_id
    # the rule must actually fire at this scale (not vacuously green)
    assert any(r["n_removed"] > 0 for r in out.values())
    # untouched docs round-trip byte-identical
    orig = {r["doc_id"]: r["text"] for r in docs}
    clean = [r for r in out.values() if r["n_removed"] == 0]
    assert clean and all(r["text_clean"] == orig[r["doc_id"]] for r in clean)


# --- contrastive triplet mining ---------------------------------------------


def test_triplet_mining_matches_numpy_brute_force(spark, sf_smoke):
    """Cross-validate ids/ranks against a float64 numpy recompute: the
    positive is the top same-label neighbor, the negatives are exactly
    the top-5 different-label neighbors in (cosine desc, vec_id) order,
    and margin == pos_cos - neg_cos."""
    import numpy as np

    rows = _df("emb_triplet_mining", spark, sf_smoke).collect()
    emb = (
        spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb}
    labels = {r["vec_id"]: r["label"] for r in emb}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r["qid"], []).append(r)
    assert set(by_anchor) == {v for v in vecs if v < 8}
    for qid, got in by_anchor.items():
        scored = [
            (cos(vecs[qid], vecs[v]), v)
            for v in vecs
            if v != qid
        ]
        same = sorted(
            [(c, v) for c, v in scored if labels[v] == labels[qid]],
            key=lambda t: (-t[0], t[1]),
        )
        diff = sorted(
            [(c, v) for c, v in scored if labels[v] != labels[qid]],
            key=lambda t: (-t[0], t[1]),
        )
        got.sort(key=lambda r: r["rank"])
        assert [r["neg_id"] for r in got] == [v for _, v in diff[:5]], qid
        assert all(r["pos_id"] == same[0][1] for r in got), qid
        for r in got:
            assert abs(r["margin"] - (r["pos_cos"] - r["neg_cos"])) < 1e-12
            assert labels[r["neg_id"]] != labels[qid]
            assert labels[r["pos_id"]] == labels[qid]
        # ranks are 1..5 with cosine non-increasing
        assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
        negs = [r["neg_cos"] for r in got]
        assert negs == sorted(negs, reverse=True)


def test_triplet_mining_singleton_label_keeps_anchor(spark, tmp_path):
    """An anchor whose label has no other member still emits its hard
    negatives — with NULL positive and NULL margin (LEFT join), rather
    than silently dropping the anchor."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (
            i,
            [1.0, float(i + 1), float((i + 1) ** 2 % 7), float(i % 3)],
            99 if i == 0 else (1 + i % 2),
        )
        for i in range(10)
    ]
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = _df("emb_triplet_mining", spark, str(tmp_path)).collect()
    a0 = [r for r in out if r["qid"] == 0]
    assert len(a0) == 5
    assert all(r["pos_id"] is None and r["margin"] is None for r in a0)
    others = [r for r in out if r["qid"] != 0]
    assert others and all(r["pos_id"] is not None for r in others)


def test_ann_root_session_scope_knob(tmp_path, monkeypatch):
    """PGCDC_ANN_CACHE=0 (the bench's integrity mode, r13 verdict item 1)
    scopes the ANN index artifact to the PROCESS: the root moves under a
    per-session scratch dir (so no run can inherit an index a previous
    run left in the shared temp root), while repeated calls within the
    session still agree (the warm-up build serves the measured probes).
    Without the knob the persistent per-user root is unchanged."""
    import pgcdc_spark.queries.llm_extra as lx

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    with open(os.path.join(sf_dir, "embeddings.parquet"), "w") as f:
        f.write("x")

    monkeypatch.delenv("PGCDC_ANN_CACHE", raising=False)
    persistent = lx._ann_root(sf_dir, "full")

    monkeypatch.setenv("PGCDC_ANN_CACHE", "0")
    monkeypatch.setattr(lx, "_ANN_SESSION_ROOT", None)
    a = lx._ann_root(sf_dir, "full")
    b = lx._ann_root(sf_dir, "full")
    assert a == b, "same session must reuse the same build"
    assert a != persistent
    assert os.path.dirname(a) == lx._ANN_SESSION_ROOT
    assert os.path.isdir(lx._ANN_SESSION_ROOT)
    # distinct kinds/corpora stay distinct inside the session root
    assert lx._ann_root(sf_dir, "incr") != a

    # a "new process" (fresh module state) gets a DIFFERENT scratch root
    monkeypatch.setattr(lx, "_ANN_SESSION_ROOT", None)
    assert lx._ann_root(sf_dir, "full") != a
