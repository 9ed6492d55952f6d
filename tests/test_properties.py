"""Property-based tests (SURVEY.md §5.2 item 4) — invariants that must
hold for ANY input, not just the golden fixtures:

- CDC upsert is a pure function of the SET of changes: permutation and
  duplication of the log cannot change the materialized state;
- salted join is row-identical to the plain join for arbitrary tables;
- exact dedup keeps exactly one representative per distinct text and
  counts every copy.

Inputs are small (Spark job per example is the cost driver) but the
generator explores key collisions, delete-then-reinsert orders, empty
groups, and duplicated rows — the shapes the fixtures can't enumerate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pgcdc_spark.cdc.upsert import latest_state
from pgcdc_spark.operators.salted import salted_join

# one change: (key in 0..3, op, lsn unique-ified by index, payload)
_change = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=99),
)

_SETTINGS = dict(
    max_examples=12,  # each example runs Spark jobs; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _mk_log(spark, changes):
    # lsn made unique (and total) by appending the position as a tiebreak
    rows = [
        (k, op, f"0/{lsn:04X}{i:04X}", f"v{i}")
        for i, (k, op, lsn) in enumerate(changes)
    ]
    return spark.createDataFrame(rows, "id LONG, op STRING, lsn STRING, val STRING")


@given(changes=st.lists(_change, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_upsert_invariant_under_permutation_and_duplication(spark, changes):
    log = _mk_log(spark, changes)
    base = latest_state(log, keys=["id"], order_by=["lsn"])
    shuffled = latest_state(
        log.orderBy(F.rand(seed=7)).repartition(5), keys=["id"], order_by=["lsn"]
    )
    duplicated = latest_state(log.union(log), keys=["id"], order_by=["lsn"])
    want = sorted(map(tuple, base.collect()))
    assert sorted(map(tuple, shuffled.collect())) == want
    assert sorted(map(tuple, duplicated.collect())) == want
    # a key whose LAST change (by the same lsn total order the engine
    # uses) is a delete must be absent
    winner = {}
    for i, (k, op, lsn) in enumerate(changes):
        key_lsn = f"0/{lsn:04X}{i:04X}"
        if k not in winner or key_lsn > winner[k][0]:
            winner[k] = (key_lsn, op)
    live = {r["id"] for r in base.collect()}
    for k, (_, op) in winner.items():
        assert (k in live) == (op != "D")


@given(
    big=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                 min_size=0, max_size=20),
    dim=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
)
@settings(**_SETTINGS)
def test_salted_join_equivalence_property(spark, big, dim):
    bdf = spark.createDataFrame(big, "k LONG, payload LONG") if big else \
        spark.createDataFrame([], "k LONG, payload LONG")
    ddf = spark.createDataFrame([(k, f"v{k}") for k in dim], "k LONG, val STRING") \
        if dim else spark.createDataFrame([], "k LONG, val STRING")
    plain = sorted(map(tuple, bdf.join(ddf, "k").collect()))
    salted = sorted(map(tuple, salted_join(bdf, ddf, "k", n_salts=4).collect()))
    assert salted == plain


@given(texts=st.lists(st.sampled_from(["a", "b", "a b", "c c", ""]),
                      min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_exact_dedup_partition_property(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    out = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # one group per distinct text; copies all accounted for; keeper is the
    # minimum doc_id bearing that text
    assert len(out) == len(set(texts))
    assert sum(r["n"] for r in out) == len(texts)
    for r in out:
        keeper_text = texts[r["keep"]]
        assert r["keep"] == min(i for i, t in enumerate(texts) if t == keeper_text)


def test_upsert_90pct_single_key_skew(spark):
    """The classic CDC hazard: one hot key receives 90% of the changelog.
    Correctness must hold and the winner must be the max-lsn image for
    every key — including the hot one — regardless of input partitioning."""
    import random

    import pyspark.sql.functions as F

    from pgcdc_spark.cdc.upsert import latest_state

    rng = random.Random(11)
    rows = []
    for lsn in range(2000):
        key = 0 if rng.random() < 0.9 else rng.randrange(1, 50)
        op = "D" if rng.random() < 0.05 else "U"
        rows.append((key, lsn, op, f"v{lsn}"))
    rng.shuffle(rows)
    changes = spark.createDataFrame(
        rows, "k LONG, lsn LONG, op STRING, payload STRING"
    ).repartition(16)

    state = {r["k"]: (r["lsn"], r["payload"])
             for r in latest_state(changes, keys=["k"], order_by=["lsn"]).collect()}
    # oracle: per key max lsn, dropped if that winner is a delete
    expect = {}
    for k, lsn, op, payload in rows:
        if k not in expect or lsn > expect[k][0]:
            expect[k] = (lsn, op, payload)
    expect = {k: (lsn, p) for k, (lsn, op, p) in expect.items() if op != "D"}
    assert state == expect


@given(changes=st.lists(_change, min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_scd2_partitions_changelog_and_agrees_with_type1(spark, changes):
    """For ANY changelog: (a) SCD2 emits exactly the non-delete changes as
    versions; (b) per key the intervals chain ordered; (c) the current
    versions equal the Type-1 upsert state computed independently."""
    from pgcdc_spark.cdc.upsert import scd2_history

    log = _mk_log(spark, changes)
    hist = scd2_history(log, keys=["id"], order_by=["lsn"]).collect()
    rows = sorted(map(tuple, log.collect()))
    n_updates = sum(1 for r in rows if r[1] != "D")
    assert len(hist) == n_updates

    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(r)
    # replay in python: per key, order by lsn; valid_to = next change's lsn
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        key_changes = sorted(r for r in rows if r[0] == k)  # not lsn-sorted
        key_lsns = sorted(r[2] for r in rows if r[0] == k)
        for v in versions:
            assert v["valid_from"] == v["lsn"]
            later = [l for l in key_lsns if l > v["lsn"]]
            want_to = later[0] if later else None
            assert v["valid_to"] == want_to
            assert v["is_current"] == (want_to is None)

    current = {
        r["id"]: (r["lsn"], r["val"]) for r in hist if r["is_current"]
    }
    t1 = {
        r["id"]: (r["lsn"], r["val"])
        for r in latest_state(log, keys=["id"], order_by=["lsn"]).collect()
    }
    assert current == t1


# --- as-of join vs pandas.merge_asof -----------------------------------------

_asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=10
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=10
)


@given(left=_asof_left, right=_asof_right,
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       tolerance=st.sampled_from([None, 7]))
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, tolerance):
    """The engine's as-of join must agree with pandas.merge_asof on
    arbitrary keyed event sets, for every direction, with and without
    tolerance — including duplicate timestamps on both sides (the
    operator's documented tiebreaks mirror pandas' sorted-input pick)."""
    import pandas as pd

    from pgcdc_spark.operators.asof import asof_join

    lrows = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    rrows = [(100 + i, k, ts) for i, (k, ts) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "lid LONG, k LONG, ts LONG")
    rdf = spark.createDataFrame(rrows, "rid LONG, k LONG, ts LONG")

    got_rows = asof_join(
        ldf, rdf, key="k", left_ts="ts", right_ts="ts",
        right_payload=["rid"], tiebreak="rid",
        direction=direction, tolerance=tolerance,
    ).collect()
    got = {r["lid"]: r["rid_asof"] for r in got_rows}

    lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values(
        ["ts", "lid"], kind="stable")
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values(
        ["ts", "rid"], kind="stable")
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction=direction,
        tolerance=tolerance, suffixes=("", "_r"),
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want, (direction, tolerance, lrows, rrows)


# --- MERGE INTO vs a reference model ------------------------------------------

_merge_target = st.dictionaries(
    st.integers(0, 5), st.floats(min_value=-100, max_value=100,
                                 allow_nan=False, allow_infinity=False),
    min_size=0, max_size=6,
)
_merge_source = st.dictionaries(
    st.integers(0, 7),
    st.tuples(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        st.booleans(),
    ),
    min_size=0, max_size=8,
)


@given(target=_merge_target, source=_merge_source, nbs_delete=st.booleans())
@settings(**_SETTINGS)
def test_merge_into_matches_reference_model(spark, target, source, nbs_delete):
    """All four MERGE branches against a plain-Python model for arbitrary
    key overlaps: matched update / matched delete-when-flag, not-matched
    insert, optional not-matched-by-source delete."""
    from pgcdc_spark.operators.merge import S, T, merge_into

    if not target and not source:
        return
    tdf = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [], "id LONG, bal DOUBLE"
    ) if target else spark.createDataFrame([], "id LONG, bal DOUBLE")
    sdf = spark.createDataFrame(
        [(k, d, p) for k, (d, p) in source.items()] or [],
        "id LONG, delta DOUBLE, purge BOOLEAN",
    ) if source else spark.createDataFrame([], "id LONG, delta DOUBLE, purge BOOLEAN")

    out = merge_into(
        tdf, sdf, on=["id"],
        when_matched_update={"bal": T("bal") + S("delta")},
        when_matched_delete=S("purge"),
        when_not_matched_insert={"bal": S("delta")},
        when_not_matched_by_source_delete=nbs_delete,
    )
    got = {r["id"]: r["bal"] for r in out.collect()}

    want = {}
    for k, v in target.items():
        if k in source:
            d, p = source[k]
            if not p:
                want[k] = v + d
        elif not nbs_delete:
            want[k] = v
    for k, (d, p) in source.items():
        if k not in target:
            want[k] = d
    assert got == want, (target, source, nbs_delete)


# --- codec robustness: corrupt payloads fail as ValueError, never worse ------

_wav_seed = None


def _valid_wav():
    global _wav_seed
    if _wav_seed is None:
        import numpy as np

        from pgcdc_spark.multimodal import DecodedAudio, encode_wav

        s = (np.arange(64) / 64.0).reshape(-1, 2)
        _wav_seed = encode_wav(DecodedAudio(s, 8000))
    return _wav_seed


@given(data=st.data())
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_codecs_raise_valueerror_only_on_corruption(data):
    """Strict-parser contract: ANY corruption of a WAV/PPM payload either
    still decodes (harmless mutation) or raises ValueError with context —
    never struct.error / IndexError / silent garbage shapes. Exercised
    with random byte flips, truncations, and pure-noise payloads."""
    from pgcdc_spark.multimodal import PpmImageCodec, WavAudioCodec

    codec_kind = data.draw(st.sampled_from(["wav", "ppm"]))
    if codec_kind == "wav":
        codec, seed = WavAudioCodec(), bytearray(_valid_wav())
    else:
        codec = PpmImageCodec()
        seed = bytearray(b"P6\n4 2\n255\n" + bytes(range(24)))

    mode = data.draw(st.sampled_from(["flip", "truncate", "noise"]))
    if mode == "flip":
        n = data.draw(st.integers(1, 4))
        for _ in range(n):
            i = data.draw(st.integers(0, len(seed) - 1))
            seed[i] ^= data.draw(st.integers(1, 255))
        payload = bytes(seed)
    elif mode == "truncate":
        payload = bytes(seed[: data.draw(st.integers(0, len(seed) - 1))])
    else:
        payload = data.draw(st.binary(min_size=0, max_size=80))

    try:
        decoded = codec.decode(payload)
    except ValueError:
        return  # the sanctioned failure mode
    # survived: must be a structurally sane object
    if codec_kind == "wav":
        assert decoded.samples.ndim == 2 and decoded.sample_rate >= 1
    else:
        assert decoded.ndim == 3 and decoded.shape[2] == 3


# --- round-11 operators: ER recall, priority-sampling invariances -------------


def test_er_every_dirty_record_recovers_its_source(spark, sf_smoke):
    """Recall of the blocked matcher: every dirty record derives from a
    clean source by a last-two-char transposition (lev 0 or 2, same
    block by construction), so its true source must appear among its
    candidate pairs — blocking must never lose the true match."""
    from pgcdc_spark.catalog import load
    from pgcdc_spark.queries import all_queries

    pairs = all_queries()["er_candidate_pairs"].fn(spark, sf_smoke).collect()
    golden = all_queries()["er_golden_records"].fn(spark, sf_smoke).collect()
    found = {(r["dirty_custkey"], r["clean_custkey"]) for r in pairs}
    # Expected dirty keys built INDEPENDENTLY of the operator under test
    # (the dirty feed is every 7th customer, surrogate key +1_000_000):
    # deriving them from the pairs output would hide a dirty record that
    # blocking loses entirely — the exact failure this test documents.
    (customer,) = load(spark, sf_smoke, "customer")
    dirty_keys = {
        r["c_custkey"] + 1_000_000
        for r in customer.filter("c_custkey % 7 = 0")
        .select("c_custkey").collect()
    }
    assert dirty_keys, "fixture produced no dirty records"
    for d in sorted(dirty_keys):
        assert (d, d - 1_000_000) in found, f"true source lost for {d}"
    # survivorship picks the minimal-distance candidate; the true source
    # is at lev <= 2, so every golden match must be too
    assert golden and all(r["lev"] <= 2 for r in golden)


def test_priority_sample_invariances(spark, sf_smoke):
    """Priority sampling structure: (a) per-stratum ranks are dense
    1..k; (b) scaling ALL weights by a constant leaves the selected SET
    unchanged (priorities scale uniformly); (c) the sample is invariant
    under repartitioning (no partition-dependent state)."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.queries import all_queries
    from pgcdc_spark.queries.llm_text import _PSAMPLE_K

    fn = all_queries()["docs_priority_sample_strata"].fn
    base = fn(spark, sf_smoke)
    rows = base.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    for lang, ranks in per.items():
        n = len(ranks)
        assert sorted(ranks) == list(range(1, n + 1)), lang
        assert n <= _PSAMPLE_K
    # weight-scale invariance: rebuild with n_tokens * 7
    (docs,) = load(spark, sf_smoke, "documents")
    from pyspark.sql import Window

    h = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")),
                        1, 8), 16, 10).cast("long") % F.lit(1073741824)
    )
    scaled = (
        docs.select(
            "doc_id", "lang",
            (F.size(F.split("text", " ")) * 7).alias("w"), h.alias("h"))
        .filter(F.col("w") >= 7)
        .select(
            "doc_id", "lang",
            (F.col("w").cast("double") * F.lit(1073741824.0)
             / (F.lit(2) * F.col("h") + F.lit(1)).cast("double"))
            .alias("priority"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("priority").desc(), F.col("doc_id"))
    scaled_ids = {
        (r["lang"], r["doc_id"])
        for r in scaled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PSAMPLE_K).collect()
    }
    assert {(r["lang"], r["doc_id"]) for r in rows} == scaled_ids
    # partition invariance
    again = {(r["lang"], r["doc_id"]) for r in fn(spark, sf_smoke).collect()}
    assert again == {(r["lang"], r["doc_id"]) for r in rows}


def test_zorder_cells_are_small_rectangles(spark, sf_smoke):
    """The layout-cell contract: grouping by the Morton key's top byte
    confines each cell to a 1/16 x 1/16 window of the normalized
    (user, time) box — the reason per-file min-max stats stay narrow
    after a z-ordered write."""
    from pgcdc_spark.queries import all_queries

    rows = all_queries()["layout_zorder_key_stats"].fn(spark, sf_smoke).collect()
    lo_u = min(r["u_min"] for r in rows); hi_u = max(r["u_max"] for r in rows)
    lo_t = min(r["t_min"] for r in rows); hi_t = max(r["t_max"] for r in rows)
    span_u = max(hi_u - lo_u, 1); span_t = max(hi_t - lo_t, 1)
    for r in rows:
        # 16 of 256 normalized cells per dim + 1-cell quantization slack
        assert (r["u_max"] - r["u_min"]) <= span_u * 17 / 256 + 1, r
        assert (r["t_max"] - r["t_min"]) <= span_t * 17 / 256 + 1, r


# --- v2 streamed wire round-trip: the in-segment xid strip ---------------------
# Protocol v2 prefixes EVERY in-segment frame with the Int32 xid — DML,
# logical-decoding Message ('M'), and Type ('Y') alike. The decoder must
# strip it before the shared v1 parse; if it doesn't, _parse_change reads
# the xid's high byte where it expects the 'M' flags byte, so the tag
# becomes a function of the xid value instead of the wire flag. The xids
# below straddle 2**24 exactly so that high byte takes 0 AND 1 across
# examples — either polarity of the bug flips at least one tag.

_RT_XIDS = st.sampled_from([3, 7, 0x01000002, 0x7F000001])

_rt_frame = st.one_of(
    st.tuples(st.sampled_from(["I", "U", "D"]),
              st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("M"), st.booleans(),
              st.integers(min_value=0, max_value=3)),
    st.just(("Y",)),
)

# (segment xid, frames, wrap frames with a SUB-xid instead of the top xid)
_rt_segment = st.tuples(
    _RT_XIDS, st.lists(_rt_frame, min_size=1, max_size=4), st.booleans())


@given(
    segments=st.lists(_rt_segment, min_size=1, max_size=3,
                      unique_by=lambda s: s[0]),
    plain=st.lists(_rt_frame, min_size=0, max_size=3),
)
@settings(**_SETTINGS)
def test_v2_streamed_decode_round_trips_every_frame_kind(
        spark, segments, plain):
    """For ANY interleaving of streamed segments and plain traffic, every
    decoded row carries (tag, xid, top_xid) derivable from the wire
    bytes alone: DML/'M'/'Y' inside a segment echo their wrapped
    (sub)xid and the segment's top xid; 'M' tags follow the
    transactional wire flag — never the xid; plain frames decode with
    xid None. The in-segment 'M' subset also round-trips through
    decode_logical_messages(streamed=True) byte-for-byte."""
    import struct as _struct

    from pgcdc_spark.cdc.pgoutput import (
        decode_logical_messages, decode_pgoutput_v2, encode_delete,
        encode_insert, encode_logical_message, encode_relation,
        encode_stream_commit, encode_stream_start, encode_stream_stop,
        encode_update, stream_wrap)
    from pyspark.sql.types import LongType, StructField, StructType

    def _frame_bytes(f, xid):
        """(wire bytes [pre-wrap for M], expected tag)"""
        if f[0] == "I":
            return encode_insert(1, [f[1], f[1]]), "insert"
        if f[0] == "U":
            return encode_update(1, [f[1], f[1] + 100]), "update"
        if f[0] == "D":
            return encode_delete(1, [f[1], None]), "delete"
        if f[0] == "M":
            txn, cid = f[1], f[2]
            body = encode_logical_message(
                "p", b"c%d" % cid, lsn=5, transactional=txn, xid=xid)
            return body, ("message" if txn else "message_nontxn")
        return (b"Y" + _struct.pack(">i", 99) + b"public\x00ty\x00",
                "type")

    msgs = [(0, encode_relation(1, "public", "t", ["id", "v"]))]
    lsn = 10
    # expected: lsn -> (tag, xid, top_xid); m_wire: in-segment 'M' rows
    expected, m_wire = {}, {}
    for seg_xid, frames, use_sub in segments:
        msgs.append((lsn, encode_stream_start(seg_xid))); lsn += 1
        wrap_xid = seg_xid + 1000 if use_sub else seg_xid
        for f in frames:
            if f[0] == "M":
                buf, tag = _frame_bytes(f, wrap_xid)  # encodes its own xid
            else:
                buf, tag = _frame_bytes(f, wrap_xid)
                buf = stream_wrap(wrap_xid, buf)
            msgs.append((lsn, buf))
            expected[lsn] = (tag, wrap_xid, seg_xid)
            if f[0] == "M":
                m_wire[lsn] = (f[1], b"c%d" % f[2])
            lsn += 1
        msgs.append((lsn, encode_stream_stop())); lsn += 1
        msgs.append((lsn, encode_stream_commit(seg_xid, lsn, lsn, 5)))
        lsn += 1
    for f in plain:
        buf, tag = _frame_bytes(f, None)
        msgs.append((lsn, buf))
        expected[lsn] = (tag, None, None)
        lsn += 1

    df = spark.createDataFrame(
        [(l, bytearray(p)) for l, p in msgs], "lsn long, payload binary")
    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])
    decoded = decode_pgoutput_v2(df, schema, bin_width=8)
    got = {r["lsn"]: (r["tag"], r["xid"], r["top_xid"])
           for r in decoded.collect()}
    for l, want in expected.items():
        assert got[l] == want, (l, got[l], want)
    # control rows never leak an xid into the data columns
    ctrl = {l: t for l, (t, _, _) in
            ((r, got[r]) for r in got if r not in expected and r != 0)}
    assert set(ctrl.values()) <= {
        "stream_start", "stream_stop", "stream_commit"}

    if m_wire:
        in_seg = df.filter(F.col("lsn").isin(list(m_wire)))
        mrows = {r["lsn"]: r for r in decode_logical_messages(
            in_seg, streamed=True).collect()}
        for l, (txn, content) in m_wire.items():
            r = mrows[l]
            assert (r["transactional"], r["prefix"], bytes(r["content"]),
                    r["msg_lsn"]) == (txn, "p", content, 5)


# --- v2 verdict semantics: envelope ≡ reference model ---------------------------
# The keep/drop/apply-lsn rules for streamed transactions are the part
# of the v2 consumer contract example tests can't enumerate: which rows
# survive is a joint function of the verdict kind (commit / whole-abort
# / sub-abort + commit / none yet) AND which (sub)xid wrapped each row.
# The model below is the protocol text, restated in ~10 lines of Python.

_VERDICTS = st.sampled_from(
    ["commit", "abort_whole", "sub_abort_then_commit", "in_flight"])

# (frame key, wrap with the sub-xid instead of the top xid)
_v_frame = st.tuples(st.sampled_from(["I", "U", "D", "M"]),
                     st.integers(min_value=0, max_value=3),
                     st.booleans())

_v_segment = st.tuples(_RT_XIDS, st.lists(_v_frame, min_size=1, max_size=4),
                       _VERDICTS)


@given(
    segments=st.lists(_v_segment, min_size=1, max_size=3,
                      unique_by=lambda s: s[0]),
    plain=st.lists(st.tuples(st.sampled_from(["I", "U", "D"]),
                             st.integers(min_value=0, max_value=3)),
                   min_size=0, max_size=2),
)
@settings(**_SETTINGS)
def test_v2_envelope_matches_reference_model(spark, segments, plain):
    """decode_pgoutput_v2 → stream_verdicts → apply_stream_transactions
    must agree with the reference model for ANY verdict interleaving:
    committed rows apply at the COMMIT lsn keyed by top_xid, a
    sub-abort removes exactly the rows the aborted sub-xid wrapped, a
    whole-abort / missing verdict drops the segment, plain rows pass at
    their own lsn."""
    from pgcdc_spark.cdc.pgoutput import (
        apply_stream_transactions, decode_pgoutput_v2, encode_delete,
        encode_insert, encode_logical_message, encode_relation,
        encode_stream_abort, encode_stream_commit, encode_stream_start,
        encode_stream_stop, encode_update, stream_verdicts, stream_wrap)
    from pyspark.sql.types import LongType, StructField, StructType

    def _enc(kind, key, wrap_xid):
        if kind == "I":
            return stream_wrap(wrap_xid, encode_insert(1, [key, key])) \
                if wrap_xid else encode_insert(1, [key, key]), "insert"
        if kind == "U":
            return stream_wrap(wrap_xid, encode_update(1, [key, key + 9])) \
                if wrap_xid else encode_update(1, [key, key + 9]), "update"
        if kind == "D":
            return stream_wrap(wrap_xid, encode_delete(1, [key, None])) \
                if wrap_xid else encode_delete(1, [key, None]), "delete"
        return (encode_logical_message("p", b"x", transactional=True,
                                       xid=wrap_xid), "message")

    msgs = [(0, encode_relation(1, "public", "t", ["id", "v"]))]
    lsn = 10
    # model rows: (original lsn, tag, top_xid or None, wrap_xid or None)
    model_rows, commit_lsn_of, sub_abort_of = [], {}, {}
    for seg_xid, frames, verdict in segments:
        msgs.append((lsn, encode_stream_start(seg_xid))); lsn += 1
        sub = seg_xid + 1000
        for kind, key, use_sub in frames:
            wrap = sub if use_sub else seg_xid
            buf, tag = _enc(kind, key, wrap)
            msgs.append((lsn, buf))
            model_rows.append((lsn, tag, seg_xid, wrap))
            lsn += 1
        msgs.append((lsn, encode_stream_stop())); lsn += 1
        if verdict == "abort_whole":
            msgs.append((lsn, encode_stream_abort(seg_xid, seg_xid)))
            lsn += 1
        elif verdict in ("commit", "sub_abort_then_commit"):
            if verdict == "sub_abort_then_commit":
                msgs.append((lsn, encode_stream_abort(seg_xid, sub)))
                sub_abort_of[seg_xid] = sub
                lsn += 1
            msgs.append((lsn, encode_stream_commit(seg_xid, lsn, lsn, 5)))
            commit_lsn_of[seg_xid] = lsn
            lsn += 1
    for kind, key in plain:
        buf, tag = _enc(kind, key, None)
        msgs.append((lsn, buf))
        model_rows.append((lsn, tag, None, None))
        lsn += 1

    want = set()
    for orig, tag, top, wrap in model_rows:
        if top is None:
            want.add(("%016X/%016X" % (orig, orig), tag))
        elif sub_abort_of.get(top) == wrap:
            continue  # exactly the aborted subtransaction's rows
        elif top in commit_lsn_of:
            want.add(("%016X/%016X" % (commit_lsn_of[top], orig), tag))
        # whole-abort / in-flight: never committed -> dropped

    df = spark.createDataFrame(
        [(l, bytearray(p)) for l, p in msgs], "lsn long, payload binary")
    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])
    env = apply_stream_transactions(
        decode_pgoutput_v2(df, schema, bin_width=8), stream_verdicts(df))
    data_tags = {"insert", "update", "delete", "message"}
    got = {(r["lsn"], r["tag"]) for r in env.collect()
           if r["tag"] in data_tags}
    assert got == want


# --- 2PC verdict semantics: envelope ≡ reference model ---------------------------
# Same model discipline as the v2 streamed property, for the prepared-
# block path: which rows survive is a joint function of the verdict
# (CommitPrepared / RollbackPrepared / still-prepared) AND the stamp
# rule — only transaction-OWNED rows follow the verdict. The block's
# framing rows and any non-transactional 'M' whose WAL lsn falls inside
# the span deliver at their own lsn unconditionally (PostgreSQL decodes
# flags=0 messages immediately; a rolled-back block must not swallow
# them — the r12 decode_pgoutput_2pc stamp fix).

_P_VERDICTS = st.sampled_from(["commit", "rollback", "none"])

# ("I"/"U"/"D", key) | ("M", transactional)
_p_frame = st.one_of(
    st.tuples(st.sampled_from(["I", "U", "D"]),
              st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("M"), st.booleans()),
)

_p_block = st.tuples(_RT_XIDS, st.lists(_p_frame, min_size=1, max_size=4),
                     _P_VERDICTS)


@given(
    blocks=st.lists(_p_block, min_size=1, max_size=3,
                    unique_by=lambda b: b[0]),
    plain=st.lists(st.tuples(st.sampled_from(["I", "U", "D"]),
                             st.integers(min_value=0, max_value=3)),
                   min_size=0, max_size=2),
)
@settings(**_SETTINGS)
def test_2pc_envelope_matches_reference_model(spark, blocks, plain):
    """decode_pgoutput_2pc → prepared_verdicts → apply_stream_transactions
    must agree with the reference model for ANY verdict interleaving:
    committed blocks apply their transaction-owned rows at the
    CommitPrepared lsn, rolled-back / still-prepared blocks drop them,
    framing rows and non-transactional messages pass at their own wire
    lsn regardless of the block's fate, plain rows pass through."""
    from pgcdc_spark.cdc.pgoutput import (
        apply_stream_transactions, decode_pgoutput_2pc, encode_begin_prepare,
        encode_commit_prepared, encode_delete, encode_insert,
        encode_logical_message, encode_prepare, encode_relation,
        encode_rollback_prepared, encode_update, prepared_verdicts)
    from pyspark.sql.types import LongType, StructField, StructType

    def _enc(kind, arg):
        if kind == "I":
            return encode_insert(1, [arg, arg]), "insert"
        if kind == "U":
            return encode_update(1, [arg, arg + 9]), "update"
        if kind == "D":
            return encode_delete(1, [arg, None]), "delete"
        return (encode_logical_message("p", b"x", transactional=arg),
                "message" if arg else "message_nontxn")

    msgs = [(0, encode_relation(1, "public", "t", ["id", "v"]))]
    lsn = 10
    # (original lsn, tag, owning block xid or None)
    model_rows, commit_lsn_of = [], {}
    for xid, frames, verdict in blocks:
        b_lsn = lsn
        msgs.append((lsn, encode_begin_prepare(b_lsn, 0, 0, xid, "g")))
        model_rows.append((lsn, "begin_prepare", None)); lsn += 1
        for f in frames:
            buf, tag = _enc(*f)
            msgs.append((lsn, buf))
            # ONLY transaction-owned rows ride the verdict
            owned = tag in ("insert", "update", "delete", "message")
            model_rows.append((lsn, tag, xid if owned else None))
            lsn += 1
        msgs.append((lsn, encode_prepare(b_lsn, lsn, 0, xid, "g")))
        model_rows.append((lsn, "prepare", None)); lsn += 1
        if verdict == "commit":
            msgs.append((lsn, encode_commit_prepared(lsn, lsn, 0, xid, "g")))
            commit_lsn_of[xid] = lsn
            lsn += 1
        elif verdict == "rollback":
            msgs.append((lsn, encode_rollback_prepared(lsn, lsn, 0, 0,
                                                       xid, "g")))
            lsn += 1
    for kind, key in plain:
        buf, tag = _enc(kind, key)
        msgs.append((lsn, buf))
        model_rows.append((lsn, tag, None))
        lsn += 1

    want = set()
    for orig, tag, owner in model_rows:
        if owner is None:
            want.add(("%016X/%016X" % (orig, orig), tag))
        elif owner in commit_lsn_of:
            want.add(("%016X/%016X" % (commit_lsn_of[owner], orig), tag))
        # rolled-back / still-prepared transaction content: dropped

    df = spark.createDataFrame(
        [(l, bytearray(p)) for l, p in msgs], "lsn long, payload binary")
    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])
    env = apply_stream_transactions(
        decode_pgoutput_2pc(df, schema, bin_width=8), prepared_verdicts(df))
    tags = {"insert", "update", "delete", "message", "message_nontxn",
            "begin_prepare", "prepare"}
    got = {(r["lsn"], r["tag"]) for r in env.collect() if r["tag"] in tags}
    assert got == want


# --- REPLICA IDENTITY key-change routing ≡ reference model ----------------------
# split_key_updates' contract for ANY op sequence: a key-changing update
# retires the old key and lands the new image; same-key and old-image-
# less updates update in place. The model is a dict applied in lsn
# order. Exercises both RI DEFAULT ('K', key-only old image) and FULL
# ('O'), interleaved inserts/deletes, re-use of retired keys, and
# key swaps (a->b while b exists).

_KEYS = st.integers(min_value=0, max_value=3)

_ku_op = st.one_of(
    st.tuples(st.just("I"), _KEYS),
    # (U, old key, new key, has old image, full RI) — PG omits the old
    # image only when the key is unchanged, so has_old=False forces
    # new_key == key in the encoder below
    st.tuples(st.just("U"), _KEYS, _KEYS, st.booleans(), st.booleans()),
    st.tuples(st.just("D"), _KEYS),
)


@given(ops=st.lists(_ku_op, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_key_change_routing_matches_reference_model(spark, ops):
    from pgcdc_spark.cdc.pgoutput import (
        decode_pgoutput, encode_delete, encode_insert, encode_relation,
        encode_update)
    from pgcdc_spark.cdc.transform import apply_pipeline, split_key_updates
    from pgcdc_spark.cdc.upsert import latest_state
    from pyspark.sql.types import LongType, StructField, StructType

    msgs = [(0, encode_relation(1, "public", "t", ["id", "v"]))]
    state: dict[int, int] = {}
    for i, op in enumerate(ops):
        lsn, val = i + 1, 100 + i
        if op[0] == "I":
            _, k = op
            msgs.append((lsn, encode_insert(1, [k, val])))
            state[k] = val
        elif op[0] == "U":
            _, k, nk, has_old, full = op
            if not has_old:
                nk = k  # wire contract: no old image => key unchanged
                msgs.append((lsn, encode_update(1, [nk, val])))
            else:
                old = [k, state.get(k)] if full else [k, None]
                msgs.append((lsn, encode_update(
                    1, [nk, val], old_values=old,
                    old_kind=b"O" if full else b"K")))
                if nk != k:
                    state.pop(k, None)
            state[nk] = val
        else:
            _, k = op
            msgs.append((lsn, encode_delete(
                1, [k, None], old_kind=b"K")))
            state.pop(k, None)

    df = spark.createDataFrame(
        [(l, bytearray(p)) for l, p in msgs], "lsn long, payload binary")
    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])
    env = split_key_updates(decode_pgoutput(df, schema), keys=["id"])
    got = sorted(
        (r["id"], r["v"])
        for r in latest_state(apply_pipeline(env), keys=["id"],
                              order_by=["lsn"]).collect())
    assert got == sorted(state.items())


# --- adapter unification: four wire formats, one state ---------------------------
# pgoutput binary, wal2json v1 transaction docs, wal2json v2 per-change
# objects, and Debezium envelopes are four renderings of the SAME
# logical changelog; for any op sequence the engine must materialize
# the identical state through each adapter (and match the dict model).
# wal2json v1 docs carry up to two changes to exercise the positional
# intra-transaction ordinal; v2 values are emitted as RAW JSON NUMBERS
# (the typed layout) and its hex lsns run past one digit so the padded
# halves must keep WAL order.


@given(ops=st.lists(_ku_op, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_four_adapters_materialize_identical_state(spark, ops):
    import json

    from pgcdc_spark.cdc.debezium import parse_debezium
    from pgcdc_spark.cdc.pgoutput import (
        decode_pgoutput, encode_delete, encode_insert, encode_relation,
        encode_update)
    from pgcdc_spark.cdc.transform import apply_pipeline, split_key_updates
    from pgcdc_spark.cdc.upsert import latest_state
    from pgcdc_spark.cdc.wal2json import parse_wal2json, parse_wal2json_v2
    from pyspark.sql.types import LongType, StructField, StructType

    def v2_cols(pairs):
        return [{"name": n, "type": "bigint", "value": v} for n, v in pairs]

    pg_msgs = [(0, encode_relation(1, "public", "t", ["id", "v"]))]
    w2j_changes, v2_lines, dbz_lines = [], [], []
    state: dict[int, int] = {}
    for i, op in enumerate(ops):
        lsn, val = i + 1, 100 + i
        # offset past 0xF so padded-hex ordering is actually exercised
        v2_lsn = "0/%x" % (lsn + 14) if lsn % 2 else "0/%X" % (lsn + 14)
        if op[0] == "I":
            _, k = op
            pg_msgs.append((lsn, encode_insert(1, [k, val])))
            w2j_changes.append({
                "kind": "insert", "schema": "s", "table": "t",
                "columnnames": ["id", "v"],
                "columnvalues": [str(k), str(val)]})
            v2_lines.append({"action": "I", "schema": "s", "table": "t",
                             "lsn": v2_lsn,
                             "columns": v2_cols([("id", k), ("v", val)])})
            dbz_lines.append({"payload": {
                "op": "c", "source": {"lsn": lsn},
                "after": {"id": k, "v": val}, "before": None}})
            state[k] = val
        elif op[0] == "U":
            _, k, nk, has_old, _full = op
            if not has_old:
                nk = k
                pg_msgs.append((lsn, encode_update(1, [nk, val])))
                w2j_changes.append({
                    "kind": "update", "schema": "s", "table": "t",
                    "columnnames": ["id", "v"],
                    "columnvalues": [str(nk), str(val)]})
                v2_lines.append({
                    "action": "U", "schema": "s", "table": "t",
                    "lsn": v2_lsn,
                    "columns": v2_cols([("id", nk), ("v", val)])})
                dbz_lines.append({"payload": {
                    "op": "u", "source": {"lsn": lsn},
                    "after": {"id": nk, "v": val}, "before": None}})
            else:
                prev = state.get(k)
                pg_msgs.append((lsn, encode_update(
                    1, [nk, val], old_values=[k, None], old_kind=b"K")))
                w2j_changes.append({
                    "kind": "update", "schema": "s", "table": "t",
                    "columnnames": ["id", "v"],
                    "columnvalues": [str(nk), str(val)],
                    "oldkeys": {"keynames": ["id"],
                                "keyvalues": [str(k)]}})
                v2_lines.append({
                    "action": "U", "schema": "s", "table": "t",
                    "lsn": v2_lsn,
                    "columns": v2_cols([("id", nk), ("v", val)]),
                    "identity": v2_cols([("id", k)])})
                dbz_lines.append({"payload": {
                    "op": "u", "source": {"lsn": lsn},
                    "after": {"id": nk, "v": val},
                    "before": {"id": k, "v": prev}}})
                if nk != k:
                    state.pop(k, None)
            state[nk] = val
        else:
            _, k = op
            pg_msgs.append((lsn, encode_delete(1, [k, None], old_kind=b"K")))
            w2j_changes.append({
                "kind": "delete", "schema": "s", "table": "t",
                "oldkeys": {"keynames": ["id"], "keyvalues": [str(k)]}})
            v2_lines.append({"action": "D", "schema": "s", "table": "t",
                             "lsn": v2_lsn,
                             "identity": v2_cols([("id", k)])})
            dbz_lines.append({"payload": {
                "op": "d", "source": {"lsn": lsn},
                "after": None, "before": {"id": k, "v": state.get(k)}}})
            state.pop(k, None)

    schema = StructType([StructField("id", LongType()),
                         StructField("v", LongType())])

    def materialize(env):
        env = split_key_updates(env, keys=["id"])
        rows = latest_state(apply_pipeline(env), keys=["id"],
                            order_by=["lsn"]).collect()
        return sorted((r["id"], r["v"]) for r in rows)

    pg_df = spark.createDataFrame(
        [(l, bytearray(p)) for l, p in pg_msgs], "lsn long, payload binary")
    got_pg = materialize(decode_pgoutput(pg_df, schema))

    # chunk two changes per wal2json doc: positional ordinal exercised
    docs = [
        json.dumps({"lsn": "0/%X" % (i + 1),
                    "change": w2j_changes[2 * i:2 * i + 2]})
        for i in range((len(w2j_changes) + 1) // 2)
    ]
    w2j_df = spark.createDataFrame([(d,) for d in docs], "value string")
    got_w2j = materialize(parse_wal2json(w2j_df, schema))

    # v2: one object per change, B/C frames interleaved (dropped by the
    # control filter), typed JSON values
    v2_texts = ['{"action":"B","lsn":"0/1"}']
    v2_texts += [json.dumps(x) for x in v2_lines]
    v2_texts.append('{"action":"C","lsn":"0/FFFF"}')
    v2_df = spark.createDataFrame([(x,) for x in v2_texts], "value string")
    got_v2 = materialize(parse_wal2json_v2(v2_df, schema))

    dbz_df = spark.createDataFrame(
        [(json.dumps(l),) for l in dbz_lines], "value string")
    got_dbz = materialize(
        parse_debezium(dbz_df, row_schema=schema).drop("_corrupt"))

    want = sorted(state.items())
    assert got_pg == want
    assert got_w2j == want
    assert got_v2 == want
    assert got_dbz == want
