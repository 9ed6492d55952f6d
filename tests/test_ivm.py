"""Incremental materialized-view maintenance: the delta log must track
inserts, updates (including group moves), and deletes exactly; replays
must never double-count; compaction must preserve the view."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pgcdc_spark.streaming.ivm import (
    AggView,
    compact_view,
    read_agg_view,
    start_upsert_stream_with_view,
)
from pgcdc_spark.streaming.pipeline import read_envelope_stream
from pgcdc_spark.streaming.statestore import BucketedStateStore

ROW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("grp", StringType()),
        StructField("val", DoubleType()),
    ]
)

VIEW = AggView("by_grp", group_cols=["grp"], sum_col="val")


def _env(lsn, tag, img=None):
    e = {"lsn": f"0/{lsn:04X}", "tag": tag}
    if tag == "delete":
        e["old"] = img
    elif img is not None:
        e["new"] = img
    return json.dumps(e)


CHUNKS = [
    [
        _env(1, "insert", {"id": 1, "grp": "A", "val": 10.0}),
        _env(2, "insert", {"id": 2, "grp": "A", "val": 5.0}),
        _env(3, "insert", {"id": 3, "grp": "B", "val": 7.0}),
    ],
    [
        _env(4, "update", {"id": 1, "grp": "A", "val": 20.0}),
        _env(5, "delete", {"id": 2, "grp": "A", "val": 5.0}),
    ],
    [
        # group move: B's row migrates to A
        _env(6, "update", {"id": 3, "grp": "A", "val": 9.0}),
    ],
]


def _run(spark, tmp_path, sub):
    src = str(tmp_path / f"src{sub}")
    os.makedirs(src, exist_ok=True)
    for i, lines in enumerate(CHUNKS):
        with open(os.path.join(src, f"c{i}.jsonl"), "w") as f:
            f.write("\n".join(lines))
    state = str(tmp_path / f"state{sub}")
    ckpt = str(tmp_path / f"ckpt{sub}")
    changes = read_envelope_stream(spark, src, ROW_SCHEMA, max_files_per_trigger=1)
    q = start_upsert_stream_with_view(changes, state, ckpt, keys=["id"], view=VIEW)
    q.awaitTermination(240)
    return src, state, ckpt


def _view_rows(spark, state):
    return {
        r["grp"]: (r["sum_val"], r["n_rows"])
        for r in read_agg_view(spark, state, VIEW).collect()
    }


def test_view_tracks_insert_update_delete_and_group_move(spark, tmp_path):
    _, state, _ = _run(spark, tmp_path, "a")
    got = _view_rows(spark, state)
    # final state: id1 (A, 20), id3 (A, 9); id2 deleted; B emptied out
    assert got == {"A": (29.0, 2)}
    # the view must equal a full groupBy over the materialized state
    st = BucketedStateStore(os.path.join(state, "state")).read(spark)
    truth = {
        r["grp"]: (r["s"], r["n"])
        for r in st.filter(F.col("op") != "D")
        .groupBy("grp")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == truth
    # three batches -> three delta partitions
    droot = os.path.join(state, "view_by_grp")
    assert len([d for d in os.listdir(droot) if d.startswith("delta_batch=")]) == 3


def test_view_replay_never_double_counts(spark, tmp_path):
    src, state, ckpt = _run(spark, tmp_path, "b")
    before = _view_rows(spark, state)
    # restart over the same checkpoint with no new data: no-op
    changes = read_envelope_stream(spark, src, ROW_SCHEMA, max_files_per_trigger=1)
    q = start_upsert_stream_with_view(changes, state, ckpt, keys=["id"], view=VIEW)
    q.awaitTermination(240)
    assert _view_rows(spark, state) == before

    # a replayed label against the ALREADY-PUBLISHED state must be a no-op
    # even when foreachBatch hands the batch back (simulated direct call):
    store = BucketedStateStore(os.path.join(state, "state"))
    batch = spark.createDataFrame(
        [("0/0006", "U", 3, "A", 9.0)], "lsn string, op string, id long, grp string, val double"
    )
    calls = []
    out = store.merge(
        batch, keys=["id"], order_by=["lsn"], label="2",
        on_transition=lambda c, n, t: calls.append(1),
    )
    assert out is None and calls == [], "applied label re-ran the transition hook"


def test_view_compaction_preserves_contents(spark, tmp_path):
    _, state, _ = _run(spark, tmp_path, "c")
    before = _view_rows(spark, state)
    compact_view(spark, state, VIEW)
    droot = os.path.join(state, "view_by_grp")
    (base,) = os.listdir(droot)
    assert base.startswith("delta_batch=base-")  # unique publish name
    assert _view_rows(spark, state) == before


def test_compaction_crash_after_commit_recovers(spark, tmp_path, monkeypatch):
    """A crash AFTER the COMMIT flag (mid-delete of old delta partitions)
    must be finished by the next read: the folded base is authoritative
    and no data is lost."""
    import shutil

    import pytest

    _, state, _ = _run(spark, tmp_path, "d")
    before = _view_rows(spark, state)

    monkeypatch.setattr(shutil, "rmtree", _raise_injected)
    with pytest.raises(OSError, match="injected"):
        compact_view(spark, state, VIEW)
    monkeypatch.undo()

    droot = os.path.join(state, "view_by_grp")
    (scratch,) = [d for d in os.listdir(droot) if d.startswith("_compact")]
    assert os.path.isfile(os.path.join(droot, scratch, "COMMIT"))

    # a restarted stream appends a NEW delta between the crash and the
    # recovery; recovery must delete ONLY the recorded victims, never
    # the post-crash delta (round-5 review: unscoped recovery lost it)
    from decimal import Decimal

    late = spark.createDataFrame([("Z", Decimal("4.0"), 1)],
                                 "grp string, sum_delta decimal(38,6), count_delta long")
    late.write.mode("overwrite").parquet(os.path.join(droot, "delta_batch=99"))

    # the next read recovers: old contents + the late delta, victims gone
    got = _view_rows(spark, state)
    assert got.pop("Z") == (4.0, 1)
    assert got == before
    late_d, base_d = sorted(os.listdir(droot))
    assert late_d == "delta_batch=99" and base_d.startswith("delta_batch=base-")


def _raise_injected(path, **kw):
    raise OSError(f"injected crash removing {path}")


def test_compaction_crash_before_commit_is_discarded(spark, tmp_path):
    """An incomplete fold (no COMMIT flag) must never become state. A
    READER must leave the scratch dir alone (it may belong to an
    in-flight compactor — deleting it would abort live maintenance,
    round-6 review); the WRITER discards its own stale scratch on the
    next compaction. Either way the delta log stays the source of
    truth."""
    _, state, _ = _run(spark, tmp_path, "e")
    before = _view_rows(spark, state)
    droot = os.path.join(state, "view_by_grp")
    junk = os.path.join(droot, "_compact", "base")
    os.makedirs(junk)
    with open(os.path.join(junk, "partial.parquet"), "w") as f:
        f.write("garbage")
    # reader: correct contents, scratch untouched
    assert _view_rows(spark, state) == before
    assert os.path.isdir(os.path.join(droot, "_compact"))
    # writer: discards the stale scratch and compacts normally
    compact_view(spark, state, VIEW)
    (base,) = os.listdir(droot)
    assert base.startswith("delta_batch=base-")
    assert _view_rows(spark, state) == before


def test_compaction_crash_after_rename_keeps_published_base(spark, tmp_path):
    """Post-rename crash window (round-6 review, HIGH): on every
    compaction after the first, 'delta_batch=base' is itself in the
    recorded victim list AND is the rename destination. A crash between
    the rename and the scratch cleanup leaves COMMIT behind; recovery
    must NOT re-delete the just-published base (the entire folded view
    state) — base absent from _compact means the swap completed."""
    import json

    _, state, _ = _run(spark, tmp_path, "f")
    before = _view_rows(spark, state)
    droot = os.path.join(state, "view_by_grp")
    compact_view(spark, state, VIEW)  # first compaction -> delta_batch=base-<u>
    (base,) = os.listdir(droot)
    # legacy-layout post-rename crash state, reconstructed exactly: a
    # fixed-name _compact whose bare-array COMMIT lists the published
    # name as a victim and whose base is gone (swap completed). The new
    # protocol cannot produce this (publish names are unique and never
    # victims), but recovery of pre-upgrade state must not lose the view.
    tmp = os.path.join(droot, "_compact")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "COMMIT"), "w") as f:
        json.dump([base], f)
    assert _view_rows(spark, state) == before  # recovery must not lose it
    assert not os.path.isdir(tmp)
    assert os.listdir(droot) == [base]


def test_merge_rejects_label_older_than_retained_window(spark, tmp_path):
    """A label older than a FULL applied-label window is ambiguous (it may
    have been applied and evicted) — merge must fail loudly, never
    silently re-apply (ADVICE r4: double-counted IVM deltas)."""
    import pytest

    store = BucketedStateStore(str(tmp_path / "stlw"), n_buckets=4)
    batch = spark.createDataFrame(
        [("0/01", "I", 1, "A", 1.0)],
        "lsn string, op string, id long, grp string, val double",
    )
    store.merge(batch, keys=["id"], order_by=["lsn"], label="100")
    man = store.current_manifest()
    # simulate a long-lived stream: a full 64-label window [100..163]
    store._publish_manifest(man["buckets"], [str(x) for x in range(100, 164)])

    with pytest.raises(ValueError, match="older than the oldest retained"):
        store.merge(batch, keys=["id"], order_by=["lsn"], label="50")
    # a non-numeric label in a FULL window is always ambiguous (an evicted
    # one is indistinguishable from a never-applied one) — raise, never
    # silently re-merge (round-6 review: the old path fell through)
    with pytest.raises(ValueError, match="non-numeric label"):
        store.merge(batch, keys=["id"], order_by=["lsn"], label="2026-01-x")
    # newer labels and in-window replays still behave
    assert store.merge(batch, keys=["id"], order_by=["lsn"], label="120") is None
    assert store.merge(batch, keys=["id"], order_by=["lsn"], label="200") is not None


def test_version_label_roundtrip():
    """version_label must invert commit's v-<label>-<uuid8> naming for
    labels that themselves contain dashes (round-6 review: a split-based
    parse broke the MinMax replay gate for date-style labels)."""
    from pgcdc_spark.streaming.statestore import version_label

    assert version_label("v-7-0123abcd") == "7"
    assert version_label("v-2026-01-01-deadbeef") == "2026-01-01"
    assert version_label("v-a-b-c-00ff00ff") == "a-b-c"


# --- join views ---------------------------------------------------------------


def _jv_maintainer(tmp_path, sub):
    from pgcdc_spark.streaming.ivm import JoinView, JoinViewMaintainer

    view = JoinView("ord_dim", on=["j"], left_cols=["id", "j", "a_val"],
                    right_cols=["j", "b_val"])
    return JoinViewMaintainer(
        str(tmp_path / f"jv{sub}"), view,
        left_keys=["id"], right_keys=["rid"], n_buckets=4,
    )


def _cdc(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


L_SCHEMA = "lsn string, op string, id long, j long, a_val string"
R_SCHEMA = "lsn string, op string, rid long, j long, b_val string"


def _recompute(spark, m):
    l_st = m.left_store.read(spark)
    r_st = m.right_store.read(spark)
    if l_st is None or r_st is None:
        return {}
    joined = (
        l_st.filter(F.col("op") != "D").select("id", "j", "a_val")
        .join(r_st.filter(F.col("op") != "D").select("j", "b_val"), on="j")
    )
    return {
        tuple(r)[:-1]: r["multiplicity"]
        for r in joined.groupBy("id", "j", "a_val", "b_val")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .collect()
    }


def _view_dict(spark, m):
    return {
        (r["id"], r["j"], r["a_val"], r["b_val"]): r["multiplicity"]
        for r in m.read_view(spark).collect()
    }


def test_join_view_tracks_all_transition_kinds(spark, tmp_path):
    """ΔL⋈R_old ∪ L_new⋈ΔR must equal a full recompute after every batch:
    inserts both sides, a join-key move on the left, a delete on the
    right, an in-place value update on the right."""
    m = _jv_maintainer(tmp_path, "a")

    batches = [
        (  # b0: base rows both sides (j=1 matches, j=2 matches, j=3 left-only)
            [("0/01", "I", 1, 1, "a1"), ("0/02", "I", 2, 2, "a2"),
             ("0/03", "I", 3, 3, "a3")],
            [("0/01", "I", 10, 1, "b1"), ("0/02", "I", 11, 2, "b2")],
        ),
        (  # b1: left key-move id=1 j 1->2; right insert second j=2 row
            [("0/04", "U", 1, 2, "a1x")],
            [("0/03", "I", 12, 2, "b2bis")],
        ),
        (  # b2: right delete rid=11; right update rid=12 value
            [],
            [("0/04", "D", 11, 2, "b2"), ("0/05", "U", 12, 2, "B2BIS")],
        ),
    ]
    for i, (lrows, rrows) in enumerate(batches):
        m.apply_batch(
            _cdc(spark, lrows, L_SCHEMA) if lrows else None,
            _cdc(spark, rrows, R_SCHEMA) if rrows else None,
            label=str(i),
        )
        assert _view_dict(spark, m) == _recompute(spark, m), f"batch {i}"

    # sanity on the final shape: id1 and id2 each join the one surviving
    # j=2 dim row (rid 12, updated value); j=1 and j=3 have no matches
    assert _view_dict(spark, m) == {
        (1, 2, "a1x", "B2BIS"): 1,
        (2, 2, "a2", "B2BIS"): 1,
    }


def test_join_view_replay_and_split_batch_idempotent(spark, tmp_path):
    """Replaying a label is a no-op on both sides; a crash between the two
    store merges (left published, right not) replays to the exact view."""
    m = _jv_maintainer(tmp_path, "b")
    l0 = _cdc(spark, [("0/01", "I", 1, 1, "a1")], L_SCHEMA)
    r0 = _cdc(spark, [("0/01", "I", 10, 1, "b1")], R_SCHEMA)
    m.apply_batch(l0, r0, label="0")
    after0 = _view_dict(spark, m)
    m.apply_batch(l0, r0, label="0")  # full replay: no-op
    assert _view_dict(spark, m) == after0

    # crash between sides: left merges label 1, right never does ...
    l1 = _cdc(spark, [("0/02", "U", 1, 1, "a1v2")], L_SCHEMA)
    r1 = _cdc(spark, [("0/02", "I", 11, 1, "b1bis")], R_SCHEMA)
    m.apply_batch(l1, None, label="1")
    # ... then the batch replays whole: left side skips, right applies
    m.apply_batch(l1, r1, label="1")
    assert _view_dict(spark, m) == _recompute(spark, m) == {
        (1, 1, "a1v2", "b1"): 1,
        (1, 1, "a1v2", "b1bis"): 1,
    }


def test_join_view_streaming_two_table_routing(spark, tmp_path):
    """One file-stream of mixed-table envelopes drives the join view via
    foreachBatch routing; a checkpoint restart with no new data is a
    no-op; a later file continues maintenance."""
    from pgcdc_spark.streaming.ivm import start_join_view_stream

    m = _jv_maintainer(tmp_path, "s")
    left_schema = StructType([
        StructField("id", LongType()), StructField("j", LongType()),
        StructField("a_val", StringType()),
    ])
    right_schema = StructType([
        StructField("rid", LongType()), StructField("j", LongType()),
        StructField("b_val", StringType()),
    ])

    def env(lsn, table, tag, img):
        e = {"lsn": f"0/{lsn:04X}", "tag": tag, "table": table}
        e["old" if tag == "delete" else "new"] = img
        return json.dumps(e)

    src = str(tmp_path / "jv_src")
    ckpt = str(tmp_path / "jv_ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "c0.jsonl"), "w") as f:
        f.write("\n".join([
            env(1, "fact", "insert", {"id": 1, "j": 1, "a_val": "a1"}),
            env(2, "dim", "insert", {"rid": 10, "j": 1, "b_val": "b1"}),
            env(3, "dim", "insert", {"rid": 11, "j": 2, "b_val": "b2"}),
        ]))

    def run():
        q = start_join_view_stream(
            spark, src, ckpt, m, "fact", "dim",
            {"fact": left_schema, "dim": right_schema},
        )
        q.awaitTermination(240)

    run()
    assert _view_dict(spark, m) == _recompute(spark, m) == {(1, 1, "a1", "b1"): 1}

    run()  # restart, no new files: nothing double-counts
    assert _view_dict(spark, m) == {(1, 1, "a1", "b1"): 1}

    with open(os.path.join(src, "c1.jsonl"), "w") as f:
        f.write("\n".join([
            env(4, "fact", "update", {"id": 1, "j": 2, "a_val": "a1x"}),  # key move
            env(5, "dim", "delete", {"rid": 10, "j": 1, "b_val": "b1"}),
        ]))
    run()
    assert _view_dict(spark, m) == _recompute(spark, m) == {(1, 2, "a1x", "b2"): 1}


def _mm_maintainer(tmp_path, sub, agg="min", k=2):
    from pgcdc_spark.streaming.ivm import MinMaxView, MinMaxViewMaintainer

    view = MinMaxView(f"{agg}_val", group_cols=["grp"], val_col="val",
                      key_cols=["id"], agg=agg, k=k)
    return MinMaxViewMaintainer(str(tmp_path / f"mm{sub}"), view,
                                keys=["id"], n_buckets=4)


MM_SCHEMA = "lsn string, op string, id long, grp string, val double"


def _mm_truth(spark, m, agg):
    st = m.store.read(spark)
    if st is None:
        return {}
    fn = F.min if agg == "min" else F.max
    return {
        r["grp"]: r["x"]
        for r in st.filter(F.col("op") != "D").groupBy("grp")
        .agg(fn("val").alias("x")).collect()
    }


def _mm_view(spark, m, agg):
    return {r["grp"]: r[f"{agg}_val"] for r in m.read_view(spark).collect()}


def test_minmax_view_tracks_transitions_and_refills(spark, tmp_path):
    """Support-set MIN with k=2: inserts, in-place update, group move,
    and a batch that deletes an entire support set (forcing the state
    refill fallback) — view equals a full recompute after every batch."""
    m = _mm_maintainer(tmp_path, "a", agg="min", k=2)
    batches = [
        # grp A gets 5 values: support holds only the 2 smallest
        [("0/01", "I", 1, "A", 50.0), ("0/02", "I", 2, "A", 10.0),
         ("0/03", "I", 3, "A", 20.0), ("0/04", "I", 4, "A", 30.0),
         ("0/05", "I", 5, "A", 40.0), ("0/06", "I", 6, "B", 7.0)],
        # in-place update of the current minimum
        [("0/07", "U", 2, "A", 60.0)],
        # EXHAUST the support: delete both remaining smallest entries
        # (whatever they are, k=2 means two deletes can empty it)
        [("0/08", "D", 3, "A", 20.0), ("0/09", "D", 4, "A", 30.0)],
        # group move: B's only row migrates to A; B must vanish
        [("0/0A", "U", 6, "A", 5.0)],
    ]
    for i, rows in enumerate(batches):
        m.apply_batch(spark.createDataFrame(rows, MM_SCHEMA), label=str(i))
        assert _mm_view(spark, m, "min") == _mm_truth(spark, m, "min"), f"batch {i}"
    assert _mm_view(spark, m, "min") == {"A": 5.0}

    # replay of the last label: no-op (store label gate)
    m.apply_batch(spark.createDataFrame(batches[-1], MM_SCHEMA), label="3")
    assert _mm_view(spark, m, "min") == {"A": 5.0}


def test_minmax_refill_when_support_replaced_at_full_count(spark, tmp_path):
    """Round-5 review repro: one batch retracts BOTH support members while
    inserting >= k larger rows — post-add count is back at k, but the
    untracked outside rows (5, 6) now undercut the rebuilt support. The
    bound-based gate must refill; the old count-based gate reported
    min=100 against a true min of 5."""
    m = _mm_maintainer(tmp_path, "d", agg="min", k=2)
    m.apply_batch(spark.createDataFrame(
        [("0/01", "I", 1, "A", 1.0), ("0/02", "I", 2, "A", 2.0),
         ("0/03", "I", 3, "A", 5.0), ("0/04", "I", 4, "A", 6.0)], MM_SCHEMA),
        label="0")
    assert _mm_view(spark, m, "min") == {"A": 1.0}

    # support {1, 2} fully replaced by larger values in ONE batch
    m.apply_batch(spark.createDataFrame(
        [("0/05", "U", 1, "A", 100.0), ("0/06", "U", 2, "A", 200.0)], MM_SCHEMA),
        label="1")
    assert _mm_view(spark, m, "min") == _mm_truth(spark, m, "min") == {"A": 5.0}

    # and the rebuilt support keeps working on later batches
    m.apply_batch(spark.createDataFrame(
        [("0/07", "D", 3, "A", 5.0)], MM_SCHEMA), label="2")
    assert _mm_view(spark, m, "min") == _mm_truth(spark, m, "min") == {"A": 6.0}


def test_minmax_view_max_and_split_replay(spark, tmp_path):
    """MAX variant; and the crash-between-commit-and-publish shape: the
    support store advanced but the state publish did not — re-running
    the transition hook must converge, not double-apply."""
    m = _mm_maintainer(tmp_path, "b", agg="max", k=2)
    b0 = spark.createDataFrame(
        [("0/01", "I", 1, "A", 1.0), ("0/02", "I", 2, "A", 9.0)], MM_SCHEMA)
    m.apply_batch(b0, label="0")
    assert _mm_view(spark, m, "max") == {"A": 9.0}

    # simulate the crash window: run the same support update twice by
    # replaying label 0 against a support that already advanced — the
    # label gate skips it entirely (merge no-op), view unchanged
    m.apply_batch(b0, label="0")
    assert _mm_view(spark, m, "max") == {"A": 9.0}

    b1 = spark.createDataFrame([("0/03", "D", 2, "A", 9.0)], MM_SCHEMA)
    m.apply_batch(b1, label="1")
    assert _mm_view(spark, m, "max") == {"A": 1.0} == _mm_truth(spark, m, "max")


def test_minmax_view_crash_between_support_and_publish(spark, tmp_path, monkeypatch):
    """Inject a crash AFTER the support store commits but BEFORE the main
    state publishes: the replayed batch re-runs the transition hook,
    which must detect the already-committed support label and no-op —
    then the merge publishes and the view matches truth."""
    import pytest

    from pgcdc_spark.streaming import statestore

    m = _mm_maintainer(tmp_path, "c", agg="min", k=2)
    m.apply_batch(spark.createDataFrame(
        [("0/01", "I", 1, "A", 3.0), ("0/02", "I", 2, "A", 8.0)], MM_SCHEMA),
        label="0")

    real_publish = statestore.AtomicStateStore._publish

    def exploding_publish(self, version):
        if self is m.store:  # only the MAIN store's manifest swap dies
            raise RuntimeError("injected crash before state publish")
        return real_publish(self, version)

    monkeypatch.setattr(statestore.AtomicStateStore, "_publish", exploding_publish)
    b1 = spark.createDataFrame([("0/03", "U", 1, "A", 0.5)], MM_SCHEMA)
    with pytest.raises(RuntimeError, match="injected"):
        m.apply_batch(b1, label="1")
    monkeypatch.undo()

    # support advanced; state did not. Replay converges, no double-apply.
    assert m.support.current_version().split("-")[1] == "1"
    m.apply_batch(b1, label="1")
    assert _mm_view(spark, m, "min") == _mm_truth(spark, m, "min") == {"A": 0.5}


def test_join_view_compaction_preserves_multiplicities(spark, tmp_path):
    """Fold keeps multiset semantics (duplicate joined rows net to
    multiplicity > 1) and survives the crash-atomic protocol."""
    m = _jv_maintainer(tmp_path, "c")
    # two left rows with identical (j, a_val) but different ids join the
    # same dim row -> distinct view rows; plus two dim rows on j=5 give
    # multiplicity via identical (id, j, a_val, b_val)? make b_val equal:
    l0 = _cdc(spark, [("0/01", "I", 1, 5, "same")], L_SCHEMA)
    r0 = _cdc(
        spark,
        [("0/01", "I", 20, 5, "dup"), ("0/02", "I", 21, 5, "dup")],
        R_SCHEMA,
    )
    m.apply_batch(l0, r0, label="0")
    before = _view_dict(spark, m)
    assert before == {(1, 5, "same", "dup"): 2}
    m.compact(spark)
    (jbase,) = os.listdir(m.delta_root)
    assert jbase.startswith("delta_batch=base-")
    assert _view_dict(spark, m) == before
    # and maintenance continues on top of the compacted base
    m.apply_batch(None, _cdc(spark, [("0/03", "D", 21, 5, "dup")], R_SCHEMA),
                  label="1")
    assert _view_dict(spark, m) == {(1, 5, "same", "dup"): 1}


def test_distinct_view_refcounts(spark, tmp_path):
    """COUNT(DISTINCT) via refcounted deltas: a value leaves the distinct
    set only when its LAST live holder departs; value moves retract one
    refcount and add another; replays never double-count; compaction
    preserves the fold."""
    import os

    from pgcdc_spark.streaming.ivm import (
        DistinctView,
        apply_distinct_view_batch,
        compact_distinct_view,
        read_distinct_view,
    )
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    view = DistinctView("dv", group_cols=["grp"], distinct_col="val")
    state = str(tmp_path / "dstate")
    store = BucketedStateStore(os.path.join(state, "state"), n_buckets=4)
    delta_root = os.path.join(state, "view_dv")
    SCHEMA = "lsn string, op string, id long, grp string, val long"

    def apply(label, rows):
        apply_distinct_view_batch(
            store, view, delta_root,
            spark.createDataFrame(rows, SCHEMA),
            label=label, keys=["id"],
        )

    def got():
        return {
            (r["grp"], r["n_distinct_val"])
            for r in read_distinct_view(spark, state, view).collect()
        }

    def recompute():
        st = store.read(spark).filter("op != 'D'")
        return {
            (r["grp"], r["n"])
            for r in st.groupBy("grp")
            .agg(F.countDistinct("val").alias("n")).collect()
        }

    # batch 0: A holds val 1 twice (ids 1,2) and val 2 once; B holds val 1
    apply("0", [("01", "U", 1, "A", 1), ("02", "U", 2, "A", 1),
                ("03", "U", 3, "A", 2), ("04", "U", 4, "B", 1)])
    assert got() == recompute() == {("A", 2), ("B", 1)}

    # batch 1: id 1 leaves val 1 (refcount 2->1: distinct UNCHANGED),
    # id 3 deleted (val 2's last holder: distinct drops), B's id 4 moves
    # val 1 -> 9 (retract+add, count unchanged)
    apply("1", [("05", "U", 1, "A", 7), ("06", "D", 3, "A", 2),
                ("07", "U", 4, "B", 9)])
    assert got() == recompute() == {("A", 2), ("B", 1)}  # A: {1,7}, B: {9}

    # replay of batch 1 is a no-op (store label gate)
    apply("1", [("05", "U", 1, "A", 7), ("06", "D", 3, "A", 2),
                ("07", "U", 4, "B", 9)])
    assert got() == {("A", 2), ("B", 1)}

    # batch 2: id 2 deleted -> val 1's LAST holder leaves A
    apply("2", [("08", "D", 2, "A", 1)])
    assert got() == recompute() == {("A", 1), ("B", 1)}

    before = got()
    compact_distinct_view(spark, state, view)
    (base,) = [d for d in os.listdir(delta_root) if d.startswith("delta_batch=")]
    assert base.startswith("delta_batch=base-")
    assert got() == before

    # group emptied entirely -> drops out of the view
    apply("3", [("09", "D", 1, "A", 7)])
    assert got() == recompute() == {("B", 1)}


def _tk_maintainer(tmp_path, sub, k_out=2, slack=1):
    from pgcdc_spark.streaming.ivm import TopKView, TopKViewMaintainer

    view = TopKView("tk", group_cols=["grp"], val_col="val",
                    key_cols=["id"], agg="max", k_out=k_out, slack=slack)
    return TopKViewMaintainer(str(tmp_path / f"tk{sub}"), view,
                              keys=["id"], n_buckets=4)


def _tk_truth(spark, m):
    st = m.store.read(spark)
    if st is None:
        return []
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("val").desc(), F.col("id"))
    return sorted(
        (r["grp"], r["id"], r["val"], r["rank"])
        for r in st.filter(F.col("op") != "D")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m.view.k_out)
        .select("grp", "id", "val", "rank").collect()
    )


def _tk_view(spark, m):
    return sorted(
        (r["grp"], r["id"], r["val"], r["rank"])
        for r in m.read_view(spark).collect()
    )


def test_topk_view_promotion_and_refill(spark, tmp_path):
    """TOP-2 (slack=1): a delete of a ranked row must promote the next
    best — first from the support buffer, then (when the buffer is
    exhausted in one batch) via the state refill. View == ranked
    recompute after EVERY batch, ranks included."""
    m = _tk_maintainer(tmp_path, "a", k_out=2, slack=1)
    batches = [
        # A: 5 rows; support holds top-3 (k_out+slack), view shows top-2
        [("0/01", "I", 1, "A", 50.0), ("0/02", "I", 2, "A", 10.0),
         ("0/03", "I", 3, "A", 20.0), ("0/04", "I", 4, "A", 30.0),
         ("0/05", "I", 5, "A", 40.0), ("0/06", "I", 6, "B", 7.0)],
        # delete rank-1: buffered row 4 (30.0) must enter the view
        [("0/07", "D", 1, "A", 50.0)],
        # EXHAUST the buffer: delete the entire remaining support in one
        # batch (40, 30, 20) -> refill must re-derive A from state (10)
        [("0/08", "D", 5, "A", 40.0), ("0/09", "D", 4, "A", 30.0),
         ("0/0A", "D", 3, "A", 20.0)],
        # update promotes B's row into a bigger value + group move to A
        [("0/0B", "U", 6, "A", 99.0)],
    ]
    for i, rows in enumerate(batches):
        m.apply_batch(spark.createDataFrame(rows, MM_SCHEMA), label=str(i))
        assert _tk_view(spark, m) == _tk_truth(spark, m), f"batch {i}"
    assert _tk_view(spark, m) == [("A", 2, 10.0, 2), ("A", 6, 99.0, 1)]

    # replay of the last label: no-op
    m.apply_batch(spark.createDataFrame(batches[-1], MM_SCHEMA), label="3")
    assert _tk_view(spark, m) == [("A", 2, 10.0, 2), ("A", 6, 99.0, 1)]


def test_topk_view_refills_when_support_shrinks_below_k_out(spark, tmp_path):
    """Round-8 review regression: successive SINGLE deletes that shrink a
    group's support below k_out — without ever emptying it — must still
    trigger the refill.  The inherited MIN/MAX condition (emptied or
    beyond-bound) is insufficient for a ranked view: after batch 2 the
    support held only {30.0} (non-empty, no adds), and the view silently
    served one rank while the live state's true top-2 was [30, 20]."""
    m = _tk_maintainer(tmp_path, "shrink", k_out=2, slack=1)
    batches = [
        [("0/01", "I", 1, "A", 50.0), ("0/02", "I", 2, "A", 40.0),
         ("0/03", "I", 3, "A", 30.0), ("0/04", "I", 4, "A", 20.0),
         ("0/05", "I", 5, "A", 10.0)],
        # support {50,40,30}; delete rank-1 -> survivors {40,30}, still
        # >= k_out: buffered promotion, no refill needed
        [("0/06", "D", 1, "A", 50.0)],
        # delete rank-1 again -> survivors {30}: below k_out, refill MUST
        # re-derive from state so rank 2 (20.0) re-enters the view
        [("0/07", "D", 2, "A", 40.0)],
        # and once more: survivors shrink again, next-best is 10.0
        [("0/08", "D", 3, "A", 30.0)],
    ]
    for i, rows in enumerate(batches):
        m.apply_batch(spark.createDataFrame(rows, MM_SCHEMA), label=str(i))
        assert _tk_view(spark, m) == _tk_truth(spark, m), f"batch {i}"
    assert _tk_view(spark, m) == [("A", 4, 20.0, 1), ("A", 5, 10.0, 2)]


def test_topk_view_stream_with_restart_and_replay(spark, tmp_path):
    """start_support_view_stream drives the TOP-K maintainer from a file
    stream of change rows: view == ranked recompute after draining, a
    restart on the same checkpoint picks up late files, and a no-new-
    files rerun changes nothing."""
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    m = _tk_maintainer(tmp_path, "s", k_out=2, slack=1)

    chunks = [
        [("0/01", "I", 1, "A", 5.0), ("0/02", "I", 2, "A", 9.0),
         ("0/03", "I", 3, "A", 7.0), ("0/04", "I", 4, "B", 1.0)],
        [("0/05", "D", 2, "A", 9.0)],          # evict rank-1, promote 3
    ]

    def write_chunk(i, rows):
        (spark.createDataFrame(rows, MM_SCHEMA)
         .coalesce(1).write.parquet(f"{src}/part_{i}"))

    def run():
        from pgcdc_spark.streaming.ivm import start_support_view_stream

        stream = (
            spark.readStream.schema(
                spark.createDataFrame([], MM_SCHEMA).schema
            ).option("maxFilesPerTrigger", 1).parquet(f"{src}/part_*")
        )
        start_support_view_stream(stream, ckpt, m).awaitTermination(240)

    write_chunk(0, chunks[0])
    run()
    assert _tk_view(spark, m) == _tk_truth(spark, m)
    assert _tk_view(spark, m) == [
        ("A", 2, 9.0, 1), ("A", 3, 7.0, 2), ("B", 4, 1.0, 1)]

    # restart on the same checkpoint with a late file
    write_chunk(1, chunks[1])
    run()
    assert _tk_view(spark, m) == _tk_truth(spark, m) == [
        ("A", 1, 5.0, 2), ("A", 3, 7.0, 1), ("B", 4, 1.0, 1)]

    # no new files: nothing changes
    before = _tk_view(spark, m)
    run()
    assert _tk_view(spark, m) == before


def test_term_df_view_delta_carries_only_changed_terms(spark, tmp_path):
    """The incremental-BM25 property: an update that edits ONE word must
    write delta rows for only the changed terms (unchanged terms' +1/-1
    cancel, including the ' N' doc-count pseudo-term), and a delete must
    retract exactly the doc's vocabulary."""
    import os

    from pgcdc_spark.streaming.ivm import (
        TermDFView, apply_agg_view_batch, read_term_df_view)
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    view = TermDFView("df")
    store = BucketedStateStore(str(tmp_path / "state"), n_buckets=4)
    root = str(tmp_path / "view_df")
    schema = "lsn string, op string, doc_id long, text string"

    def apply(rows, label):
        apply_agg_view_batch(store, view, root,
                             spark.createDataFrame(rows, schema),
                             label=label, keys=["doc_id"])

    apply([("0/01", "U", 1, "the quick brown fox"),
           ("0/02", "U", 2, "the lazy dog")], "0")
    # edit one word of doc 1
    apply([("0/03", "U", 1, "the quick brown wolf")], "1")
    d1 = {r["term"]: r["df_delta"]
          for r in spark.read.parquet(os.path.join(root, "delta_batch=1")).collect()}
    assert d1 == {"fox": -1, "wolf": 1}
    # delete doc 2: exactly its vocabulary retracts (plus N)
    apply([("0/04", "D", 2, "the lazy dog")], "2")
    d2 = {r["term"]: r["df_delta"]
          for r in spark.read.parquet(os.path.join(root, "delta_batch=2")).collect()}
    assert d2 == {"the": -1, "lazy": -1, "dog": -1, " N": -1}

    got = {(r["term"], r["df"]) for r in read_term_df_view(spark, str(tmp_path), view).collect()}
    assert got == {("the", 1), ("quick", 1), ("brown", 1), ("wolf", 1), (" N", 1)}


def test_term_df_and_postings_compaction_preserve_views(spark, tmp_path):
    """Folding the term-DF / postings delta logs into one base partition
    must leave both views identical and drop fully-cancelled rows."""
    import os

    from pgcdc_spark.streaming.ivm import (
        PostingsView, TermDFView, apply_agg_view_batch,
        compact_postings_view, compact_term_df_view,
        read_postings_view, read_term_df_view)
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    schema = "lsn string, op string, doc_id long, text string"
    dfv, pv = TermDFView("df"), PostingsView("post")
    sd, sp = str(tmp_path / "d"), str(tmp_path / "p")
    std = BucketedStateStore(os.path.join(sd, "state"), n_buckets=4)
    stp = BucketedStateStore(os.path.join(sp, "state"), n_buckets=4)

    batches = [
        [("0/01", "U", 1, "a b b c"), ("0/02", "U", 2, "b c d")],
        [("0/03", "U", 1, "a b e")],       # update: c leaves doc 1, e enters
        [("0/04", "D", 2, "b c d")],       # delete doc 2
    ]
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, schema)
        apply_agg_view_batch(std, dfv, os.path.join(sd, "view_df"), b,
                             label=str(i), keys=["doc_id"])
        apply_agg_view_batch(stp, pv, os.path.join(sp, "view_post"), b,
                             label=str(i), keys=["doc_id"])

    df_before = sorted(map(tuple, read_term_df_view(spark, sd, dfv).collect()))
    po_before = sorted(map(tuple, read_postings_view(spark, sp, pv).collect()))
    compact_term_df_view(spark, sd, dfv)
    compact_postings_view(spark, sp, pv)
    assert sorted(map(tuple, read_term_df_view(spark, sd, dfv).collect())) == df_before
    assert sorted(map(tuple, read_postings_view(spark, sp, pv).collect())) == po_before
    # one folded partition each; cancelled rows gone from the base
    for root, col in ((os.path.join(sd, "view_df"), "df_delta"),
                      (os.path.join(sp, "view_post"), "tf_delta")):
        parts = [d for d in os.listdir(root) if d.startswith("delta_batch=")]
        assert len(parts) == 1, parts
        base = spark.read.parquet(os.path.join(root, parts[0]))
        assert base.filter(F.col(col) == 0).count() == 0
    assert df_before == [(" N", 1), ("a", 1), ("b", 1), ("e", 1)]


def test_maintained_dir_cache_semantics(tmp_path, monkeypatch):
    """The IVM maintained-state cache: builds publish by atomic rename
    (a crashed build leaves no root -> next call rebuilds), a second
    builder losing the race discards its scratch copy, and
    PGCDC_IVM_CACHE=0 bypasses the cache entirely (fresh scratch dir
    per invocation — the bench's maintenance-timing mode)."""
    import os
    import tempfile

    from pgcdc_spark.queries.ivm_views import _maintained_dir

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    with open(os.path.join(sf_dir, "events.parquet"), "w") as f:
        f.write("x")

    calls = []

    def build(d):
        calls.append(d)
        with open(os.path.join(d, "state.txt"), "w") as f:
            f.write("built")

    r1 = _maintained_dir("t", sf_dir, ("events",), build)
    r2 = _maintained_dir("t", sf_dir, ("events",), build)
    assert r1 == r2 and len(calls) == 1, "second call must hit the cache"
    assert open(os.path.join(r1, "state.txt")).read() == "built"

    # crashed build: the exception propagates and nothing publishes
    def boom(d):
        raise RuntimeError("crash")
    try:
        _maintained_dir("t2", sf_dir, ("events",), boom)
        raise AssertionError("must propagate")
    except RuntimeError:
        pass
    r3 = _maintained_dir("t2", sf_dir, ("events",), build)
    assert open(os.path.join(r3, "state.txt")).read() == "built"

    # changed source fingerprint -> different cache key, fresh build
    with open(os.path.join(sf_dir, "events.parquet"), "w") as f:
        f.write("xy")
    n_before = len(calls)
    r4 = _maintained_dir("t", sf_dir, ("events",), build)
    assert r4 != r1 and len(calls) == n_before + 1

    # cache opt-out: every call builds into a fresh scratch dir
    monkeypatch.setenv("PGCDC_IVM_CACHE", "0")
    a = _maintained_dir("t", sf_dir, ("events",), build)
    b = _maintained_dir("t", sf_dir, ("events",), build)
    assert a != b and len(calls) == n_before + 3


def test_sweep_stale_builds_ages_on_newest_mtime(tmp_path):
    """The orphan-build sweeper reaps only trees whose NEWEST mtime
    exceeds the stale threshold: an abandoned build goes, but a
    long-running concurrent build whose top-level dir mtime is old while
    a nested subdirectory is still being written is left alone (writing
    into a nested dir does not touch the top-level mtime — the ADVICE
    r10 gap)."""
    import os

    from pgcdc_spark.queries.ivm_views import (
        _STALE_BUILD_SECS, _sweep_stale_builds)

    parent = str(tmp_path)
    old = __import__("time").time() - _STALE_BUILD_SECS - 60

    dead = os.path.join(parent, ".t-build-dead")
    os.makedirs(os.path.join(dead, "nested"))
    with open(os.path.join(dead, "nested", "part"), "w") as f:
        f.write("x")
    for base, dirs, files in os.walk(dead, topdown=False):
        for entry in dirs + files:
            os.utime(os.path.join(base, entry), (old, old))
    os.utime(dead, (old, old))

    live = os.path.join(parent, ".t-build-live")
    os.makedirs(os.path.join(live, "nested"))
    os.utime(live, (old, old))  # top-level LOOKS old...
    with open(os.path.join(live, "nested", "part"), "w") as f:
        f.write("x")  # ...but a nested write is fresh

    published = os.path.join(parent, "t-abcdef0123456789")
    os.makedirs(published)
    os.utime(published, (old, old))  # not a build dir: never swept

    _sweep_stale_builds(parent)
    assert not os.path.exists(dead), "abandoned build must be reaped"
    assert os.path.exists(live), "in-progress build must survive"
    assert os.path.exists(published)
