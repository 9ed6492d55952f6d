"""Engine operator helpers: salted join equivalence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pgcdc_spark.operators.salted import salted_join


def test_salted_join_equals_plain_join(spark):
    """Salting must be semantically invisible — including under heavy skew
    (one hot key with 10k rows)."""
    import pytest

    hot = [(1, i) for i in range(10_000)] + [(k, k) for k in range(2, 50)]
    big = spark.createDataFrame(hot, "k LONG, payload LONG")
    dim = spark.createDataFrame([(k, f"v{k}") for k in range(0, 60)], "k LONG, val STRING")

    plain = big.join(dim, "k").groupBy("k", "val").count()
    salted = salted_join(big, dim, "k", n_salts=8).groupBy("k", "val").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    with pytest.raises(ValueError):
        salted_join(big, dim, "k", how="full")


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k LONG, payload STRING")
    dim = spark.createDataFrame([(1, "v1")], "k LONG, val STRING")
    got = {(r["k"], r["payload"], r["val"])
           for r in salted_join(big, dim, "k", how="left", n_salts=4).collect()}
    assert got == {(1, "a", "v1"), (99, "b", None)}


def test_binned_range_join_equals_naive_theta(spark):
    """Bin + residual must be semantically identical to the naive interval
    theta join, across bin widths smaller/equal/larger than the interval
    length (replication factor 1..many) — and produce no duplicates."""
    import random

    from pgcdc_spark.operators.rangejoin import binned_range_join

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 1000)) for i in range(300)]
    ivs = []
    for j in range(80):
        s = rng.randrange(0, 950)
        ivs.append((j, s, s + rng.randrange(0, 120)))
    points = spark.createDataFrame(pts, "pid LONG, x LONG")
    intervals = spark.createDataFrame(ivs, "iid LONG, s LONG, e LONG")

    naive = points.join(
        intervals, (points["x"] >= intervals["s"]) & (points["x"] <= intervals["e"])
    ).select("pid", "iid")
    expected = sorted(map(tuple, naive.collect()))
    for width in (7, 64, 120, 500):
        got = binned_range_join(points, intervals, "x", "s", "e", width).select("pid", "iid")
        assert sorted(map(tuple, got.collect())) == expected, f"width={width}"


def test_binned_range_join_left_outer_and_guards(spark):
    import pytest

    from pgcdc_spark.operators.rangejoin import binned_range_join

    points = spark.createDataFrame([(1, 5), (2, 500)], "pid LONG, x LONG")
    intervals = spark.createDataFrame([(10, 0, 10)], "iid LONG, s LONG, e LONG")
    got = {
        (r["pid"], r["iid"])
        for r in binned_range_join(
            points, intervals, "x", "s", "e", 16, how="left_outer"
        ).collect()
    }
    assert got == {(1, 10), (2, None)}

    with pytest.raises(ValueError):
        binned_range_join(points, points, "x", "s", "e", 16)  # overlapping cols
    with pytest.raises(ValueError):
        binned_range_join(points, intervals, "x", "s", "e", 16, how="full")


def test_binned_range_join_left_outer_null_payload_no_dup(spark):
    """A matched point carrying a NULL payload column must NOT be re-emitted
    as a spurious NULL-padded unmatched row (anti-join must be null-safe)."""
    from pgcdc_spark.operators.rangejoin import binned_range_join

    points = spark.createDataFrame(
        [(1, 5, None), (2, 500, "p2"), (3, 7, None)],
        "pid LONG, x LONG, payload STRING",
    )
    intervals = spark.createDataFrame([(10, 0, 10)], "iid LONG, s LONG, e LONG")
    rows = binned_range_join(
        points, intervals, "x", "s", "e", 16, how="left_outer"
    ).collect()
    got = sorted((r["pid"], r["iid"]) for r in rows)
    assert got == [(1, 10), (2, None), (3, 10)]


def test_merge_into_all_branches(spark):
    """One merge statement exercising every branch: matched update,
    matched delete, not-matched insert, not-matched-by-source delete —
    with unlisted columns preserved and output schema pinned to target."""
    import pytest

    from pgcdc_spark.operators.merge import S, T, merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id LONG, name STRING, bal DOUBLE",
    )
    source = spark.createDataFrame(
        # id1 -> update, id2 -> delete (flag), id9 -> insert; id3/id4 absent
        [(1, 5.0, False), (2, 0.0, True), (9, 99.0, False)],
        "id LONG, delta DOUBLE, purge BOOLEAN",
    )

    out = merge_into(
        target, source, on=["id"],
        when_matched_update={"bal": T("bal") + S("delta")},
        when_matched_delete=S("purge"),
        when_not_matched_insert={"name": F.lit("new"), "bal": S("delta")},
        when_not_matched_by_source_delete=F.col("__mt.name") == F.lit("c"),
    )
    assert out.columns == ["id", "name", "bal"]
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 15.0),    # matched update; name preserved
        4: ("d", 40.0),    # not matched by source, condition false -> kept
        9: ("new", 99.0),  # inserted (key defaults to source key)
    }  # id2 purged (matched delete), id3 dropped (by-source delete)

    # without clauses, matched/only-target rows pass through, source-only drop
    passthru = merge_into(target, source, on=["id"])
    assert {r["id"] for r in passthru.collect()} == {1, 2, 3, 4}

    # duplicate source keys must fail loudly AT EXECUTION (the guard is
    # embedded in the plan; building the merge runs no eager job)
    dup = spark.createDataFrame([(1, 1.0, False), (1, 2.0, False)],
                                "id LONG, delta DOUBLE, purge BOOLEAN")
    dup_merge = merge_into(target, dup, on=["id"],
                           when_matched_update={"bal": S("delta")})
    with pytest.raises(Exception, match="duplicate merge keys"):
        dup_merge.collect()
    # and the guard can be waived explicitly
    waived = merge_into(target, dup, on=["id"], check_unique_source=False)
    assert waived.count() >= len(target.collect())


def test_merge_into_null_keys_never_match(spark):
    """Standard SQL MERGE: NULL join keys never match (plain equality in
    the ON clause, NOT eqNullSafe) — a NULL-key source row takes the NOT
    MATCHED INSERT branch, a NULL-key target row falls into the NOT
    MATCHED BY SOURCE branch; and TWO NULL-key source rows are not
    'duplicate merge keys' (each inserts independently). Round-6 review:
    the old eqNullSafe ON clause matched NULLs and raised on two NULL-key
    source rows."""
    from pgcdc_spark.operators.merge import S, merge_into

    target = spark.createDataFrame([(None, 1.0), (7, 2.0)], "id LONG, bal DOUBLE")
    source = spark.createDataFrame([(None, 100.0), (None, 200.0), (7, 70.0)],
                                   "id LONG, bal2 DOUBLE")
    out = merge_into(target, source, on=["id"],
                     when_matched_update={"bal": S("bal2")},
                     when_not_matched_insert={"bal": S("bal2")})
    rows = sorted((r["id"], r["bal"]) for r in out.collect()
                  if r["id"] is not None)
    null_rows = sorted(r["bal"] for r in out.collect() if r["id"] is None)
    assert rows == [(7, 70.0)]                    # matched update
    assert null_rows == [1.0, 100.0, 200.0]       # target kept + both inserted

    # NULL-key target rows are still eligible for NOT MATCHED BY SOURCE
    purge = merge_into(target, source.filter("id IS NOT NULL"), on=["id"],
                       when_not_matched_by_source_delete=True)
    assert {r["id"] for r in purge.collect()} == {7}


def test_compact_files_bin_packs(spark, sf_smoke, tmp_path):
    """64 tiny files fold into the planned byte-targeted count; contents
    survive exactly; z-style local sort is honored within output files."""
    from pgcdc_spark.operators.compaction import compact_files, dir_bytes, plan_output_files

    events = spark.read.parquet(f"{sf_smoke}/events.parquet")
    src = str(tmp_path / "small")
    events.repartition(64).write.parquet(src)
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in == 64

    total = dir_bytes(spark, src)
    dst = str(tmp_path / "packed")
    n_planned = compact_files(spark, src, dst, target_file_bytes=total // 2 + 1)
    assert n_planned == plan_output_files(total, total // 2 + 1) == 2
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_out == 2

    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_files(spark, src, dst, target_file_bytes=0)


def test_asof_join_directions_and_tolerance(spark):
    """merge_asof surface: backward / forward / nearest, with and without
    tolerance; documented tiebreaks at equal timestamps."""
    import pytest

    from pgcdc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 205, "L2"), (2, 50, "L3"), (3, 10, "L4")],
        "k LONG, ts LONG, lbl STRING",
    )
    right = spark.createDataFrame(
        # k=1: quotes at 90, 200, 210; k=2: only a LATER quote at 70;
        # k=1 ts=200 has two rows (ids 20, 21) to exercise tiebreaks.
        [(1, 90, 10), (1, 200, 20), (1, 200, 21), (1, 210, 30), (2, 70, 40)],
        "k LONG, ts LONG, rid LONG",
    )

    def run(**kw):
        rows = asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], tiebreak="rid", **kw,
        ).collect()
        return {r["lbl"]: r["rid_asof"] for r in rows}

    # backward: latest ts <= left ts; at equal ts largest tiebreak wins
    assert run() == {"L1": 10, "L2": 21, "L3": None, "L4": None}
    # forward: earliest ts >= left ts; L2(205) -> 210
    assert run(direction="forward") == {"L1": 20, "L2": 30, "L3": 40, "L4": None}
    # nearest: L1(100) nearer to 90 (10) than 200 (100); L2(205) ties
    # 200 vs 210 at distance 5 -> backward wins -> rid 21
    assert run(direction="nearest") == {"L1": 10, "L2": 21, "L3": 40, "L4": None}
    # tolerance clips the k=2 forward match (|70-50|=20 > 15)
    assert run(direction="nearest", tolerance=15) == {
        "L1": 10, "L2": 21, "L3": None, "L4": None,
    }
    assert run(tolerance=5) == {"L1": None, "L2": 21, "L3": None, "L4": None}

    with pytest.raises(ValueError, match="direction"):
        run(direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        run(tolerance=-1)


def test_adaptive_quantizer_tiny_corpus_edges(spark):
    """The adaptive sqrt(n) donor rule (r10) must yield >= 1 centroid for
    ANY non-empty training set: M = max(1, floor(n/ceil(sqrt(n)))) with
    rule vec_id % M == 1 % M — the `1 % M` form makes M=1 mean 'every
    row', so 1-3 vector corpora still train (the old `== 1` form
    selected nothing at M=1). Donor counts stay ~sqrt(n)."""
    import math

    import pyspark.sql.functions as SF
    from pgcdc_spark.queries.llm_similarity import ivf_centroids

    for n in (1, 2, 3, 5, 40, 500):
        base = spark.range(n).select(
            SF.col("id").alias("vec_id"),
            SF.array(SF.lit(1.0), SF.lit(0.0)).alias("e"),
            SF.lit(1.0).alias("n"),
        )
        cnt = ivf_centroids(base).count()
        assert cnt >= 1, f"n={n}: no donors"
        expected_m = max(1, n // math.ceil(math.sqrt(n)))
        expected = sum(1 for v in range(n) if v % expected_m == 1 % expected_m)
        assert cnt == expected, (n, cnt, expected)
        # sqrt-ish scaling: never more than ~2*sqrt(n)+1 donors
        assert cnt <= 2 * math.isqrt(n) + 2, (n, cnt)


def test_zorder_morton_key_guards_sign_bit(spark):
    """bits * ndims must stay below the long sign bit; 16 bits x 4 cols = 64
    would interleave into bit 63 and alias/negate keys silently."""
    import pytest

    from pgcdc_spark.operators.zorder import morton_key

    df = spark.createDataFrame([(1, 2, 3, 4)], "a LONG, b LONG, c LONG, d LONG")
    with pytest.raises(ValueError, match="sign bit"):
        morton_key(df, ["a", "b", "c", "d"], bits=16)
    # 15 bits x 4 cols = 60 is fine
    assert "__k" in df.withColumn("__k", morton_key(df, ["a", "b", "c", "d"], bits=15)).columns


def test_zorder_layout_deterministic(spark, sf_correct, tmp_path):
    """Two writes of the same data must produce identical per-file min-max
    boxes — the layout uses exact split points, not sampled range bounds."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.zorder import write_zordered

    (events,) = load(spark, sf_correct, "events")
    d1, d2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    write_zordered(events, d1, ["user_id", "ts"], n_files=8)
    write_zordered(events, d2, ["user_id", "ts"], n_files=8)

    def file_boxes(path):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"), "user_id", "ts"
        )
        rows = df.groupBy("f").agg(
            F.min("user_id"), F.max("user_id"), F.min("ts"), F.max("ts")
        ).collect()
        return sorted(tuple(r)[1:] for r in rows)

    assert file_boxes(d1) == file_boxes(d2)


def test_zorder_layout_prunes_both_dimensions(spark, sf_correct, tmp_path):
    """Files written along the Z-curve of (user_id, ts) must have narrow
    min-max boxes on BOTH dimensions: a point-user predicate overlaps few
    files, and a time-range predicate still overlaps few files — whereas
    a ts-sorted layout leaves every file covering all users."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.zorder import write_zordered

    (events,) = load(spark, sf_correct, "events")
    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    write_zordered(events, zdir, ["user_id", "ts"], n_files=16)
    (events.repartitionByRange(16, "ts").sortWithinPartitions("ts")
     .write.mode("overwrite").parquet(ldir))

    def file_boxes(path):
        df = spark.read.parquet(path).select(
            F.input_file_name().alias("f"), "user_id", "ts"
        )
        return df.groupBy("f").agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("ts").alias("tlo"), F.max("ts").alias("thi"),
        ).collect()

    zb, lb = file_boxes(zdir), file_boxes(ldir)
    assert len(zb) == 16 and len(lb) == 16

    probe_user = 42
    z_user_hits = sum(1 for r in zb if r["ulo"] <= probe_user <= r["uhi"])
    l_user_hits = sum(1 for r in lb if r["ulo"] <= probe_user <= r["uhi"])
    # linear-by-ts layout cannot prune on user_id at all
    assert l_user_hits == 16
    assert z_user_hits <= 8, f"z-order user pruning too weak: {z_user_hits}/16"

    # a 10%-of-range time slice must still prune most z-ordered files
    tlo = min(r["tlo"] for r in zb)
    thi = max(r["thi"] for r in zb)
    t0, t1 = tlo, tlo + (thi - tlo) // 10
    z_time_hits = sum(1 for r in zb if not (r["thi"] < t0 or r["tlo"] > t1))
    assert z_time_hits <= 8, f"z-order time pruning too weak: {z_time_hits}/16"

    # row content is preserved exactly
    assert spark.read.parquet(zdir).count() == events.count()


def test_ann_index_probe_matches_inline_and_prunes(spark, sf_smoke, tmp_path):
    """The persisted IVF-PQ index (operators/annindex.py) must serve
    probes BIT-IDENTICAL to the inline emb_ivf_pq_topk plan (same
    quantizer rules, exact double round-trip, decimal ADC sum), read
    ONLY the probed cells' partitions, and version its rebuilds behind
    the atomic manifest (old versions GC'd past the keep window)."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex
    from pgcdc_spark.queries import all_queries

    (emb,) = load(spark, sf_smoke, "embeddings")
    idx = AnnIndex(str(tmp_path / "ann"))
    v1 = idx.build(emb, label="b1")

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    probed = idx.probe(spark, queries, nprobe=2, k=10)

    # only probed cells' partitions are scanned (partition pruning is the
    # on-disk face of IVF candidate pruning)
    cell_files = [f for f in probed.inputFiles() if "/cells/" in f]
    cells_read = {f.split("cid=")[1].split("/")[0] for f in cell_files}
    all_cells = {
        d.split("=", 1)[1]
        for d in idx.fs.listdir(idx.table_path("cells"))
        if d.startswith("cid=")
    }
    assert cells_read and cells_read < all_cells, (cells_read, all_cells)

    inline = all_queries()["emb_ivf_pq_topk"].fn(spark, sf_smoke)
    got = sorted(map(tuple, probed.collect()))
    want = sorted(map(tuple, inline.collect()))
    assert got == want  # bit-identical, including approx_dist2 doubles

    # rebuild: new version published atomically, probe result unchanged,
    # version dirs bounded by the keep window
    v2 = idx.build(emb, label="b2")
    assert v2 != v1 and idx.current_version() == v2
    again = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    assert again == want
    versions = [d for d in idx.fs.listdir(idx.root) if d.startswith("v-")]
    assert len(versions) <= 2  # _KEEP_VERSIONS


def test_ann_index_append_is_incremental(spark, sf_smoke, tmp_path):
    """AnnIndex.append must (a) answer probes bit-identical to a full
    rebuild over base+delta (frozen quantizer == full-corpus quantizer
    when every donor is in the base), (b) rewrite ONLY the touched cid=
    partitions — untouched cells stay in the old version's directory,
    byte-identical, inherited through the cellmap, and (c) tombstone
    deletes / fold upserts with the same touched-partition cost."""
    import os as _os

    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex
    # small delta (5 vectors) so some of the 10 cells are untouched —
    # the driver query's bigger %5 delta exercises the same code path;
    # donors stay in the base so frozen == full-corpus quantizer
    pred = "(vec_id % 100 = 2) AND (vec_id % 53 <> 1) AND (vec_id % 127 <> 1)"
    (emb,) = load(spark, sf_smoke, "embeddings")
    base = emb.filter(F.expr(f"NOT ({pred})"))
    delta = emb.filter(F.expr(pred))

    idx = AnnIndex(str(tmp_path / "incr"))
    v1 = idx.build(base, label="base")

    def _files(version, cid):
        d = _os.path.join(str(tmp_path / "incr"), version, "cells", f"cid={cid}")
        return sorted(
            (f, _os.path.getsize(_os.path.join(d, f)), _os.path.getmtime(_os.path.join(d, f)))
            for f in _os.listdir(d) if not f.startswith("_")
        )

    before = {c: _files(v1, c) for c in idx.meta()["cellmap"]}

    v2 = idx.append(delta, label="delta")
    m = idx.meta()
    owners = {v for v in m["cellmap"].values()}
    assert owners == {v1, v2}, "append must mix inherited and rewritten cells"
    untouched = [c for c, v in m["cellmap"].items() if v == v1]
    touched = [c for c, v in m["cellmap"].items() if v == v2]
    assert untouched and touched
    # untouched partitions: same files, same bytes on disk, never copied
    for c in untouched:
        assert _files(v1, c) == before[c]
    # probe: incremental index == full rebuild over the whole corpus
    full = AnnIndex(str(tmp_path / "full"))
    full.build(emb, label="full")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    got = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    want = sorted(map(tuple, full.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got == want

    # upsert: re-appending the same delta must not duplicate rows
    v3 = idx.append(delta, label="redo")
    again = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    assert again == want

    # tombstone delete: non-donor, non-query ids; index answer must match
    # a full rebuild over the corpus minus the deleted ids
    del_ids = [20, 21, 33]
    dels = emb.filter(F.col("vec_id").isin(del_ids))
    assert dels.count() == len(del_ids)
    idx.append(None, deletes=dels, label="gc")
    shrunk = AnnIndex(str(tmp_path / "shrunk"))
    shrunk.build(emb.filter(~F.col("vec_id").isin(del_ids)), label="shrunk")
    got_d = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    want_d = sorted(map(tuple, shrunk.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got_d == want_d
    ids_left = {
        r[0]
        for c in idx.meta()["cellmap"]
        for r in idx._read_cells(spark, idx.meta(), [int(c)])
        .select("vec_id").distinct().collect()
    }
    assert not (ids_left & set(del_ids))


def test_ann_index_upsert_cell_migration(spark, sf_smoke, tmp_path):
    """An upsert whose NEW embedding assigns to a DIFFERENT cell than the
    row's old embedding must evict the old row from its OLD cell — the
    idmap lookup resolves where the id currently lives (ADVICE r7, high:
    the pre-idmap append only rewrote cells touched by the NEW
    assignment, so a migrating upsert left a stale duplicate behind and
    probes diverged from a rebuild)."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    (emb,) = load(spark, sf_smoke, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    idx = AnnIndex(str(tmp_path / "mig"))
    idx.build(corpus, label="base")

    # pick a victim X and an embedding donor Y in DIFFERENT cells; X must
    # be a non-donor (frozen quantizer == rebuild quantizer) and >= 8 so
    # it stays out of the probe query set
    m = idx.meta()
    home = {
        r["vec_id"]: r["cid"]
        for r in idx._read_idmap(
            spark, m, sorted(int(b) for b in m["idmap"])
        ).collect()
    }
    x = next(
        v for v in sorted(home)
        if v >= 8 and v % 53 != 1 and v % 127 != 1
    )
    y = next(v for v in sorted(home) if home[v] != home[x])
    old_cell = home[x]

    upsert = emb.filter(F.col("vec_id") == y).select(
        F.lit(x).cast("long").alias("vec_id"), "embedding"
    )
    idx.append(upsert, label="mig")

    # X lives in exactly ONE cell, and not its old one (unless Y's cell
    # coincides — excluded by construction)
    m2 = idx.meta()
    rows = (
        idx._read_cells(spark, m2, sorted(int(c) for c in m2["cellmap"]))
        .filter((F.col("vec_id") == x) & (F.col("s") == 0))
        .select("cid")
        .collect()
    )
    assert len(rows) == 1, f"vec_id={x} in cells {[r[0] for r in rows]}"
    assert rows[0][0] != old_cell
    home2 = {
        r["vec_id"]: r["cid"]
        for r in idx._read_idmap(
            spark, m2, sorted(int(b) for b in m2["idmap"])
        ).collect()
    }
    assert home2[x] == rows[0][0]

    # probes == full rebuild over the corpus with X's embedding replaced
    rebuilt = AnnIndex(str(tmp_path / "mig_truth"))
    rebuilt.build(
        corpus.filter(F.col("vec_id") != x).unionByName(upsert),
        label="truth",
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    got = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    want = sorted(map(tuple, rebuilt.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got == want

    # deletes are routed by idmap, keyed on vec_id ONLY (no embedding /
    # before-image needed), and deleting an absent id is a clean no-op
    idx.append(None, deletes=spark.createDataFrame([(x,)], "vec_id long"),
               label="del-x")
    m3 = idx.meta()
    left = (
        idx._read_cells(spark, m3, sorted(int(c) for c in m3["cellmap"]))
        .filter(F.col("vec_id") == x).count()
    )
    assert left == 0
    assert x not in {
        r["vec_id"]
        for r in idx._read_idmap(
            spark, m3, sorted(int(b) for b in m3["idmap"])
        ).collect()
    }
    before = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    idx.append(None, deletes=spark.createDataFrame([(10**9,)], "vec_id long"),
               label="del-absent")
    after = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    assert after == before


def test_ann_index_build_refuses_degenerate_quantizer(spark, sf_smoke, tmp_path):
    """A training set with no centroid or codebook donor rows must fail
    the build loudly instead of committing an index that silently
    assigns/encodes nothing forever (ADVICE r7, medium — the annstream
    bootstrap inherits this guard)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    (emb,) = load(spark, sf_smoke, "embeddings")
    no_donors = emb.filter(
        (F.col("vec_id") % 53 != 1) & (F.col("vec_id") % 127 != 1)
    )
    idx = AnnIndex(str(tmp_path / "degen"))
    with _pytest.raises(ValueError, match="degenerate"):
        idx.build(no_donors, label="bad")
    assert idx.current_version() is None  # nothing committed


def test_ann_index_compact_and_version_probe(spark, sf_smoke, tmp_path):
    """compact() folds a multi-version cell chain into one self-contained
    layer: probes are unchanged bit-for-bit, every live cell is owned by
    the new version, and the previous tip remains probe-able (time
    travel) until the GC window moves past it."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    pred = "(vec_id % 100 = 2) AND (vec_id % 53 <> 1) AND (vec_id % 127 <> 1)"
    (emb,) = load(spark, sf_smoke, "embeddings")
    idx = AnnIndex(str(tmp_path / "cmp"))
    idx.build(emb.filter(F.expr(f"NOT ({pred})")), label="base")
    v_delta = idx.append(emb.filter(F.expr(pred)), label="delta")
    assert len(set(idx.meta()["cellmap"].values())) > 1  # spans versions

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    before = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))

    v_cmp = idx.compact(spark, label="cmp1")
    m = idx.meta()
    assert set(m["cellmap"].values()) == {v_cmp}  # one self-contained layer
    after = sorted(map(tuple, idx.probe(spark, queries, nprobe=2, k=10).collect()))
    assert after == before  # fold is a pure move, bit-identical

    # time travel: the previous tip (pre-compaction) still probes —
    # its closure is retained as the GC escape hatch
    old = sorted(map(tuple, idx.probe(
        spark, queries, nprobe=2, k=10, version=v_delta
    ).collect()))
    assert old == before

    # replaying the compaction label is a no-op
    assert idx.compact(spark, label="cmp1") == v_cmp


def test_ann_index_attrs_survive_append_and_compact(spark, sf_smoke, tmp_path):
    """Metadata attrs (filtered-probe columns) must ride through append's
    touched-cell rewrite AND compact's fold unchanged — and an append
    whose batch lacks the attr columns must refuse loudly rather than
    write schema-divergent cells."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    pred = "(vec_id % 100 = 2) AND (vec_id % 53 <> 1) AND (vec_id % 127 <> 1)"
    (emb,) = load(spark, sf_smoke, "embeddings")
    idx = AnnIndex(str(tmp_path / "attrs"))
    idx.build(emb.filter(F.expr(f"NOT ({pred})")), label="base",
              attrs=("label",))

    # attr-less batch refused
    with _pytest.raises(ValueError, match="lacks"):
        idx.append(
            emb.filter(F.expr(pred)).select("vec_id", "embedding"),
            label="bad",
        )

    idx.append(emb.filter(F.expr(pred)), label="delta")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    before = sorted(map(tuple, idx.probe(
        spark, queries, nprobe=2, k=10, where="label = 3"
    ).collect()))
    assert before  # the filter actually selects something

    idx.compact(spark, label="fold")
    after = sorted(map(tuple, idx.probe(
        spark, queries, nprobe=2, k=10, where="label = 3"
    ).collect()))
    assert after == before  # fold moved the attr column bit-for-bit

    # filtered == unfiltered restricted to passing neighbors, on the same
    # candidate cells (pre-filter semantics sanity)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    unfiltered = idx.probe(spark, queries, nprobe=2, k=10**6).collect()
    expect = {}
    for r in sorted(unfiltered, key=lambda r: (r["qid"], r["approx_dist2"], r["neighbor_id"])):
        if labels[r["neighbor_id"]] == 3:
            expect.setdefault(r["qid"], [])
            if len(expect[r["qid"]]) < 10:
                expect[r["qid"]].append((r["neighbor_id"], r["approx_dist2"]))
    got = {}
    for (qid, nid, d2, rk) in sorted(after, key=lambda t: (t[0], t[3])):
        got.setdefault(qid, []).append((nid, d2))
    assert got == {q: v for q, v in expect.items() if v}


def test_ann_index_pre_idmap_layout_fails_actionably(spark, sf_smoke, tmp_path):
    """A v2-layout index (meta without 'idmap') cannot be incrementally
    maintained: BOTH append and compact must raise the explicit
    rebuild-required ValueError — compact used to die with a raw
    KeyError('idmap') from _read_idmap (round-8 review)."""
    import json as _json
    import os as _os

    import pyspark.sql.functions as F
    import pytest as _pytest

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex, _META

    (emb,) = load(spark, sf_smoke, "embeddings")
    idx = AnnIndex(str(tmp_path / "v2"))
    ver = idx.build(emb, label="base")
    mpath = _os.path.join(str(tmp_path / "v2"), ver, _META)
    m = _json.loads(open(mpath).read())
    del m["idmap"]
    with open(mpath, "w") as f:
        f.write(_json.dumps(m, sort_keys=True))

    batch = emb.limit(1).select("vec_id", "embedding")
    with _pytest.raises(ValueError, match="rebuild required"):
        idx.append(batch, label="a")
    with _pytest.raises(ValueError, match="rebuild required"):
        idx.compact(spark, label="c")


def test_annindex_sharded_assignment_equals_broadcast_build(spark, sf_smoke,
                                                            tmp_path):
    """An index built (and appended) with the sharded shuffle-join
    quantizer assignment — the past-the-broadcast-budget fallback — is
    IDENTICAL to the broadcast-assigned one: same vec_id -> cell map,
    same probe answers, through both build and append maintenance."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    (emb,) = load(spark, sf_smoke, "embeddings")
    base = emb.filter("vec_id % 5 <> 2")
    delta = emb.filter("vec_id % 5 = 2")

    bcast = AnnIndex(str(tmp_path / "bcast"))
    shard = AnnIndex(str(tmp_path / "shard"), assignment_shards=4)
    for idx in (bcast, shard):
        idx.build(base, label="b")
        idx.append(delta, label="d")

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    got = sorted(map(tuple, shard.probe(spark, queries, nprobe=2, k=10)
                     .collect()))
    want = sorted(map(tuple, bcast.probe(spark, queries, nprobe=2, k=10)
                      .collect()))
    assert got == want and got
    # the knob is PERSISTED: a fresh opener (the annstream/ingest serving
    # shape) inherits the build-time sharding from _META — no constructor
    # argument — and carries it into the meta of versions IT writes
    fresh = AnnIndex(str(tmp_path / "shard"))
    assert fresh.meta()["assignment_shards"] == 4
    assert sorted(map(tuple, fresh.probe(spark, queries, nprobe=2, k=10)
                      .collect())) == want
    fresh.append(None, deletes=emb.filter("vec_id = 3").select("vec_id"),
                 label="d2")
    assert fresh.meta()["assignment_shards"] == 4
    # mirror the delete so the cellmap comparison below stays apples-to-apples
    bcast.append(None, deletes=emb.filter("vec_id = 3").select("vec_id"),
                 label="d2")
    assert AnnIndex(str(tmp_path / "bcast")).meta()["assignment_shards"] \
        is None
    # the stored assignment itself matches cell-for-cell
    def cellmap(idx):
        m = idx.meta()
        rows = []
        for cid, ver in m["cellmap"].items():
            p = f"{idx.root}/{ver}/cells/cid={cid}"
            rows.extend((r["vec_id"], int(cid))
                        for r in spark.read.parquet(p).collect())
        return sorted(rows)
    assert cellmap(shard) == cellmap(bcast)
    # a REBUILD over the existing index (fresh opener, no knob — the
    # remedy the rebuild-required errors prescribe) inherits the
    # persisted sharding into the new version it writes
    rebuilt = AnnIndex(str(tmp_path / "shard"))
    rebuilt.build(base, label="rebuild")
    assert rebuilt.meta()["assignment_shards"] == 4


def test_fresh_build_auto_computes_assignment_shards(spark, tmp_path, sf_smoke):
    """A genuinely fresh build (no knob, no prior _META) must DERIVE
    assignment_shards from the trained quantizer via the documented
    ceil(|C| x d x 8 B / broadcast budget) rule instead of silently
    broadcasting — at a true 100 TB corpus the first build is exactly
    where the ~230 MB quantizer would otherwise ship as a broadcast
    (r12 verdict). The budget is shrunk so the test corpus's quantizer
    crosses it; results must equal the broadcast-path build."""
    import math

    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    (emb,) = load(spark, sf_smoke, "embeddings")

    bcast = AnnIndex(str(tmp_path / "bc"))
    bcast.build(emb, label="b")
    assert bcast.meta()["assignment_shards"] is None  # under the budget

    # shrink the budget below |C| x d x 8 B: auto rule must kick in
    cent = spark.read.parquet(bcast.table_path("centroids"))
    c, d = cent.count(), len(cent.first()["ce"])
    budget = max(1, (c * d * 8) // 3)
    auto = AnnIndex(str(tmp_path / "auto"), broadcast_budget_bytes=budget)
    auto.build(emb, label="b")
    got = auto.meta()["assignment_shards"]
    assert got == math.ceil(c * d * 8 / budget) and got > 1

    # recorded without the caller asking, AND row-identical to broadcast
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    assert sorted(map(tuple,
                      auto.probe(spark, queries, nprobe=2, k=10).collect())) \
        == sorted(map(tuple,
                      bcast.probe(spark, queries, nprobe=2, k=10).collect()))
    # a fresh opener of the auto index inherits the derived decision
    assert AnnIndex(str(tmp_path / "auto")).meta()["assignment_shards"] == got

    # REBUILD over an index whose _META persisted null (built under the
    # default budget) must still derive the rule for its NEW quantizer
    # (r13 review: the 'rebuild required' remedy path must not inherit
    # the stale broadcast decision past the budget) ...
    regrown = AnnIndex(str(tmp_path / "bc"), broadcast_budget_bytes=budget)
    regrown.build(emb, label="rebuild")
    assert regrown.meta()["assignment_shards"] == got
    # ... and an inherited EXPLICIT decision is never downgraded below
    # the new quantizer's own rule (max of the two)
    wide = AnnIndex(str(tmp_path / "wide"),
                    assignment_shards=got + 5)
    wide.build(emb, label="b")
    rebuilt_wide = AnnIndex(str(tmp_path / "wide"),
                            broadcast_budget_bytes=budget)
    rebuilt_wide.build(emb, label="rebuild")
    assert rebuilt_wide.meta()["assignment_shards"] == got + 5
