"""pgcdc_spark.fs: the state-commit filesystem facade.

The commit protocol (versioned dirs + fsync'd manifest + atomic pointer
swap) must run identically whether the state root is a bare local path
(LocalStateFS / os) or a Hadoop FileSystem URI (HadoopStateFS via the
session JVM) — ``file://`` is the in-container stand-in for hdfs://;
the FileSystem/FileContext calls exercised are the same ones HDFS
serves."""

from __future__ import annotations

import pytest

from pgcdc_spark.fs import HadoopStateFS, LocalStateFS, get_fs


def test_get_fs_dispatch(spark, tmp_path):
    assert isinstance(get_fs(str(tmp_path)), LocalStateFS)
    assert isinstance(get_fs(f"file://{tmp_path}"), HadoopStateFS)
    # (an hdfs:// root dispatches the same way; constructing one here
    # would eagerly resolve the namenode, so file:// is the proof)


@pytest.mark.parametrize("scheme", ["local", "file"])
def test_facade_op_contract(spark, tmp_path, scheme):
    """Both implementations satisfy the contract the stores rely on:
    atomic replace onto an existing file, ENOENT-typed rename of a
    missing source, idempotent recursive delete, FileNotFoundError
    reads."""
    root = str(tmp_path / "fsroot") if scheme == "local" else f"file://{tmp_path}/fsroot"
    fs = get_fs(root)
    fs.mkdirs(f"{root}/a/b")
    assert fs.is_dir(f"{root}/a/b") and not fs.exists(f"{root}/nope")

    fs.write_text_atomic(f"{root}/a/PTR", "v1\n")
    fs.write_text_atomic(f"{root}/a/PTR", "v2\n")  # replace onto existing
    assert fs.read_text(f"{root}/a/PTR").strip() == "v2"
    assert fs.is_file(f"{root}/a/PTR") and not fs.is_dir(f"{root}/a/PTR")
    assert sorted(fs.listdir(f"{root}/a")) == ["PTR", "b"]
    assert fs.mtime(f"{root}/a/PTR") > 0

    fs.rename(f"{root}/a/b", f"{root}/a/c")
    assert fs.is_dir(f"{root}/a/c") and not fs.exists(f"{root}/a/b")
    with pytest.raises(FileNotFoundError):
        fs.rename(f"{root}/a/gone", f"{root}/a/x")
    with pytest.raises(FileNotFoundError):
        fs.read_text(f"{root}/a/missing")

    fs.delete(f"{root}/a/c")
    fs.delete(f"{root}/a/c")  # idempotent
    assert not fs.exists(f"{root}/a/c")


def test_bucketed_store_on_file_uri_root(spark, tmp_path):
    """Full BucketedStateStore lifecycle — merge, replay no-op, read,
    lookup, compact, history — under a ``file:`` URI root: every
    manifest/COMMIT/GC touch goes through HadoopStateFS (an os.path call
    on a URI would throw), proving the store runs wherever a Hadoop
    FileSystem does."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    root = f"file://{tmp_path}/state"
    store = BucketedStateStore(root, n_buckets=4, compact_after=2)
    assert isinstance(store.fs, HadoopStateFS)
    schema = "lsn string, op string, id long, grp string, val double"

    b1 = spark.createDataFrame(
        [("0/01", "I", 1, "A", 1.0), ("0/02", "I", 2, "B", 2.0)], schema)
    b2 = spark.createDataFrame(
        [("0/03", "U", 1, "A", 5.0), ("0/04", "I", 3, "A", 3.0)], schema)
    assert store.merge(b1, keys=["id"], order_by=["lsn"], label="1") is not None
    assert store.merge(b2, keys=["id"], order_by=["lsn"], label="2") is not None
    # replayed label is a no-op through the URI-read manifest
    assert store.merge(b2, keys=["id"], order_by=["lsn"], label="2") is None

    live = {r["id"]: r["val"] for r in store.read(spark).filter("op != 'D'").collect()}
    assert live == {1: 5.0, 2: 2.0, 3: 3.0}

    hits = store.lookup(spark, ["id"], [(1,), (3,)])
    assert sorted(r["id"] for r in hits.collect()) == [1, 3]

    # force a full compaction + GC under the URI root
    assert store.compact(spark, label="2c") is not None
    live2 = {r["id"]: r["val"] for r in store.read(spark).filter("op != 'D'").collect()}
    assert live2 == live
    assert len(store.history()) >= 1


def test_agg_view_delta_log_on_file_uri_root(spark, tmp_path):
    """IVM delta-log compaction (fold + COMMIT + victim delete + publish
    rename) under a ``file:`` URI root, including a reconstructed
    post-rename crash recovery."""
    import json
    from decimal import Decimal

    from pgcdc_spark.fs import get_fs
    from pgcdc_spark.streaming.ivm import AggView, _compact_delta_log, _no_deltas

    view = AggView("g", group_cols=["grp"], sum_col="val")
    root = f"file://{tmp_path}/view_g"
    fs = get_fs(root)
    dschema = "grp string, sum_delta decimal(28,6), count_delta long"
    for i, rows in enumerate([[("A", Decimal("1.0"), 1)],
                              [("A", Decimal("2.0"), 1), ("B", Decimal("4.0"), 1)]]):
        spark.createDataFrame(rows, dschema).write.mode("overwrite").parquet(
            f"{root}/delta_batch={i}")
    assert not _no_deltas(root)

    def fold(df):
        import pyspark.sql.functions as F
        return df.groupBy("grp").agg(F.sum("sum_delta").alias("sum_delta"),
                                     F.sum("count_delta").alias("count_delta"))

    _compact_delta_log(spark, root, fold)
    (base,) = fs.listdir(root)
    assert base.startswith("delta_batch=base-")  # unique publish name
    got = {r["grp"]: (float(r["sum_delta"]), r["count_delta"])
           for r in spark.read.parquet(root).collect()}
    assert got == {"A": (3.0, 2), "B": (4.0, 1)}

    # post-rename crash window under the URI root: recovery must not
    # delete the published base
    fs.mkdirs(f"{root}/_compact")
    fs.write_text_atomic(f"{root}/_compact/COMMIT",
                         json.dumps([base]))
    _compact_delta_log(spark, root, fold)  # writer path runs recovery first
    # legacy scratch discarded; the re-fold publishes under a fresh name
    (base2,) = fs.listdir(root)
    assert base2.startswith("delta_batch=base-")
    got2 = {r["grp"]: (float(r["sum_delta"]), r["count_delta"])
            for r in spark.read.parquet(root).collect()}
    assert got2 == got


def test_hadoop_delete_swallows_only_not_found(spark, tmp_path):
    """State-GC deletes: a missing path stays a no-op, but a permission /
    IO failure must surface loudly (round-6 review: the blanket except
    hid those)."""
    root = f"file://{tmp_path}/delroot"
    fs = get_fs(root)
    fs.mkdirs(f"{root}/gcme")

    class PermBoom:
        def delete(self, p, rec):
            raise RuntimeError("java.io.IOException: Permission denied")

        def exists(self, p):
            return True

    class NotFound:
        def delete(self, p, rec):
            raise RuntimeError("java.io.FileNotFoundException: gone")

        def exists(self, p):
            return True

    real = fs._fs
    try:
        fs._fs = PermBoom()
        with pytest.raises(RuntimeError, match="Permission denied"):
            fs.delete(f"{root}/gcme")
        fs._fs = NotFound()
        fs.delete(f"{root}/gcme")  # not-found-shaped: no-op
    finally:
        fs._fs = real
    fs.delete(f"{root}/never-existed")  # plain missing path: no-op
    assert fs.is_dir(f"{root}/gcme")


def test_ann_index_on_file_uri_root(spark, tmp_path):
    """The ANN index artifact is FS-portable like the state store: build,
    append, and probe against a file: URI root route every manifest and
    cellmap operation through HadoopStateFS, bit-identical to a local
    root over the same corpus."""
    import pyspark.sql.functions as F

    from pgcdc_spark.catalog import load
    from pgcdc_spark.operators.annindex import AnnIndex

    (emb,) = load(spark, "/root/testdata/sf0.001", "embeddings")
    pred = "(vec_id % 100 = 2) AND (vec_id % 53 <> 1) AND (vec_id % 127 <> 1)"
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("e"),
    )

    uri = AnnIndex(f"file://{tmp_path}/ann_uri")
    uri.build(emb.filter(F.expr(f"NOT ({pred})")), label="base")
    uri.append(emb.filter(F.expr(pred)), label="delta")
    local = AnnIndex(str(tmp_path / "ann_local"))
    local.build(emb.filter(F.expr(f"NOT ({pred})")), label="base")
    local.append(emb.filter(F.expr(pred)), label="delta")

    got = sorted(map(tuple, uri.probe(spark, queries, nprobe=2, k=10).collect()))
    want = sorted(map(tuple, local.probe(spark, queries, nprobe=2, k=10).collect()))
    assert got and got == want
    assert len(set(uri.meta()["cellmap"].values())) > 1  # chain spans versions
