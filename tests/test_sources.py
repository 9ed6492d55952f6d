"""CSV/JSON source round-trips with explicit schemas, plus partitioned
parquet pruning — the non-parquet rows of SURVEY.md §2.2's sources table.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pgcdc_spark import sources
from pgcdc_spark.catalog import load


@pytest.fixture(scope="module")
def nation(spark, sf_smoke):
    (df,) = load(spark, sf_smoke, "nation")
    return df


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip_preserves_values_and_schema(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv")
    sources.write_csv(nation, path)
    back = sources.read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_json_roundtrip_preserves_values(spark, nation, tmp_path):
    path = str(tmp_path / "nation_json")
    sources.write_json(nation, path)
    back = sources.read_json(spark, path, nation.schema)
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_orc_roundtrip_and_partition_pruning(spark, nation, sf_smoke, tmp_path):
    """ORC is the third columnar format on the source/sink surface: exact
    round trip (embedded schema), and partitioned writes prune directories
    on read like parquet does."""
    path = str(tmp_path / "nation_orc")
    sources.write_orc(nation, path)
    back = sources.read_orc(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert _sorted_rows(back) == _sorted_rows(nation)

    (orders,) = load(spark, sf_smoke, "orders")
    part = str(tmp_path / "orders_orc")
    sources.write_orc(
        orders.withColumn("status", F.col("o_orderstatus")), part,
        partition_by=["status"],
    )
    pruned = sources.read_orc(spark, part).filter(F.col("status") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan
    got = pruned.count()
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert got == want > 0


def test_csv_permissive_nulls_bad_lines(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("id,name\n1,ok\nnot_an_int,broken\n2,fine\n")
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    df = sources.read_csv(spark, str(p), schema)
    rows = {r["name"]: r["id"] for r in df.collect()}
    assert rows["ok"] == 1 and rows["fine"] == 2
    assert rows["broken"] is None  # malformed cell nulled, row kept


def test_partitioned_parquet_prunes(spark, sf_smoke, tmp_path):
    """Writing partitioned by a key and filtering on it must prune
    partitions at plan time (PartitionFilters, not a full scan)."""
    (orders,) = load(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_by_status")
    sources.write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError):
        sources.read_jdbc(spark, "jdbc:postgresql://x/y", "t", partition_column="id")


# --- bucketed tables: the pay-shuffle-once-at-ingest path -------------------

def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with ZERO
    Exchange operators — the co-located join that makes repeated fact
    joins affordable at scale."""
    import pyspark.sql.functions as F

    from pgcdc_spark.sources import write_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so bucketing is what's being tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        write_bucketed(li.select("l_orderkey", "l_quantity"), "b_li",
                       ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
        write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders",
                       ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
        j = spark.table("b_li").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        n = j.count()
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_ddl_surface(spark):
    from pgcdc_spark.catalog import create_table, create_table_as, drop_table

    try:
        create_table(spark, "ddl_t", "id BIGINT, name STRING")
        spark.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
        assert spark.table("ddl_t").count() == 2
        create_table_as(spark, "ddl_t2",
                        spark.table("ddl_t").where("id = 1"))
        assert [r["name"] for r in spark.table("ddl_t2").collect()] == ["a"]
    finally:
        drop_table(spark, "ddl_t")
        drop_table(spark, "ddl_t2")
        assert "ddl_t" not in [t.name for t in spark.catalog.listTables()]


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_JDBC_URL"),
    reason="opt-in live-JDBC smoke: set SPARK_GRAFT_JDBC_URL "
           "(e.g. jdbc:postgresql://host/db?user=u&password=p) on a host "
           "with a reachable database and a `students` table",
)
def test_jdbc_partitioned_pushdown_smoke(spark):
    """Live-DB smoke (skipped in this container — no database): a range-
    partitioned scan must produce N parallel range queries and push a
    filter down to the remote engine (PushedFilters in the scan node)."""
    from pgcdc_spark import sources

    url = os.environ["SPARK_GRAFT_JDBC_URL"]
    table = os.environ.get("SPARK_GRAFT_JDBC_TABLE", "students")
    df = sources.read_jdbc(
        spark, url, table,
        partition_column="id", lower_bound=0, upper_bound=10_000,
        num_partitions=4,
    ).filter("id >= 100")
    assert df.rdd.getNumPartitions() == 4
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:200]
    assert df.count() >= 0


def test_dynamic_partition_pruning(spark, tmp_path):
    """A partitioned fact joined to a FILTERED dim on the partition column
    must prune partitions at RUNTIME (dynamicpruning subquery in the scan)
    — the selective values are only known after the dim filter runs, so
    static pruning can't do this; at scale DPP is the difference between
    scanning one status partition and scanning the table."""
    import pyspark.sql.functions as F

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    pdir = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(pdir)
    fact = spark.read.parquet(pdir)
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "done"), ("P", "pending")], "st string, label string"
    )
    sel = dim.filter(F.col("label") == "open")
    j = fact.join(sel.hint("broadcast"), fact.o_orderstatus == sel.st)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP subquery missing from scan"
    assert j.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion: a directory of raw PPM/WAV/text files becomes
    the (doc_id, modality, payload) shape, glob-pruned at listing time,
    and flows straight through extract_features with REAL decodes."""
    import pyspark.sql.functions as F

    from pgcdc_spark.multimodal import _synth_audio, _synth_image, extract_features
    from pgcdc_spark.sources import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.ppm").write_bytes(_synth_image(4))
    (d / "b.wav").write_bytes(_synth_audio(5))
    (d / "c.txt").write_text("plain text payload")
    (d / "skip.bin").write_bytes(b"\x00" * 8)

    mm = read_binary_files(spark, str(d), glob="*.{ppm,wav,txt}")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in mm.collect()}
    assert set(rows) == {"a.ppm", "b.wav", "c.txt"}  # glob pruned skip.bin
    assert rows["a.ppm"]["modality"] == "image"
    assert rows["b.wav"]["modality"] == "audio"
    assert rows["c.txt"]["modality"] == "text"
    assert rows["a.ppm"]["payload"] == _synth_image(4)
    assert len({r["doc_id"] for r in rows.values()}) == 3  # stable distinct ids

    feats = extract_features(
        mm.select("doc_id", "modality", "payload"), fake=False
    ).collect()
    by_mod = {r["modality"]: r for r in feats}
    assert set(by_mod) == {"image", "audio", "text"}
    assert all(len(r["feature"]) == 8 for r in feats)
    # the image row carries REAL channel statistics of the decoded raster
    import numpy as np

    from pgcdc_spark.multimodal import PpmImageCodec, image_feature

    want = image_feature(PpmImageCodec().decode(_synth_image(4)))
    got = list(by_mod["image"]["feature"])
    assert got == [np.float32(x) for x in want]


def test_avro_round_trip_if_available(spark, tmp_path):
    """Avro is an external Spark module (spark-avro jar); absent in this
    container, so the round trip gates on availability — on a cluster
    with the jar it runs for real."""
    import pytest

    from pgcdc_spark.sources import read_avro, write_avro

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    try:
        write_avro(df, str(tmp_path / "avro"))
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            pytest.skip("spark-avro jar not deployed in this container")
        raise
    back = read_avro(spark, str(tmp_path / "avro"))
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
