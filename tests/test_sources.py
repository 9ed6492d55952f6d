"""CSV/JSON source round-trips with explicit schemas, plus partitioned
parquet pruning — the non-parquet rows of SURVEY.md §2.2's sources table.
"""

from __future__ import annotations

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
