"""Engine operator helpers: salted join equivalence."""

from __future__ import annotations

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
