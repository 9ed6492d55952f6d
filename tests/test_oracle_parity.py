"""Replicates the driver's DuckDB-oracle gate locally (sf0.001 for speed;
set SPARK_GRAFT_CORRECT_DIR=/root/testdata/sf0.01 for the full check)."""

from __future__ import annotations

import pytest

from pgcdc_spark.oracle import compare, duck_connect
from pgcdc_spark.queries import all_queries


def _oracle_queries():
    return [(n, qd) for n, qd in all_queries().items() if qd.oracle is not None]


@pytest.mark.parametrize("name,qd", _oracle_queries(), ids=[n for n, _ in _oracle_queries()])
def test_parity(spark, sf_smoke, name, qd):
    con = duck_connect(sf_smoke)
    spark_pdf = qd.fn(spark, sf_smoke).toPandas()
    duck_pdf = con.execute(qd.oracle).df()
    res = compare(name, spark_pdf, duck_pdf)
    assert res.ok, res.detail


def test_all_queries_run(spark, sf_smoke):
    """Queries without an oracle must still execute and return a schema."""
    for name, qd in all_queries().items():
        if qd.oracle is None:
            df = qd.fn(spark, sf_smoke)
            assert df.columns, name
            df.limit(5).collect()
