"""Env-gated sf0.1 scale-robustness sweep (the SURVEY §5 claim, in CI
shape).

The FULL oracle surface must hash-match DuckDB at 10x the driver gate —
zero skips. (Rounds 5-9 excluded the three CC-composed queries because
their recursive-CTE oracles were superlinear over the then ~500k-edge
LSH candidate graph; the round-10 trigram-shingle + r=4 banding fix
collapsed that graph to O(corpus) edges and the oracles now run at
sf0.1 in seconds.)

Gated because it is a ~10-minute run: enable with

    SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_sf01_sweep.py -q

or regenerate the checked-in artifact directly:

    python scripts/parity_sweep.py /root/testdata/sf0.1 --out SWEEP_SF01.json
"""

from __future__ import annotations

import os

import pytest

SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_SWEEP"),
    reason="10-minute sweep; set SPARK_GRAFT_SF01_SWEEP=1 to run",
)
def test_full_oracle_surface_at_sf01(spark):
    from pgcdc_spark.oracle import run_parity
    from pgcdc_spark.queries import all_queries

    results = run_parity(spark, SF01, list(all_queries()))
    failed = [(r.name, r.detail) for r in results if not r.ok]
    assert not failed, failed
