"""Env-gated sf0.1 scale-robustness sweep (the SURVEY §5 claim, in CI
shape).

The full oracle surface must hash-match DuckDB at 10x the driver gate —
minus the three CC-composed queries whose recursive-CTE oracles are
ORACLE-side superlinear at that size (dedup_cc_clusters,
dedup_keep_best, and the training_mix_pipeline composition that embeds
the keep-best stage; their invariants are pytest-pinned in
test_llm.py).

Gated because it is a ~10-minute run: enable with

    SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_sf01_sweep.py -q

or regenerate the checked-in artifact directly:

    python scripts/parity_sweep.py /root/testdata/sf0.1 \
        --skip dedup_cc_clusters,dedup_keep_best,training_mix_pipeline \
        --out SWEEP_SF01.json
"""

from __future__ import annotations

import os

import pytest

SF01 = "/root/testdata/sf0.1"
SKIP = {"dedup_cc_clusters", "dedup_keep_best", "training_mix_pipeline"}


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_SWEEP"),
    reason="10-minute sweep; set SPARK_GRAFT_SF01_SWEEP=1 to run",
)
def test_full_oracle_surface_at_sf01(spark):
    from pgcdc_spark.oracle import run_parity
    from pgcdc_spark.queries import all_queries

    names = [n for n in all_queries() if n not in SKIP]
    results = run_parity(spark, SF01, names)
    failed = [(r.name, r.detail) for r in results if not r.ok]
    assert not failed, failed
