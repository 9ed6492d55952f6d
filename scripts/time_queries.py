#!/usr/bin/env python
"""Spot-time named queries with the bench methodology (warmups + measured
medians, collect() action, shared-cache release between runs) without
running the whole bench. Optimization-round A/B tool.

    python scripts/time_queries.py q1 q2 ...          # 1 warmup + 3 runs
    N_WARM=2 N_MEAS=5 python scripts/time_queries.py q1

Prints one line per query: name, median, per-run times.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ["PGCDC_IVM_CACHE"] = "0"
    # mirror bench.py (r14): index-family spots must never ride a
    # cross-run artifact; set PGCDC_ANN_CACHE=1 explicitly to opt out
    os.environ.setdefault("PGCDC_ANN_CACHE", "0")
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_warm = int(os.environ.get("N_WARM", "1"))
    n_meas = int(os.environ.get("N_MEAS", "3"))

    from pgcdc_spark.cache import release_shared
    from pgcdc_spark.queries import all_queries
    from pgcdc_spark.session import get_spark

    spark = get_spark(app_name="pgcdc-spot-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    import gc

    for name in names:
        qd = qs[name]
        spark.sparkContext.setJobDescription(f"spot:{name}")
        for _ in range(n_warm):
            qd.fn(spark, sf_dir).collect()
            release_shared()
        per_run = []
        for _ in range(n_meas):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).collect()
            per_run.append(round(time.perf_counter() - t0, 4))
            release_shared()
        gc.collect()
        med = sorted(per_run)[len(per_run) // 2]
        print(f"{name:40s} {med:7.3f}  runs={per_run}", flush=True)


if __name__ == "__main__":
    main()
