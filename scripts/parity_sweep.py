"""Fast local parity sweep: one Spark session, all oracle queries.

Usage: python scripts/parity_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgcdc_spark.oracle import run_parity  # noqa: E402
from pgcdc_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark(app_name="parity-sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    results = run_parity(spark, sf_dir, names)
    failed = [r for r in results if not r.ok]
    for r in results:
        print(f"{'PASS' if r.ok else 'FAIL':4} {r.name:32} {r.detail}")
    print(f"\n{len(results) - len(failed)}/{len(results)} pass in {time.time() - t0:.1f}s")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
