"""Fast local parity sweep: one Spark session, all oracle queries.

Usage: python scripts/parity_sweep.py [sf_dir] [name ...]
                                      [--skip n1,n2] [--out FILE.json]

One-command scale-robustness regeneration (the SURVEY sf0.1 claim):

    python scripts/parity_sweep.py /root/testdata/sf0.1 \
        --skip dedup_cc_clusters,dedup_keep_best --out SWEEP_SF01.json

(the two skips are the CC-composed queries whose recursive-CTE DuckDB
oracles are oracle-side superlinear at sf0.1; their invariants are
pytest-pinned instead). The JSON artifact records pass/fail + detail per
query so each round's sweep is auditable. tests/test_sf01_sweep.py wraps
the same call as an env-gated pytest target.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgcdc_spark.oracle import run_parity  # noqa: E402
from pgcdc_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    skip: set[str] = set()
    out_path: str | None = None
    pos: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--skip":
            skip |= set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    sf_dir = pos[0] if pos else "/root/testdata/sf0.001"
    names = pos[1:] or None
    if names is None and skip:
        from pgcdc_spark.queries import all_queries

        names = [n for n in all_queries() if n not in skip]
    spark = get_spark(app_name="parity-sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    results = run_parity(spark, sf_dir, names)
    failed = [r for r in results if not r.ok]
    for r in results:
        print(f"{'PASS' if r.ok else 'FAIL':4} {r.name:32} {r.detail}")
    elapsed = round(time.time() - t0, 1)
    print(f"\n{len(results) - len(failed)}/{len(results)} pass in {elapsed}s")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "skipped": sorted(skip),
                    "pass": len(results) - len(failed),
                    "total": len(results),
                    "elapsed_sec": elapsed,
                    "results": {r.name: {"ok": r.ok, "detail": r.detail}
                                for r in results},
                },
                f, indent=1,
            )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
