#!/usr/bin/env python
"""Snapshot .explain("formatted") for named queries -> plans/<tag>/<q>_<suffix>.txt.

Optimization-round evidence tool: capture the physical plan of every query
named on the command line (or the full bench set) before and after a change.

    python scripts/snap_plans.py <tag> <suffix> [query ...]

e.g.  python scripts/snap_plans.py r13 before q1_pricing_summary
With no query names, snapshots the whole bench set (HEADLINE + EXTRA).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import EXTRA, HEADLINE
    from pgcdc_spark.queries import all_queries
    from pgcdc_spark.session import get_spark

    if not names:
        names = HEADLINE + EXTRA

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="pgcdc-plan-snap")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from dump_plans import indicators

    for name in names:
        df = qs[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) sf_dir={sf}\n")
            f.write(f"# indicators: {indicators(plan)}\n\n")
            f.write(plan)
        print(f"{name}: {indicators(plan)}")


if __name__ == "__main__":
    main()
