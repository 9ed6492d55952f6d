"""Compare two BENCH JSON files per query.

Usage: python scripts/bench_compare.py BENCH_r03.json BENCH_r04.json

Accepts either the raw one-line bench output or the driver's wrapper
({"parsed": {...}} / {"tail": "...json..."}). Prints per-query medians,
the ratio, and each side's raw runs where present, so a 2x total delta
can be attributed to specific queries (or to uniform machine drift —
see SURVEY.md §6's variance note).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    if "parsed" in doc and doc["parsed"]:
        return doc["parsed"]
    if "tail" in doc:
        for line in reversed(doc["tail"].splitlines()):
            line = line.strip().lstrip("\r")
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"{path}: no bench payload found")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    ra, rb = a.get("runs", {}), b.get("runs", {})
    names = sorted(set(qa) | set(qb))
    print(f"{'query':32} {'old':>8} {'new':>8} {'ratio':>6}")
    for n in names:
        va, vb = qa.get(n), qb.get(n)
        ratio = f"{vb / va:6.2f}" if va and vb else "     -"
        print(
            f"{n:32} {va if va is not None else '-':>8} "
            f"{vb if vb is not None else '-':>8} {ratio}"
            + (f"  runs {ra.get(n, '')} -> {rb.get(n, '')}" if n in ra or n in rb else "")
        )
    print(f"\ntotal: {a.get('value')} -> {b.get('value')}")


if __name__ == "__main__":
    main()
