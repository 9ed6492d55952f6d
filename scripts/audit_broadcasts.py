#!/usr/bin/env python
"""Engine-wide AQE-broadcast-hazard audit -> AUDIT_BROADCAST.json.

The one bug class this engine has now hit twice (r10 bigram-shingle LSH,
r11 dup-gram AQE broadcast -> driver OOM at sf10) is a join whose build
side GROWS WITH THE CORPUS but sits under the broadcast threshold at
test scale: the plan that passes every small-SF test is not the plan
that survives 100 TB, because "small enough to broadcast at test scale
is not a property of the plan".

This audit makes the hazard measurable for EVERY registry query instead
of only where a scale run happened to look.  The invariant it checks:
**join strategy must be scale-invariant**.  A fixed-size build side
(codebooks, date spines, query sets, verdict frames) is broadcast at
every scale; a corpus-scaled side crosses the threshold as the corpus
grows, so its join STRATEGY FLIPS between scales — and any scale where
it is still broadcast is a scale where the broadcast cost is growing
linearly toward an OOM.

Two tiers, because the threshold is consulted twice:

- ``static``: `explain` on the un-executed frame at sf0.01 vs sf1
  (100x) — catches broadcasts decided from FILE-SIZE statistics
  (base-table build sides).
- ``runtime``: execute (collect) and re-read the FINAL adaptive plan at
  sf0.01 vs sf0.1 (10x) — catches AQE converting a post-shuffle
  intermediate to broadcast from its RUNTIME size, invisible to static
  estimates (the r11 dup-gram failure mode).

A "flip" (different join-strategy multiset between the two scales of a
tier) is a human-review flag, not automatically a bug: AQE demoting an
over-estimated SMJ to broadcast on a side that is PROVABLY bounded
(1-row aggregates, per-query top-k) is fine and gets classified as such
in SURVEY.md's audit table.  Every flip on a corpus-scaled side gets a
`hint("merge")`/`hint("shuffle_hash")` pin and a tests/test_plans.py
assertion that the pin (not the estimate) decides the strategy.

Usage: python scripts/audit_broadcasts.py
Writes AUDIT_BROADCAST.json (the committed full-registry, two-tier
artifact) at the repo root. Partial runs — ``--runtime-only`` /
``--static-only`` / ``--only name1,name2`` — REQUIRE ``AUDIT_OUT`` to
point at a different path: a partial sweep must never clobber the
committed evidence.

``--big`` (r12 verdict item 5 — the STANDING decade-up gate, was a
one-off ``--only``+env invocation in r12): audits the heavy scale-set
families one decade higher and writes AUDIT_BROADCAST_BIG.json —
    runtime tier: scale_curve.SCALE_SET on final AQE plans at
                  sf0.1 vs the 10x testdata_sf1 (the decade where the
                  r11 OOM class lived);
    static tier:  scale_curve.SF10_SET on file-size-statistic plans at
                  testdata_sf1 vs the 100x testdata_sf10 (only the
                  documents/embeddings/events-backed subset has tables
                  there; cdc entries drop out if the gitignored 100x
                  events table is absent, same gate as scale_curve).
A new heavy query family added to the scale sets gets this read by
default. Invocation: ``python scripts/audit_broadcasts.py --big``.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)

SF_SMALL = os.environ.get("AUDIT_SF_SMALL", "/root/testdata/sf0.01")
SF_MED = os.environ.get("AUDIT_SF_MED",
                        os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1"))
SF_BIG = os.environ.get("AUDIT_SF_BIG", os.path.join(REPO, "testdata_sf1"))
SF_SF10 = os.environ.get("AUDIT_SF_SF10", os.path.join(REPO, "testdata_sf10"))
OUT = os.environ.get("AUDIT_OUT", "AUDIT_BROADCAST.json")


def fingerprint(plan: str) -> dict[str, int]:
    """Join-strategy multiset from a formatted explain, counted on the
    '(id) Node' detail headers so tree+detail double-printing does not
    double-count (same discipline as scripts/dump_plans.py)."""
    fp = {}
    for node in JOIN_NODES:
        n = len(re.findall(rf"^\(\d+\) {node}", plan, re.M))
        if n:
            fp[node] = n
    return fp


def plan_of(df, execute: bool) -> str:
    if execute:
        # Draining toLocalIterator drives df's OWN QueryExecution, so
        # the adaptive plan this frame re-explains afterwards is the
        # FINAL one (isFinalPlan=true) — a noop write would execute a
        # DIFFERENT QueryExecution and leave df's plan un-finalized.
        # Iterator instead of collect() (ADVICE r12): queries with
        # corpus-scaled outputs (per-doc rows) hold at most one result
        # partition on the driver, so raising the audit scales can
        # never OOM the audit itself.
        for _ in df.toLocalIterator(prefetchPartitions=True):
            pass
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    global OUT
    big = "--big" in sys.argv
    if big and "AUDIT_OUT" not in os.environ:
        OUT = "AUDIT_BROADCAST_BIG.json"  # its own committed artifact
    tiers = {"static", "runtime"}
    if "--runtime-only" in sys.argv:
        tiers = {"runtime"}
    if "--static-only" in sys.argv:
        tiers = {"static"}
    if tiers != {"static", "runtime"} and "AUDIT_OUT" not in os.environ:
        # same clobber guard as --only: a one-tier run must not replace
        # the committed two-tier full-registry artifact (r12 review)
        raise SystemExit(
            "--static-only/--runtime-only write a PARTIAL audit: set "
            f"AUDIT_OUT to a different path (refusing to overwrite {OUT})")
    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            raise SystemExit("usage: --only name1,name2,...")
        only = set(sys.argv[i + 1].split(","))
        if "AUDIT_OUT" not in os.environ:
            # never clobber the committed full-registry artifact with a
            # partial sweep (r12 review): a forgotten AUDIT_OUT would
            # silently replace the 235-query evidence SURVEY.md cites
            # with an n_queries=<subset> file
            raise SystemExit(
                "--only writes a PARTIAL audit: set AUDIT_OUT to a "
                f"different path (refusing to overwrite {OUT})")

    from pgcdc_spark.queries import all_queries
    from pgcdc_spark.session import get_spark

    spark = get_spark(app_name="pgcdc-broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    registered = set(qs)  # full registry, before any --big scoping

    # tier -> ((small_dir, big_dir), execute, name_filter-or-None)
    if big:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_curve import SCALE_SET, SF10_SET

        sf10_names = set(SF10_SET)
        if not os.path.exists(os.path.join(SF_SF10, "events.parquet")):
            # same gate as scale_curve: the 100x events table is
            # gitignored; without it the CDC legs have no sf10 input
            sf10_names = {n for n in sf10_names if not n.startswith("cdc_")}
        tier_cfg = {
            "runtime": ((SF_MED, SF_BIG), True, set(SCALE_SET)),
            "static": ((SF_BIG, SF_SF10), False, sf10_names),
        }
        qs = {n: qs[n] for n in sorted(set(SCALE_SET) | sf10_names)
              if n in qs}
    else:
        tier_cfg = {
            "runtime": ((SF_SMALL, SF_MED), True, None),
            "static": ((SF_SMALL, SF_BIG), False, None),
        }

    out: dict[str, dict] = {}
    t0 = time.time()
    if only:
        unknown = only - set(qs)
        if unknown:
            # in --big mode qs was pre-filtered to the scale sets, so a
            # validly registered name can land here — distinguish a typo
            # (not registered anywhere) from a registered-but-unscoped
            # name instead of sending the operator hunting the wrong
            # list (r13 review, both directions)
            unregistered = sorted(unknown - registered)
            unscoped = sorted(unknown & registered)
            parts = []
            if unregistered:
                parts.append(f"--only names not registered: {unregistered}")
            if unscoped:
                parts.append(
                    f"--only names not in the --big scale sets "
                    f"(SCALE_SET/SF10_SET): {unscoped}")
            raise SystemExit("; ".join(parts))
        qs = {n: qs[n] for n in sorted(only)}
    for i, (name, qd) in enumerate(sorted(qs.items())):
        rec: dict[str, dict] = {}
        for tier, ((sf_a, sf_b), execute, names) in sorted(tier_cfg.items()):
            if tier not in tiers or (names is not None and name not in names):
                continue
            fps, err = {}, None
            for sf in (sf_a, sf_b):
                try:
                    # a persisted intermediate left cached by an earlier
                    # query/tier changes later plans (InMemoryTableScan
                    # replaces whole join subtrees) — measured r12: two
                    # false-positive flips came from exactly this
                    spark.catalog.clearCache()
                    fps[sf] = fingerprint(plan_of(qd.fn(spark, sf), execute))
                except Exception as e:  # record, keep sweeping
                    err = f"{sf}: {type(e).__name__}: {e}"[:300]
                    break
            if err:
                rec[tier] = {"error": err}
            else:
                a, b = fps[sf_a], fps[sf_b]
                rec[tier] = {"small": a, "big": b, "flip": a != b}
        out[name] = rec
        flips = [t for t, r in rec.items() if r.get("flip")]
        mark = f"  FLIP[{','.join(flips)}]" if flips else ""
        errs = [t for t, r in rec.items() if "error" in r]
        if errs:
            mark += f"  ERR[{','.join(errs)}]"
        print(f"[{i + 1}/{len(qs)}] {name}{mark}  ({time.time() - t0:.0f}s)",
              flush=True)

    flagged = sorted(
        n for n, rec in out.items()
        if any(r.get("flip") for r in rec.values())
    )
    errored = sorted(
        n for n, rec in out.items()
        if any("error" in r for r in rec.values())
    )
    artifact = {
        "mode": "big" if big else "full",
        "tiers": sorted(tiers),
        "scales": {t: list(cfg[0]) for t, cfg in tier_cfg.items()},
        "n_queries": len(out),
        "flagged": flagged,
        "errored": errored,
        "queries": out,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    path = os.path.join(REPO, OUT)
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(flagged)} flagged, {len(errored)} errored, "
          f"{artifact['elapsed_sec']}s")


if __name__ == "__main__":
    main()
