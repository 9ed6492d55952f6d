#!/usr/bin/env python
"""Measure per-query scaling exponents between two corpus scales.

The 100-TB design claims rest on plan-shape arguments (bucketed joins,
bounded candidate pairs, touched-cell-only maintenance). This harness
turns them into measurements: run the heaviest registered queries at
sf0.1 AND the 10x synthesized sf1 (scripts/make_sf1.py) and record

    exponent = log(t_sf1 / t_sf0.1) / log(10)

per query into SCALE_SF1.json. exponent <= ~1.0 is linear; O(n log n)
at these sizes lands ~1.07; a query is FLAGGED when its measured
exponent exceeds its DESIGN exponent (DESIGN_EXPONENT below; default
1.0, the IVF-quantizer build family is 1.5 by design) plus slack.
Fixed session overhead (job scheduling, Arrow setup) DEFLATES
exponents for fast queries — the per-run arrays ship in the artifact
so that's auditable.

Round 11 adds a SECOND DECADE (VERDICT r10 item 4): the superlinear-
risk ANN/dedup/CC subset (SF10_SET) is also measured against a 100x
corpus ("sf10", make_sf1.py n_replicas=100 over documents+embeddings
only), because a quadratic term with a small constant hides at 10x —
two decades pin the exponent. Per SF10_SET query the artifact gains
t_sf10, the second-decade exponent log10(t_sf10/t_big), and the
two-decade exponent log100(t_sf10/t_small); flagging applies to each
decade independently.

Usage: python scripts/scale_curve.py [small_dir] [big_dir] [out.json]
                                     [sf10_dir|'' to skip]
Bench discipline matches bench.py: warm-ups before measured runs,
median reported, PGCDC_IVM_CACHE=0 so IVM entries time maintenance,
gc between queries to release py4j-held fixture checkpoint blocks.
"""
from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The heaviest registry queries at sf0.1 (BENCH_r09 order) — one per
# scale-critical plan family: iterative CC, LSH verify, wire decode,
# IVM maintenance, retrieval fusion, k-means, pruned ANN serving,
# TPC-H scan/join/agg shapes.
SCALE_SET = [
    "training_mix_pipeline",
    "dedup_verified_pairs",
    "cdc_two_phase_state",
    "dedup_cc_clusters",
    "cdc_pgoutput_stream_state",
    "ivm_histogram_view_state",
    "cdc_toast_upsert_state",
    "cdc_pgoutput_state",
    "hybrid_rrf_retrieval",
    "emb_semantic_dedup",
    "dedup_minhash_lsh",
    "emb_ann_rerank_exact",
    "emb_kmeans_lloyd",
    "emb_ivf_pq_topk",
    "cdc_wal2json_state",
    # r13 addition: the format_version=2 adapter joins its v1 twin in
    # the heavy set (same LWW state family, different wire layout)
    "cdc_wal2json_v2_state",
    "dedup_dup_ngram_spans",
    "cdc_e2e_revenue_rollup",
    "graph_pagerank",
    "graph_bfs_recursive_cte",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_profit_by_nation",
    "q18_large_orders",
    "emb_ann_index_probe",
    "emb_ivf_ann_topk",
    "emb_mmr_rerank_ann",
    "dedup_lsh_bucket_profile",
    # r12 broadcast-audit pins: the funnel/mix gate sets and the
    # vocabulary-sized term tables are now pinned SMJ/SHJ — measure the
    # pinned plans (funnel caught as a live flip; tfidf/bm25 were
    # forced broadcasts the flip audit could not see)
    "docs_filter_funnel",
    "docs_tfidf",
    "docs_bm25_topk",
    "assoc_rules_copurchase",
    # r12 addition: the nprobe operating curve (embeds the full IVF
    # assignment -> design 1.5 like the rest of the quantizer family)
    "emb_ivf_probe_profile",
    # r13 additions: corpus-level line dedup (narrow first-occurrence
    # shuffles, linear by design) and triplet mining (fixed anchor set,
    # streaming corpus passes — linear)
    "docs_line_dedup",
    "emb_triplet_mining",
]

# Per-query DESIGN exponents: a query is flagged when its measured
# exponent exceeds design + slack. Default design is 1.0 (linear);
# the IVF-quantizer family is O(n^1.5) BY DESIGN (nlist ~ sqrt(n), so
# assignment/training is n*sqrt(n) and within-cell pair work is
# cells*(n/cells)^2 = n^1.5 — the production FAISS build shape), and
# k-means inherits it (k ~ sqrt(n) centers times n points per
# iteration). Serving-path queries (index probes) stay ~flat and keep
# the linear budget.
DESIGN_EXPONENT = {
    "emb_semantic_dedup": 1.5,
    "emb_kmeans_lloyd": 1.5,
    "emb_ivf_pq_topk": 1.5,
    "emb_ivf_ann_topk": 1.5,
    "hybrid_rrf_retrieval": 1.5,   # embeds the IVF-PQ plan
    "emb_ann_rerank_exact": 1.5,   # ADC shortlist over the IVF-PQ plan
    "emb_ivf_probe_profile": 1.5,  # embeds the full IVF assignment
}
FLAG_SLACK = 0.2

# The superlinear-risk subset measured at the SECOND decade (sf10 =
# 100x): the LSH/CC/substring dedup builds, the IVF/PQ quantizer
# family, the composed training-mix plan, and one serving probe (flat
# by design — the control). The sf10 corpus carries
# documents+embeddings (checked in) plus a gitignored 100x events
# table for the CDC legs, so doc/emb/events-backed queries are
# eligible.
SF10_SET = [
    "dedup_minhash_lsh",
    "dedup_verified_pairs",
    "dedup_cc_clusters",
    "dedup_dup_ngram_spans",
    "emb_semantic_dedup",
    "emb_kmeans_lloyd",
    "emb_ivf_pq_topk",
    "emb_ivf_ann_topk",
    "training_mix_pipeline",
    "emb_ann_index_probe",
    # r11 late adds: the second flat-serving control (MMR over the ADC
    # shortlist), the BM25+ANN fusion composition, the ADC refine
    # stage, and the LSH operating-point monitor (all doc/emb-backed)
    "emb_mmr_rerank_ann",
    "hybrid_rrf_retrieval",
    "emb_ann_rerank_exact",
    "dedup_lsh_bucket_profile",
    # r12 broadcast-audit pins at the second decade (documents-backed):
    # the merge-pinned filter funnel and the SHJ-pinned tfidf
    "docs_filter_funnel",
    "docs_tfidf",
    # r12 addition at the second decade (embeddings-backed)
    "emb_ivf_probe_profile",
    # r11 CDC second decade: needs the 100x events table
    # (make_sf1.py testdata_sf10 100 events — gitignored, regenerate
    # deterministically; the three heaviest wire-format paths: Arrow
    # binary decode, TOAST carry-forward, two-phase interval machinery)
    "cdc_pgoutput_state",
    "cdc_toast_upsert_state",
    "cdc_two_phase_state",
    # r13: the v2 JSON wire path at the second decade (events-backed;
    # the codegen contrast to cdc_pgoutput_state's Arrow decode above)
    "cdc_wal2json_v2_state",
    # r13 additions at the second decade (documents/embeddings-backed):
    # the line-dedup rewrite's window+join chain is the superlinear
    # risk; triplet mining is the fixed-anchor flat-serving control
    "docs_line_dedup",
    "emb_triplet_mining",
]


def _bench(spark, sf_dir: str, names: list[str],
           n_warm: int, n_meas: int,
           long_run_cutoff: float | None = None) -> dict[str, dict]:
    from pgcdc_spark.cache import release_shared
    from pgcdc_spark.queries import all_queries

    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        qd = qs[name]
        for _ in range(n_warm):
            qd.fn(spark, sf_dir).collect()
            release_shared()
        per_run: list[float] = []
        rows = 0
        for _ in range(n_meas):
            t0 = time.perf_counter()
            got = qd.fn(spark, sf_dir).collect()
            per_run.append(round(time.perf_counter() - t0, 4))
            release_shared()
            rows = len(got)
            # exponent runs in the minutes regime: fixed overhead and
            # load noise are proportionally negligible there, so one
            # measured rep pins the exponent — repeating a 10-minute
            # build would triple the wall-clock for no extra signal
            if long_run_cutoff and per_run[-1] > long_run_cutoff:
                break
        out[name] = {"median": sorted(per_run)[len(per_run) // 2],
                     "runs": per_run, "rows": rows}
        gc.collect()
        print(f"  {name}: {out[name]['median']:.2f}s ({rows} rows)",
              flush=True)
    return out


def main() -> None:
    os.environ["PGCDC_IVM_CACHE"] = "0"
    only = None
    argv = list(sys.argv)
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            raise SystemExit("usage: --only name1,name2,...")
        only = set(argv[i + 1].split(","))
        unknown = only - set(SCALE_SET)
        if unknown:
            raise SystemExit(
                f"--only names not in SCALE_SET: {sorted(unknown)} — a "
                "typo here would silently measure nothing and still "
                "rewrite the artifact")
        del argv[i:i + 2]
        sys.argv = argv
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SF1.json")
    ratio = 10.0

    from pgcdc_spark.session import get_spark

    spark = get_spark(app_name="pgcdc-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    sf10 = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf10")
    run_sf10 = bool(sf10) and os.path.isdir(sf10)
    # SF10_SET names need their tables present — documents/embeddings
    # are checked in, the 100x events table is gitignored (regenerate:
    # make_sf1.py <sf10_dir> 100 events). Drop-and-log instead of
    # crashing after an hour of measured legs.
    sf10_set = list(SF10_SET)
    if run_sf10 and not os.path.exists(os.path.join(sf10, "events.parquet")):
        dropped = [n for n in sf10_set if n.startswith("cdc_")]
        sf10_set = [n for n in sf10_set if not n.startswith("cdc_")]
        print(f"NOTE: {sf10}/events.parquet absent — skipping sf10 legs "
              f"{dropped} (regenerate with scripts/make_sf1.py)",
              flush=True)

    scale_set = [n for n in SCALE_SET if only is None or n in only]
    if only:
        sf10_set = [n for n in sf10_set if n in only]
    print(f"== {small} ==", flush=True)
    t_small = _bench(spark, small, scale_set, n_warm=2, n_meas=3)
    print(f"== {big} ==", flush=True)
    t_big = _bench(spark, big, scale_set, n_warm=1, n_meas=3)
    t_sf10 = {}
    if run_sf10:
        print(f"== {sf10} (second decade) ==", flush=True)
        t_sf10 = _bench(spark, sf10, sf10_set, n_warm=1, n_meas=2,
                        long_run_cutoff=90.0)

    queries = {}
    for name in scale_set:
        ts, tb = t_small[name]["median"], t_big[name]["median"]
        exp = round(math.log(tb / ts) / math.log(ratio), 3)
        design = DESIGN_EXPONENT.get(name, 1.0)
        queries[name] = {
            "t_small": ts, "t_big": tb, "ratio": round(tb / ts, 2),
            "exponent": exp, "design_exponent": design,
            "flagged": exp > design + FLAG_SLACK,
            "rows_small": t_small[name]["rows"],
            "rows_big": t_big[name]["rows"],
            "runs_small": t_small[name]["runs"],
            "runs_big": t_big[name]["runs"],
        }
        if name in t_sf10:
            tt = t_sf10[name]["median"]
            exp2 = round(math.log(tt / tb) / math.log(ratio), 3)
            exp_2dec = round(math.log(tt / ts) / math.log(ratio ** 2), 3)
            queries[name].update({
                "t_sf10": tt,
                "exponent_dec2": exp2,
                "exponent_2dec": exp_2dec,
                "rows_sf10": t_sf10[name]["rows"],
                "runs_sf10": t_sf10[name]["runs"],
            })
            # each decade is flagged independently: a quadratic term
            # with a small constant only surfaces in the SECOND decade
            queries[name]["flagged"] = (
                queries[name]["flagged"] or exp2 > design + FLAG_SLACK)
    # EVERY measured entry carries its own 'scales' provenance stamp at
    # write time (ADVICE r12): a --only merge overwrites the top-level
    # small/big/sf10 with this run's dirs, so entries carried over from
    # the prior artifact would otherwise have ambiguous provenance in a
    # mixed-session file. With the per-entry stamp, a reader attributes
    # each exponent to the corpora it was actually measured on.
    for name, q in queries.items():
        # sf10 is stamped ONLY on entries that actually ran a second-
        # decade leg (r13 review): SCALE_SET-only names, and cdc legs
        # dropped for a missing 100x events table, must not claim a
        # corpus they never touched.
        q["scales"] = {"small": small, "big": big,
                       "sf10": sf10 if name in t_sf10 else None}
    # --only runs MERGE into the existing artifact (the other entries'
    # measurements stay — WITH their original stamps; flags/median
    # recomputed over the union), and top-level merged_only lists what
    # the latest partial run replaced.
    merged_only = None
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        merged = dict(prev.get("queries", {}))
        merged.update(queries)
        queries = merged
        merged_only = sorted(only)
    flagged = sorted(n for n, q in queries.items() if q["flagged"])
    artifact = {
        "merged_only": merged_only,
        "small": small, "big": big, "scale_ratio": ratio,
        "sf10": sf10 if run_sf10 else None,
        "flag_slack": FLAG_SLACK,
        "flagged": flagged,
        "median_exponent": sorted(
            q["exponent"] for q in queries.values())[len(queries) // 2],
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"flagged": flagged,
                      "median_exponent": artifact["median_exponent"]}))


if __name__ == "__main__":
    main()
