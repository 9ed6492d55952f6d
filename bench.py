"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Headline set: one representative per operator family (scan+agg, star
joins, rollup, windows, time-series, CDC upsert, LLM dedup/similarity/
text) — the queries whose plans matter most at 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_profit_by_nation",
    "join_range_binned",
    "agg_rollup",
    "agg_distinct_stats",
    "window_topk_per_group",
    "window_running_frames",
    "events_hourly_rollup",
    "cdc_upsert_state",
    "dedup_exact",
    "dedup_minhash_lsh",
    "emb_cosine_topk",
    "docs_quality_score",
    "docs_unigram_logprob",
    # worst-case plans (VERDICT r1 item 5): iterative CC, bucketed ANN,
    # skewed-agg top-k, windowed packing — regressions here are the ones
    # that matter at 100 TB.
    "dedup_cc_clusters",
    "emb_ivf_ann_topk",
    "q18_large_orders",
    "docs_pack_sequences",
    "dedup_verified_pairs",
]

# Timed and reported alongside, but NOT in "value": the headline sum must
# stay the same 21-query set to be comparable with BENCH_r01-r03. These
# are the r4 additions whose plans matter at 100 TB (substring-span
# dedup's gram shuffle, bitmap distinct's fixed-size state, per-series
# window repair).
EXTRA = [
    "dedup_dup_ngram_spans",
    "agg_bitmap_distinct",
    "events_linear_interp",
    "cdc_scd2_history",
    "emb_ivf_pq_topk",
    "events_funnel_conversion",
    # r5 additions: nearest-asof (two windows, one exchange), full-outer
    # MERGE, Arrow audio decode+resample
    "join_asof_tolerance",
    "merge_into_customer_orders",
    "mm_audio_resample",
    # r6: probe latency against the PERSISTED ANN index — the warm-up run
    # builds (and caches) the index artifact, so the measured runs time
    # the serving path alone: pruned cells read + broadcast LUT + ADC agg
    "emb_ann_index_probe",
    # r7: probe latency against the INCREMENTALLY maintained index (base
    # build + append, cells spanning versions), and the composed
    # quality->dedup->decontam->pack->sample training-mix plan
    "emb_ann_index_incremental",
    "training_mix_pipeline",
    # r7 operator families: cell-bounded semantic dedup, unrolled Lloyd
    # k-means, unrolled PageRank
    "emb_semantic_dedup",
    "emb_kmeans_lloyd",
    "graph_pagerank",
    # r8: filtered serving probe (predicate inside the pruned cell scan)
    # and the BM25 ∪ ANN reciprocal-rank-fusion composition
    "emb_ann_index_filtered_probe",
    "hybrid_rrf_retrieval",
    # r8: two-stage retrieval — ADC shortlist, exact cosine re-rank of
    # only the C survivors (the FAISS refine serving shape)
    "emb_ann_rerank_exact",
    # r8: JL projection recall diagnostic and the incremental
    # distribution-drift histogram view
    "emb_jl_projection_recall",
    "ivm_histogram_view_state",
    # r8: Spark-4 native operators — recursive CTE BFS and session_window
    "graph_bfs_recursive_cte",
    "events_session_window_native",
    # r8: wire-format decode throughput — Arrow-batched binary pgoutput
    # vs whole-stage-codegen wal2json JSON (the deliberate pairing)
    "cdc_pgoutput_state",
    "cdc_wal2json_state",
    # r8: TOAST carry-forward upsert (binary decode + per-column max_by
    # carry aggregates in one groupBy)
    "cdc_toast_upsert_state",
    # r8: protocol-v2 streamed transactions (segment pairing + binned
    # interval membership + verdict join + commit-order apply)
    "cdc_pgoutput_stream_state",
    # r9: protocol-v3 two-phase commit (b/P span pairing + prepared
    # verdicts through the SAME apply machinery) and the whole-engine
    # showcase (decode -> TOAST carry -> SCD2 -> PIT join -> rollup)
    "cdc_two_phase_state",
    "cdc_e2e_revenue_rollup",
    # r9: text-family hygiene passes (regex redaction; per-row
    # higher-order-function 3-gram repetition)
    "docs_pii_scrub",
    "docs_repetition_filter",
    # r10: MMR composed over the IVF-PQ shortlist (the serving shape —
    # relevance is O(shortlist), unlike emb_mmr_rerank's brute-force
    # twin), PG 15 publication column-list + row-filter decode, and
    # BPE merge-rule training (one corpus shuffle, then vocab-sized)
    "emb_mmr_rerank_ann",
    "cdc_publication_filter_state",
    "docs_bpe_train_merges",
    # r11: the LSH operating-point monitor (per-band bucket profile +
    # pair bound — the guardrail the r10/r11 LSH quadratics motivate)
    "dedup_lsh_bucket_profile",
    # r11: structured entity resolution (block join + candidate-only
    # levenshtein + survivorship window) and the z-order layout-cell
    # diagnostic (broadcast stats box + codegen interleave + one
    # 256-group agg)
    "er_golden_records",
    "layout_zorder_key_stats",
    # r11: weighted sampling without replacement (priority sampling —
    # per-stratum WindowGroupLimit top-k, integer-exact priorities)
    "docs_priority_sample_strata",
    # r13: wal2json format_version=2 (per-change typed-JSON objects —
    # joins its v1 twin in the codegen-vs-Arrow wire-format pairing;
    # NOTE the cdc family subtotal gains this entry from r13 on)
    "cdc_wal2json_v2_state",
    # r13: corpus-level keep-first line dedup (narrow-shuffle rewrite)
    # and contrastive triplet mining (fixed-anchor streaming passes);
    # the text / ann family subtotals gain these entries from r13 on
    "docs_line_dedup",
    "emb_triplet_mining",
]


# Family map (VERDICT r7 item 6): the one-scalar headline drifts as the
# registry grows — cross-round comparisons should be per operator family.
# Every benched query belongs to exactly one family; subtotals ride in the
# stdout JSON ("families") and BENCH_DETAIL ("totals.families").
FAMILIES = {
    "relational": [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q9_profit_by_nation",
        "join_range_binned", "agg_rollup", "agg_distinct_stats",
        "window_topk_per_group", "window_running_frames",
        "events_hourly_rollup", "q18_large_orders", "agg_bitmap_distinct",
        "events_linear_interp", "events_funnel_conversion",
        "join_asof_tolerance", "events_session_window_native",
        "er_golden_records", "layout_zorder_key_stats",
    ],
    "cdc": [
        "cdc_upsert_state", "cdc_scd2_history", "merge_into_customer_orders",
        "cdc_pgoutput_state", "cdc_wal2json_state", "cdc_wal2json_v2_state",
        "cdc_toast_upsert_state",
        "cdc_pgoutput_stream_state", "cdc_two_phase_state",
        "cdc_e2e_revenue_rollup", "cdc_publication_filter_state",
    ],
    "dedup": [
        "dedup_exact", "dedup_minhash_lsh", "dedup_cc_clusters",
        "dedup_verified_pairs", "dedup_dup_ngram_spans", "emb_semantic_dedup",
        "dedup_lsh_bucket_profile",
    ],
    "ann": [
        "emb_cosine_topk", "emb_ivf_ann_topk", "emb_ivf_pq_topk",
        "emb_ann_index_probe", "emb_ann_index_incremental",
        "emb_ann_index_filtered_probe", "emb_kmeans_lloyd",
        "emb_ann_rerank_exact", "emb_jl_projection_recall",
        "emb_mmr_rerank_ann", "emb_triplet_mining",
    ],
    "retrieval": ["hybrid_rrf_retrieval"],
    "text": [
        "docs_quality_score", "docs_unigram_logprob", "docs_pack_sequences",
        "training_mix_pipeline", "docs_pii_scrub", "docs_repetition_filter",
        "docs_bpe_train_merges", "docs_priority_sample_strata",
        "docs_line_dedup",
    ],
    "graph": ["graph_pagerank", "graph_bfs_recursive_cte"],
    "multimodal": ["mm_audio_resample"],
    "streaming": ["streaming_upsert_e2e", "ivm_histogram_view_state"],
}


def _streaming_benchmarks(spark, sf_dir: str, runs: dict,
                          split: dict | None = None) -> dict[str, float]:
    """End-to-end streaming CDC upsert: replay the events table as
    envelope JSON lines through start_upsert_stream (availableNow, 4
    micro-batches) and time source->transform->bucketed-merge->commit.
    With the bucketed store each micro-batch's merge cost tracks the
    BATCH's touched buckets, not total state size — this entry is the
    regression guard on that contract.

    ``split`` (r12 verdict item 3): the fixture treatment the CDC
    entries got in r11 — per-stage attribution so a round-over-round
    move in the headline number can be read from checked-in artifacts
    instead of inferred. Records feed_write_sec (fixture encode+write,
    paid once, NOT part of the headline), per-run final_read_sec (state
    read-back, also outside the headline), and per-run per-micro-batch
    engine telemetry from StreamingQuery.recentProgress
    (triggerExecution/addBatch/getBatch millis + rows/batch) — the
    numbers that say whether a drift is merge work, source overhead, or
    fixed per-batch scheduling."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from pgcdc_spark.catalog import load
    from pgcdc_spark.streaming.pipeline import (
        read_envelope_stream,
        read_state,
        start_upsert_stream,
    )

    (events,) = load(spark, sf_dir, "events")
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    line = F.to_json(
        F.struct(
            F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn"),
            F.when(is_del, "delete").otherwise("update").alias("tag"),
            F.when(~is_del, img).alias("new"),
            F.when(is_del, img).alias("old"),
        )
    )
    work = tempfile.mkdtemp(prefix="pgcdc-bench-stream-")
    try:
        src = os.path.join(work, "src")
        t_feed = time.perf_counter()
        (
            events.select(line.alias("value"))
            .repartition(8)
            .write.mode("overwrite")
            .format("text")
            .save(src)
        )
        feed_write = round(time.perf_counter() - t_feed, 4)
        per_run: list[float] = []
        final_reads: list[float] = []
        progress: list[list[dict]] = []
        for i in range(3):
            state = os.path.join(work, f"state{i}")
            ckpt = os.path.join(work, f"ckpt{i}")
            changes = read_envelope_stream(
                spark, src, row_schema, max_files_per_trigger=2
            )
            t0 = time.perf_counter()
            q = start_upsert_stream(changes, state, ckpt, keys=["user_id"])
            q.awaitTermination()
            per_run.append(round(time.perf_counter() - t0, 4))
            prog = []
            for p in q.recentProgress:
                d = p.get("durationMs") or {}
                prog.append({
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "triggerExecution_ms": d.get("triggerExecution"),
                    "addBatch_ms": d.get("addBatch"),
                    "getBatch_ms": d.get("getBatch"),
                    "latestOffset_ms": d.get("latestOffset"),
                })
            progress.append(prog)
            t1 = time.perf_counter()
            n = read_state(spark, state).count()
            final_reads.append(round(time.perf_counter() - t1, 4))
            assert n > 0
        runs["streaming_upsert_e2e"] = per_run
        if split is not None:
            split["streaming_upsert_e2e"] = {
                "feed_write_sec": feed_write,
                "final_read_sec": final_reads,
                "micro_batches": progress,
            }
        return {"streaming_upsert_e2e": sorted(per_run)[1]}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    # the benched IVM entries time the MAINTENANCE path (the cross-round
    # series) — disable the maintained-state cache so every run replays
    # the 3-batch fixture through the real maintainer
    os.environ["PGCDC_IVM_CACHE"] = "0"
    # the ANN twin (r13 verdict item 1): scope the index artifact to THIS
    # session — the warm-up run builds it in a per-process scratch dir
    # (removed at exit) and the measured runs probe that build, so no
    # bench number can ride an index a PREVIOUS run left on disk. The
    # probe-family entries still time the serving path (probe, not
    # build), which is their declared semantics since r6.
    os.environ["PGCDC_ANN_CACHE"] = "0"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from pgcdc_spark.cache import release_shared
    from pgcdc_spark.session import get_spark
    from pgcdc_spark.queries import all_queries

    spark = get_spark(app_name="pgcdc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Power-test style: per query, warm-up runs (JVM codegen + JIT +
    # parquet footers), then measured runs; report the median.  A
    # single measured run on a shared sandbox swings +-50-150% with machine
    # load (a round-3 "regression" adjudicated to pure noise), drowning
    # real round-over-round deltas.  Round-9 cold-session bisect of the
    # r6-r8 "fixed-overhead creep" on unchanged headline queries found the
    # cause: ONE warm-up does not reach JIT/codegen steady state (q1 reps
    # in a fresh session decay 1.87 -> 1.15 s over 7 runs; steady state is
    # AT r1's number), so median-of-3-after-1-warmup lands on the
    # still-warming tail and drifts with whatever ran earlier in the
    # session.  HEADLINE queries therefore get 2 warm-ups + 5 measured
    # runs (steady-state medians, comparable across rounds); EXTRA keeps
    # 1+3 to bound total bench time.  Per-run times ship in
    # BENCH_DETAIL.json for auditability.
    # The CDC wire-format queries localCheckpoint their fixture capture;
    # those block-manager blocks are reclaimed by the ContextCleaner only
    # after the PYTHON-side DataFrame wrappers are garbage collected (py4j
    # holds the JVM refs). Without an explicit gc.collect() between
    # queries a long bench session accumulates hundreds of MB of dead
    # checkpoint blocks, and heap pressure inflates every LATE entry —
    # the r9 diagnosis of why late-session readings degraded as the
    # benched set grew.
    import gc

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE + EXTRA:
        qd = qs[name]
        n_warm, n_meas = (2, 5) if name in HEADLINE else (1, 3)
        for _ in range(n_warm):
            qd.fn(spark, sf_dir).collect()
            release_shared()  # shared-subplan blocks must not carry across runs
        per_run: list[float] = []
        for _ in range(n_meas):
            t0 = time.perf_counter()
            rows = qd.fn(spark, sf_dir).collect()
            per_run.append(round(time.perf_counter() - t0, 4))
            release_shared()
            assert rows is not None
        runs[name] = per_run
        timings[name] = sorted(per_run)[len(per_run) // 2]
        gc.collect()  # release py4j-held fixture checkpoint blocks

    # "value" stays the sum of the 21 BATCH headline queries so it is
    # comparable to BENCH_r01-r03; the streaming end-to-end entry and the
    # r4 extras are reported alongside (queries + runs + totals.*).
    batch_total = round(sum(timings[n] for n in HEADLINE), 4)
    extras_total = round(sum(timings[n] for n in EXTRA), 4)
    streaming_split: dict = {}
    streaming = _streaming_benchmarks(spark, sf_dir, runs, streaming_split)
    timings.update(streaming)

    # FIXTURE MATERIALIZATION, reported apart (r9 item 8, extended to
    # EVERY fixture-heavy cdc entry in r11 per VERDICT r10 item 2): each
    # cdc wire-format entry pays an encode + localCheckpoint of its
    # synthetic capture before any engine work runs. Timing each capture
    # separately makes the cdc family subtotal interpretable across
    # rounds: engine regressions move the family number, fixture-encode
    # drift moves these.
    from pgcdc_spark.queries.cdc_state import (
        e2e_revenue_capture, publication_filter_capture,
        pgoutput_stream_capture, toast_capture, two_phase_capture,
        xlog_infer_capture)

    CAPTURES = {
        "cdc_two_phase_state": two_phase_capture,
        "cdc_pgoutput_stream_state": pgoutput_stream_capture,
        "cdc_toast_upsert_state": toast_capture,
        "cdc_publication_filter_state": publication_filter_capture,
        "cdc_e2e_revenue_rollup": e2e_revenue_capture,
        # not in the benched set, but its fixture is the heaviest encode
        # (XLogData framing + retries) — tracked for the same reason
        "cdc_xlog_infer_state": xlog_infer_capture,
    }
    fixtures: dict[str, float] = {}
    for entry, capture in CAPTURES.items():
        fx_runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            capture(spark, sf_dir)  # localCheckpoints internally (eager)
            fx_runs.append(round(time.perf_counter() - t0, 4))
            # Dataset.unpersist would be a no-op here (it only uncaches
            # cache-manager entries, not checkpoint blocks); dropping the
            # py4j reference + gc lets the ContextCleaner reclaim them.
            gc.collect()
        fixtures[entry] = sorted(fx_runs)[1]
        runs[f"fixture_{entry}"] = fx_runs
    fixture_sec = fixtures["cdc_two_phase_state"]  # r9-r10 series name

    # stdout gets EXACTLY the compact r1-r3 shape — the round-4 line, with
    # per-run arrays inline, was long enough to be truncated by the
    # driver's output capture, so the official record had no parsed bench
    # value.  Full telemetry (per-run arrays, batch/extras/streaming
    # subtotals) goes to the BENCH_DETAIL.json sidecar instead.
    assert set(sum(FAMILIES.values(), [])) == set(timings), (
        "FAMILIES must cover exactly the benched queries"
    )
    families = {
        fam: round(sum(timings[n] for n in names), 4)
        for fam, names in FAMILIES.items()
    }
    # the cdc family subtotal is ENGINE time only (r11): each benched
    # entry's measured median minus its fixture-materialization median,
    # clamped at 0 — fixture drift moves "fixtures", not the family.
    families["cdc"] = round(sum(
        max(0.0, timings[n] - fixtures.get(n, 0.0))
        for n in FAMILIES["cdc"]
    ), 4)
    # LOAD SANITY GATE (VERDICT r10 item 1): the r10 final session was
    # measured on a loaded host — its tell was a first streaming e2e rep
    # at 2-4x the trailing ones. Flag that signature so a dirty session
    # never silently becomes the official artifact again.
    # true median of the trailing reps (for the common 2-element case
    # their MEAN — sorted[len//2] would pick the max and let the exact
    # signature this gate exists for pass silently)
    s_runs = runs.get("streaming_upsert_e2e", [])
    tr = sorted(s_runs[1:])
    if not tr:
        trailing = None
    elif len(tr) % 2:
        trailing = tr[len(tr) // 2]
    else:
        trailing = (tr[len(tr) // 2 - 1] + tr[len(tr) // 2]) / 2.0
    load_warning = bool(trailing and s_runs[0] > 2.0 * trailing)
    if load_warning:
        print(
            f"WARNING: load signature detected — first streaming_upsert_e2e "
            f"rep {s_runs[0]:.1f}s > 2x trailing median {trailing:.1f}s; "
            f"re-run this bench on a quiet host before checking it in.",
            file=sys.stderr,
        )
    detail = {
        "totals": {
            "batch": batch_total,
            "extras": extras_total,
            "streaming": round(sum(streaming.values()), 4),
            "fixture_two_phase_capture": fixture_sec,
            "fixtures": fixtures,
            "families": families,
            "load_warning": load_warning,
            # per-stage attribution for the streaming headline entry
            # (r12 verdict item 3): feed-write / per-micro-batch engine
            # millis / final state read, all OUTSIDE or inside the timed
            # stream-run as labeled
            "streaming_split": streaming_split,
        },
        "runs": runs,
        "sf": sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": batch_total,
        "unit": "sec",
        "queries": timings,
        "families": families,
        "fixture_sec": fixture_sec,
        "fixtures": fixtures,
        "load_warning": load_warning,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
