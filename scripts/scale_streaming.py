#!/usr/bin/env python
"""Scale-measure the streaming/stateful family (VERDICT r10 item 3).

SCALE_SF1.json covers every batch family; this harness covers the one
it can't: continuous maintenance. The design claim under measurement is
**state-size independence of per-batch cost** — a micro-batch's wall
time must track the BATCH (its rows + the buckets/groups/cells it
touches), not the accumulated state. Four maintainers, each driven by
a 1x (sf0.1) and a 10x (testdata_sf1, scripts/make_sf1.py) changelog
in FIXED-SIZE micro-batches:

- ``bucketed_upsert``: the CDC upsert sink (pipeline.start_upsert_stream
  -> BucketedStateStore.merge) over the events changelog, keyed user_id.
- ``agg_view``: the same feed through the IVM AggView maintainer
  (ivm.start_upsert_stream_with_view): upsert + signed-delta view in
  one commit unit.
- ``ingest``: the composed training-data ingest
  (ingest.start_training_ingest_stream): one doc-envelope feed driving
  the incremental LSH dedup state AND the persisted ANN index.
- ``rocksdb_latest_state``: the applyInPandasWithState changelog
  compactor under the RocksDB state-store provider (the large-state
  provider), memory sink.

Per maintainer and scale the artifact records every micro-batch's
wall-clock (triggerExecution from query progress), the batch size, the
cumulative rows (the state-size axis: state grows ACROSS the run, so
within-run flatness is itself the claim), and for the bucketed stores
the per-batch touched-bucket fraction. Two derived statistics:

- ``exponent``: log10(median_batch_big / median_batch_small) at equal
  batch size — design 0.0 (a 10x-state store must not slow equal-sized
  batches), flagged above design + slack;
- ``growth_ratio``: median of the last quartile of batches over the
  first quartile within the 10x run — the within-run flatness check
  (state grows ~10x start-to-end of the big run), flagged above 1.5
  (compaction spikes land in single batches; medians absorb them).

Round 12 adds the SECOND DECADE (VERDICT r11 item 4): a 100x leg from
the sf10 events feed (10M messages) for ``bucketed_upsert``,
``agg_view`` and ``rocksdb_latest_state``. 1000 timed 10k-line batches
would blow the 256-entry progress retention and take ~30 min per
component, so the 100x run is STAGED: the first ~9.9M rows load state
in 100k-line BULK batches (untimed for the statistic), then the final
100k rows replay in the same fixed 10k-line batches as the 1x run —
per-batch medians at FULL 100x state, batch size held constant, under
the retention cap. The per-decade exponent is then
log10(huge/small) / 2, flagged against the same design-0 slack.

Usage: python scripts/scale_streaming.py [small_dir] [big_dir] [out] [huge_dir]
(huge_dir optional; pass e.g. testdata_sf10 to add the 100x leg.)
Quiet-core discipline applies (same as bench.py).
"""
from __future__ import annotations

import gc
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BATCH_LINES = 10_000     # events-changelog batch size (both scales)
DOC_BATCH = 500          # ingest feed: docs per micro-batch
FLAG_SLACK = 0.2
GROWTH_FLAG = 1.5
# Per-component design exponents (default 0.0 = state-size-independent
# per-batch cost). line_dedup and ingest both carry a full prior-state
# probe per batch (the accepted streaming/dedup.py shape, bucketed-store
# upgrade path documented) — registered at 0.0 because the probe is a
# narrow columnar scan that stays sub-noise until state far exceeds
# these scales; a flag on either is the signal that the probe term has
# become visible and the bucketed upgrade is due.
DESIGN_EXPONENT: dict[str, float] = {
    "line_dedup": 0.0,
    "ingest": 0.0,
}


def _progress_durations(q) -> list[dict]:
    """(batchId, seconds, rows) per micro-batch from the query's progress
    history (availableNow runs end with an empty flush batch — dropped).

    recentProgress retains at most numRecentProgressUpdates entries
    (pinned to 256 in main). A feed producing more batches would
    silently truncate the EARLY batches and corrupt growth_ratio (the
    first-quartile median would come from late, full-state batches) —
    fail loudly instead of measuring a lie."""
    if len(q.recentProgress) >= 250:
        raise RuntimeError(
            "recentProgress near/at the 256-entry retention cap — early "
            "batches may be dropped; raise numRecentProgressUpdates or "
            "lower the batch count before trusting growth ratios")
    out = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        if d.get("numInputRows", 0) > 0:
            out.append({
                "batch": d["batchId"],
                "sec": round(d["durationMs"]["triggerExecution"] / 1000, 4),
                "rows": d["numInputRows"],
            })
    return sorted(out, key=lambda r: r["batch"])


def _events_feed(spark, sf_dir: str, work: str, batch_lines: int) -> str:
    """The events table as envelope JSON text files of exactly
    ``batch_lines`` lines each (same construction as bench.py's
    streaming entry): fixed batch size is what makes per-batch medians
    comparable across a 10x state range."""
    from pyspark.sql.window import Window

    from pgcdc_spark.catalog import load

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    line = F.to_json(F.struct(
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn"),
        F.when(is_del, "delete").otherwise("update").alias("tag"),
        F.when(~is_del, img).alias("new"),
        F.when(is_del, img).alias("old"),
    ))
    src = os.path.join(work, "events_src")
    chunk = (F.row_number().over(Window.orderBy("event_id")) - 1) / batch_lines
    (events.select(line.alias("value"),
                   F.floor(chunk).cast("int").alias("b"))
     .repartition("b").write.partitionBy("b").mode("overwrite")
     .format("text").save(src))
    return src


BULK_LINES = 100_000     # 100x leg: state-loading batch size (untimed)
TAIL_BATCHES = 10        # 100x leg: timed fixed-size batches at full state


def _events_feed_staged(spark, sf_dir: str, work: str,
                        bulk_lines: int, tail_lines: int,
                        n_tail: int) -> str:
    """The events table as a STAGED changelog: all but the final
    ``n_tail * tail_lines`` rows in ``bulk_lines``-line chunks (the
    state-loading phase), then the tail in ``tail_lines``-line chunks —
    the measured phase, same batch size as the 1x run. Chunk files get
    ascending mtimes so the file stream replays bulk before tail: a
    tail batch replayed early would be timed against small state and
    the 100x claim would be a lie."""
    from pyspark.sql.window import Window

    from pgcdc_spark.catalog import load

    (events,) = load(spark, sf_dir, "events")
    total = events.count()
    tail_rows = n_tail * tail_lines
    tail_start = max(0, total - tail_rows)
    n_bulk = -(-tail_start // bulk_lines)  # ceil

    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    line = F.to_json(F.struct(
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn"),
        F.when(is_del, "delete").otherwise("update").alias("tag"),
        F.when(~is_del, img).alias("new"),
        F.when(is_del, img).alias("old"),
    ))
    src = os.path.join(work, "events_staged_src")
    rn = F.row_number().over(Window.orderBy("event_id")) - 1
    b = (F.when(rn < tail_start, F.floor(rn / bulk_lines))
         .otherwise(n_bulk + F.floor((rn - tail_start) / tail_lines))
         .cast("int"))
    (events.select(line.alias("value"), b.alias("b"))
     .repartition("b").write.partitionBy("b").mode("overwrite")
     .format("text").save(src))
    _stamp_feed_order(src)
    return src


def _tail_stats(batches: list[dict], tail_lines: int,
                n_tail: int) -> dict:
    """_stats over only the fixed-size TAIL batches of a staged run.
    Tail = the LAST ``n_tail`` batches by batch id (feed chunks map 1:1
    to batches in replay order) — a size-based split would misclassify
    a partial final BULK chunk of <= a few tail-sizes as a timed tail
    batch and corrupt the 100x median. The size check remains as a
    loud sanity assert, not the classifier."""
    tail = batches[-n_tail:]
    bulk = batches[:-n_tail]
    oversized = [b for b in tail if b["rows"] > tail_lines * 3]
    if oversized:
        raise RuntimeError(
            f"staged tail contains non-tail-sized batches {oversized} — "
            "feed staging and replay order disagree")
    st = _stats(tail)
    st["n_bulk_batches"] = len(bulk)
    st["bulk_median_sec"] = (_median([b["sec"] for b in bulk])
                             if bulk else None)
    st["staged"] = True
    return st


def _touched_fraction(spark, src: str, keys, n_buckets) -> dict:
    """Per feed-chunk touched-bucket fraction, computed OUTSIDE the timed
    runs with the store's own bucket_expr (xxhash64 % n_buckets). The
    chunk id rides in as the ``b`` partition column of the feed dir."""
    from pgcdc_spark.streaming.statestore import BucketedStateStore

    store = BucketedStateStore(os.path.join(tempfile.gettempdir(), "x"),
                               n_buckets=n_buckets)
    raw = spark.read.format("text").load(src)
    rows = raw.select(
        "b",
        *[F.coalesce(F.get_json_object("value", f"$.new.{k}"),
                     F.get_json_object("value", f"$.old.{k}"))
          .cast("long").alias(k) for k in keys])
    got = (rows.withColumn("bk", store.bucket_expr(keys))
           .groupBy("b").agg(F.countDistinct("bk").alias("nb")).collect())
    return {int(r["b"]): round(r["nb"] / n_buckets, 3) for r in got}


def _run_upsert(spark, src: str, work: str, row_schema, with_view: bool):
    from pgcdc_spark.streaming.pipeline import (read_envelope_stream,
                                                read_state,
                                                start_upsert_stream)

    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    changes = read_envelope_stream(spark, f"{src}/b=*", row_schema,
                                   max_files_per_trigger=1)
    if with_view:
        from pgcdc_spark.streaming.ivm import (AggView,
                                               start_upsert_stream_with_view)
        q = start_upsert_stream_with_view(
            changes, state, ckpt, keys=["user_id"],
            view=AggView("byuser", ["user_id"], "value"))
        final_state = os.path.join(state, "state")
    else:
        q = start_upsert_stream(changes, state, ckpt, keys=["user_id"])
        final_state = state
    q.awaitTermination()
    batches = _progress_durations(q)
    n_state = read_state(spark, final_state).count()
    return batches, n_state


def _docs_feed(spark, sf_dir: str, work: str) -> tuple[str, int]:
    """Insert-only doc envelopes (doc_id, text, embedding) over the FULL
    documents table (5k docs at sf0.1 -> 50k at the 10x corpus; real
    texts, so the dup rate the dedup maintainer works against is the
    corpus's own). Embeddings are synthesized deterministically from
    doc_id — the ANN maintainer's per-batch COST (assign + encode +
    touched-cell rewrite) is geometry-independent, and the real
    embeddings table does not cover the 10x doc_id range. Files carry
    ascending mtimes so the file stream replays the changelog in
    doc_id order — the quantizer bootstrap trains on the first batch,
    which must contain codebook donor ids (the AnnIndex degenerate-
    quantizer guard fails the build loudly otherwise)."""
    from pyspark.sql.window import Window

    from pgcdc_spark.catalog import load

    (docs,) = load(spark, sf_dir, "documents")
    emb_expr = F.expr(
        "transform(sequence(0, 7),"
        " i -> sin((doc_id + 1) * (i + 1) * 0.7853981633974483))")
    line = F.to_json(F.struct(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("lsn"),
        F.lit("insert").alias("tag"),
        F.struct("doc_id", "text",
                 emb_expr.alias("embedding")).alias("new"),
    ))
    chunk = (F.row_number().over(Window.orderBy("doc_id")) - 1) / DOC_BATCH
    src = os.path.join(work, "docs_src")
    (docs.select(line.alias("value"),
                 F.floor(chunk).cast("int").alias("b"))
     .repartition("b").write.partitionBy("b").mode("overwrite")
     .format("text").save(src))
    _stamp_feed_order(src)
    return src, docs.count()


def _stamp_feed_order(src: str) -> None:
    """Give each chunk dir's files mtimes ascending in chunk id: the
    file-stream source batches by (mtime, path), so this pins replay
    order to changelog order."""
    base = time.time() - 86_400
    for d in sorted(os.listdir(src)):
        if not d.startswith("b="):
            continue
        t = base + int(d.split("=", 1)[1]) * 2
        full = os.path.join(src, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (t, t))


def _run_ingest(spark, src: str, work: str):
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    from pgcdc_spark.streaming.ingest import start_training_ingest_stream

    row_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    q = start_training_ingest_stream(
        spark, f"{src}/b=*", os.path.join(work, "ckpt"),
        os.path.join(work, "dedup"), os.path.join(work, "ann"),
        row_schema, max_files_per_trigger=1)
    q.awaitTermination()
    return _progress_durations(q)


def _docs_parquet_feed(spark, sf_dir: str, work: str) -> tuple[str, int]:
    """Chunked (doc_id, text) parquet feed in doc_id order, DOC_BATCH
    docs per chunk, mtimes stamped ascending — the line-dedup
    maintainer's changelog (it needs raw documents, not JSON
    envelopes, so this is the parquet twin of _docs_feed)."""
    from pyspark.sql.window import Window

    from pgcdc_spark.catalog import load

    (docs,) = load(spark, sf_dir, "documents")
    chunk = (F.row_number().over(Window.orderBy("doc_id")) - 1) / DOC_BATCH
    src = os.path.join(work, "ld_src")
    (docs.select("doc_id", "text",
                 F.floor(chunk).cast("int").alias("b"))
     .repartition("b").write.partitionBy("b").mode("overwrite")
     .parquet(src))
    _stamp_feed_order(src)
    return src, docs.count()


def _run_line_dedup(spark, src: str, work: str):
    from pgcdc_spark.streaming.linededup import start_line_dedup_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    q = start_line_dedup_stream(
        stream, os.path.join(work, "state"), os.path.join(work, "ckpt"))
    q.awaitTermination()
    return _progress_durations(q)


def _run_rocksdb(spark, src: str, work: str, row_schema, name: str):
    from pgcdc_spark.streaming.pipeline import read_envelope_stream
    from pgcdc_spark.streaming.stateful import streaming_latest_state

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        changes = read_envelope_stream(spark, f"{src}/b=*", row_schema,
                                       max_files_per_trigger=1)
        out = streaming_latest_state(changes, keys=["user_id"])
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return _progress_durations(q)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2] if xs else float("nan")


def _stats(batches: list[dict]) -> dict:
    secs = [b["sec"] for b in batches]
    k = max(1, len(secs) // 4)
    return {
        "n_batches": len(batches),
        "median_batch_sec": _median(secs),
        "first_quartile_median": _median(secs[:k]),
        "last_quartile_median": _median(secs[-k:]),
        "growth_ratio": round(_median(secs[-k:]) / _median(secs[:k]), 3),
        "batches": batches,
    }


ALL_COMPONENTS = ("bucketed_upsert", "agg_view", "rocksdb_latest_state",
                  "ingest", "line_dedup")


def main() -> None:
    only = None
    argv = list(sys.argv)
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            raise SystemExit("usage: --only comp1,comp2,...")
        only = set(argv[i + 1].split(","))
        unknown = only - set(ALL_COMPONENTS)
        if unknown:
            raise SystemExit(
                f"--only names not in ALL_COMPONENTS: {sorted(unknown)}")
        del argv[i:i + 2]
        sys.argv = argv
    run = set(ALL_COMPONENTS) if only is None else only
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_STREAMING.json")
    huge = sys.argv[4] if len(sys.argv) > 4 else None
    if huge and not os.path.isdir(huge):
        raise SystemExit(f"huge dir not found: {huge}")

    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from pgcdc_spark.session import get_spark

    spark = get_spark(app_name="pgcdc-scale-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    # 10x feed = 100 fixed-size batches; keep every progress entry
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    row_schema = StructType([StructField("user_id", LongType()),
                             StructField("value", DoubleType())])

    results: dict[str, dict] = {}
    work_root = tempfile.mkdtemp(prefix="pgcdc-scale-streaming-")
    try:
        feeds = {}
        if run & {"bucketed_upsert", "agg_view", "rocksdb_latest_state"}:
            for tag, sf_dir in (("small", small), ("big", big)):
                w = os.path.join(work_root, f"events_{tag}")
                os.makedirs(w, exist_ok=True)
                feeds[tag] = _events_feed(spark, sf_dir, w, BATCH_LINES)

        for comp, with_view in (("bucketed_upsert", False),
                                ("agg_view", True)):
            if comp not in run:
                continue
            results[comp] = {}
            for tag in ("small", "big"):
                w = os.path.join(work_root, f"{comp}_{tag}")
                os.makedirs(w, exist_ok=True)
                print(f"== {comp} {tag} ==", flush=True)
                batches, n_state = _run_upsert(
                    spark, feeds[tag], w, row_schema, with_view)
                st = _stats(batches)
                st["final_state_rows"] = n_state
                if comp == "bucketed_upsert":
                    st["touched_bucket_fraction"] = _touched_fraction(
                        spark, feeds[tag], ["user_id"], 64)
                results[comp][tag] = st
                print(f"  {st['n_batches']} batches, median "
                      f"{st['median_batch_sec']:.2f}s, growth "
                      f"{st['growth_ratio']}", flush=True)
                gc.collect()

        if "rocksdb_latest_state" in run:
            results["rocksdb_latest_state"] = {}
        for tag in (("small", "big") if "rocksdb_latest_state" in run else ()):
            w = os.path.join(work_root, f"rocks_{tag}")
            os.makedirs(w, exist_ok=True)
            print(f"== rocksdb_latest_state {tag} ==", flush=True)
            st = _stats(_run_rocksdb(spark, feeds[tag], w, row_schema,
                                     f"rocks_scale_{tag}"))
            results["rocksdb_latest_state"][tag] = st
            print(f"  {st['n_batches']} batches, median "
                  f"{st['median_batch_sec']:.2f}s, growth "
                  f"{st['growth_ratio']}", flush=True)
            gc.collect()

        if "ingest" in run:
            results["ingest"] = {}
        for tag, sf_dir in ((("small", small), ("big", big))
                            if "ingest" in run else ()):
            w = os.path.join(work_root, f"ingest_{tag}")
            os.makedirs(w, exist_ok=True)
            print(f"== ingest {tag} ==", flush=True)
            src, n_docs = _docs_feed(spark, sf_dir, w)
            st = _stats(_run_ingest(spark, src, w))
            st["n_docs"] = n_docs
            results["ingest"][tag] = st
            print(f"  {st['n_batches']} batches, median "
                  f"{st['median_batch_sec']:.2f}s, growth "
                  f"{st['growth_ratio']}", flush=True)
            gc.collect()

        if "line_dedup" in run:
            results["line_dedup"] = {}
        for tag, sf_dir in ((("small", small), ("big", big))
                            if "line_dedup" in run else ()):
            w = os.path.join(work_root, f"linededup_{tag}")
            os.makedirs(w, exist_ok=True)
            print(f"== line_dedup {tag} ==", flush=True)
            src, n_docs = _docs_parquet_feed(spark, sf_dir, w)
            st = _stats(_run_line_dedup(spark, src, w))
            st["n_docs"] = n_docs
            results["line_dedup"][tag] = st
            print(f"  {st['n_batches']} batches, median "
                  f"{st['median_batch_sec']:.2f}s, growth "
                  f"{st['growth_ratio']}", flush=True)
            gc.collect()

        if huge and run & {"bucketed_upsert", "agg_view",
                           "rocksdb_latest_state"}:
            w = os.path.join(work_root, "events_huge")
            os.makedirs(w, exist_ok=True)
            print("== staging 100x feed ==", flush=True)
            huge_feed = _events_feed_staged(
                spark, huge, w, BULK_LINES, BATCH_LINES, TAIL_BATCHES)
            for comp, with_view in (("bucketed_upsert", False),
                                    ("agg_view", True)):
                if comp not in run:
                    continue
                w = os.path.join(work_root, f"{comp}_huge")
                os.makedirs(w, exist_ok=True)
                print(f"== {comp} huge (100x) ==", flush=True)
                batches, n_state = _run_upsert(
                    spark, huge_feed, w, row_schema, with_view)
                st = _tail_stats(batches, BATCH_LINES, TAIL_BATCHES)
                st["final_state_rows"] = n_state
                results[comp]["huge"] = st
                print(f"  {st['n_batches']} tail batches, median "
                      f"{st['median_batch_sec']:.2f}s, growth "
                      f"{st['growth_ratio']}", flush=True)
                gc.collect()
            if "rocksdb_latest_state" in run:
                w = os.path.join(work_root, "rocks_huge")
                os.makedirs(w, exist_ok=True)
                print("== rocksdb_latest_state huge (100x) ==", flush=True)
                st = _tail_stats(
                    _run_rocksdb(spark, huge_feed, w, row_schema,
                                 "rocks_scale_huge"),
                    BATCH_LINES, TAIL_BATCHES)
                results["rocksdb_latest_state"]["huge"] = st
                print(f"  {st['n_batches']} tail batches, median "
                      f"{st['median_batch_sec']:.2f}s, growth "
                      f"{st['growth_ratio']}", flush=True)
                gc.collect()
    finally:
        shutil.rmtree(work_root, ignore_errors=True)

    for comp, r in results.items():
        exp = round(math.log10(
            r["big"]["median_batch_sec"] / r["small"]["median_batch_sec"]), 3)
        r["exponent"] = exp
        r["design_exponent"] = DESIGN_EXPONENT.get(comp, 0.0)
        r["flagged"] = (exp > r["design_exponent"] + FLAG_SLACK
                        or r["big"]["growth_ratio"] > GROWTH_FLAG)
        if "huge" in r:
            # two decades: per-decade exponent at equal batch size
            exp2 = round(math.log10(
                r["huge"]["median_batch_sec"]
                / r["small"]["median_batch_sec"]) / 2, 3)
            r["exponent_per_decade_100x"] = exp2
            r["flagged"] = r["flagged"] or (
                exp2 > r["design_exponent"] + FLAG_SLACK
                or r["huge"]["growth_ratio"] > GROWTH_FLAG)
        # provenance: every entry records the dirs it was measured
        # against (the scale_curve.py --only discipline, ADVICE r12) —
        # a merged artifact never leaves an entry's scales ambiguous
        r["scales"] = {"small": small, "big": big,
                       "huge": huge if "huge" in r else None}

    if only is not None and os.path.exists(out_path):
        # partial re-measure: carry forward unmeasured components from
        # the prior artifact. An entry carried from a pre-stamp artifact
        # gets its stamp BACKFILLED from that artifact's top-level dirs
        # — the merged file must never leave an entry's scales ambiguous
        with open(out_path) as f:
            prior_doc = json.load(f)
        for comp, r in prior_doc.get("components", {}).items():
            if comp in results:
                continue
            r.setdefault("scales", {
                "small": prior_doc.get("small"),
                "big": prior_doc.get("big"),
                "huge": prior_doc.get("huge") if "huge" in r else None,
            })
            results[comp] = r

    flagged = sorted(c for c, r in results.items() if r["flagged"])
    artifact = {
        "small": small, "big": big, "huge": huge,
        "batch_lines": BATCH_LINES, "doc_batch": DOC_BATCH,
        "bulk_lines": BULK_LINES, "tail_batches": TAIL_BATCHES,
        "flag_slack": FLAG_SLACK, "growth_flag": GROWTH_FLAG,
        "flagged": flagged,
        "components": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "flagged": flagged,
        "exponents": {c: r["exponent"] for c, r in results.items()},
        "growth_ratios": {c: r["big"]["growth_ratio"]
                          for c, r in results.items()},
    }))


if __name__ == "__main__":
    main()
