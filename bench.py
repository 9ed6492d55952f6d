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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from pgcdc_spark.session import get_spark
    from pgcdc_spark.queries import all_queries

    spark = get_spark(app_name="pgcdc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Power-test style: per query, one warm-up run (JVM codegen + JIT +
    # parquet footers) immediately followed by the measured run — the
    # steady state a long-running job sees for that plan.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        qd = qs[name]
        qd.fn(spark, sf_dir).collect()
        t0 = time.perf_counter()
        rows = qd.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert rows is not None

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
