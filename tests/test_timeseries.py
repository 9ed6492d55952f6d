"""Semantic edge cases for the time-series repair operators and the
substring-span dedup — the cases the sf oracles can't isolate: series
with no observations, leading/trailing gaps, single-observation series,
and span-dedup invariants (self-repetition is not duplication; exact
copies are fully covered)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    )


def _repair(df, name):
    """Run the registered query fn's logic on a crafted frame by cloning
    its windowed expression path via a temp parquet round-trip."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="pgcdc-ts-test-")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from pgcdc_spark.queries import all_queries

    return all_queries()[name].fn(df.sparkSession, d)


def test_locf_edges(spark):
    rows = [
        # user 1: leading gap, then obs, then gaps carried forward
        (1, 1, 100, "click", 5.0),
        (2, 1, 200, "purchase", 10.0),
        (3, 1, 300, "click", 7.0),
        (4, 1, 400, "purchase", 20.0),
        (5, 1, 500, "error", 1.0),
        # user 2: no observations at all
        (6, 2, 100, "click", 3.0),
        (7, 2, 200, "view", 4.0),
    ]
    out = {
        r["event_id"]: r["locf_value"]
        for r in _repair(_series(spark, rows), "events_locf_fill").collect()
    }
    assert out[1] is None, "leading gap must stay null"
    assert out[2] == 10.0 and out[3] == 10.0
    assert out[4] == 20.0 and out[5] == 20.0
    assert out[6] is None and out[7] is None, "no-observation series stays null"


def test_interp_brackets_and_edges(spark):
    rows = [
        (1, 1, 100, "click", 99.0),  # leading edge -> null
        (2, 1, 200, "purchase", 10.0),
        (3, 1, 300, "click", 0.0),  # midpoint of 10 -> 30 over 200..600
        (4, 1, 500, "view", 0.0),  # 3/4 of the way
        (5, 1, 600, "purchase", 30.0),
        (6, 1, 700, "error", 0.0),  # trailing edge -> null
        # single-observation series: only the observed row non-null
        (7, 2, 100, "purchase", 5.0),
        (8, 2, 200, "click", 0.0),
    ]
    out = {
        r["event_id"]: r["interp_value"]
        for r in _repair(_series(spark, rows), "events_linear_interp").collect()
    }
    assert out[1] is None and out[6] is None
    assert out[2] == 10.0 and out[5] == 30.0, "observed rows return their value"
    assert out[3] == 10.0 + 20.0 * (100.0 / 400.0)
    assert out[4] == 10.0 + 20.0 * (300.0 / 400.0)
    assert out[7] == 5.0 and out[8] is None


def test_dup_spans_invariants(spark):
    import os
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "en", "s", 9),  # copied verbatim by doc 2
            (2, "a b c d e", "en", "s", 9),
            (3, "x x x x x", "en", "s", 9),  # self-repetition only
            (4, "q r", "en", "s", 3),  # shorter than k=3 -> no grams
            (5, "c d e f g", "en", "s", 9),  # shares one gram with 1/2
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tempfile.mkdtemp(prefix="pgcdc-span-test-")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    from pgcdc_spark.queries import all_queries

    out = {
        r["doc_id"]: r
        for r in all_queries()["dedup_dup_ngram_spans"].fn(spark, d).collect()
    }
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    # self-repetition within one doc is NOT cross-doc duplication
    assert out[3]["dup_positions"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    # doc 5: grams {c d e, d e f, e f g}; only "c d e" is shared
    assert out[5]["n_grams"] == 3 and out[5]["dup_positions"] == 1
    assert abs(out[5]["dup_frac"] - 1.0 / 3.0) < 1e-15


def test_ohlc_single_trade_and_order(spark):
    rows = [
        # one bucket with three trades in a known order
        (1, 1, 3_600_000_000_000 * 10 + 100, "purchase", 5.0),
        (2, 1, 3_600_000_000_000 * 10 + 200, "purchase", 9.0),
        (3, 1, 3_600_000_000_000 * 10 + 300, "purchase", 2.0),
        # same-ts tie broken by event_id: 5 arrives "before" 6
        (5, 1, 3_600_000_000_000 * 11, "purchase", 7.0),
        (6, 1, 3_600_000_000_000 * 11, "purchase", 3.0),
        # single-trade bucket: open == high == low == close
        (7, 1, 3_600_000_000_000 * 12 + 50, "purchase", 4.0),
        (8, 1, 3_600_000_000_000 * 12 + 60, "click", 99.0),  # not a trade
    ]
    out = {
        r["hour_bucket"]: r
        for r in _repair(_series(spark, rows), "events_ohlc_hourly").collect()
    }
    b10 = out[10]
    assert (b10["open"], b10["high"], b10["low"], b10["close"], b10["n_trades"]) == (
        5.0, 9.0, 2.0, 2.0, 3,
    )
    b11 = out[11]
    assert (b11["open"], b11["close"]) == (7.0, 3.0), "event_id tie-break lost"
    b12 = out[12]
    assert (b12["open"], b12["high"], b12["low"], b12["close"], b12["n_trades"]) == (
        4.0, 4.0, 4.0, 4.0, 1,
    )


def test_ewma_segmented_hot_key_bounded(spark):
    """The segmented EWMA fold (r9: replaces the whole-series
    collect_list, whose per-hot-key buffer was unbounded) must match a
    local sequential fold on a 10^5-event hot key spread over many time
    buckets — with per-chunk buffers of ~bucket size, not series size."""
    import math

    from pgcdc_spark.queries.timeseries import ewma_segmented

    n = 100_000
    # one hot user; ts advances 1s per event -> ~28 hourly buckets... use
    # 10s steps for ~278 buckets so chunks hold ~360 events each
    rows = [(i, 1, (1_000_000_000 + i * 10) * 1_000_000_000,
             "purchase", float((i * 37) % 101) / 7.0) for i in range(n)]
    df = _series(spark, rows).repartition(16)
    out = ewma_segmented(df).collect()
    assert len(out) == 1 and out[0]["n_obs"] == n

    vals = [r[4] for r in rows]  # already in (ts, event_id) order
    e = vals[0]
    for x in vals[1:]:
        e = 0.5 * x + 0.5 * e
    assert math.isclose(out[0]["ewma"], round(e, 9), rel_tol=0, abs_tol=2e-9)
