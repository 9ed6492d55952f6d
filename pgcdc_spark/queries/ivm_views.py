"""Incremental view maintenance driven through the driver oracle.

streaming/ivm.py's three view maintainers (group-agg deltas, join views
via ΔL ⋈ R ∪ L ⋈ ΔR, MIN/MAX via support sets) were previously
suite-visible only (pytest exactness vs recompute). These queries are
their BATCH TWINS: each derives a deterministic multi-batch CDC fixture
from the standard tables, applies the batches through the SAME maintainer
code paths the streams use (apply_agg_view_batch /
JoinViewMaintainer.apply_batch / MinMaxViewMaintainer.apply_batch), then
returns the maintained view — while the DuckDB oracle recomputes the view
directly from the fixture definition (plain window + join + group-by).
A hash match therefore proves the incremental path converges to the
batch-recompute answer on real data, under the driver gate, not just in
the suite.

Fixture discipline (same as cdc_state.py): everything derives
arithmetically from table columns so the oracle can mirror it; batch
assignment is part of the fixture (later batches carry updates/deletes
against keys inserted by earlier ones, so retraction paths genuinely
run). State lives in a fresh scratch dir per invocation (the returned
DataFrame reads it lazily, so it cannot be deleted here); _scratch_dir
registers an atexit rmtree so bench/sweep sessions that invoke these
twins repeatedly do not accumulate unbounded /tmp state (r8 review).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

_N_BUCKETS = 8  # small fixtures: fewer buckets = fewer tiny files/jobs


def _scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit cleanup: the state must outlive this function
    (the returned DataFrame reads it lazily) but not the process."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


_IVM_CACHE_FORMAT = "v1"  # bump to invalidate cached maintained states

_STALE_BUILD_SECS = 6 * 3600


def _sweep_stale_builds(parent: str) -> None:
    """Reap `.{kind}-build-*` scratch dirs older than 6 h: a SIGKILLed
    builder never reaches its rename-or-rmtree epilogue, so without a
    sweep the orphans accumulate forever. Age-gated so a live concurrent
    build is never reaped — on the NEWEST mtime anywhere in the tree
    (writing into a nested subdirectory does not touch the top-level
    dir's mtime, so aging on that alone could reap a legitimately
    long-running build mid-write); errors ignored (another sweeper may
    race us)."""
    import time

    def _newest_mtime(p: str) -> float:
        newest = os.stat(p).st_mtime
        for base, dirs, files in os.walk(p):
            for entry in dirs + files:
                try:
                    m = os.stat(os.path.join(base, entry)).st_mtime
                except OSError:
                    continue  # a concurrent builder renamed/removed it
                if m > newest:
                    newest = m
        return newest

    try:
        now = time.time()
        for name in os.listdir(parent):
            if "-build-" not in name or not name.startswith("."):
                continue
            p = os.path.join(parent, name)
            try:
                if now - _newest_mtime(p) > _STALE_BUILD_SECS:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass


def _tables_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> str:
    """Content fingerprint (paths + sizes + mtimes) of the fixture's
    source tables — the cache key, so a regenerated corpus at the same
    path rebuilds instead of serving stale state (same discipline as the
    ANN index cache, queries/llm_extra._corpus_fingerprint)."""
    import hashlib

    h = hashlib.md5(sf_dir.encode())
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        paths = [p] if os.path.isfile(p) else [
            os.path.join(base, f)
            for base, _dirs, files in os.walk(p) for f in files
        ]
        for f in sorted(paths):
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def _maintained_dir(kind: str, sf_dir: str, tables: tuple[str, ...],
                    build) -> str:
    """Session-transcending cache of a twin's MAINTAINED state, keyed on
    the source-table fingerprint: the 3-batch maintenance is
    deterministic, so its end state is a build-once artifact exactly
    like the ANN index — query builds on a warm cache plan lazily over
    the published state (the job-free-build discipline,
    tests/test_plans.py::test_no_collect_in_query_surface). The build
    runs in a scratch sibling and publishes by ATOMIC RENAME (manifests
    are root-relative, so the state is relocatable); a concurrent
    builder losing the rename race just discards its scratch copy.

    ``PGCDC_IVM_CACHE=0`` disables the cache (fresh scratch dir per
    invocation) — bench.py sets it so the benched IVM entries keep
    timing the MAINTENANCE path, the number the cross-round series
    tracks, not the cached read-back."""
    if os.environ.get("PGCDC_IVM_CACHE", "1") == "0":
        d = _scratch_dir(f"pgcdc-ivm-{kind}-")
        build(d)
        return d
    # Per-user cache root, mode 0700: the shared system temp dir is
    # world-writable, so an unscoped path would let another local user
    # pre-create a fingerprint dir and poison cached query results.
    uid = os.getuid() if hasattr(os, "getuid") else 0
    parent = os.path.join(
        tempfile.gettempdir(), f"pgcdc_spark_ivm_{_IVM_CACHE_FORMAT}_u{uid}")
    os.makedirs(parent, mode=0o700, exist_ok=True)
    st = os.stat(parent)
    if hasattr(os, "getuid") and st.st_uid != uid:
        raise RuntimeError(
            f"IVM cache root {parent} is owned by uid {st.st_uid}, not "
            f"{uid} — refusing to trust it (set PGCDC_IVM_CACHE=0 to "
            "bypass the cache)")
    os.chmod(parent, 0o700)
    _sweep_stale_builds(parent)
    root = os.path.join(
        parent, f"{kind}-{_tables_fingerprint(sf_dir, tables)}")
    if os.path.isdir(root):
        return root
    tmp = tempfile.mkdtemp(prefix=f".{kind}-build-", dir=parent)
    try:
        build(tmp)
        try:
            os.rename(tmp, root)
        except OSError:
            # lost the publish race: the winner's state is identical
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return root


def _events_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a 3-batch CDC changelog: key user_id, LSN (ts_us,
    event_id), op D for 'error' rows, batch = event_id % 3 — so a user's
    later changes routinely land in different batches than their first."""
    (events,) = load(spark, sf_dir, "events")
    return events.select(
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "user_id",
        "event_type",
        "value",
        (F.col("event_id") % 3).alias("batch"),
    )


_AGG_VIEW_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n_rows
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type
"""


@query("ivm_agg_view_state", oracle=_AGG_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_agg_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/COUNT view maintained from state-transition deltas across 3
    CDC batches (inserts, updates, deletes, out-of-order arrivals), read
    back as the delta-log fold. The oracle recomputes the view directly
    from the final upsert state — agreement proves the incremental deltas
    net to the batch answer (exact decimal arithmetic on both sides)."""
    from ..streaming.ivm import AggView, apply_agg_view_batch, read_agg_view
    from ..streaming.statestore import BucketedStateStore

    view = AggView("by_type", group_cols=["event_type"], sum_col="value")

    def build(state_dir: str) -> None:
        store = BucketedStateStore(os.path.join(state_dir, "state"),
                                   n_buckets=_N_BUCKETS)
        delta_root = os.path.join(state_dir, f"view_{view.name}")
        log = _events_changelog(spark, sf_dir)
        for b in range(3):
            apply_agg_view_batch(
                store, view, delta_root,
                log.filter(F.col("batch") == b).drop("batch"),
                label=str(b), keys=["user_id"],
                order_by=["ts_us", "event_id"],
            )

    state_dir = _maintained_dir("agg", sf_dir, ("events",), build)
    return read_agg_view(spark, state_dir, view)


_MINMAX_VIEW_ORACLE = """
SELECT event_type, MIN(value) AS min_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type
"""


@query("ivm_minmax_view_state", oracle=_MINMAX_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_minmax_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN view maintained via the bounded support-set construction
    (k entries per group) across the same 3-batch fixture — deletes and
    updates retract support members, exercising the invariant-repair
    re-derivation path on real data. Oracle: MIN over the final upsert
    state (doubles compare exactly; no arithmetic beyond comparison)."""
    from ..streaming.ivm import MinMaxView, MinMaxViewMaintainer

    view = MinMaxView("mn", group_cols=["event_type"], val_col="value",
                      key_cols=["user_id"], agg="min", k=4)

    def build(state_dir: str) -> None:
        m = MinMaxViewMaintainer(state_dir, view, keys=["user_id"],
                                 order_by=["ts_us", "event_id"],
                                 n_buckets=_N_BUCKETS)
        log = _events_changelog(spark, sf_dir)
        for b in range(3):
            m.apply_batch(log.filter(F.col("batch") == b).drop("batch"),
                          label=str(b))

    state_dir = _maintained_dir("minmax", sf_dir, ("events",), build)
    out = MinMaxViewMaintainer(state_dir, view, keys=["user_id"],
                               order_by=["ts_us", "event_id"],
                               n_buckets=_N_BUCKETS).read_view(spark)
    return out.select("event_type", F.col("min_value"))


# Join-view fixture: orders (sampled, key id) ⋈ customer (key rid) on
# custkey. Batches 0/1 insert first images; batch 2 carries updates
# (left: k%5=0 reprices +100; right: custkey%4=1 retags segment '*') and
# deletes (left: k%7=3) against batch-0/1 keys — both ΔL ⋈ R_old and
# L_new ⋈ ΔR see genuine retractions.
_JOIN_VIEW_ORACLE = """
WITH lsrc AS (
  SELECT o_orderkey AS id, o_custkey AS j, o_totalprice AS a_val,
         o_orderkey // 10 AS k
  FROM orders WHERE o_orderkey % 10 = 0
),
lev AS (
  SELECT id, j, a_val, 2 * id AS lsn, 'U' AS op FROM lsrc
  UNION ALL
  SELECT id, j, a_val + 100, 2 * id + 1, 'U' FROM lsrc WHERE k % 5 = 0
  UNION ALL
  SELECT id, j, a_val, 2 * id + 2, 'D' FROM lsrc WHERE k % 7 = 3
),
lstate AS (
  SELECT id, j, a_val FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
    FROM lev
  ) WHERE rn = 1 AND op <> 'D'
),
rsrc AS (SELECT c_custkey AS j, c_mktsegment AS b_val FROM customer),
rev AS (
  SELECT j, b_val, 2 * j AS lsn, 'U' AS op FROM rsrc
  UNION ALL
  SELECT j, b_val || '*', 2 * j + 1, 'U' FROM rsrc WHERE j % 4 = 1
),
rstate AS (
  SELECT j, b_val FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY j ORDER BY lsn DESC) AS rn
    FROM rev
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT l.id, l.j, l.a_val, r.b_val, CAST(1 AS BIGINT) AS multiplicity
FROM lstate l JOIN rstate r USING (j)
"""


@query("ivm_join_view_state", oracle=_JOIN_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_join_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join view maintained incrementally with
    ΔV = ΔL ⋈ R_old ∪ L_new ⋈ ΔR over a two-table, 3-batch CDC fixture
    (both sides see inserts, updates, and deletes), read back as the
    signed fold. The oracle joins the two final upsert states directly —
    agreement proves the delta rule nets to the join of the end states,
    including retraction bookkeeping (every surviving row's multiplicity
    is exactly 1 here: unique ids on the left, unique custkeys on the
    right)."""
    from ..streaming.ivm import JoinView, JoinViewMaintainer

    (orders, customer) = load(spark, sf_dir, "orders", "customer")
    lsrc = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("j"),
        F.col("o_totalprice").alias("a_val"),
        (F.col("o_orderkey") / F.lit(10)).cast("long").alias("k"),
    )
    first_l = lsrc.select(
        (2 * F.col("id")).alias("lsn"), F.lit("U").alias("op"),
        "id", "j", "a_val", (F.col("k") % 2).alias("batch"),
    )
    upd_l = lsrc.filter(F.col("k") % 5 == 0).select(
        (2 * F.col("id") + 1).alias("lsn"), F.lit("U").alias("op"),
        "id", "j", (F.col("a_val") + 100).alias("a_val"),
        F.lit(2).alias("batch"),
    )
    del_l = lsrc.filter(F.col("k") % 7 == 3).select(
        (2 * F.col("id") + 2).alias("lsn"), F.lit("D").alias("op"),
        "id", "j", "a_val", F.lit(2).alias("batch"),
    )
    left_log = first_l.unionByName(upd_l).unionByName(del_l)

    rsrc = customer.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_custkey").alias("j"),
        F.col("c_mktsegment").alias("b_val"),
    )
    first_r = rsrc.select(
        (2 * F.col("rid")).alias("lsn"), F.lit("U").alias("op"),
        "rid", "j", "b_val", (F.col("rid") % 2).alias("batch"),
    )
    upd_r = rsrc.filter(F.col("rid") % 4 == 1).select(
        (2 * F.col("rid") + 1).alias("lsn"), F.lit("U").alias("op"),
        "rid", "j", F.concat(F.col("b_val"), F.lit("*")).alias("b_val"),
        F.lit(2).alias("batch"),
    )
    right_log = first_r.unionByName(upd_r)

    view = JoinView("ord_cust", on=["j"], left_cols=["id", "j", "a_val"],
                    right_cols=["j", "b_val"])

    def build(state_dir: str) -> None:
        m = JoinViewMaintainer(state_dir, view, left_keys=["id"],
                               right_keys=["rid"], n_buckets=_N_BUCKETS)
        for b in range(3):
            m.apply_batch(
                left_log.filter(F.col("batch") == b).drop("batch"),
                right_log.filter(F.col("batch") == b).drop("batch"),
                label=str(b),
            )

    state_dir = _maintained_dir("join", sf_dir, ("orders", "customer"), build)
    return JoinViewMaintainer(state_dir, view, left_keys=["id"],
                              right_keys=["rid"],
                              n_buckets=_N_BUCKETS).read_view(spark)


_DISTINCT_VIEW_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id % 25) AS BIGINT) AS n_distinct_cohort
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type
"""


@query("ivm_distinct_view_state", oracle=_DISTINCT_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_distinct_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) view maintained incrementally via refcounted
    deltas (streaming/ivm.DistinctView) across the same 3-batch CDC
    fixture: a cohort (user_id % 25) leaves a group's distinct set only
    when its LAST live holder departs — the case plain count deltas
    cannot express. Oracle: direct COUNT(DISTINCT) over the final upsert
    state; agreement proves the refcount fold nets to the batch answer."""
    from ..streaming.ivm import (
        DistinctView,
        apply_distinct_view_batch,
        read_distinct_view,
    )
    from ..streaming.statestore import BucketedStateStore

    view = DistinctView("cohorts", group_cols=["event_type"],
                        distinct_col="cohort")

    def build(state_dir: str) -> None:
        store = BucketedStateStore(os.path.join(state_dir, "state"),
                                   n_buckets=_N_BUCKETS)
        delta_root = os.path.join(state_dir, f"view_{view.name}")
        log = _events_changelog(spark, sf_dir).withColumn(
            "cohort", F.col("user_id") % 25
        )
        for b in range(3):
            apply_distinct_view_batch(
                store, view, delta_root,
                log.filter(F.col("batch") == b).drop("batch"),
                label=str(b), keys=["user_id"],
                order_by=["ts_us", "event_id"],
            )

    state_dir = _maintained_dir("distinct", sf_dir, ("events",), build)
    return read_distinct_view(spark, state_dir, view)


_TOPK_VIEW_ORACLE = """
SELECT event_type, user_id, value, rank FROM (
  SELECT event_type, user_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY value DESC, user_id) AS rank
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
) WHERE rank <= 3
"""


@query("ivm_topk_view_state", oracle=_TOPK_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_topk_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-3 rows per group maintained incrementally (r8) — the support-
    set IVM case where a delete/update of a ranked row must promote the
    next-best: the buffered support (k_out + slack) absorbs evictions,
    and the invariant-repair refill re-derives a group from state when
    the buffer is exhausted. Same 3-batch I/U/D fixture as the other IVM
    twins; the oracle ranks the final upsert state directly (value
    doubles compare exactly, user_id breaks ties), so a hash match
    proves the incremental view == the batch recompute, rank for rank."""
    from ..streaming.ivm import TopKView, TopKViewMaintainer

    view = TopKView("t3", group_cols=["event_type"], val_col="value",
                    key_cols=["user_id"], agg="max", k_out=3, slack=4)

    def build(state_dir: str) -> None:
        m = TopKViewMaintainer(state_dir, view, keys=["user_id"],
                               order_by=["ts_us", "event_id"],
                               n_buckets=_N_BUCKETS)
        log = _events_changelog(spark, sf_dir)
        for b in range(3):
            m.apply_batch(log.filter(F.col("batch") == b).drop("batch"),
                          label=str(b))

    state_dir = _maintained_dir("topk", sf_dir, ("events",), build)
    return TopKViewMaintainer(state_dir, view, keys=["user_id"],
                              order_by=["ts_us", "event_id"],
                              n_buckets=_N_BUCKETS).read_view(spark)


# Documents as a 3-batch changelog — batches 0/1 insert (doc_id % 2),
# batch 2 updates (doc_id % 5 = 0 appends a new token) and deletes
# (doc_id % 7 = 3) keys from the earlier batches, so term deltas
# genuinely retract old vocabularies.  Shared by the term-DF and
# incremental-BM25 queries; _DOCS_FINAL_CTE is the oracle-side twin (the
# post-changelog corpus state) — change them TOGETHER.
_DOCS_FINAL_CTE = """
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' zqxnovel' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 3
"""


def _docs_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, lsn, op, batch) rows of the shared fixture above."""
    (docs,) = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")
    return (
        base.select(
            "doc_id", "text", (2 * F.col("doc_id")).alias("lsn"),
            F.lit("U").alias("op"),
            (F.col("doc_id") % 2).cast("int").alias("batch"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 5 == 0).select(
                "doc_id",
                F.concat("text", F.lit(" zqxnovel")).alias("text"),
                (2 * F.col("doc_id") + 1).alias("lsn"),
                F.lit("U").alias("op"),
                F.lit(2).cast("int").alias("batch"),
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 7 == 3).select(
                "doc_id", "text",
                (2 * F.col("doc_id") + 2).alias("lsn"),
                F.lit("D").alias("op"),
                F.lit(2).cast("int").alias("batch"),
            )
        )
    )


_TERM_DF_ORACLE = f"""
WITH final AS (
{_DOCS_FINAL_CTE}
),
t AS (
  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS term
  FROM final
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term
  UNION ALL
  SELECT ' N' AS term, CAST(COUNT(*) AS BIGINT) FROM final
)
SELECT term, df FROM df
"""


@query("ivm_term_df_state", oracle=_TERM_DF_ORACLE, tags=("cdc", "ivm", "text"))
def ivm_term_df_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency view (term -> live-doc count, plus the ' N'
    pseudo-term carrying N itself — the BM25/TF-IDF corpus statistics)
    maintained incrementally from a 3-batch documents changelog (r8):
    updates retract the old text's token set and add the new one, so the
    delta log carries only CHANGED terms; deletes retract exactly the
    doc's vocabulary. The oracle recomputes df from the final state —
    a hash match proves the signed token deltas net to the batch answer
    over a real vocabulary."""
    from ..streaming.ivm import (
        TermDFView,
        apply_agg_view_batch,
        read_term_df_view,
    )
    from ..streaming.statestore import BucketedStateStore

    ev = _docs_changelog(spark, sf_dir)
    view = TermDFView("df")

    def build(state_dir: str) -> None:
        store = BucketedStateStore(os.path.join(state_dir, "state"),
                                   n_buckets=_N_BUCKETS)
        delta_root = os.path.join(state_dir, f"view_{view.name}")
        for b in range(3):
            apply_agg_view_batch(
                store, view, delta_root,
                ev.filter(F.col("batch") == b).drop("batch"),
                label=str(b), keys=["doc_id"], order_by=["lsn"],
            )

    state_dir = _maintained_dir("termdf", sf_dir, ("documents",), build)
    return read_term_df_view(spark, state_dir, view)


# BM25 served from the MAINTAINED views — the end state of the text-index
# story: postings (tf + doc lengths) kept current by PostingsView over
# the same 3-batch documents changelog, scored with the exact formula of
# the batch docs_bm25_topk. The oracle recomputes BM25 from the final
# state, so a hash match proves the incrementally maintained inverted
# index answers retrieval queries identically to a fresh index build.
def _bm25_incr_oracle() -> str:
    from .llm_text import _BM25_B, _BM25_K1, _BM25_TERMS, _BM25_TOP

    return f"""
WITH final AS (
{_DOCS_FINAL_CTE}
),
tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM final
),
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM final
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok
  WHERE t IN {_BM25_TERMS} GROUP BY doc_id, t
),
df AS (
  SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
  WHERE t IN {_BM25_TERMS} GROUP BY t
),
scored AS (
  SELECT f.doc_id,
    ROUND(SUM(
      CAST(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        * f.tf * ({_BM25_K1} + 1.0)
        / (f.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * l.dl / s.avgdl))
      AS DECIMAL(28,9))
    )::DOUBLE, 9) AS bm25
  FROM tf f
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  JOIN df d USING (t)
  GROUP BY f.doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM scored
) WHERE rank <= {_BM25_TOP}
"""


@query("ivm_bm25_topk_state", oracle=_bm25_incr_oracle(),
       tags=("cdc", "ivm", "text", "retrieval"))
def ivm_bm25_topk_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k answered FROM the incrementally maintained postings
    (r8): PostingsView keeps (term, doc_id, tf) and per-doc lengths
    current across the 3-batch I/U/D changelog; the query derives N,
    avgdl, df, and the scores from the view alone — no corpus rescan.
    The oracle rebuilds the index from the final state: a hash match is
    the retrieval-level incremental-equals-rebuild proof for the text
    index, the twin of emb_ann_index_incremental's for vectors."""
    from pyspark.sql import Window

    from ..streaming.ivm import (
        PostingsView,
        apply_agg_view_batch,
        read_postings_view,
    )
    from ..streaming.statestore import BucketedStateStore
    from .llm_text import _BM25_B, _BM25_K1, _BM25_TERMS, _BM25_TOP

    ev = _docs_changelog(spark, sf_dir)
    view = PostingsView("post")

    def build(state_dir: str) -> None:
        store = BucketedStateStore(os.path.join(state_dir, "state"),
                                   n_buckets=_N_BUCKETS)
        delta_root = os.path.join(state_dir, f"view_{view.name}")
        for b in range(3):
            apply_agg_view_batch(
                store, view, delta_root,
                ev.filter(F.col("batch") == b).drop("batch"),
                label=str(b), keys=["doc_id"], order_by=["lsn"],
            )

    state_dir = _maintained_dir("bm25post", sf_dir, ("documents",), build)
    post = read_postings_view(spark, state_dir, view)
    dl = post.filter(F.col("term") == view.dl_term).select(
        "doc_id", F.col("tf").cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = post.filter(F.col("term").isin(list(_BM25_TERMS))).select(
        F.col("term").alias("t"), "doc_id", F.col("tf").cast("double").alias("tf")
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf * F.col("tf") * (_BM25_K1 + 1.0)
        / (F.col("tf") + _BM25_K1
           * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        # tf (docs containing the query terms) and dl (ALL doc lengths)
        # are both corpus-scaled — never leave this join to a size
        # estimate (r12 broadcast audit); merge on the shared doc_id key
        tf.join(dl.hint("merge"), "doc_id")
        .crossJoin(F.broadcast(stats))   # bounded: 1-row aggregate
        .join(F.broadcast(df_), "t")     # bounded: one row per fixed term
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(term_score.cast("decimal(28,9)")).cast("double"), 9
            ).alias("bm25")
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOP)
        .select("doc_id", "bm25", "rank")
    )


# --- incremental histogram (distribution/drift view) --------------------------
# The distribution-monitoring view a training-data pipeline keeps over a
# CDC-fed table: per-group equi-width bucket counts, maintained
# incrementally.  Structurally this is AggView with the bucket id folded
# into the grouping key — bucket assignment is a row-local expression
# (width_bucket), so an UPDATE whose value crosses a bucket boundary
# retracts (-1) from the old bucket and adds (+1) to the new one through
# the same state-transition delta that maintains the sums.  Cost per
# batch: O(touched groups x buckets), log rows bounded by touched keys;
# the read-time fold is |groups x buckets| rows regardless of state size
# — at 100 TB the histogram stays a dashboard-sized relation maintained
# for the price of the delta scan.

_HIST_LO, _HIST_HI, _HIST_NB = 0.0, 500.0, 8

_HIST_VIEW_ORACLE = f"""
SELECT event_type,
       CASE WHEN value < {_HIST_LO} THEN 0
            WHEN value >= {_HIST_HI} THEN {_HIST_NB + 1}
            ELSE CAST(FLOOR({_HIST_NB}.0 * (value - {_HIST_LO})
                            / ({_HIST_HI} - {_HIST_LO})) AS BIGINT) + 1
       END AS bucket,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n_rows
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type, bucket
"""


@query("ivm_histogram_view_state", oracle=_HIST_VIEW_ORACLE, tags=("cdc", "ivm"))
def ivm_histogram_view_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, width_bucket) count + sum view maintained from
    state-transition deltas across the 3-batch I/U/D fixture — the
    incremental distribution monitor: updates that move a row across a
    bucket boundary retract from the old bucket and add to the new one.
    Oracle: the same width_bucket arithmetic (CASE/FLOOR mirror of the
    SQL-standard function) over the final upsert state; a hash match
    proves bucket-crossing retractions net to the batch histogram."""
    from ..streaming.ivm import AggView, apply_agg_view_batch, read_agg_view
    from ..streaming.statestore import BucketedStateStore

    view = AggView("hist", group_cols=["event_type", "bucket"], sum_col="value")

    def build(state_dir: str) -> None:
        store = BucketedStateStore(os.path.join(state_dir, "state"),
                                   n_buckets=_N_BUCKETS)
        delta_root = os.path.join(state_dir, f"view_{view.name}")
        log = _events_changelog(spark, sf_dir).withColumn(
            "bucket",
            F.width_bucket(
                "value", F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_NB)
            ),
        )
        for b in range(3):
            apply_agg_view_batch(
                store, view, delta_root,
                log.filter(F.col("batch") == b).drop("batch"),
                label=str(b), keys=["user_id"],
                order_by=["ts_us", "event_id"],
            )

    state_dir = _maintained_dir("hist", sf_dir, ("events",), build)
    return read_agg_view(spark, state_dir, view)
