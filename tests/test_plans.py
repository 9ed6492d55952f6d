"""Physical-plan shape tests — the 100 TB posture, enforced.

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives a 1000-executor scale-up (SURVEY.md §4.2): filters
reach the parquet scan, small sides broadcast, disjunctive join predicates
keep their equi-key (no cartesian blowup), aggregation is partial before
the shuffle, and top-k uses WindowGroupLimit instead of a full sort.
A refactor that silently regresses any of these fails here long before a
benchmark would catch it.
"""

from __future__ import annotations

import pytest

from pgcdc_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_scan(spark):
    plan = _plan(spark, "q6_revenue_forecast")
    scan = plan[plan.index("FileScan") :]
    head = scan[:1200]
    # All three predicates must reach the parquet reader (row-group skipping
    # at scale), and the scan must read only the 4 referenced columns.
    assert "PushedFilters" in head
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in head.split("ReadSchema")[0], f"{col} not pushed"
    read_schema = head.split("ReadSchema:")[1]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema, "column pruning regressed"


@pytest.mark.parametrize("name", ["q5_local_supplier_volume", "q14_promo_share",
                                  "q18_large_orders"])
def test_dim_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dim join no longer broadcast"


def test_q19_keeps_equi_key(spark):
    """The OR-bracket predicate must not demote the join to a nested-loop /
    cartesian plan — Catalyst extracts the common p_partkey equi-key."""
    plan = _plan(spark, "q19_disjunctive_brackets")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_partial_aggregation(spark):
    """Partial (map-side) agg must run before the exchange so the shuffle
    moves |groups| rows per partition, not |lineitem|."""
    plan = _plan(spark, "q1_pricing_summary")
    # Below the groupBy's hash exchange there must be a partial HashAggregate
    # (the adaptive fan_out's round-robin exchange may sit further down).
    below_group_shuffle = plan.split("Exchange hashpartitioning")[-1]
    assert "HashAggregate" in below_group_shuffle, "no map-side partial agg below shuffle"
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_window_group_limit(spark):
    """rank<=k must compile to WindowGroupLimit (per-group top-k heap), not
    a full per-partition sort + filter."""
    for name in ("window_topk_per_group", "emb_cosine_topk"):
        assert "WindowGroupLimit" in _plan(spark, name), name


def test_dedup_exact_single_shuffle(spark):
    """Hash-groupBy dedup is one shuffle on the text hash — never on text."""
    plan = _plan(spark, "dedup_exact")
    assert plan.count("Exchange") == 1


def test_no_collect_in_query_surface(spark):
    """Building any query's DataFrame must not run a Spark JOB: a collect/
    count/toPandas inside a query builder would be a driver-side loop the
    100 TB posture forbids. Job IDs are monotonically increasing, so a new
    max job ID after the build means something executed eagerly.

    (fan_out's getNumPartitions inspects the plan without running a job —
    this test is also the proof of that.)"""
    # EXCEPTION DISCIPLINE (r8 verdict item 6, family form since r10):
    # each FAMILY is one argued exception — the argument names the O(.)
    # class of what its build jobs ship to the driver AND the single
    # code path that does the shipping; members without their own
    # distinct argument do not get their own entry. Two sanctioned
    # classes (artifact-cached builders — ANN stats, binaryFile fixture,
    # all IVM twins, time travel — plan lazily on a warm cache and are
    # PREWARMED below instead of excepted):
    #   fixpoint   — declared-iterative operators (the GraphX/Pregel
    #                execution model): per-iteration jobs, only SCALAR
    #                convergence counts reach the driver;
    #   metadata   — one bounded collect of schema/cell/relation METADATA
    #                that must exist before the plan can be built.
    EXCEPTION_FAMILIES = {
        # fixpoint: label-propagation CC with pointer jumping
        # (llm_dedup.connected_components) — O(1) convergence scalar per
        # round; the other two COMPOSE the same CC stage.
        "cc-fixpoint": (
            "dedup_cc_clusters", "dedup_keep_best", "training_mix_pipeline",
            "docs_filter_funnel",  # composes dedup_keep_best's CC stage
        ),
        # fixpoint: O(1) frontier-size scalar per BFS hop.
        "bfs-fixpoint": ("graph_bfs_hops",),
        # metadata: O(columns) image-column-name discovery — the evolved
        # schema must exist before the plan can name its columns.
        "schema-discovery": ("cdc_evolving_state", "cdc_widening_state"),
        # metadata: every member funnels through the ONE collect in
        # AnnIndex.probe shipping O(|queries| * nprobe) (qid, cid) rows
        # — the FAISS invlist lookup, reused as a literal frame for the
        # ADC join so the assignment never executes twice (+ O(versions)
        # manifest reads for the pinned-version probe) — plus, on a cold
        # corpus cache, the DECLARED one-time O(corpus) index build.
        "ann-probe-serving": (
            "emb_ann_index_probe", "emb_ann_index_incremental",
            "emb_ann_index_compacted", "emb_ann_index_filtered_probe",
            "emb_ann_index_filtered_incremental", "emb_ann_index_asof_probe",
            "emb_mmr_rerank_ann",  # shortlist via the same idx.probe
            # r13 optimization: these two now take their ANN stage from
            # the SAME idx.probe (serving shape) instead of the inline
            # ADC pipeline — same single bounded collect, same argument.
            "emb_ann_rerank_exact", "hybrid_rrf_retrieval",
        ),
        # metadata: O(#tables) 'R' relation-message discovery — the
        # relations dict must exist driver-side before the Arrow decode
        # closure can be built. Since r11 BOTH protocol paths dedupe
        # re-sent payloads executor-side (groupBy payload, max lsn), so
        # the discovery collect is two-stage by design and ships one
        # image per relation instead of one per re-send.
        # cdc_toast_upsert_state joined in r11: it exercises the
        # auto-discovery path (no explicit relations dict) on purpose.
        "relation-discovery": ("cdc_pgoutput_state", "cdc_pgoutput_stream_state",
                               "cdc_toast_upsert_state"),
        # metadata: FIXTURE capture materialization (localCheckpoint of
        # the encoded byte stream — the bytes-in-storage model; several
        # control passes read it). Real deployments read bytes from
        # storage, where the build is job-free. cdc_xlog_infer_state
        # additionally runs the O(#tables) relation-SCHEMA discovery
        # collect (type-OID inference IS that query's claim).
        # (cdc_publication_filter_state joined in r11: its factored
        # capture localCheckpoints a fixture whose transition routing
        # needs lag(value) — a window shuffle, hence multi-stage.
        # cdc_e2e_revenue_rollup and cdc_multitable_route_state joined
        # in r13: every capture now pins BALANCED blocks — pin_capture
        # repartitions the encoded bytes before the localCheckpoint so
        # downstream decode passes parse in parallel instead of one
        # skewed task — which makes even the narrow fixture plans'
        # checkpoint jobs multi-stage. Same O(batch) shipped to storage,
        # zero rows to the driver; the argument is unchanged.)
        "fixture-capture": (
            "cdc_two_phase_state", "cdc_origin_filter_state",
            "cdc_xlog_infer_state", "cdc_publication_filter_state",
            "cdc_e2e_revenue_rollup", "cdc_multitable_route_state",
        ),
    }
    iterative = {
        name for names in EXCEPTION_FAMILIES.values() for name in names
    }
    # Artifact-cached builders: their one-time build (ANN index / mm
    # fixture / IVM maintained state) is the artifact's contract, not a
    # query-build leak — prewarm the caches, then hold the queries to the
    # SAME job-free standard as everything else (warm = serving path =
    # the 100 TB posture, where the artifact already exists).
    prewarm = [
        "emb_ann_index_stats", "emb_ann_index_idmap_stats",
        "mm_binary_ingest",
        "ivm_agg_view_state", "ivm_minmax_view_state",
        "ivm_join_view_state", "ivm_distinct_view_state",
        "ivm_topk_view_state", "ivm_term_df_state",
        "ivm_bm25_topk_state", "ivm_histogram_view_state",
        "cdc_time_travel_state",
    ]

    qs = all_queries()
    for name in prewarm:
        qs[name].fn(spark, SF_DIR).schema  # cold build fills the cache
    tracker = spark.sparkContext.statusTracker()

    def jobs_above(jid: int) -> list[int]:
        return sorted(j for j in (tracker.getJobIdsForGroup(None) or []) if j > jid)

    before = max(tracker.getJobIdsForGroup(None) or [], default=-1)
    for name, qd in sorted(qs.items()):
        if name in iterative:
            continue
        df = qd.fn(spark, SF_DIR)
        df.schema  # force full analysis, still no execution
        new_jobs = jobs_above(before)
        # `spark.read.parquet` runs ONE single-stage footer/schema job per
        # table — that's metadata, not data. Anything multi-stage (a
        # shuffle => an agg/collect executed eagerly) or beyond the
        # max-tables-per-query budget is a driver-side execution leak
        # (q5 reads 6 tables; udf_sql_registered registers the whole
        # 10-table catalog as views for its ad-hoc SQL).
        assert len(new_jobs) <= 11, f"{name}: {len(new_jobs)} jobs during build"
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                assert len(info.stageIds) <= 1, (
                    f"{name}: multi-stage job {j} during plan build"
                )
        before = max(tracker.getJobIdsForGroup(None) or [], default=-1)


def test_q7_q8_dims_broadcast(spark):
    """The nation/supplier/part dims must come in as broadcast sides so the
    lineitem scan never shuffles for them."""
    for name, min_bhj in (("q7_volume_shipping", 3), ("q8_market_share", 4)):
        plan = _plan(spark, name)
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "CartesianProduct" not in plan, name


def test_global_topk_avoids_full_sort(spark):
    """Global top-k (q10, heavy hitters) must run as TakeOrderedAndProject
    (per-partition heaps), not a full Sort + Limit."""
    for name in ("q10_returned_items", "docs_top_bigrams"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_stratified_sample_group_limit(spark):
    plan = _plan(spark, "docs_stratified_sample")
    assert "WindowGroupLimit" in plan


def test_quantize_stats_join_broadcast(spark):
    """The 64-row per-dimension stats join back via broadcast — the scan
    side must not shuffle for it."""
    plan = _plan(spark, "emb_quantize_int8")
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["q2_best_supplier", "q9_profit_by_nation",
                                  "q16_supplier_part_counts",
                                  "q17_small_qty_revenue", "q20_heavy_shippers"])
def test_tpch_rest_dims_broadcast(spark, name):
    """The adapted TPC-H shapes keep every dim/agg side broadcast — no
    fact-table shuffle for a join, no nested-loop fallback."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, name
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q17_single_fact_shuffle(spark):
    """Only the per-part threshold agg shuffles; the probe side of the
    fact table reaches the final agg through broadcast joins alone."""
    plan = _plan(spark, "q17_small_qty_revenue")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q21_self_joins_keep_equi_key(spark):
    """EXISTS/NOT EXISTS self-joins must stay hash/sort-merge on
    l_orderkey with the <> suppkey arm as a residual condition — a
    nested-loop plan here is quadratic in order size at 100 TB."""
    plan = _plan(spark, "q21_sole_late_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_binned_is_hash_join(spark):
    """The binned interval join must compile to a hash join on the bin
    key with the range predicate as a residual — never a nested loop
    (which is O(|points| x |intervals|) at scale)."""
    plan = _plan(spark, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_upsert_partial_agg_skew_resistant(spark):
    """latest_state must be an AGGREGATE with map-side partial combine, not
    a window: a 90%-one-key changelog then collapses to one candidate row
    per input partition before the shuffle (no unsplittable straggler)."""
    from pgcdc_spark.cdc.upsert import latest_state

    changes = spark.createDataFrame(
        [(i % 10 if i % 10 else 0, i, "U") for i in range(100)],
        "k LONG, lsn LONG, op STRING",
    )
    plan = latest_state(changes, keys=["k"], order_by=["lsn"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan or "partial max_by" in plan.lower(), plan
    assert "Window" not in plan


def test_cbo_stats_reorder_star_join(spark):
    """With ANALYZE'd tables and CBO on, the optimizer must move the
    selective nation-filtered dim join BELOW the orders join (the written
    order joins the two big tables first). Without stats it cannot."""
    from pgcdc_spark.catalog import analyze_tables, drop_table

    names = analyze_tables(spark, SF_DIR, tables=("nation", "customer", "orders"))
    sql = """
      SELECT n.n_name, COUNT(*) AS cnt
      FROM stats_orders o
      JOIN stats_customer c ON c.c_custkey = o.o_custkey
      JOIN stats_nation n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY n.n_name
    """

    def innermost_join_cond(plan: str) -> str:
        """Condition of the INNERMOST (first-to-execute) inner join."""
        return [l for l in plan.splitlines() if "Join Inner" in l][-1]

    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        baseline = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        reordered = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        for n in names:
            drop_table(spark, n)

    # written order: big-big first (customer-orders key); CBO with stats:
    # the selective nation-filtered dim join first (nationkey)
    assert "c_custkey" in innermost_join_cond(baseline)
    assert "n_nationkey" in innermost_join_cond(reordered)


def test_histogram_partial_agg_single_shuffle(spark):
    """width_bucket assignment is row-local inside the scan stage; the
    histogram must be ONE exchange with a partial HashAggregate below it
    (the shuffle carries <= n_buckets + 2 keys per input partition)."""
    plan = _plan(spark, "agg_histogram_width_bucket")
    assert plan.count("Exchange") == 1
    below = plan.split("Exchange hashpartitioning")[-1]
    assert "HashAggregate" in below, "no map-side partial agg below the shuffle"


def test_timeseries_single_shuffle_per_series(spark):
    """LOCF and interpolation must shuffle ONCE on user_id — both window
    directions share the same partitioning + sort, so Catalyst plans a
    single Exchange (and at most one sort) per series."""
    for name in ("events_locf_fill", "events_linear_interp"):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "CartesianProduct" not in plan, name


def test_profile_single_scan(spark):
    """The column profile computes every per-column metric in one
    aggregation pass — exactly ONE FileScan however many columns are
    profiled (a per-column-job profiler would scan N times)."""
    plan = _plan(spark, "profile_orders_columns")
    assert plan.count("FileScan") == 1


def test_asof_nearest_single_exchange(spark):
    """direction='nearest' evaluates a backward and a forward window over
    the same key partitioning — Catalyst must plan ONE hash exchange (two
    sorts are expected, the frame directions differ), never a range join."""
    plan = _plan(spark, "join_asof_tolerance")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_spans_no_text_shuffle(spark):
    """Substring-span dedup must never shuffle document text: every
    Exchange below the gram aggregates carries only the md5 hash (gh),
    doc ids and counts."""
    plan = _plan(spark, "dedup_dup_ngram_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        partitioning_key = seg[: seg.index(")")]
        assert "text" not in partitioning_key, "document text reached a shuffle key"


def test_posexplode_no_shuffle(spark):
    """Generators run inside the scan stage: the lateral expansion plan
    must contain a Generate node and no Exchange at all."""
    plan = _plan(spark, "scalar_posexplode_ordinal")
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_bitmap_distinct_fixed_size_shuffles(spark):
    """The bitmap distinct-count must aggregate partially below BOTH
    exchanges (bits packed map-side) and never shuffle raw user ids: every
    hash exchange keys on (event_type[, bucket]) over already-aggregated
    bitmap state."""
    plan = _plan(spark, "agg_bitmap_distinct")
    assert plan.count("Exchange hashpartitioning") == 2
    segs = plan.split("Exchange hashpartitioning")
    # below the (event_type) exchange: map-side partial popcount sums
    assert "partial_sum" in segs[1]
    # below the (event_type, bucket) exchange: map-side partial bitmap OR
    # (SortAggregate — bitmap state is not hash-aggregable, which is fine:
    # the point is bits pack BEFORE the shuffle)
    assert "partial_bitmap_construct_agg" in segs[2]
    for seg in segs[1:]:  # no exchange partitions on the raw user id
        assert "user_id" not in seg[: seg.index(")")]


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join must split a pathologically hot key's partition at
    runtime (OptimizeSkewedJoin -> 'skew=true' in the final plan) — the
    no-code-change answer to skew that operators/salted.py complements
    for the planned-salting cases."""
    import pyspark.sql.functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        pad = F.lpad(F.lit("x"), 32, "x")
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            pad.alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        out = left.join(right, "k")
        # collect() (not count()) so the final adaptive plan belongs to
        # THIS DataFrame's QueryExecution — count() plans a separate one
        # and the un-executed original would never show the runtime split
        assert len(out.collect()) > 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark):
    """With runtime bloom filters on, a selective non-partition-column
    join must inject might_contain onto the probe side's scan — rows that
    cannot match are dropped BEFORE the shuffle (the row-level analogue
    of dynamic partition pruning; at scale this is what keeps a 1%-
    selective dim join from shuffling the whole fact table)."""
    import pyspark.sql.functions as F

    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), "runtime bloom filter not injected"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", [
    "emb_ann_index_filtered_probe",
    "emb_ann_index_filtered_incremental",  # version-spanning cells read
])
def test_ann_filtered_probe_pushes_predicate_into_cell_scan(spark, name):
    """Filtered probes: the metadata predicate must land INSIDE the
    pruned cells parquet scan (PushedFilters on `label`), not as a
    filter/join after the candidate union — at 100 TB that is the
    difference between skipping row groups inside the nprobe cells and
    shipping every candidate to a post-hoc join."""
    plan = _plan(spark, name)
    # the cells scan is the one reading PQ codes + the denormalized attr
    cell_scans = [
        seg for seg in plan.split("FileScan")[1:]
        if "pqcid" in seg[:200] and "label" in seg[:200]
    ]
    assert cell_scans, "no cells FileScan in the probe plan"
    for seg in cell_scans:
        pushed = seg[seg.index("PushedFilters") :][:300]
        assert "EqualTo(label,3)" in pushed, (
            "label predicate not pushed into the cells parquet scan"
        )
        # and the scan stays cell-pruned: cid is a partition filter
        part = seg[seg.index("PartitionFilters") :][:300]
        assert "cid" in part


def test_session_window_single_shuffle_with_partial_agg(spark):
    """Native session_window must plan as partial agg -> ONE hash
    exchange on the session key -> sort -> MergingSessions -> final agg:
    the session merge happens inside the one shuffle the group-by needs
    anyway. A second exchange (or a missing partial agg) would mean the
    operator re-shuffles per-event rows — the thing that kills it at
    100 TB."""
    plan = _plan(spark, "events_session_window_native")
    assert "MergingSessions" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    below = plan.split("Exchange hashpartitioning")[-1]
    assert "HashAggregate" in below, "no map-side partial agg below the shuffle"


def test_recursive_cte_no_cartesian(spark):
    """The WITH RECURSIVE BFS must execute each recursion level as an
    equi-join of the previous level against the edge table — never a
    nested-loop/cartesian fallback."""
    plan = _plan(spark, "graph_bfs_recursive_cte")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_linreg_partial_agg_single_shuffle(spark):
    """All five OLS sufficient statistics must partial-aggregate before
    the one shuffle (the whole point of the closed-form rewrite vs
    regr_* built-ins), and the scan reads only the three needed cols."""
    plan = _plan(spark, "agg_linreg_by_type")
    assert "partial_" in plan
    body = plan.split("ReadSchema")[0]
    # one hash-partition exchange for the groupBy (+ the presentation
    # range sort); no expand, no extra shuffles
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" not in body
    read_schema = plan.split("ReadSchema:")[1]
    assert "event_type" in read_schema and "value" in read_schema
    assert "user_id" not in read_schema, "column pruning regressed"


def test_lsn_gap_audit_rides_window_shuffle(spark):
    """The adjacency rewrite exists so the audit aggregate reuses the
    window's hash partitioning: exactly one hashpartitioning Exchange
    (the orderBy's rangepartitioning is presentation-only), and no
    count-distinct Expand."""
    plan = _plan(spark, "cdc_lsn_gap_audit")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" not in plan
    assert "partial_count" in plan


def test_basket_pairs_co_partitioned_on_order(spark):
    """Market-basket pair generation must be an equi-join on the basket
    key (co-partitioned or broadcast at test scale) with the a<b dedup
    as a join condition — never a cartesian/nested-loop over parts."""
    plan = _plan(spark, "assoc_rules_copurchase")
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the single-row count broadcast
    bnlj = plan.count("BroadcastNestedLoopJoin")
    assert bnlj <= 1
    assert "l_orderkey" in plan.split("ReadSchema")[0]


def test_ingest_decode_shared_across_maintainers(spark):
    """The composed training-ingest stream decodes each micro-batch ONCE
    (ingest.decode_and_fold persists both the row frame and the fold) and
    every maintainer reads the cache: downstream plans must leaf at
    InMemoryTableScan with zero re-parsing (no JsonToStructs) and zero
    re-scans of the batch source. Removing either persist() makes the
    composed stream re-decode the batch once PER maintainer — the N-pass
    regression this pin forbids."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField, StructType)

    from pgcdc_spark.streaming.ingest import decode_and_fold

    row_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    lines = [
        json.dumps({"lsn": f"{i:012d}", "tag": "insert",
                    "new": {"doc_id": i, "text": f"doc {i}",
                            "embedding": [0.1 * i, 0.2]}})
        for i in range(8)
    ]
    batch = spark.createDataFrame([(l,) for l in lines], "value string")
    rows, folded = decode_and_fold(batch, row_schema)
    try:
        folded.count()  # materialize the shared cache once
        # the four maintainer feeds, as merge() derives them
        feeds = [
            rows.filter(F.col("op") == "I").select("doc_id").distinct(),
            folded.filter(F.col("op") != "D").select("doc_id", "text"),
            folded.filter(F.col("op") == "D").select("doc_id"),
            folded.select("lsn", "op", "doc_id",
                          F.length("text").alias("doclen")),
        ]
        for f in feeds:
            plan = f._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, "maintainer lost the cache"
            # the cached relation PRINTS its build plan (from_json et al.)
            # under InMemoryRelation; the execution path ABOVE the cache
            # leaf must not re-decode
            exec_path = plan.split("InMemoryRelation")[0]
            assert "JsonToStructs" not in exec_path, "re-decode per maintainer"
            assert "from_json" not in exec_path
    finally:
        folded.unpersist()
        rows.unpersist()


def test_e2e_revenue_rollup_one_decode_hash_join(spark):
    """The CDC->analytics showcase must stay: ONE Arrow decode pass
    (binary pgoutput is the only sanctioned Python), the point-in-time
    join as a HASH join (equi user_id + validity residual — never a
    nested loop over versions), and a partial agg before the rollup's
    shuffle."""
    plan = _plan(spark, "cdc_e2e_revenue_rollup")
    assert plan.count("MapInPandas") == 1, "decode must run exactly once"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)
    assert "partial_sum" in plan, "rollup lost map-side combine"


def test_er_block_join_is_hash_join(spark):
    """Entity resolution must candidate-generate via a SHUFFLED join on
    the blocking key — never cartesian/nested-loop, and never broadcast:
    the dirty feed is corpus-scaled, so a broadcast build side is the
    sf10 OOM class (see dedup_dup_ngram_spans). The Levenshtein filter
    must sit above the join (candidates only)."""
    for name in ("er_candidate_pairs", "er_golden_records"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" not in plan, name
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), name
        assert "levenshtein" in plan, name


def test_zorder_key_stats_plan(spark):
    """The layout-cell query broadcasts the 1-row stats box (a
    BroadcastNestedLoopJoin over a 1-row side is the intended shape)
    and aggregates once; the interleave must stay in codegen (no
    Python eval in the plan)."""
    plan = _plan(spark, "layout_zorder_key_stats")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats box join
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 3  # stats agg + final agg only


# --- r12: engine-wide AQE-broadcast-hazard audit rules -----------------------


def test_corpus_scaled_joins_never_broadcast(spark):
    """The r12 audit rule (VERDICT r11 item 1): every join whose build
    side GROWS WITH THE CORPUS is pinned to a shuffled strategy —
    "small enough to broadcast at test scale is not a property of the
    plan". Each entry names a query whose plan once relied on a size
    estimate (static or AQE-runtime) for a corpus-scaled side:

    - docs_filter_funnel / training_mix_pipeline: quality / keep-best /
      decontam gate sets (one row per doc) — caught as an
      AUDIT_BROADCAST flip (BHJ at sf0.01 -> SMJ at sf0.1);
    - docs_tfidf / docs_unigram_logprob: vocabulary-sized term tables
      (forced broadcasts before r12 — a force never flips, so the
      audit could not see it; found by the explicit-site sweep);
    - docs_bm25_topk / ivm_bm25_topk_state: the doc-length table;
    - assoc_rules_copurchase: the basket self-join and the
      item-catalog-sized lift sides."""
    for name, min_smj, min_shj in (
        # three merge-pinned doc_id gate joins each
        ("docs_filter_funnel", 3, 0),
        ("training_mix_pipeline", 3, 0),
        # one shuffle_hash-pinned vocabulary join each
        ("docs_tfidf", 0, 1),
        ("docs_unigram_logprob", 0, 1),
        # one merge-pinned doc-length join each
        ("docs_bm25_topk", 1, 0),
        ("ivm_bm25_topk_state", 1, 0),
        # merge-pinned basket self-join + two shuffle_hash lift sides
        ("assoc_rules_copurchase", 1, 2),
        # shuffle_hash-pinned per-doc keep-list join (one row per doc)
        ("docs_line_dedup", 0, 1),
    ):
        plan = _plan(spark, name)
        # hints guarantee these nodes regardless of size estimates, so
        # the counts are stable at any test scale — a dropped pin (or a
        # re-introduced broadcast force on a pinned side) lowers the
        # count and fails here even while other shuffled joins remain
        assert plan.count("SortMergeJoin") >= min_smj, (
            f"{name}: expected >= {min_smj} merge-pinned joins")
        assert plan.count("ShuffledHashJoin") >= min_shj, (
            f"{name}: expected >= {min_shj} shuffle_hash-pinned joins")
        assert "CartesianProduct" not in plan, name


def test_every_broadcast_site_annotated_bounded():
    """Source-level guard for the same audit: every explicit
    F.broadcast( call site in the engine must carry a DEDICATED
    '# bounded: <why>' marker within the preceding 8 lines stating WHY
    the side cannot grow with the corpus — 1-row aggregate, fixed dim,
    query set, codebook, O(#control rows), ... A new broadcast without
    an argued bound fails here, so the corpus-scaled-broadcast bug
    class (r10 bigram shingles, r11 dup-gram OOM) cannot re-enter
    silently. Forced broadcasts are invisible to the plan-flip audit
    (a force never flips), which is exactly why this is a SOURCE rule.
    The marker is a fixed convention ('bounded:' immediately after the
    hash), not keyword sniffing — ADVICE r12: an unrelated nearby
    comment saying 'fixed a bug' must not vacuously satisfy the rule."""
    import os
    import re

    pat = re.compile(r"F\.broadcast\(")
    mark = re.compile(r"#\s*bounded:", re.I)
    viol = []
    root_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pgcdc_spark")
    for root, _, files in os.walk(root_dir):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                lines = f.read().splitlines()
            for i, ln in enumerate(lines):
                if pat.search(ln):
                    ctx = lines[max(0, i - 8):i + 1]
                    if not any(mark.search(c) for c in ctx):
                        viol.append(f"{os.path.relpath(path, root_dir)}:{i + 1}")
    assert not viol, (
        "F.broadcast( sites without a boundedness annotation "
        f"(say WHY the side cannot grow with the corpus): {viol}")
