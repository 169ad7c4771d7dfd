"""Physical-plan assertions — the 100 TB posture, checked mechanically.

These don't compare values (test_correctness does); they assert the *plan
shape* that survives a 1000× scale-up: broadcast joins where a side is a
dimension, pushed filters reaching the parquet scan, pruned read schemas,
and rank-filter top-k compiling to a group-limit instead of a full sort.
"""

from __future__ import annotations

import pytest

import nedp_etl_spark as eng


def _plan(spark, sf_dir, name: str) -> str:
    df = eng.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiway_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_multiway")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = eng.queries()["agg_groupby"](spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in executed
    assert "l_comment" not in optimized  # sanity: no phantom columns


def test_column_pruning(spark, sf_dir):
    df = eng.queries()["project_select"](spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    # ReadSchema must not include unprojected columns.
    assert "p_retailprice" in executed
    seg = executed[executed.index("ReadSchema") :]
    head = seg.split("\n")[0]
    assert "p_partkey" in head and "p_retailprice" in head


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_range_join_broadcasts_interval_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_range_join_binned_is_equi(spark, sf_dir):
    # The scale path: bin bucketing turns the range predicate into an
    # equi join on `bin` + residual filter — no nested loop anywhere.
    plan = _plan(spark, sf_dir, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_spatial_grid_join_is_equi(spark, sf_dir):
    # Grid bucketing must turn the within-radius predicate into an equi
    # join on cell id (+ residual distance filter), with the 3x3 explode on
    # the small side — never a nested loop over the points table.
    plan = _plan(spark, sf_dir, "join_spatial_grid")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "Generate explode" in plan  # neighbourhood explode, small side only


def test_asof_nearest_is_equi_join_hash_agg(spark, sf_dir):
    # Nearest-in-time within tolerance: plain equi join on the user key,
    # rank-1 via a two-phase min(struct(...)) aggregate (struct buffers
    # plan as SortAggregate, but the partial runs map-side) — no nested
    # loop, and no per-key window sort.
    plan = _plan(spark, sf_dir, "join_asof_nearest")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "partial_min(struct" in plan  # map-side partial rank-1
    assert "Window" not in plan


def test_count_min_sketch_is_partial_agg(spark, sf_dir):
    # The DataFrame-native sketch build must aggregate the (depth, cell)
    # counters in two phases — map-side partial counts, then the merge —
    # so the shuffle carries at most depth x width counters per partition,
    # never raw rows; and the bounded counter table reaches the probe as a
    # broadcast.
    plan = _plan(spark, sf_dir, "agg_count_min")
    assert plan.count("partial_count") >= 1  # map-side combine
    assert "BroadcastHashJoin" in plan       # sketch table broadcast to probe


def test_bloom_prefilter_injects_might_contain(spark, sf_dir):
    # Runtime Bloom-filter pruning: the probe side's scan must carry a
    # might_contain(...) filter built from the selective side's keys.
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_sorted_layout_pushes_date_band(spark, sf_dir):
    # The read-back of the range-partitioned sorted layout must carry the
    # date-band predicate into the parquet scan (footer min/max skipping).
    plan = _plan(spark, sf_dir, "sink_sorted_layout")
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan and "PushedFilters" in scan[0]
    assert "GreaterThanOrEqual(o_orderdate" in scan[0]
    assert "LessThan(o_orderdate" in scan[0]


def test_no_cartesian_in_equi_joins(spark, sf_dir):
    for name in ("join_inner_equi", "join_left_right_full", "join_semi_anti"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_partition_pruning_on_partitioned_layout(spark, sf_dir):
    # sink_table writes partitioned by order_year; a filter on the partition
    # column must become a PartitionFilter (no data files from other years
    # are even listed — the 100 TB date-partitioned layout).
    eng.queries()["sink_table"](spark, sf_dir).count()  # ensure materialized
    from nedp_etl_spark.operators.scans import _scratch

    df = spark.read.parquet(_scratch("sink_table", sf_dir)).filter("order_year = 1997")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan or "PartitionFilters: [(order_year" in plan


@pytest.mark.parametrize("name", ["agg_groupby", "join_inner_equi", "win_ranking"])
def test_whole_stage_codegen_active(spark, sf_dir, name):
    # AQE finalizes the plan lazily — materialize, then inspect.
    df = eng.queries()[name](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the finalized plan.
    assert "*(" in plan


def test_sim_search_broadcasts_probes(spark, sf_dir):
    df = eng.queries()["llm_sim_search"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_shuffle_hash_hint_respected(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dynamic_partition_pruning(spark, sf_dir):
    # A join keyed on the partition column of the date-partitioned sink
    # layout, with a selective filter on the dim side, must compile to a
    # dynamicpruning PartitionFilter — at 100 TB only the matching
    # partitions' files are even listed.
    import nedp_etl_spark as eng
    from nedp_etl_spark.operators.scans import _scratch
    from pyspark.sql import functions as F

    eng.queries()["sink_table"](spark, sf_dir).count()  # materialize layout
    fact = spark.read.parquet(_scratch("sink_table", sf_dir))
    dim = spark.createDataFrame(
        [(1996, "keep"), (1997, "drop")], "order_year int, tag string"
    ).filter(F.col("tag") == "keep")
    plan = (
        fact.join(dim, "order_year")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_dedup_embed_bucketed_no_all_pairs(spark, sf_dir):
    # Round-2 fix: embedding dedup must route through IVF buckets — the
    # candidate join is an equi-join on the bucket id, never a nested loop
    # over the corpus (the round-1 all-pairs plan died at 100×).
    plan = _plan(spark, sf_dir, "llm_dedup_embed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_contamination_is_keyed_join(spark, sf_dir):
    # eval↔train n-gram check: an equi-join keyed on the n-gram string —
    # shuffles by key, no quadratic comparison.
    plan = _plan(spark, sf_dir, "llm_contamination")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_near_single_band_shuffle(spark, sf_dir):
    # MinHash-LSH: signatures are map-side; the only exchanges are the band
    # self-join + final pair aggregate — no shuffle of raw text.  Since the
    # r13 optimization the narrow band relation is localCheckpoint'ed (its
    # lineage ran 4-5× across the stats/self-join/hot branches), so the
    # executed plan reads the checkpoint's ExistingRDD — the FileScan then
    # lives inside the checkpoint materialization, not this plan.
    df = eng.queries()["llm_dedup_near"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        first_exchange = plan.split("Exchange")[1][:400]
        assert "text" not in first_exchange
    assert plan.count("FileScan") >= 1 or "Scan ExistingRDD" in plan


# Queries allowed to show row-at-a-time Python in their plans (the one
# intentional row UDF and the native UDTF).
_ROW_PYTHON_OK = {"udf_scalar", "udtf_native"}
# Non-equi/cross shapes where a nested-loop/cartesian strategy is the point.
_NESTED_LOOP_OK = {"join_cross_theta", "join_range", "llm_sim_search",
                   "llm_ngram_jaccard", "scan_parquet",
                   "set_union", "llm_sim_search_ivf",
                   "llm_ann_recall",  # fixed 5-probe broadcast × corpus scan
                   "llm_hard_negatives",  # probe-set broadcast × corpus scan (sim_search shape)
                   "llm_minhash_recall",  # tiny probe-set broadcast × corpus scan

                   "join_skew_salted",  # dim × 8-row salt spine is a cross join by design
                   "llm_tfidf", "llm_bm25",
                   "llm_unigram_logprob",  # 1-row corpus-scalar broadcast (O(n))
                   "llm_perplexity_buckets",  # 1-row corpus-total + 1-row tercile-cut broadcasts (O(n))
                   "agg_ks_test",  # 1-row (n1, n2) totals broadcast (O(distinct values))
                   "llm_rag_retrieval",  # 1-row avgdl/n_docs broadcast (O(n))
                   "dbt_source_freshness",  # 1-row watermark broadcast (O(n))
                   "llm_bigram_logprob",  # 1-row token-total broadcast (O(n))
                   "llm_kneser_ney",  # 1-row bigram-type-total broadcast (O(n))
                   "llm_source_rebalance",  # 1-row total/n_langs broadcast (O(#langs))
                   "llm_kmeans",  # 1-row broadcast centroid-array crossJoin (O(n))
                   "llm_semdedup",  # same 1-row centroid broadcast (Lloyd assignment)
                   "agg_cuped",  # 1-row pooled-moments broadcast (O(#users) agg)
                   "llm_corpus_overlap_sketch",  # #sources^2 pair spine (dimension-sized)
                   "graph_deepwalk_pairs",  # nodes x 2-row walk-id spine crossJoin
                   "agg_shapley_attribution",  # bitmask theta joins on 2^k model-sized spines
                   "llm_bradley_terry",  # 1-row mean-normalizer broadcast per MM update
                   "llm_dsir_importance",  # 256-row LM × 1-row totals crossJoin
                   "llm_temperature_sample",  # 1-row total/denom broadcast (O(#langs))
                   "profile_skew",  # 1-row totals broadcast onto top-10 rows
                   "scan_csv_malformed",  # 1-row × 1-row count crossJoin
                   "graph_triangle_count",  # 1-row × 1-row count crossJoin
                   "tpch_q22",  # 1-row AVG-threshold broadcast (O(n))
                   "tpch_q11",  # 1-row total/nparts broadcast (O(#parts))
                   "agg_heavy_hitters",  # 1-row grand-total broadcast over candidates (O(n))
                   "agg_chisq_independence",  # 1-row (N, ka, kb) totals broadcast (O(cells))
                   "llm_dedup_cluster_sizes",  # 1-row cluster-total broadcast (O(#clusters))
                   "llm_class_weights",  # 1-row (k, sum raw_w) totals broadcast (O(#labels))
                   "graph_hits",  # 1-row L1-mass totals broadcast per half-iteration (O(#nodes))
                   "agg_market_basket",  # 1-row distinct-user total broadcast (O(|T|^2) pairs)
                   "agg_diff_in_diff",  # 1-row (min,max)-midpoint cut broadcast (O(cells))
                   "graph_modularity",  # 1-row total-edge-mass (2m) broadcast (O(#communities))
                   "agg_time_decay_score",  # 1-row MAX(ts) high-water broadcast (O(n) agg)
                   "agg_survival_km",  # 1-row corpus-end-date broadcast (O(n) aggregate)
                   "agg_rfm_segments",  # 1-row quintile-cut + high-water broadcasts (O(#customers))
                   "llm_cooccurrence_pmi",  # 1-row pair-total N broadcast (O(V^2) keys)
                   "llm_minhash_band_tuning",  # literal 5x100 tuning grid, no corpus input
                   "llm_assembly_e2e",  # 1-row (total, denom) rate broadcast (O(#langs))
                   "agg_cramers_v",  # 1-row totals x 1-row term-sum broadcast (O(cells))
                   "agg_mutual_information",  # 1-row N/MI/entropy broadcasts (O(cells))
                   "agg_benjamini_hochberg",  # 1-row k* broadcast over the bounded family
                   "llm_mix_temperature_sweep",  # #langs x 4-alpha literal grid + 1-row total
                   "llm_calibration_ece",  # 1-row N broadcast over the 10-bin aggregate
                   "llm_ngram_entropy_rate",  # 1-row N/H broadcasts over count tables
                   "llm_curriculum_order",  # 1-row tercile-cut broadcast (exact_rank_values)
                   "llm_dedup_threshold_sweep",  # 5-row literal tau grid over checkpointed pairs
                   "profile_json_schema",  # 1-row total broadcast over the 4-key sweep
                   "agg_price_index",  # 1-row base-month broadcast (O(part-months))
                   "agg_theil_decomposition",  # 1-row grand-total broadcast (O(n) terms)
                   "ts_backtest_cv",  # calendar-bounded cutoff-spine broadcast (O(weeks))
                   "agg_logistic_irls",  # 1-row beta broadcast per IRLS pass (O(n) agg)
                   "ts_forecast_reconcile",  # 1-row horizon broadcast onto the fits
                   "agg_empirical_bayes",  # 1-row pooled-moments/prior broadcasts
                   "ts_event_study",  # 1-row pre-period baseline broadcast
                   "agg_parallel_trends"}  # 1-row midpoint-cut broadcast (DiD convention)


def test_pagerank_iterates_over_checkpointed_edges(spark, sf_dir):
    # Iterative PageRank must not re-derive the edge list from the corpus
    # each iteration (edges/nodes are localCheckpoint-ed RDD scans), and —
    # the 100 TB posture — must NOT broadcast the O(nodes) rank relation by
    # hint.  With stats-based auto-broadcast disabled, any BroadcastExchange
    # left in the plan could only come from an explicit broadcast() hint, so
    # zero is the assertion; at runtime AQE remains free to downgrade a
    # genuinely small side on its own stats.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "graph_pagerank")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "Scan ExistingRDD" in plan          # checkpointed edges/nodes
    assert "Scan parquet" not in plan          # corpus not re-read per iter
    assert "BroadcastExchange" not in plan     # no hinted broadcast of ranks
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 8


def test_twophase_agg_is_two_exchanges(spark, sf_dir):
    # Salted two-phase aggregation: exactly the (key, salt) exchange and the
    # key-merge exchange — the hot key fans out in phase 1 and the phase-2
    # input is bounded by keys x salts, independent of corpus size.
    df = __import__("nedp_etl_spark").queries()["agg_skew_twophase"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2


# Queries allowed to contain a single-partition window: the window input is
# a bounded aggregate/top-k, not the raw corpus.  Keep this list justified
# row by row — the llm_seq_packing incident (r4 verdict) is exactly what
# this guard exists to catch.
_GLOBAL_WINDOW_OK = {
    "sort_multi",  # the contract's total-order demo; input bounded by o_orderkey < 2000
    "ts_funnel",  # conv_pct first_value over the ≤4-row step-count aggregate
    "agg_benjamini_hochberg",  # p-value ranking over the ≤ #metrics family aggregate
    "ts_new_vs_returning",  # cumulative users over the per-day census (bounded by calendar)
    "llm_bradley_terry",  # leaderboard rank over the #players strength vector
    "agg_msprt",  # cumulative frames over the calendar-bounded daily rollup
    "agg_shapley_attribution",  # channel-id rank over the k-row channel dictionary
}


# Queries allowed a SHRINKING following-frame (start moves with currentRow,
# end pinned at unboundedFollowing): Spark computes growing running frames
# incrementally but re-scans a shrinking frame per row — O(n²) per
# partition (the round-10 ts_interpolate finding: 27 s on a 20k-day grid,
# rewritten as last() over the DESC-ordered running frame).  Keep empty:
# every such frame has an O(n) reversed-running-frame equivalent.
_SHRINKING_FRAME_OK: set = set()


def _has_shrinking_following_frame(plan: str) -> bool:
    """True if any window frame ends at unboundedFollowing without starting
    at unboundedPreceding (full-partition frames evaluate once, shrinking
    frames re-scan per row)."""
    import re

    for m in re.finditer(
        r"specifiedwindowframe\(\w+, ([^,]+), unboundedfollowing\$\(\)\)", plan
    ):
        if "unboundedpreceding" not in m.group(1):
            return True
    return False


def _has_global_window(plan: str) -> bool:
    """True if any Window node sits directly on a SinglePartition exchange
    (the physical signature of ``Window.orderBy`` with no partitionBy:
    Window ← Sort ← Exchange SinglePartition).

    (No carve-outs: the prefix-sum helper builds its per-pid offsets
    driver-side from a bounded collect, so its plans contain no
    single-partition window at all.)"""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        if any("Exchange SinglePartition" in nxt for nxt in lines[i + 1 : i + 4]):
            return True
    return False


def test_registry_wide_plan_audit(spark, sf_dir):
    """Every registered batch query: no accidental row-Python, no
    accidental cartesian product, no un-partitioned (single-partition)
    window over unbounded input.  Also: no top-level Array/Map/Struct
    output column — the driver's canonicalizer pandas-``sort_values``-es
    every column before hashing, and container cells are unhashable there
    (the round-10 ``llm_packing_attention_mask`` incident: a raw
    ``array<bigint>`` ``cu_seqlens`` was the only container column in all
    424 keys and turned an oracle-exact key into an ``err`` row);
    stringify (``concat_ws``/``to_json``/``as_str``) before the column
    leaves the query.  Streaming/sink queries execute real side effects
    and are audited by their own tests plus the ``driver_canon`` replica
    inside ``tests.oracle.compare`` — skipped here."""
    from pyspark.sql import types as T

    skip_prefixes = ("stream_", "sink_", "scan_csv_json", "scan_orc", "join_bucketed")
    offenders = []
    for name, fn in sorted(eng.queries().items()):
        if name.startswith(skip_prefixes):
            continue
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append(
                    (name, f"container output column {f.name}: "
                           f"{f.dataType.simpleString()} (driver-canon incompatible)")
                )
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan and name not in _ROW_PYTHON_OK:
            offenders.append((name, "row-at-a-time Python"))
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)                 and name not in _NESTED_LOOP_OK:
            offenders.append((name, "unexpected nested-loop/cartesian"))
        if _has_global_window(plan) and name not in _GLOBAL_WINDOW_OK:
            offenders.append((name, "un-partitioned window (SinglePartition exchange)"))
        if _has_shrinking_following_frame(plan) and name not in _SHRINKING_FRAME_OK:
            offenders.append((name, "shrinking following-frame (O(n^2) per partition)"))
    assert not offenders, offenders


def test_seq_packing_no_global_window(spark, sf_dir):
    # Two-phase prefix sum: the running-sum window must be keyed by the
    # physical partition id, never a corpus-wide SinglePartition exchange,
    # and the partition offsets come back as a broadcast join.
    plan = _plan(spark, sf_dir, "llm_seq_packing")
    assert not _has_global_window(plan)
    assert "BroadcastHashJoin" in plan


def test_surrogate_keys_no_global_window(spark, sf_dir):
    # sink_surrogate_keys is skipped by the registry-wide audit (sink_
    # prefix), so pin its plan here: total-order row_number via the same
    # two-phase idiom — no single-partition window at fact scale.
    plan = _plan(spark, sf_dir, "sink_surrogate_keys")
    assert not _has_global_window(plan)
    assert "Exchange SinglePartition" not in plan


def test_sample_bottomk_is_take_ordered(spark, sf_dir):
    # Exact-k sampling must be per-partition local top-k + bounded merge
    # (TakeOrderedAndProject), never a global sort of the input.
    plan = _plan(spark, sf_dir, "sample_bottomk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_pq_encode_codebook_broadcasts(spark, sf_dir):
    # The M·K-subcentroid codebook joins the (vec_id, m) stream as a
    # broadcast — vectors never shuffle for assignment, and there is no
    # nested-loop over the corpus.
    plan = _plan(spark, sf_dir, "llm_pq_encode")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_scoring_join_is_broadcast(spark, sf_dir):
    # The 256-row log-ratio table must broadcast to the token stream; the
    # token explode side never shuffles on the bucket key for scoring.
    plan = _plan(spark, sf_dir, "llm_dsir_importance")
    assert "BroadcastHashJoin" in plan


def test_perplexity_buckets_no_global_window(spark, sf_dir):
    # Tercile cutoffs come from the two-phase histogram refinement: the
    # only window ranks ONE bucket's occupants per cut (keyed by cut_id),
    # never the whole score distribution; the cut values flow back as a
    # 1-row broadcast for the map-side CASE labeling.
    plan = _plan(spark, sf_dir, "llm_perplexity_buckets")
    assert not _has_global_window(plan)
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cuts broadcast


def test_streaks_windows_keyed_by_user(spark, sf_dir):
    # Gaps-and-islands: the numbering window partitions by user_id (state
    # = one user's active days); no corpus-wide SinglePartition exchange.
    plan = _plan(spark, sf_dir, "ts_streaks")
    assert not _has_global_window(plan)
    # The physical Window node prints its partition spec inside
    # windowspecdefinition(...) — pin user_id as the leading key.
    assert "windowspecdefinition(user_id" in plan


def test_holt_grouped_map_sees_daily_partials_only(spark, sf_dir):
    # The recurrence runs per series over DAILY rows: the (event_type, d)
    # aggregate must combine map-side (partial_ before its exchange) so raw
    # events never shuffle or reach Python; the grouped map is Arrow-batched
    # (FlatMapGroupsInPandas), not row-at-a-time.
    plan = _plan(spark, sf_dir, "ts_holt")
    assert "FlatMapGroupsInPandas" in plan
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan


def test_bitmap_distinct_is_two_partial_aggs(spark, sf_dir):
    # Both phases must combine map-side: the word build (partial bit_or) so
    # the shuffle carries (group, word, bits) not raw keys, and the
    # popcount sum (partial_sum) — the exact-distinct shuffle-volume win.
    plan = _plan(spark, sf_dir, "agg_bitmap_distinct")
    assert "partial_bit_or" in plan
    assert "partial_sum" in plan


def test_pattern_match_window_keyed_by_user(spark, sf_dir):
    # Fixed-length CEP compiles to lag flags over ONE user-keyed window —
    # no per-user history materialization, no SinglePartition exchange.
    plan = _plan(spark, sf_dir, "win_pattern_match")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(user_id" in plan


def test_entropy_filter_histogram_combines_map_side(spark, sf_dir):
    # The (doc, char) histogram must pre-aggregate before its exchange so
    # the shuffle carries alphabet-bounded counts, never raw characters.
    plan = _plan(spark, sf_dir, "llm_entropy_filter")
    assert "partial_count" in plan


def test_mad_anomaly_daily_partials_and_broadcast_stats(spark, sf_dir):
    # The daily collapse runs ONCE (eager localCheckpoint) — the med/dev/
    # mad/output branches all read the checkpointed daily table, never the
    # events parquet again; median/MAD tables broadcast; no window over
    # raw data anywhere.
    plan = _plan(spark, sf_dir, "ts_mad_anomaly")
    assert "FileScan parquet" not in plan  # events scanned only at checkpoint
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_bitmap_intersect_single_scan_two_partial_aggs(spark, sf_dir):
    # Both class bitmaps build as conditional bit_or in ONE scan (no
    # self-join, no second FileScan) with map-side partials; the set
    # algebra is word-wise popcounts in the final bounded aggregate.
    plan = _plan(spark, sf_dir, "agg_bitmap_intersect")
    assert plan.count("FileScan parquet") == 1
    assert "partial_bit_or" in plan
    assert "Join" not in plan


def test_acf_lag_join_is_equi_with_broadcast_stats(spark, sf_dir):
    # Lag pairing must be an equi hash join on (series, shifted day) — not
    # 7 window sorts and no nested loop — with the series-sized mean and
    # denominator tables broadcast, and the daily collapse run ONCE
    # (checkpoint) rather than re-scanned per branch.
    plan = _plan(spark, sf_dir, "ts_acf")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "FileScan parquet" not in plan  # events scanned only at checkpoint


def test_bfs_iterates_over_checkpointed_pairs(spark, sf_dir):
    # The frontier loop must re-join MATERIALIZED pairs (Scan ExistingRDD),
    # never re-derive the MinHash-LSH lineage per step — no parquet scan
    # and no shingle explode may appear in the final plan.
    plan = _plan(spark, sf_dir, "graph_bfs_reach")
    assert "Scan ExistingRDD" in plan
    assert "FileScan parquet" not in plan


def test_ks_test_no_global_window(spark, sf_dir):
    # Both empirical-CDF prefix sums must go through the two-phase helper:
    # no SinglePartition window anywhere, and the per-pid offsets return
    # as broadcast joins.
    plan = _plan(spark, sf_dir, "agg_ks_test")
    assert not _has_global_window(plan)
    assert "BroadcastHashJoin" in plan


def test_curation_e2e_stage_shapes(spark, sf_dir):
    # The composed pipeline must keep each stage's scale shape: the LSH
    # band probe and contamination-gram probes are EQUI-joins (hash
    # shuffles keyed on band/gram — never all-pairs), the exact-dedup
    # window is keyed by text_hash (no global window), and the packing
    # prefix sum never sorts globally (the two-phase util shape).
    plan = _plan(spark, sf_dir, "llm_curation_e2e")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no un-partitioned window (the shared SinglePartition detector — the
    # previous inline check was vacuously true on every plan line)
    assert not _has_global_window(plan)


def test_entropy_gini_two_phase_broadcast_totals(spark, sf_dir):
    # the (group, category) histogram is checkpointed (one corpus scan —
    # totals and terms both branch from the ExistingRDD), and the
    # group-totals side broadcasts back, never a sort-merge shuffle.
    plan = _plan(spark, sf_dir, "agg_entropy_gini")
    assert "Scan ExistingRDD" in plan  # checkpointed histogram
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rolling_corr_single_window_keyed_by_type(spark, sf_dir):
    # All six frame aggregates must share ONE Window node over ONE
    # event_type-keyed exchange on the daily partials (never raw events),
    # with the daily aggregate combining map-side first.
    plan = _plan(spark, sf_dir, "ts_rolling_corr")
    assert plan.count("Window [") == 1
    assert "windowspecdefinition(event_type" in plan
    assert "HashAggregate" in plan  # daily partial precedes the window


def test_sorted_neighborhood_one_keyed_exchange_no_joins(spark, sf_dir):
    # Featurization must be map-side (no explode-groupBy-join before the
    # window): the plan has NO join at all — just the simhash-keyed window
    # exchange feeding the LEAD neighborhood and a union of projections.
    plan = _plan(spark, sf_dir, "llm_sorted_neighborhood")
    assert "Join" not in plan  # no self-join: the neighborhood is LEAD-based
    assert "windowspecdefinition(simhash" in plan
    assert "CartesianProduct" not in plan


def test_label_propagation_iterates_over_checkpointed_edges(spark, sf_dir):
    # The symmetrized edge list must be checkpointed once (LogicalRDD scan
    # in the plan) and every round must be an equi-join — one parquet scan
    # at most (label init), never a per-round corpus re-derivation.
    plan = _plan(spark, sf_dir, "graph_label_propagation")
    assert "Scan ExistingRDD" in plan  # the checkpointed edges
    assert plan.count("Scan parquet") == 0  # labels derive from the checkpoint
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corr_matrix_single_pass_no_join(spark, sf_dir):
    # All 11 accumulators (n + 4 sums + 6 cross-sums) must come from ONE
    # keyed aggregate over ONE scan — no join, no second scan per pair.
    plan = _plan(spark, sf_dir, "agg_corr_matrix")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_bpe_encode_encodes_vocab_not_occurrences(spark, sf_dir):
    # The merge-chain folds must run over the DISTINCT-word relation (an
    # aggregate precedes them), and the corpus word stream joins back via
    # an equi-join — no cartesian, no per-occurrence fold evaluation.
    plan = _plan(spark, sf_dir, "llm_bpe_encode")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the vocab side dedups before the fold projection:
    assert "HashAggregate" in plan


def test_quality_classifier_pure_map(spark, sf_dir):
    # Learned-filter scoring is a scan→score map: no exchange at all in
    # the plan (zero shuffles at any corpus size).
    plan = _plan(spark, sf_dir, "llm_quality_classifier")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Scan parquet" in plan


def test_temporal_scd2_is_equi_join_on_key(spark, sf_dir):
    # The interval predicate must ride as a residual on a custkey
    # EQUI-join — never a nested loop / cartesian over versions.
    plan = _plan(spark, sf_dir, "join_temporal_scd2")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_file_metadata_zero_extra_io(spark, sf_dir):
    # Provenance is reader-state, not data: exactly one parquet scan and
    # one aggregate, no join, and the scan reads only o_orderkey from the
    # data pages (the _metadata struct is a constant-folded reader column).
    plan = _plan(spark, sf_dir, "scan_file_metadata")
    assert "Join" not in plan
    # the only DATA column read is o_orderkey; row_index/file_name are
    # reader-state columns appended to the scan output, not page reads
    assert "ReadSchema: struct<o_orderkey:bigint" in plan
    assert "FileScan parquet [o_orderkey" in plan


def test_state_reader_reads_checkpoint_not_data(spark, sf_dir):
    # The returned relation must be a statestore scan + projection — the
    # event data itself is only touched inside the already-drained
    # streaming query, never re-scanned for the result.
    plan = _plan(spark, sf_dir, "stream_state_reader")
    assert "Join" not in plan
    assert "events.parquet" not in plan  # no fixture re-scan


def test_twa_one_keyed_window_one_aggregate(spark, sf_dir):
    # LEAD + FIRST share one (event_type, d)-keyed Window; the integral is
    # a single keyed aggregate over the windowed relation — no self-join.
    plan = _plan(spark, sf_dir, "ts_time_weighted_avg")
    assert plan.count("Window [") == 1
    assert "windowspecdefinition(event_type" in plan
    assert "Join" not in plan


def test_lttb_keyed_windows_and_small_join(spark, sf_dir):
    # Both windows key on event_type (position) / event_type+bucket
    # (argmax); the centroid-neighbor join is an equi-join whose build
    # side is series×K rows — no cartesian, no global window.
    plan = _plan(spark, sf_dir, "ts_lttb")
    assert "windowspecdefinition(event_type" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_watermark_score_pure_map(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_watermark_score")
    assert "Exchange" not in plan and "Join" not in plan


def test_benford_two_phase_broadcast_sides(spark, sf_dir):
    # the groups×9 histogram is checkpointed (customer-dim broadcast join
    # happens once, inside its derivation); downstream the totals
    # broadcast back — never a sort-merge shuffle.
    plan = _plan(spark, sf_dir, "agg_benford_test")
    assert "Scan ExistingRDD" in plan  # checkpointed histogram
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_psi_one_pass_broadcast_totals(spark, sf_dir):
    # The groups×10 histogram is checkpointed → ONE corpus scan total;
    # downstream totals broadcast back.
    plan = _plan(spark, sf_dir, "profile_drift_psi")
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan  # corpus touched only pre-checkpoint
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_holt_winters_grouped_map_sees_daily_partials_only(spark, sf_dir):
    # Same discipline as ts_holt: the triple recurrence runs over DAILY
    # partials (map-side combine before the exchange), Arrow-batched.
    plan = _plan(spark, sf_dir, "ts_holt_winters")
    assert "FlatMapGroupsInPandas" in plan
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan


def test_shard_balance_no_single_partition_window(spark, sf_dir):
    # The global rank must come from the two-phase prefix sum — no Window
    # on a SinglePartition exchange anywhere in the plan.
    plan = _plan(spark, sf_dir, "llm_shard_balance")
    assert not _has_global_window(plan)
    assert "Scan ExistingRDD" in plan  # the checkpointed range layout


def test_token_sort_dedup_single_keyed_aggregate(spark, sf_dir):
    # Order-insensitive key is map-side; ONE keyed aggregate, no join.
    plan = _plan(spark, sf_dir, "llm_dedup_token_sort")
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_chisq_margins_branch_from_checkpoint(spark, sf_dir):
    # Contingency table checkpoints once; margins and terms branch from
    # the ExistingRDD with broadcast joins (1-row totals crossJoin is the
    # allowlisted broadcast-scalar shape).
    plan = _plan(spark, sf_dir, "agg_chisq_independence")
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_m4_one_keyed_exchange_four_roles(spark, sf_dir):
    # All four rank orders share the (event_type, day) partitioning — the
    # union must not multiply exchanges beyond the shared hash layout and
    # never sorts globally.
    plan = _plan(spark, sf_dir, "ts_m4_downsample")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(event_type" in plan


def test_embed_outliers_centroids_broadcast(spark, sf_dir):
    # The labels×64 centroid table must broadcast back to the vectors;
    # the per-dim sums combine map-side; the rank window keys on label.
    plan = _plan(spark, sf_dir, "llm_embed_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition(label" in plan


def test_gini_totals_first_then_keyed_rank(spark, sf_dir):
    # Orders collapse to customer totals BEFORE the dim join (map-side
    # combine); the segment dim broadcasts; the rank window keys on
    # segment — no global sort, no sort-merge of the fact table.
    plan = _plan(spark, sf_dir, "agg_gini_coefficient")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(segment" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_lsh_purity_no_join_keyed_windows(spark, sf_dir):
    # Signatures are map-side; everything after the first combine is
    # bucket-cardinality-sized: no join, bucket-keyed windows only.
    plan = _plan(spark, sf_dir, "llm_lsh_bucket_purity")
    assert "Join" not in plan
    assert "windowspecdefinition(bucket" in plan


def test_interleave_two_phase_rank_no_skewed_window(spark, sf_dir):
    # Per-group rank must come from the two-phase prefix sum (a 2-group
    # keyed window would put half the corpus in one partition); the group
    # starts are a 2-row broadcast.
    plan = _plan(spark, sf_dir, "llm_dataset_interleave")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(grp" not in plan  # no per-group window
    assert "BroadcastHashJoin" in plan


def test_ipv4_pure_map(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_ipv4")
    assert "Exchange" not in plan and "Join" not in plan


def test_novelty_gram_keyed_equi_join(spark, sf_dir):
    # df pass combines map-side; the novelty join is a gram-keyed
    # EQUI-join — never a nested loop over doc pairs.
    plan = _plan(spark, sf_dir, "llm_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_welch_ttest_partial_aggs_balanced_shuffle(spark, sf_dir):
    # One pass of sufficient statistics: the (metric, arm) rollup must
    # pre-aggregate map-side (partial sum/count) so the shuffle carries
    # O(|metrics| * 2) rows, and the pivot runs on that tiny relation —
    # no second events scan, no join, no window.
    plan = _plan(spark, sf_dir, "agg_welch_ttest")
    assert plan.count("FileScan parquet") == 1
    assert "partial_sum" in plan or "partial sum" in plan.lower()
    assert "Join" not in plan and "Window" not in plan


def test_zipf_fit_two_phase_rank_no_global_window(spark, sf_dir):
    # Ranking the term-frequency table must use the two-phase prefix sum
    # (global_running_sum) — a rank() over an unpartitioned window would
    # funnel the vocabulary through one task at 100 TB.
    plan = _plan(spark, sf_dir, "agg_zipf_fit")
    assert not _has_global_window(plan)
    assert "partial_count" in plan  # term counts combine map-side


def test_timezone_pure_map(spark, sf_dir):
    # Timezone conversion is a per-row projection: the pushed event_id
    # filter reaches the scan and nothing shuffles.
    plan = _plan(spark, sf_dir, "fn_timezone")
    assert "Exchange" not in plan and "Join" not in plan
    assert "PushedFilters: [IsNotNull(event_id), LessThan(event_id,500)]" in plan


def test_prefix_dedup_key_sized_join(spark, sf_dir):
    # Docs are reduced to (doc_id, 32-char prefix hash) BEFORE any
    # exchange: the group-size join is an equi-join on the md5 key and the
    # text column never shuffles (no 'text' in any Exchange input).
    plan = _plan(spark, sf_dir, "llm_prefix_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text" not in ln


def test_rolling_regression_keyed_window_single_scan(spark, sf_dir):
    # The rolling OLS sums share ONE series-keyed window over the daily
    # partials (which combine map-side) — no global window, no join, one
    # parquet scan.
    plan = _plan(spark, sf_dir, "win_rolling_regression")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(event_type" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_scd2_partitioned_merge_read_is_partition_pruned(spark, sf_dir):
    # The merge's read of the existing target must carry PartitionFilters
    # on the segment partition column — untouched partitions are never
    # opened, which is what makes the SCD2 merge O(changed partitions)
    # instead of O(table) at 100 TB.
    import os

    from nedp_etl_spark.operators.scans import _scratch, _scd2_affected_read

    # run the operator once so the partitioned target exists
    eng.queries()["sink_scd2_partitioned"](spark, sf_dir).collect()
    path = _scratch("sink_scd2_partitioned", sf_dir)
    assert os.path.isdir(path)
    target_schema = (
        "c_custkey bigint, c_acctbal double, valid_from string,"
        " valid_to string, is_current boolean, segment string"
    )
    df = _scd2_affected_read(spark, path, ["BUILDING", "PREMIUM"], target_schema)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "segment" in plan.split("PartitionFilters")[1][:200]


def test_kcore_iterates_over_checkpointed_pairs(spark, sf_dir):
    # Peeling must re-join MATERIALIZED pairs — since the candidate_pairs
    # derived-table rewire that is a scan of the tiny pair parquet, never
    # a re-derivation of the MinHash-LSH lineage per round (no documents
    # scan in the plan) — and no nested loop.
    plan = _plan(spark, sf_dir, "graph_kcore")
    assert "documents" not in plan          # LSH lineage never re-derived
    assert plan.count("FileScan parquet") >= 1  # the materialized pair table
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dedup_simhash_banded_equi_join_no_all_pairs(spark, sf_dir):
    # Pigeonhole banding: candidates come from equi-joins on
    # (block_idx, block_value) and the verify step joins the fingerprint
    # table by doc id — never a nested loop over doc pairs, and the text
    # column never shuffles (fingerprints are map-side).  Audit the
    # BUILDER's plan: the registered key serves the session-scoped derived
    # table (a parquet scan), so the lineage only exists here.
    from nedp_etl_spark.llm.dedup import _simhash_pairs_build

    plan = (
        _simhash_pairs_build(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text" not in ln


def test_mase_keyed_window_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_mase_backtest")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(event_type" in plan
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_fuzzy_blocked_is_equi_join_with_pushed_probe(spark, sf_dir):
    # Blocking must compile to an EQUI join on p_brand (the levenshtein
    # verify is a post-join filter) with the probe bound pushed to both
    # scans — never a nested loop.
    plan = _plan(spark, sf_dir, "join_fuzzy_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)
    assert "LessThan(p_partkey,200)" in plan


def test_embed_covariance_one_scan_combining_aggregate(spark, sf_dir):
    # The expansion is map-side; the only shuffle carries the 2080 (i, j)
    # groups' partial sums — no joins, one embeddings scan.
    plan = _plan(spark, sf_dir, "llm_embed_covariance")
    assert plan.count("FileScan parquet") == 1
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_cdc_chunking_map_side_only(spark, sf_dir):
    # Chunk assembly is pure array math per row: the ONLY plan nodes are
    # scan → project → generate — no Exchange, no Join, no Window.
    plan = _plan(spark, sf_dir, "llm_cdc_chunking")
    assert "Exchange" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_bootstrap_expansion_combines_map_side(spark, sf_dir):
    # The 32x explode must pre-aggregate (metric, b) means map-side; the
    # order-stat window runs over 32 rows per metric, keyed.
    plan = _plan(spark, sf_dir, "agg_bootstrap_ci")
    assert "partial_count" in plan or "partial_sum" in plan
    assert not _has_global_window(plan)
    assert "windowspecdefinition(event_type" in plan


def test_dataset_card_keyed_aggregates_only(spark, sf_dir):
    # Three combining aggregates + |sources|-sized joins; the top-lang
    # window is keyed by source over lang-count rows, never the corpus.
    plan = _plan(spark, sf_dir, "llm_dataset_card")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stl_decompose_keyed_windows_small_joins(spark, sf_dir):
    # Centered MA is one series-keyed window; the seasonal join operands
    # are (series x 7)-sized — no global window, no nested loop.
    plan = _plan(spark, sf_dir, "ts_stl_decompose")
    assert not _has_global_window(plan)
    assert "windowspecdefinition(event_type" in plan
    assert "CartesianProduct" not in plan


def test_manifest_prune_reads_subset_of_files(spark, sf_dir):
    # The data scan must read ONLY the pruned files: inputFiles() of the
    # operator's result is a strict subset of the layout.
    import glob
    import os

    from nedp_etl_spark.operators.scans import _scratch

    df = eng.queries()["scan_manifest_prune"](spark, sf_dir)
    path = _scratch("scan_manifest_prune", sf_dir)
    layout = {os.path.basename(f) for f in glob.glob(os.path.join(path, "*.parquet"))}
    read = {os.path.basename(f) for f in df.inputFiles()}
    assert read and read < layout


def test_bpe_fertility_vocab_only_fold(spark, sf_dir):
    # The merge fold must run on the DISTINCT vocabulary; the corpus word
    # stream joins the vocab-sized encode table — no nested loop.
    plan = _plan(spark, sf_dir, "llm_bpe_fertility")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_survival_km_no_global_window(spark, sf_dir):
    # Both cumulations (at-risk counts, log-survival) must go through the
    # two-phase prefix sum — never a naked global window.
    plan = _plan(spark, sf_dir, "agg_survival_km")
    assert not _has_global_window(plan)


def test_bipartite_projection_type_keyed_join(spark, sf_dir):
    # Pair generation is the type-keyed equi-join; the probe filter is
    # pushed to the scan.
    plan = _plan(spark, sf_dir, "graph_bipartite_projection")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LessThan(user_id,40)" in plan


def test_range_generator_no_scan_parallel_range(spark, sf_dir):
    # A generator source reads no files: the plan is Range → Project.
    plan = _plan(spark, sf_dir, "scan_range_generator")
    assert "FileScan" not in plan
    assert "Range (0, 10000" in plan
    assert "Exchange" not in plan


def test_class_weights_tiny_aggregate_broadcast(spark, sf_dir):
    # One keyed count over labels, then a 1-row totals broadcast — the
    # only join is the broadcast of the (k, sum) scalar row.
    plan = _plan(spark, sf_dir, "llm_class_weights")
    assert plan.count("FileScan parquet") <= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_hits_iterates_over_checkpointed_edges(spark, sf_dir):
    # Same 100 TB posture as graph_pagerank: iterations re-join the
    # MATERIALIZED edge/node relations (Scan ExistingRDD), never re-derive
    # from the corpus; the only hinted broadcasts are the 1-row L1-mass
    # totals (each BroadcastExchange input is a single-row aggregate), so
    # the O(nodes) score relation itself never broadcasts by hint.
    plan = _plan(spark, sf_dir, "graph_hits")
    assert "Scan ExistingRDD" in plan          # checkpointed edges/nodes
    assert "FileScan parquet" not in plan      # corpus not re-read per iter
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 6


def test_market_basket_no_all_pairs_over_users(spark, sf_dir):
    # The pair join must be the user-keyed self-equi-join (fan-out bounded
    # by the event-type catalog), and the only nested-loop shape the 1-row
    # user-total broadcast; events' value/props columns never scan.
    plan = _plan(spark, sf_dir, "agg_market_basket")
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "FileScan" in ln and "ReadSchema" in ln:
            assert "value" not in ln and "props" not in ln


def test_periodogram_single_scan_no_joins(spark, sf_dir):
    # One events scan -> daily aggregate -> map-side period explode ->
    # keyed aggregate: no joins, no windows anywhere in the plan.
    plan = _plan(spark, sf_dir, "ts_periodogram")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert not _has_global_window(plan)
    assert "Generate explode" in plan


def test_delta_method_ci_two_level_aggregate_no_joins(spark, sf_dir):
    # events -> per-user totals -> per-metric moments: two keyed
    # aggregations over a single scan, never a join or window — the
    # map-side-combine shape that holds at any corpus size.
    plan = _plan(spark, sf_dir, "agg_delta_method_ci")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_windowed_distinct_two_level_aggregate(spark, sf_dir):
    # The streaming-safe distinct idiom: dedup aggregate feeding the count
    # aggregate — no joins, no windows, no expand (COUNT DISTINCT would
    # plan an Expand or a distinct aggregate; the two-level form must not).
    plan = _plan(spark, sf_dir, "stream_windowed_distinct")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert not _has_global_window(plan)
    assert plan.count("HashAggregate") >= 4  # partial+final x two levels


def test_pit_features_two_phase_rank_and_broadcast_dim(spark, sf_dir):
    # The as-of pick must be the map-side partial_max(struct) two-phase
    # aggregate (no per-key window sort), and the customer dim must join
    # broadcast.
    plan = _plan(spark, sf_dir, "join_pit_features")
    assert "partial_max(struct" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_candidate_compare_no_new_quadratic_surface(spark, sf_dir):
    # The comparison adds ONE keyed full-outer join over the two capped
    # candidate sets — any nested-loop shape in the plan could only come
    # from the generators themselves, which ban it (their own tests), so
    # the composed plan must have none either.
    plan = _plan(spark, sf_dir, "llm_candidate_compare")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_power_analysis_single_scan_no_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_power_analysis")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_diff_in_diff_one_broadcast_no_window(spark, sf_dir):
    # Two scans of events (the 1-row bounds aggregate + the cells pass);
    # the only join shape is the broadcast of that single row.
    plan = _plan(spark, sf_dir, "agg_diff_in_diff")
    assert plan.count("FileScan parquet") <= 2
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_modularity_keyed_joins_over_checkpointed_edges(spark, sf_dir):
    # Labels join the MATERIALIZED edge list (Scan ExistingRDD); no
    # all-pairs shape beyond the allowlisted 1-row 2m broadcast.
    plan = _plan(spark, sf_dir, "graph_modularity")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_time_decay_single_scan_keyed_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_time_decay_score")
    assert plan.count("FileScan parquet") <= 2  # high-water pass + score pass
    assert "Window" not in plan
    assert "CartesianProduct" not in plan

def test_clustering_coefficient_keyed_joins_only(spark, sf_dir):
    # Triangle corners + degrees over the CHECKPOINTED pair graph: every
    # join is an equi-join on node ids — no nested loop, no window.
    plan = _plan(spark, sf_dir, "graph_clustering_coefficient")
    # pairs come from the shared derived-table materialization
    # (llm.dedup.candidate_pairs): the LSH lineage must never re-derive
    assert "documents" not in plan
    assert plan.count("FileScan parquet") >= 1  # the materialized pair table
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_degree_assortativity_keyed_joins_only(spark, sf_dir):
    # Degrees attach to both edge endpoints via equi-joins; the Pearson
    # readout is one global aggregate — no nested loop, no window.
    plan = _plan(spark, sf_dir, "graph_degree_assortativity")
    # pairs come from the shared derived-table materialization
    assert "documents" not in plan
    assert plan.count("FileScan parquet") >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_mannwhitney_window_over_distinct_values(spark, sf_dir):
    # Ranks come from cumulative counts over the DISTINCT-value relation
    # (two-level aggregate before the window) — never a per-row rank; the
    # window partitions by event_type, so no single-partition sort.
    df = __import__("nedp_etl_spark").queries()["agg_mannwhitney_u"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan parquet") == 1


def test_trimmed_winsorized_window_over_distinct_values(spark, sf_dir):
    df = __import__("nedp_etl_spark").queries()["agg_trimmed_winsorized"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan parquet") == 1


def test_rfm_scoring_is_mapside_case(spark, sf_dir):
    # The quintile cuts arrive as ONE broadcast row (exact_rank_values'
    # bounded histogram refinement); scoring is a map-side CASE — the
    # customer-metric relation is never globally sorted.
    plan = _plan(spark, sf_dir, "agg_rfm_segments")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_rouge_overlap_keyed_joins_only(spark, sf_dir):
    # The overlap is an equi-join keyed on (pair, gram); pairing is an
    # equi-join on doc_id+1 — no nested loop, no window anywhere.
    plan = _plan(spark, sf_dir, "llm_rouge_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_cooccurrence_pmi_bounded_vocab_filter(spark, sf_dir):
    # Top-50 vocab arrives as broadcast semi-joins onto the map-side pair
    # stream; the only nested-loop shape is the allowlisted 1-row N total.
    plan = _plan(spark, sf_dir, "llm_cooccurrence_pmi")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_geo_haversine_pure_mapside(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_geo_haversine")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_band_tuning_reads_no_tables(spark, sf_dir):
    # Pure analytic grid: 5 literal configs x 100 range steps — the plan
    # must contain NO parquet scan; the only join shapes are over the
    # bounded literal grid (allowlisted).
    plan = _plan(spark, sf_dir, "llm_minhash_band_tuning")
    assert "FileScan parquet" not in plan


def test_croston_daily_rollup_first(spark, sf_dir):
    # Corpus collapses to (series, day) BEFORE any window; windows
    # partition by event_type over demand days only.
    plan = _plan(spark, sf_dir, "ts_croston")
    assert not _has_global_window(plan)
    assert plan.count("FileScan parquet") == 1
    assert "CartesianProduct" not in plan


def test_embed_quantize_pure_mapside(spark, sf_dir):
    # The 100 TB re-encode shape: one scan, zero shuffles.
    plan = _plan(spark, sf_dir, "llm_embed_quantize")
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_assembly_e2e_featurize_once_no_global_window(spark, sf_dir):
    # Stage-0 featurize drops text before any exchange; the epoch-order
    # prefix sum is the two-phase helper (per-pid window, never a
    # one-partition global window); rebalance rates broadcast-hash join.
    df = eng.queries()["llm_assembly_e2e"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _has_global_window(plan)
    if "Exchange" in plan:
        first_exchange = plan.split("Exchange")[1][:400]
        assert "text" not in first_exchange  # nothing wide ever shuffles


def test_wilson_ci_single_scan_no_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_wilson_ci")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_theil_keyed_join_no_window(spark, sf_dir):
    # Per-metric stats join back by event_type (keyed, O(#metrics) side);
    # terms quantize to int64 before the keyed sum.
    plan = _plan(spark, sf_dir, "agg_theil_index")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_cramers_v_observed_cells_only(spark, sf_dir):
    # The contingency identity needs only OBSERVED cells: marginals join
    # back keyed; no marginal-domain cross product anywhere (the only
    # nested-loop shape is the allowlisted 1-row totals broadcast).
    plan = _plan(spark, sf_dir, "agg_cramers_v")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_bollinger_daily_rollup_first(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_bollinger_bands")
    assert not _has_global_window(plan)
    assert plan.count("FileScan parquet") == 1


def test_mutual_information_observed_cells_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_mutual_information")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_judge_agreement_single_scan_no_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_judge_agreement")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_moments_two_pass_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_kurtosis_skewness")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_bh_window_only_over_bounded_family(spark, sf_dir):
    # The ranking window input is the ≤ #metrics aggregate, not raw rows.
    # Since the r13 regression fix the MWU family is localCheckpoint'ed (the
    # janino-64KB / double-execution fix), so the window sits on the
    # checkpoint's LogicalRDD barrier; the boundedness proof splits in two:
    # (a) the window's input is the checkpointed family (or a plain
    # aggregate, if the checkpoint is ever removed), never a raw scan, and
    # (b) the family relation itself collapses through an Aggregate.
    df = eng.queries()["agg_benjamini_hochberg"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan
    w_idx = plan.index("Window")
    below = plan[w_idx:]
    assert "Aggregate" in below or "LogicalRDD" in below, (
        "window must sit on the aggregate family (directly or via its "
        "checkpoint barrier)"
    )
    assert "Relation" not in below.replace("LogicalRDD", ""), (
        "no raw fixture scan may feed the ranking window"
    )
    from nedp_etl_spark.operators.analytics import agg_mannwhitney_u

    fam_plan = (
        agg_mannwhitney_u(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Aggregate" in fam_plan, "the MWU family must be an aggregate collapse"


def test_paragraph_dedup_keyed_joins_no_window(spark, sf_dir):
    # First-occurrence selection is a hash-keyed MIN aggregate joined
    # back; reassembly is sort_array over per-doc collected structs —
    # no window, no nested loop.
    plan = _plan(spark, sf_dir, "llm_paragraph_dedup")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_topk_rank_partitioned_by_window(spark, sf_dir):
    # The rank window partitions by (window, event_type) — bounded by
    # active users per window, never a global sort.
    plan = _plan(spark, sf_dir, "stream_topk_per_window")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_mix_sweep_single_corpus_scan(spark, sf_dir):
    # The per-language count aggregate is checkpointed (corpus scan runs
    # ONCE, at construction); everything in the returned plan is
    # O(#langs x #alphas) over the materialized relation.
    plan = _plan(spark, sf_dir, "llm_mix_temperature_sweep")
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert not _has_global_window(plan)


def test_calibration_ece_bounded_rollup(spark, sf_dir):
    # Same shape: the 10-bin aggregate is checkpointed; the returned plan
    # only rolls up the materialized bins.
    plan = _plan(spark, sf_dir, "llm_calibration_ece")
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan


def test_nearest_1d_is_sorted_union_no_join(spark, sf_dir):
    # The sorted-union trick: ZERO joins — one partitioned sort and two
    # running-edge windows replace the quadratic |Δprice| cross join.
    plan = _plan(spark, sf_dir, "join_nearest_1d")
    assert "Join" not in plan
    assert not _has_global_window(plan)
    assert plan.count("FileScan parquet") == 1


def test_gumbel_two_level_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_gumbel_extremes")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_luhn_pure_mapside(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_luhn")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan and "Exchange" not in plan


def test_entropy_rate_checkpointed_counts(spark, sf_dir):
    # Count tables are checkpointed (one derivation each); the rollup
    # works over materialized vocabulary-bounded relations.
    plan = _plan(spark, sf_dir, "llm_ngram_entropy_rate")
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_lorenz_window_over_distinct_values(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_lorenz_curve")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan parquet") == 1


def test_control_chart_daily_rollup_first(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_control_chart")
    assert not _has_global_window(plan)
    assert "Scan ExistingRDD" in plan  # checkpointed daily relation
    assert "CartesianProduct" not in plan


def test_ttl_expire_survivor_scan_prunes(spark, sf_dir):
    # The read-back plan scans only surviving partitions (expired dirs are
    # gone); no join, no window.
    plan = _plan(spark, sf_dir, "sink_ttl_expire")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_median_window_over_distinct_values(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_weighted_median")
    assert not _has_global_window(plan)
    assert plan.count("FileScan parquet") == 1


def test_knn_graph_bucketed_equi_join(spark, sf_dir):
    # The self-join is keyed on the LSH bucket (never all-pairs); ranking
    # partitions by source vector.
    plan = _plan(spark, sf_dir, "llm_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_quarantine_single_pass_tag(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sink_quarantine")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_pack_utilization_two_phase_prefix(spark, sf_dir):
    df = eng.queries()["llm_pack_utilization"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not _has_global_window(plan)  # two-phase prefix sum, never global


def test_curriculum_cuts_are_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_curriculum_order")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_drawdown_running_frames_only(spark, sf_dir):
    # Both windows are [unbounded preceding, current] — the O(1)-per-row
    # fast path (the join_nearest_1d lesson); the reduce is keyed.
    plan = _plan(spark, sf_dir, "ts_drawdown")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_pythagorean_means_single_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pythagorean_means")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_threshold_sweep_verify_once(spark, sf_dir):
    # The expensive Jaccard verify is checkpointed — the sweep's plan
    # must not re-derive the shingle lineage per grid row.
    plan = _plan(spark, sf_dir, "llm_dedup_threshold_sweep")
    assert "documents" not in plan        # verify ran once, upstream
    assert not _has_global_window(plan)


def test_multimodal_dedup_single_keyed_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "llm_multimodal_dedup")
    assert "Join" not in plan and "Window" not in plan
    assert "CartesianProduct" not in plan


def test_json_schema_profile_mapside_sweep(spark, sf_dir):
    plan = _plan(spark, sf_dir, "profile_json_schema")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_new_vs_returning_window_over_daily_aggregate(spark, sf_dir):
    # The only window is the cumulative sum over the per-DAY aggregate
    # (bounded by calendar days), never over raw activity rows.
    df = eng.queries()["ts_new_vs_returning"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    w_idx = plan.index("Window")
    assert "Aggregate" in plan[w_idx:], "window must sit above the day census"


def test_period_growth_weekly_rollup_first(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_period_growth")
    assert not _has_global_window(plan)
    assert plan.count("FileScan parquet") == 1


def test_cohort_ltv_keyed_matrix(spark, sf_dir):
    # First-seen is one user-keyed aggregate joined back; the cumulative
    # frame partitions by cohort — never global.
    plan = _plan(spark, sf_dir, "ts_cohort_ltv")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_price_index_one_partmonth_pass(spark, sf_dir):
    # The (part, month) aggregate is checkpointed — base and month
    # branches share one lineitem pass; joins are keyed on part.
    plan = _plan(spark, sf_dir, "agg_price_index")
    assert "Scan ExistingRDD" in plan
    assert "lineitem" not in plan          # source never re-derived
    assert not _has_global_window(plan)


def test_theil_decomposition_keyed_stats_reuse(spark, sf_dir):
    # Group stats are checkpointed (terms + parts reuse); per-row terms
    # join the O(#groups) stats keyed; no window anywhere.
    plan = _plan(spark, sf_dir, "agg_theil_decomposition")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_backtest_cv_spine_broadcast(spark, sf_dir):
    # The cutoff spine is calendar-bounded and broadcast; the fit table
    # is O(series x cutoffs); daily relation checkpointed (3 consumers).
    plan = _plan(spark, sf_dir, "ts_backtest_cv")
    assert "Scan ExistingRDD" in plan      # checkpointed daily rollup
    assert "events" not in plan            # source never re-derived
    assert not _has_global_window(plan)


def test_simpson_single_rollup(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_simpson_diversity")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan


def test_bitpack_pure_mapside(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_bitpack_roundtrip")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan and "Exchange" not in plan


def test_suffix_dedup_keyed_no_pairwise(spark, sf_dir):
    # Candidate discovery is equality-on-hash (agg + equi-join), never a
    # self-join; the island merge windows are per-doc running frames.
    plan = _plan(spark, sf_dir, "llm_suffix_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_semdedup_pairwise_only_within_cluster(spark, sf_dir):
    # The only pairwise work is the cluster-keyed equi self-join (rank-
    # capped); nothing cartesian, and every window partitions by cluster
    # or vec_id.  The 1-row centroid broadcast rides the kmeans allowlist.
    plan = _plan(spark, sf_dir, "llm_semdedup")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_bloom_dedup_keyed_only(spark, sf_dir):
    # Build = one keyed bit_or aggregate; probe = equi-join against the
    # m/32-row word table; truth = equi-join on the hash.  Nothing
    # pairwise, no window.
    plan = _plan(spark, sf_dir, "llm_bloom_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_cuped_single_pass_totals_broadcast(spark, sf_dir):
    # Per-user relation computed once (checkpoint) feeding the 1-row
    # pooled-moments broadcast and the map-side adjustment; no window.
    plan = _plan(spark, sf_dir, "agg_cuped")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_corpus_overlap_sketch_bounded_pairwork(spark, sf_dir):
    # Sketch windows partition by source / (sa, sb); the only non-equi
    # join is the dimension-sized source-pair spine (allowlisted).  The
    # corpus-sized shingle relation appears only in equi joins.
    plan = _plan(spark, sf_dir, "llm_corpus_overlap_sketch")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_join_dpp_dynamic_pruning_fires(spark, sf_dir):
    # The year-partitioned fact scan must carry a DynamicPruningExpression
    # in its PartitionFilters — the dim's surviving keys prune fact
    # partitions at runtime (no literal year filter exists in the query).
    df = eng.queries()["join_dpp"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    assert "PartitionFilters" in plan


def test_deepwalk_keyed_steps_no_pairwise(spark, sf_dir):
    # Each walk step is an equi-join + keyed min over the frontier; the
    # skip-gram join is keyed on (walk, start).  No cartesian, and every
    # window-free aggregation is keyed.
    plan = _plan(spark, sf_dir, "graph_deepwalk_pairs")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_bradley_terry_model_sized_iterations(spark, sf_dir):
    # One corpus pass (rank-zip join on per-source windows); every MM
    # update runs on the checkpointed #players² match table.  The only
    # global window is the allowlisted leaderboard rank.
    plan = _plan(spark, sf_dir, "llm_bradley_terry")
    assert "CartesianProduct" not in plan


def test_msprt_daily_rollup_before_windows(spark, sf_dir):
    # The cumulative frames run over the calendar-bounded daily aggregate
    # (<= #days rows), never raw events: an Aggregate must sit below the
    # first Window in the optimized plan.
    df = eng.queries()["agg_msprt"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    w_idx = plan.index("Window")
    assert "Aggregate" in plan[w_idx:], "window must sit above the daily aggregate"


def test_esd_rounds_over_daily_rollup(spark, sf_dir):
    # Every round's moment aggregate and rank run on the (series, day)
    # daily relation; windows partition by series; no pairwise work.
    plan = _plan(spark, sf_dir, "ts_esd_anomaly")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_shapley_corpus_work_is_one_aggregate(spark, sf_dir):
    # The only corpus-sized work is the per-user path aggregate; Shapley
    # terms run on 2^k model-sized spines (bitmask joins, allowlisted).
    plan = _plan(spark, sf_dir, "agg_shapley_attribution")
    assert "CartesianProduct" not in plan


def test_anova_f_single_corpus_aggregate(spark, sf_dir):
    # Corpus-sized work is ONE keyed aggregate (k sufficient-stat rows);
    # the combine runs on those k rows.  No windows, no joins, no repeat
    # scan of events.
    plan = _plan(spark, sf_dir, "agg_anova_f")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 1


def test_k_anonymity_single_aggregate(spark, sf_dir):
    # One QI-keyed aggregate; class relation bounded by the QI vocabulary.
    plan = _plan(spark, sf_dir, "llm_k_anonymity")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 1


def test_mann_kendall_pairs_over_daily_rollup(spark, sf_dir):
    # Pairwise work and the Sen median run on the calendar-bounded daily
    # relation (equi-join on event_type + windows partitioned by series),
    # never raw events: the optimized plan joins above an Aggregate and
    # has no cartesian/global-window hazard.
    plan = _plan(spark, sf_dir, "ts_mann_kendall")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_spearman_ranks_avoid_global_window(spark, sf_dir):
    # Ranks come from the two-phase prefix sum over distinct-value
    # relations — the only windows in the plan are the helper's
    # pid-partitioned running sums (the oracle's global RANK() windows
    # must NOT appear on the Spark side), and no cartesian hazard.
    plan = _plan(spark, sf_dir, "agg_spearman_rho")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Aggregate-first (r14): moments accumulate at distinct-value
    # granularity, so NO shuffled join remains — every join is a broadcast
    # of a bounded rank/offset page onto the corpus or distinct relation.
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_ljung_box_calendar_bounded_like_acf(spark, sf_dir):
    # Inherits ts_acf's shape: daily rollup self-join at 7 calendar
    # offsets; Q combines <= 7 rows per series.  No cartesian, no global
    # window, one events scan (the checkpoint freezes the rollup).
    plan = _plan(spark, sf_dir, "ts_ljung_box")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_deletion_vectors_broadcast_anti_join(spark, sf_dir):
    # The DV side must broadcast (real readers hold the per-file bitmap in
    # memory); the base side stays a plain parquet scan.
    plan = _plan(spark, sf_dir, "scan_deletion_vectors")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_jackknife_runs_on_daily_partials(spark, sf_dir):
    # One corpus-sized keyed aggregate (day partials); replicate algebra
    # joins the calendar-bounded partials to broadcast totals.  No
    # windows, no cartesian, one events scan.
    plan = _plan(spark, sf_dir, "agg_jackknife_ci")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 1


def test_raking_ipf_model_sized_iterations(spark, sf_dir):
    # The 2T scaling passes run driver-side on the vocabulary-bounded
    # cell page (collected once); the returned relation is a local table
    # — no parquet scan, no window, no join in the final plan.
    plan = _plan(spark, sf_dir, "agg_raking_ipf")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 1


def test_hurst_windows_partition_by_block(spark, sf_dir):
    # All windows partition by (series[, scale, block]); the regression
    # runs on <= 3 rows/series.  One events scan (checkpointed rollup).
    plan = _plan(spark, sf_dir, "ts_hurst_exponent")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)
    assert plan.count("Scan parquet") <= 1


def test_logistic_irls_aggregates_only(spark, sf_dir):
    # Each IRLS pass = one balanced 9-sum aggregate with a 1-row beta
    # broadcast (allowlisted); the solve is a 1-row select.  No windows,
    # no sort-merge joins, one events scan feeding the checkpointed
    # feature relation.
    plan = _plan(spark, sf_dir, "agg_logistic_irls")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 0  # all inputs are checkpointed


def test_sax_calendar_bounded_windows(spark, sf_dir):
    # Everything runs on the checkpointed daily rollup; windows partition
    # by series; words assemble from <= days/7 frames per series.
    plan = _plan(spark, sf_dir, "ts_sax_symbolize")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)
    assert plan.count("Scan parquet") == 0  # checkpointed rollup only


def test_topo_levels_model_sized_rounds(spark, sf_dir):
    # Peel rounds run on checkpointed <= k-node relations; the one
    # corpus-sized stage (first-occurrence aggregate) is checkpointed, so
    # the final plan reads no parquet and joins tiny relations only.
    plan = _plan(spark, sf_dir, "graph_topo_levels")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 0


def test_conformal_windows_partition_by_series(spark, sf_dir):
    # OLS sums and residual ranks run over the checkpointed daily rollup;
    # all windows partition by series.
    plan = _plan(spark, sf_dir, "ts_conformal_interval")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)
    assert plan.count("Scan parquet") == 0


def test_pca_power_corpus_touched_once(spark, sf_dir):
    # The covariance aggregate is the only corpus-sized stage; iterations
    # run on the collected d^2-bounded page, so the returned relation is
    # a local table — no parquet scan, no window, no join.
    plan = _plan(spark, sf_dir, "llm_embed_pca_power")
    assert plan.count("Scan parquet") == 0
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_containment_rides_candidate_pairs(spark, sf_dir):
    # The pair list is the shared LSH-bounded derived table; the exact
    # intersection joins the checkpointed shingle relation — never an
    # all-pairs product.
    plan = _plan(spark, sf_dir, "llm_minhash_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_packing_mask_no_global_window(spark, sf_dir):
    # The prefix sum is the two-phase helper; per-pack windows are bounded
    # by the cap.  No single-partition window, no cartesian.
    plan = _plan(spark, sf_dir, "llm_packing_attention_mask")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_theta_closed_form_no_iteration(spark, sf_dir):
    # The SES level is a single aggregate (exact powers of two as
    # weights) — no iterative stage, no global window, one events scan
    # into the checkpointed rollup.
    plan = _plan(spark, sf_dir, "ts_theta_forecast")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0


def test_geohash_pure_map_side(spark, sf_dir):
    # Encode/decode is a projection: no exchange beyond the scan, no
    # window, no join.
    plan = _plan(spark, sf_dir, "fn_geohash")
    assert "Window" not in plan
    assert "Join" not in plan


def test_variance_ratio_series_partitioned(spark, sf_dir):
    # Lag windows and moment sums partition by series over the
    # checkpointed rollup; per-series means broadcast back.
    plan = _plan(spark, sf_dir, "ts_variance_ratio_test")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0


def test_spatial_neighbors_cell_equijoin_only(spark, sf_dir):
    # x9 map-side expansion + ONE cell equi-join; never an all-pairs
    # product; ranking windows partition per point.
    plan = _plan(spark, sf_dir, "join_spatial_neighbors")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_roc_auc_no_global_window(spark, sf_dir):
    # Ranks via the two-phase prefix sum, moments at distinct-value
    # granularity (aggregate-first, r14): no single-partition window and
    # no shuffled join at all — the only join is the broadcast prefix-sum
    # offset page.
    plan = _plan(spark, sf_dir, "agg_roc_auc")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_forecast_reconcile_broadcast_dims(spark, sf_dir):
    # Dims broadcast into the single orders pass; fits run on the
    # checkpointed calendar-bounded rollup; no global window.
    plan = _plan(spark, sf_dir, "ts_forecast_reconcile")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_empirical_bayes_one_fact_pass(spark, sf_dir):
    # One orders pass with a broadcast dim; moments over the bounded
    # entity relation; 1-row prior broadcast back.  No windows.
    plan = _plan(spark, sf_dir, "agg_empirical_bayes")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_levene_two_balanced_passes(spark, sf_dir):
    # Two keyed corpus aggregates (means, then deviations) with the k-row
    # means broadcast between them; no windows.
    plan = _plan(spark, sf_dir, "agg_levene_test")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2


def test_shallow_clone_reads_are_plain_scans(spark, sf_dir):
    # Clone reads are ordinary parquet scans over pointed-at files; no
    # windows, no joins in the returned comparison relation.
    plan = _plan(spark, sf_dir, "sink_shallow_clone")
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_haar_pyramid_keyed_aggregates(spark, sf_dir):
    # Three halving keyed aggregates over the checkpointed rollup; the
    # only windows are the per-series day index.
    plan = _plan(spark, sf_dir, "ts_haar_energy")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_iv_2sls_two_aggregates_only(spark, sf_dir):
    # One user aggregate, one moments aggregate; no windows, no joins.
    plan = _plan(spark, sf_dir, "agg_iv_2sls")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 1


def test_topic_segments_within_doc_joins_only(spark, sf_dir):
    # Adjacent-block joins key on (doc, block): work scales with corpus
    # tokens, never cross-document pairs.
    plan = _plan(spark, sf_dir, "llm_topic_segments")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not _has_global_window(plan)


def test_event_study_user_keyed_band_join(spark, sf_dir):
    # Anchors join activity ON USER with the banded date filter; offsets
    # aggregate to 7 rows; the pre baseline is a 1-row broadcast.
    plan = _plan(spark, sf_dir, "ts_event_study")
    assert "CartesianProduct" not in plan
    assert not _has_global_window(plan)


def test_gpd_two_moment_passes(spark, sf_dir):
    # Global moments then exceedance moments with the 1-row thresholds
    # broadcast between; no windows, no order statistics.
    plan = _plan(spark, sf_dir, "agg_gpd_tail")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2


def test_huber_t_balanced_passes(spark, sf_dir):
    # One moments pass + T weighted passes with the k-row mu broadcast;
    # no windows.
    plan = _plan(spark, sf_dir, "agg_huber_mean")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_seasonality_strength_composes_stl(spark, sf_dir):
    # Same plan family as ts_stl_decompose plus one variance aggregate;
    # windows stay series-partitioned.
    plan = _plan(spark, sf_dir, "ts_seasonality_strength")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_embedding_drift_single_explode_aggregate(spark, sf_dir):
    # One map-side explode into 2d groups; the battery combines d rows.
    plan = _plan(spark, sf_dir, "profile_embedding_drift")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 1


def test_weighted_reservoir_take_ordered(spark, sf_dir):
    # Map-side keys + TakeOrderedAndProject: no global sort, no window.
    df = eng.queries()["sample_weighted_reservoir"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_peak_prominence_series_windows(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_peak_prominence")
    assert not _has_global_window(plan)
    assert "CartesianProduct" not in plan


def test_parallel_trends_one_pass_regression(spark, sf_dir):
    # One (arm, day) aggregate under the broadcast cutoff; the gap
    # regression runs on <= #days rows.  No windows.
    plan = _plan(spark, sf_dir, "agg_parallel_trends")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Shared-session state audit (Spark-free, AST over the package source):
# registered queries run on a session they do NOT own — the driver's, an
# engine gateway's, a thread pool's — so their bodies may not plant
# session-global names or mutate session conf.  A fixed temp-view name is
# the cross-tenant wrong-data race tests/test_concurrency.py pins (two
# threads at different sf_dirs, loser reads the winner's fixture); use
# data.run_sql / parameterized spark.sql instead.  Allowlisted sites own
# their namespace: data.views (engine/tests, documented), ModelGraph
# (always handed a per-(key, sf) sibling session), the dbt sibling-session
# keys, and sink_view (the view-materialization demo; its name is
# sf-scoped).
# --------------------------------------------------------------------------

_TEMP_VIEW_ALLOWED = {
    ("data.py", "views"),
    ("models.py", "run"),
    ("models.py", "_run_incremental"),
    ("operators/core_ext.py", "dbt_incremental_dag"),  # sibling session
    ("operators/scans.py", "sink_view"),  # sf-scoped name, deliberate
}

_CONF_SET_ALLOWED = {
    ("data.py", "prepare"),  # the documented per-query re-pin contract
    ("streaming/windows.py", "_run_to_memory"),  # isolated newSession only
}


def _session_state_sites(method: str):
    import ast
    import pathlib

    pkg = pathlib.Path(eng.__file__).resolve().parent
    hits = []
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        tree = ast.parse(path.read_text(), filename=rel)
        # enclosing top-level function (or method's class-level def) by span
        spans = [
            (n.name, n.lineno, max(getattr(n, "end_lineno", n.lineno), n.lineno))
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == method
            ):
                owner = min(
                    (
                        (hi - lo, name)
                        for name, lo, hi in spans
                        if lo <= node.lineno <= hi
                    ),
                    default=(0, "<module>"),
                )[1]
                hits.append((rel, owner, node.lineno))
    return hits


def test_no_session_global_temp_views():
    bad = [
        h
        for h in _session_state_sites("createOrReplaceTempView")
        if (h[0], h[1]) not in _TEMP_VIEW_ALLOWED
    ]
    assert not bad, (
        f"session-global temp view(s) outside the allowlist: {bad} — "
        "registered queries must bind tables via data.run_sql / "
        "parameterized spark.sql (cross-tenant race, see SCALE.md round 12)"
    )


def test_no_caller_session_conf_mutation():
    """``spark.conf.set`` — mutating the CALLER's session — is banned.

    Isolated sessions (``s = _isolated(spark)`` / ``newSession()`` /
    ``_sibling``) may pin conf freely; the package naming convention is
    that the handed-in session is always called ``spark``, so the precise
    AST shape ``Name('spark').conf.set(...)`` is exactly the hazard: a
    registered query silently re-planning every other tenant's concurrent
    queries (e.g. shuffle.partitions mid-flight)."""
    import ast
    import pathlib

    pkg = pathlib.Path(eng.__file__).resolve().parent
    bad = []
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        tree = ast.parse(path.read_text(), filename=rel)
        spans = [
            (n.name, n.lineno, max(getattr(n, "end_lineno", n.lineno), n.lineno))
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "set"
                and isinstance(node.func.value, ast.Attribute)
                and node.func.value.attr == "conf"
                and isinstance(node.func.value.value, ast.Name)
                and node.func.value.value.id == "spark"
            ):
                continue
            owner = min(
                (
                    (hi - lo, name)
                    for name, lo, hi in spans
                    if lo <= node.lineno <= hi
                ),
                default=(0, "<module>"),
            )[1]
            if (rel, owner) not in _CONF_SET_ALLOWED:
                bad.append((rel, owner, node.lineno))
    assert not bad, (
        f"caller-session conf mutation(s) outside the allowlist: {bad} — "
        "registered queries run on a session they don't own; pin conf on "
        "an isolated newSession() (streaming) or via data.prepare"
    )
