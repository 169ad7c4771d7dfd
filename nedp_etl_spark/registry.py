"""Query registry — the single source of truth for the operator inventory.

Each operator from ``SURVEY.md §2`` registers exactly once via the
:func:`register` decorator, pairing the Spark implementation with its DuckDB
oracle SQL (or ``None`` for the rows-only checks the driver allows for
non-SQL-expressible operators).  ``__spark_entry__.py`` re-exports the two
dicts this module accumulates.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL twin.

    The oracle SQL must produce identical column names (the driver sorts
    columns by name before value-hashing) and value-identical output at
    sf=0.01 — float aggregates rounded to 6 dp on BOTH sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


# Verification priority: the driver sweeps registry keys IN ORDER and only a
# prefix fits its budget (r1–r5 each recorded EXACTLY 50 CORRECTNESS rows).
# Keys named here are emitted first, in this order; everything else follows
# in registration order.  Round-7 ordering: the round-6 driver sweep never
# ran (import crash: duplicate fn_url registration, fixed round 7), so the
# backlog is (a) the 18 round-5-new keys + (b) the 7 round-6-new keys =
# 25 keys with no driver CORRECTNESS row (cumulative coverage after r5:
# 230/255 distinct keys, all green); then (b2) keys whose CODE changed in
# round 6/7 and need re-verification (fn_url rewritten in
# functions/scalar.py; agg_bitmap_dict + ts_mad_anomaly oracle hardening
# in round 7); then (c)/(d) previously-green keys touched by hardening,
# for any spare budget.  The 50-row budget closes the registry to
# 255/255-cumulative with every changed key re-verified in the same sweep.
_PRIORITY: list[str] = [
    # --- (a) the 18 round-5 keys awaiting their first driver row.  All 18
    # are hash-exact at sf0.001 AND sf0.01 against their DuckDB oracles in
    # the in-repo suite (tests/test_correctness.py parametrizes over the
    # registry) and carry semantic ground-truth tests (test_semantics.py).
    # agg_ks_test moved to the front three: round 6 changed its
    # empty-segment semantics (no row instead of NULL), ts_mad_anomaly's
    # median switched to the discrete lower-of-midpair element, and
    # llm_perplexity_buckets gained the concentrated-bucket recursion guard
    # (output-identical) — their rows verify the round-6 code.
    "agg_ks_test",                # r6: empty segment now emits no row
    "ts_mad_anomaly",             # r6: discrete lower-of-midpair median
    "llm_perplexity_buckets",     # r6: bounded-occupancy recursion guard
    "llm_pq_encode",              # product quantization (IVF-PQ codes)
    "llm_dsir_importance",        # DSIR hashed-unigram importance weights
    "ts_changepoint",             # CUSUM mean-shift per series
    "sample_bottomk",             # exact-k deterministic bottom-k sample
    "llm_bpe_merges",             # BPE round-1 merge-pair counts
    "llm_html_extract",           # boilerplate-strip text extraction
    "agg_percentile_histogram",   # two-phase exact median (scale path)
    "ts_streaks",                 # gaps-and-islands day streaks per user
    "ts_holt",                    # Holt linear-trend recurrence (grouped map)
    "agg_bitmap_distinct",        # exact distinct via bitmap words
    "win_pattern_match",          # MATCH_RECOGNIZE-style lag-flag CEP
    "llm_entropy_filter",         # char-entropy gibberish detection
    "agg_bitmap_intersect",       # word-wise bitmap set algebra
    "ts_acf",                     # per-series autocorrelation (lag join)
    "graph_bfs_reach",            # multi-source BFS (frontier loop)
    # --- (b) NEW in round 6 (each: exact oracle green at sf0.001+sf0.01,
    # planted semantic test, plan audit) ---
    "llm_bpe_train",              # NEW: iterative BPE, incremental pair deltas
    "win_pattern_var",            # NEW: variable-length CEP via run compression
    "agg_bitmap_dict",            # NEW: dictionary-encoded sparse-domain bitmap
    "graph_connected_components", # NEW: large-star/small-star O(log n) CC
    "agg_heavy_hitters",          # NEW: exact two-phase frequent items
    "llm_dedup_cluster_sizes",    # NEW: duplicate-cluster size histogram
    "win_distribution",           # NEW: percent_rank/cume_dist/ntile family
    # --- (b2) keys whose code/oracle CHANGED in round 6/7 — rows double as
    # re-verification of the new code (fn_url: rewritten with fragment +
    # per-parameter extraction in functions/scalar.py; agg_bitmap_dict:
    # oracle BIGINT-cast hardening; ts_mad_anomaly is already in (a)) ---
    "fn_url",                     # r7: rewritten (fragment/ref_param/NULLs)
    "llm_curation_e2e",           # NEW r7: six-stage composed curation pipeline
    "agg_entropy_gini",           # NEW r7: per-group entropy + Gini impurity
    "ts_rolling_corr",            # NEW r7: 7-day rolling Pearson (integer sums)
    "llm_sorted_neighborhood",    # NEW r7: SNM blocking dedup (SimHash blocks)
    "graph_label_propagation",    # NEW r7: K-round LPA community detection
    "agg_corr_matrix",            # NEW r7: one-pass pairwise Pearson matrix
    "llm_bpe_encode",             # NEW r7: merge-table application (vocab-level)
    "llm_quality_classifier",     # NEW r7: fastText-style logistic quality model
    "join_temporal_scd2",         # NEW r7: validity-interval temporal join
    "scan_file_metadata",         # NEW r7: _metadata provenance invariants
    "stream_state_reader",        # NEW r7: State Data Source introspection
    "ts_time_weighted_avg",       # NEW r7: LOCF time-weighted average
    "ts_lttb",                    # NEW r7: parallel LTTB downsampling
    "llm_watermark_score",        # NEW r7: statistical watermark detector
    "agg_benford_test",           # NEW r7: Benford first-digit chi² forensics
    "profile_drift_psi",          # NEW r7: PSI drift monitor
    "ts_holt_winters",            # NEW r7: triple exponential smoothing
    "llm_shard_balance",          # NEW r7: snake-order data-parallel sharding
    "llm_dedup_token_sort",       # NEW r7: bag-of-words permutation dedup
    "agg_chisq_independence",     # NEW r7: contingency chi² + Cramér's V
    # --- (b3) LATE round-7 keys — registered after the 50-row budget
    # filled; they are in-repo green at sf0.001+sf0.01 and queue as the
    # round-8 section-(a) backlog ---
    "ts_m4_downsample",           # NEW r7-late: M4 pixel-exact downsampling
    "llm_embed_outliers",         # NEW r7-late: centroid-cosine embedding QA
    "agg_gini_coefficient",       # NEW r7-late: Lorenz inequality per segment
    "llm_lsh_bucket_purity",      # NEW r7-late: ANN-index purity evaluation
    "llm_dataset_interleave",     # NEW r7-late: fixed-ratio corpus mixing
    "fn_ipv4",                    # NEW r7-late: IPv4 parse/CIDR enrichment
    "llm_ngram_novelty",          # NEW r7-late: corpus-unique trigram fraction
    # --- (b4) NEW in round 8's build session (in-repo green at
    # sf0.001+sf0.01, planted semantic tests, plan audit) — queue behind
    # the (b3) tail for the next driver sweep ---
    "llm_hard_negatives",         # NEW r8: cross-label hard-negative mining
    "agg_markov_transitions",     # NEW r8: event-sequence transition matrix
    "graph_shortest_path",        # NEW r8: bounded Bellman-Ford weighted SSSP
    "graph_neighbor_jaccard",     # NEW r8: pair-graph neighborhood Jaccard QA
    "ts_kalman",                  # NEW r8: 1-D random-walk Kalman filter
    "llm_kneser_ney",             # NEW r8: interpolated KN bigram smoothing
    "scan_xml",                   # NEW r8: Spark 4 native XML round-trip
    # --- (c) previously-green keys; round-6 edits are output-identical
    # (stream_transform_state: bootstrap refactor into shared helpers for
    # the bench warm-up — same query path) ---
    "stream_transform_state",
    # --- (d) round-5 OUTPUT-IDENTICAL hardening/perf edits (all carry
    # green driver rows for the same results from earlier rounds), next in
    # line for any spare driver budget.  Per-vector norm caching (one O(dim)
    # fold per vector instead of three per scored pair — identical double
    # arithmetic), the _shingles total-function guard (empty array for
    # docs shorter than one shingle; unreachable on current fixtures), the
    # llm_chunking oracle's per-doc spine (was fixed-width 64), and
    # llm_dataset_split's null-propagating hash input.  All re-verified
    # hash-exact at sf0.01 by the in-repo replica this round
    # (tests/test_llm_edges.py pins the edge behaviors).
    "llm_sim_search", "llm_sim_search_ivf", "llm_ann_recall",
    "llm_semantic_lsh", "llm_chunking", "llm_dataset_split",
    "llm_dedup_near", "llm_dedup_lsh_verified",
    "llm_kmeans",  # argmin factored into _argmin_centroid (shared w/ PQ)
    # ...and the timeseries/analytics hardening of the same review program:
    # ts_sessionize (microsecond-exact gap compare — the floored-second
    # diff disagreed with the oracle for true gaps in (1800 s, 1801 s)),
    # ts_forecast_linear (normal-equation products in decimal(38,0),
    # matching the oracle's HUGEINT against int64 overflow under ANSI),
    # ts_downsample / ts_attribution (single-pass over the windowed
    # relation instead of two filtered branches re-evaluating it),
    # ts_retention_cohort (cohort + active weeks from ONE user_id
    # exchange).  ts_funnel's zero-user step spine and agg_ab_ztest's
    # decimal(18,6) squares are already inside the 50-row budget above.
    "ts_sessionize", "ts_forecast_linear", "ts_downsample",
    "ts_attribution", "ts_retention_cohort",
    # ...and the sink/scan isolation pass: sink_view (sf-scoped view name),
    # sink_partition_overwrite (per-write option replaces the racy
    # session-conf save/restore), sink_ephemeral (dsum_dec reuse),
    # scan_csv_malformed (localCheckpoint replaces an unbounded cache-entry
    # leak).  The dbt_* DAG ops' sibling-session isolation and
    # scan_binaryfile's stage-dir clearing are already inside the 50-row
    # budget; the streaming stall guards only fire on environment timeouts.
    "sink_view", "sink_partition_overwrite", "sink_ephemeral",
    "scan_csv_malformed", "stream_foreachbatch",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_ORACLES)
