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
# prefix fits its budget (~50 keys/round got CORRECTNESS entries in r1–r3).
# Keys named here are emitted first, in this order; everything else follows
# in registration order.  Round-4 ordering: (a) keys MODIFIED this round
# (promoted oracles + perf/scale fixes — the driver must re-verify them),
# then (b) the 93 keys that have never received a driver CORRECTNESS row
# across r1–r3, leading with the 32 unchecked llm_* keys per the round-3
# verdict, then ts_*, win_*/agg_*/graph, and the remaining join/scan/sink/
# dbt/fn/stream blocks.  The 136 already-checked keys sort last (their green
# results are on record in CORRECTNESS_r01–r03).
_PRIORITY: list[str] = [
    # --- (a) modified this round: promoted to exact oracles / fixed ---
    "stream_watermark_late",      # rows-only -> exact batch-analogue oracle
    "llm_multimodal_decode",      # rows-only -> deterministic (w,h,frames)
    "stream_rate_source",         # rows-only -> exact cadence oracle
    "stream_custom_state",        # rows-only -> fixed-point profile oracle
    "fn_collate",                 # 6.8s collation agg fixed
    "graph_pagerank",             # broadcast-ranks -> shuffle-join iteration
    "llm_kmeans",                 # K*dim literal plan -> broadcast centroids
    "llm_temperature_sample",     # int64-overflow guard (ADVICE r3)
    "ts_forecast_linear",         # zero-divisor guard (ADVICE r3)
    "scan_csv_malformed",         # staleness guard on staged CSV (ADVICE r3)
    # --- (b) never driver-checked: llm_* block (north-star first) ---
    "llm_cross_dedup", "llm_winnowing", "llm_semantic_lsh", "llm_bm25",
    "llm_tfidf", "llm_multimodal_framesample", "llm_multimodal_resize",
    "llm_multimodal_audio_window", "llm_pii_scrub", "llm_seq_packing",
    "llm_simhash", "llm_ngram_jaccard", "llm_dedup_cluster",
    "llm_dedup_keep_best", "llm_filter_pipeline", "llm_dataset_split",
    "llm_source_rebalance", "llm_contrastive_pairs", "llm_ngram_topk",
    "llm_unigram_logprob", "llm_bigram_logprob", "llm_embed_norm",
    "llm_quality_gopher", "llm_url_dedup", "llm_span_dedup",
    "llm_tokenizer_fertility", "llm_rag_retrieval", "llm_epoch_shuffle",
    "llm_chat_format",
    # --- never checked: time-series block ---
    "ts_sessionize", "ts_gapfill", "ts_bucket_rollup", "ts_anomaly",
    "ts_downsample", "ts_ohlc", "ts_ewma", "ts_retention_cohort",
    "ts_funnel", "ts_cusum", "ts_attribution", "ts_interpolate",
    "ts_seasonal_decompose",
    # --- never checked: window/aggregate extensions + graph ---
    "win_count_distinct", "win_session_native", "win_rolling_median",
    "agg_percentile_exact", "agg_weighted", "agg_regr", "agg_count_min",
    "agg_hll_mergeable", "agg_skew_twophase", "agg_ab_ztest",
    "graph_triangle_count",
    # --- never checked: join extensions ---
    "join_skew_salted", "join_range_binned", "join_spatial_grid",
    "join_asof_fwd_tol", "join_asof_nearest",
    "join_hint_shuffle_hash", "join_bloom_prefilter",
    # --- never checked: scans / sinks ---
    "scan_jsonl_nested", "scan_binaryfile", "scan_text_lines",
    "scan_python_datasource",
    "sink_file_sizing", "sink_sorted_layout", "sink_zorder",
    "sink_parquet_bloom", "sink_observe_metrics",
    "sink_surrogate_keys", "sink_csv_roundtrip", "sink_cdc_apply",
    # --- never checked: dbt parity / profiling / misc ---
    "dbt_model_dag", "dbt_incremental_dag", "dbt_source_freshness",
    "dbt_catalog", "dbt_run_hooks",
    "profile_table", "profile_skew", "udtf_native",
    "fn_xml", "fn_try_safe", "sql_pipe_syntax",
    "stream_static_join", "stream_stream_join",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_ORACLES)
