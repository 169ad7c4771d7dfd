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
    # Round-11 ordering (the driver sweeps a ~50-key PREFIX in order):
    # (a) the one round-10 driver-RED key: its raw array<bigint>
    # cu_seqlens column broke the driver's pandas canonicalizer (the only
    # container-typed output column of all 424, per the round-10 judge's
    # live schema scan); round 11 stringifies it on both sides
    # (llm/chunking.py), the in-repo oracle + new driver-canon replica are
    # green, and the registry-wide plan audit now bans the class.
    "llm_packing_attention_mask",
    # (b) re-verification: keys whose implementing code changed in round
    # 10 (robustness-sweep fixes) AFTER their last driver-green row —
    # harvested mechanically from the 54e3256..12d2512 diffs (hunk →
    # enclosing @register site), minus the 50 keys CORRECTNESS_r10 already
    # verified at final round-10 HEAD.  All hash-exact in the in-repo
    # suite; the external gate has not re-seen this code.  Keys also
    # touched by the round-11 ADVICE fixes (simsearch Gram-partial
    # overflow guard, timeseries oracle normalization) and the round-11
    # derived-table rewrite (llm_dedup_simhash / llm_candidate_compare
    # serve the materialized simhash_pairs relation; llm_embed_pca_power
    # gained the decimal combine) head the block.
    "llm_embed_covariance",
    "llm_embed_pca_power",
    "llm_dedup_simhash",
    "llm_candidate_compare",
    # round-11 long-doc catalog fix: n-gram builds rewritten zip_with
    # (the index-lambda form re-split the text per element — O(n²)/doc)
    "llm_curation_e2e",
    "llm_contamination",
    "llm_repetition_filter",
    "llm_ngram_novelty",
    # round-11 adversarial-JSON catalog fix: try_cast / try_parse_json /
    # try_variant_get (junk payloads NULL their row, never fail the job)
    "fn_json",
    "fn_variant",
    "ts_gapfill",
    "ts_interpolate",
    "ts_forecast_linear",
    "agg_chisq_independence",
    "graph_hits",
    "llm_multimodal_audio_window",
    "llm_multimodal_decode",
    "llm_multimodal_framesample",
    "llm_multimodal_resize",
    "llm_hard_negatives",
    "llm_kmeans",
    "llm_semdedup",
    "sink_observe_metrics",
    "sink_partition_overwrite",
    "sink_ttl_expire",
    "join_dpp",
    "scan_binaryfile",
    "scan_text_lines",
    "sink_scd2_partitioned",
    "sink_snapshot_scd2",
    "sink_table",
    "ts_ewma",
    "udtf_native",
    "stream_asof_enrich",
    "stream_custom_state",
    "stream_session",
    "stream_watermark_late",
    # --- (c) spare budget: the longest-unconfirmed greens (last driver
    # row round 1, code untouched since), oldest-first alphabetical ---
    "agg_collect", "agg_cube", "agg_distinct", "agg_filter_clause",
    "agg_global", "agg_groupby", "agg_grouping_sets", "agg_having",
    "agg_mode_median", "agg_stats", "agg_string_agg", "cte_chain",
    "cte_recursive", "dbt_schema_tests", "filter_corr_subquery",
    "filter_like_in_between", "filter_null", "filter_pred",
    "filter_subquery", "fn_regex", "fn_sequence", "fn_struct",
    "join_broadcast", "join_bucketed", "join_cross_theta",
    # --- (d) older previously-green keys, registration order thereafter ---
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
