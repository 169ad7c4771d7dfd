"""EngineSession control-surface parity tests (reference R1-R11 mapping)."""

from __future__ import annotations

import pytest

from nedp_etl_spark.engine import EngineSession


def test_run_before_initialize_raises(spark, sf_dir):
    eng = EngineSession(spark, sf_dir)
    with pytest.raises(RuntimeError, match="not initialized"):
        eng.run("agg_groupby")


def test_context_manager_lifecycle(spark, sf_dir):
    with EngineSession(spark, sf_dir) as eng:
        res = eng.run("agg_groupby")
        assert res["success"] and res["rows"] > 0
        # raw SQL path (views registered by initialize)
        res2 = eng.run("SELECT COUNT(*) AS n FROM lineitem")
        assert res2["success"] and res2["rows"] == 1
    # after exit, views are dropped
    assert not spark.catalog.tableExists("lineitem")


def test_execute_fail_fast(spark, sf_dir):
    eng = EngineSession(spark, sf_dir)
    eng.initialize()
    out = eng.execute(["agg_groupby", "SELECT bogus FROM nowhere", "agg_global"])
    assert out["status"] == "failed"
    assert out["failed_command"] == "SELECT bogus FROM nowhere"
    assert len(out["results"]) == 2  # stopped before agg_global


def test_dbt_schema_tests_all_pass(spark, sf_dir):
    import nedp_etl_spark as eng

    rows = {r["test_name"]: r["violations"] for r in
            eng.queries()["dbt_schema_tests"](spark, sf_dir).collect()}
    assert len(rows) == 5
    assert all(v == 0 for v in rows.values()), rows


def test_malformed_csv_permissive_captures_bad_rows(spark, sf_dir):
    import nedp_etl_spark as eng

    [r] = eng.queries()["scan_csv_malformed"](spark, sf_dir).collect()
    from nedp_etl_spark.data import load

    n_nation = load(spark, sf_dir, "nation").count()
    assert r.good_rows == n_nation            # every good row survives
    assert r.corrupt_rows > 0                 # bad rows captured, not fatal
    assert r.total_rows == r.good_rows + r.corrupt_rows
    assert r.dropmalformed_rows == r.good_rows  # DROPMALFORMED drops exactly them


def test_approx_percentile_within_band(spark, sf_dir):
    """Sketch percentiles must land within the band the query itself asserts
    (the in_band booleans are part of the hashed, oracle-checked output)."""
    import nedp_etl_spark as eng

    rows = eng.queries()["agg_approx_percentile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_p50_in_band and r.approx_p95_in_band, r


def test_hll_mergeable_estimate_within_error(spark, sf_dir):
    """Merged daily HLL sketches must estimate per-event_type distinct users
    within HLL error (default lgK=12 → ~1.6% rel. std. error; assert 5%)."""
    import nedp_etl_spark as eng
    from nedp_etl_spark.data import load
    from pyspark.sql import functions as F

    rows = eng.queries()["agg_hll_mergeable"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]], r
        assert r["est_in_band"], r


# ---------------------------------------------------------------------------
# ModelGraph — dbt-style DAG semantics (ref parsing, topo order, selection,
# cycle/unresolved errors, view inlining).
# ---------------------------------------------------------------------------


def _demo_graph():
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model("a", "SELECT 1 AS x")
    g.add_model("b", "SELECT x FROM {{ ref('a') }}")
    g.add_model("c", "SELECT x FROM {{ ref('a') }}")
    g.add_model("d", "SELECT b.x FROM {{ ref('b') }} b JOIN {{ ref('c') }} c ON b.x = c.x")
    return g


def test_model_graph_topo_order():
    g = _demo_graph()
    order = g.topo_order()
    assert order.index("a") < order.index("b") < order.index("d")
    assert order.index("a") < order.index("c") < order.index("d")


def test_model_graph_select_closure():
    g = _demo_graph()
    assert set(g.topo_order(["b"])) == {"a", "b"}
    assert set(g.topo_order(["d"])) == {"a", "b", "c", "d"}


def test_model_graph_cycle_raises():
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model("x", "SELECT * FROM {{ ref('y') }}")
    g.add_model("y", "SELECT * FROM {{ ref('x') }}")
    import pytest

    with pytest.raises(ValueError, match="cycle"):
        g.topo_order()


def test_model_graph_unresolved_ref_raises():
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model("x", "SELECT * FROM {{ ref('nope') }}")
    import pytest

    with pytest.raises(ValueError, match="unresolved"):
        g.topo_order()


def test_model_graph_runs_dag(spark):
    g = _demo_graph()
    out = g.run(spark, select=["d"])
    assert [r["x"] for r in out["d"].collect()] == [1]


def test_model_graph_incremental_merge(spark, tmp_path):
    """Run 1 full-builds (guard compiled out); run 2 applies the guard and
    merges on unique_key — source wins, unmatched target rows survive."""
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model(
        "inc",
        "SELECT k, v FROM src_feed {% if is_incremental() %} WHERE k >= 2 {% endif %}",
        materialization="incremental",
        unique_key="k",
    )
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").createOrReplaceTempView("src_feed")
    out1 = g.run(spark, table_dir=str(tmp_path))["inc"]
    assert sorted((r.k, r.v) for r in out1.collect()) == [(1, "a"), (2, "b")]

    # source advances: k=2 updated, k=3 new, k=1 touched but OUTSIDE the
    # incremental guard — its update must NOT land.
    spark.createDataFrame(
        [(1, "STALE"), (2, "B"), (3, "c")], "k int, v string"
    ).createOrReplaceTempView("src_feed")
    out2 = g.run(spark, table_dir=str(tmp_path))["inc"]
    assert sorted((r.k, r.v) for r in out2.collect()) == [(1, "a"), (2, "B"), (3, "c")]


def test_model_graph_incremental_this_highwater(spark, tmp_path):
    """`{{ this }}` resolves to the existing target — the classic
    max-timestamp high-water-mark guard only ingests rows beyond it."""
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model(
        "hw",
        "SELECT k FROM hw_feed "
        "{% if is_incremental() %} WHERE k > (SELECT MAX(k) FROM {{ this }}) {% endif %}",
        materialization="incremental",
    )
    spark.createDataFrame([(1,), (2,)], "k int").createOrReplaceTempView("hw_feed")
    g.run(spark, table_dir=str(tmp_path))
    spark.createDataFrame([(1,), (2,), (4,)], "k int").createOrReplaceTempView("hw_feed")
    out = g.run(spark, table_dir=str(tmp_path))["hw"]
    # no unique_key → append strategy; duplicates of 1/2 excluded by the guard
    assert sorted(r.k for r in out.collect()) == [1, 2, 4]


def test_model_graph_incremental_failed_batch_recovers(spark, tmp_path):
    """A failed incremental batch must NOT advance the version pointer:
    the write runs before the bump, so a retry merges onto the last good
    version instead of chasing a v{N+1} that never materialized."""
    import pytest

    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    g.add_model(
        "rec",
        "SELECT k, v FROM rec_feed {% if is_incremental() %} WHERE k >= 2 {% endif %}",
        materialization="incremental",
        unique_key="k",
    )
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").createOrReplaceTempView("rec_feed")
    g.run(spark, table_dir=str(tmp_path))

    # batch 2 fails: the source lost column v — analysis error mid-batch
    spark.createDataFrame([(2,), (3,)], "k int").createOrReplaceTempView("rec_feed")
    with pytest.raises(Exception):
        g.run(spark, table_dir=str(tmp_path))
    assert g._version["rec"] == 1  # pointer still at the last good build

    # source repaired: the SAME graph retries batch 2 successfully
    spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string").createOrReplaceTempView("rec_feed")
    out = g.run(spark, table_dir=str(tmp_path))["rec"]
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "a"), (2, "B"), (3, "c")]


def test_model_graph_rejects_this_outside_incremental():
    from nedp_etl_spark.models import ModelGraph

    g = ModelGraph()
    import pytest

    with pytest.raises(ValueError, match="incremental"):
        g.add_model("bad", "SELECT * FROM {{ this }}", materialization="view")


# --------------------------------------------------------------------------
# Registry snapshot-hygiene tripwires (round-6 postmortem: an uncommitted
# second @register("fn_url") swept into the end-of-round snapshot killed
# import for the whole round — CORRECTNESS_r06 was empty).  Two guards:
# the key count is pinned, and re-importing the package must be idempotent
# (a duplicate registration raises ValueError inside registry.register, so
# idempotent reimport + pinned count means no silent or crashing dupes).
# --------------------------------------------------------------------------

# Static @register sites; stream_transform_state joins at runtime when the
# protobuf bootstrap succeeds (streaming/transformstate.py gate).
EXPECTED_STATIC_KEYS = 423


def test_registry_key_count_pinned():
    from nedp_etl_spark.registry import queries

    n = len(queries())
    assert n in (EXPECTED_STATIC_KEYS, EXPECTED_STATIC_KEYS + 1), (
        f"registry has {n} keys; update EXPECTED_STATIC_KEYS deliberately "
        "when adding operators (this guard catches accidental dupes/drops)"
    )


def test_package_reimport_is_idempotent():
    import importlib

    import nedp_etl_spark
    from nedp_etl_spark.registry import queries

    before = set(queries())
    importlib.reload(nedp_etl_spark)  # re-running __init__ must not re-register
    after = set(queries())
    assert before == after


def test_survey_table_matches_registry():
    # SURVEY.md §2.3 is the judge's line-by-line coverage checklist — it is
    # GENERATED from the registry (round-7 postmortem: hand-synced rows
    # drifted twice).  The marked block must equal survey_table() verbatim;
    # on drift the fix is one command, printed in the assertion.
    import os

    import nedp_etl_spark  # noqa: F401 — trigger all @register sites
    from nedp_etl_spark import registry

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = open(os.path.join(here, "SURVEY.md")).read()
    i = s.index(registry.SURVEY_BEGIN) + len(registry.SURVEY_BEGIN)
    j = s.index(registry.SURVEY_END)
    assert s[i:j].strip() == registry.survey_table().strip(), (
        "SURVEY §2.3 drift — regenerate with: "
        "python -m nedp_etl_spark.registry --update-survey"
    )


# Pairs of keys whose oracle SQL is legitimately near-identical: same
# relational contract exercised through a DIFFERENT Spark surface (the
# udf_* family), a converged vs fixed-round variant, or QA readouts over
# the same derived relation.  Anything NOT listed here that exceeds the
# similarity bar is treated as a probable duplicate registration — the
# round-8 incident (three near-duplicate keys written before grepping the
# registry) caught two only by manual audit.
_SIMILAR_ORACLES_OK = {
    ("udf_pandas", "udf_scalar"),          # same contract, pandas vs row UDF
    ("stream_join_left_outer", "stream_stream_join"),  # same query, join TYPE is the point
    ("ts_seasonality_strength", "ts_stl_decompose"),  # strengths are DEFINED on that chain
    ("llm_dedup_cluster", "llm_dedup_cluster_converged"),  # fixed vs converged
    ("llm_knn_graph", "llm_semantic_lsh"),  # shared embedding-bucket spine
    ("join_range", "join_range_binned"),    # same join, binned plan variant
    ("llm_knn_graph", "llm_lsh_bucket_purity"),
    ("agg_cube", "agg_rollup"),             # grouping-set family pair
    ("llm_lsh_bucket_purity", "llm_semantic_lsh"),
    ("stream_state_reader", "stream_transform_state"),  # reader over same state
    ("agg_skew_twophase", "stream_transform_state"),    # same running-sum oracle
    ("agg_skew_twophase", "stream_foreachbatch"),
    ("agg_groupby", "tpch_q1"),             # TPC-H Q1 IS the groupby contract
    ("graph_triangle_count", "llm_dedup_near"),  # triangle QA over pair table
}


def test_oracle_similarity_tripwire():
    """Token-set Jaccard > 0.9 between two oracles means the two keys very
    likely compute the same thing — a duplicate registration unless the
    pair is explicitly allowlisted with a justification above."""
    import itertools
    import re

    import nedp_etl_spark as eng

    toks = {
        k: frozenset(
            re.findall(r"[a-z_][a-z0-9_]*|\d+|[^\sa-z0-9_]", sql.lower())
        )
        for k, sql in eng.oracle_sql().items()
    }
    offenders = []
    for a, b in itertools.combinations(sorted(toks), 2):
        ta, tb = toks[a], toks[b]
        j = len(ta & tb) / len(ta | tb)
        if j > 0.9 and (a, b) not in _SIMILAR_ORACLES_OK:
            offenders.append((round(j, 3), a, b))
    assert not offenders, (
        "near-identical oracle SQL — duplicate semantics? Either remove the"
        " redundant key or allowlist the pair with a justification in"
        f" _SIMILAR_ORACLES_OK: {sorted(offenders, reverse=True)}"
    )
