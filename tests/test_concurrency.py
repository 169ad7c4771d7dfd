"""Concurrent-consumer tripwire: registry queries issued from thread pools.

Real thin-client Spark applications issue queries from many threads on one
shared session (a BI server, a notebook gateway, the SparkSession is
documented thread-safe).  The repo's own session-scoped machinery must
hold up under that: the round-12 review found ``derived_table`` raced on
a cold cache — two concurrent consumers could both miss ``_PAIRS_CACHE``
and overwrite-write the SAME scratch parquet path mid-read-registration.
The fix serializes the build under a module lock with a double-check, so
the race loser reuses the winner's materialization.

The tripwire runs the two derived-table families' consumers CONCURRENTLY
on a cold cache (``spark.newSession()`` has a fresh sessionUUID, which is
the cache key) and asserts each thread's result equals the sequential
run — value-identical, not just no-crash.
"""

from __future__ import annotations

import os
import threading

import pytest

import nedp_etl_spark as eng

_CONSUMERS = [
    "llm_candidate_compare",   # simhash_pairs + candidate_pairs
    "llm_dedup_cluster",       # candidate_pairs
    "graph_triangle_count",    # candidate_pairs
    "llm_dedup_simhash",       # simhash_pairs
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_derived_table_consumers_race_clean(spark, sf_dir):
    qs = eng.queries()
    expected = {k: _rows(qs[k](spark, sf_dir)) for k in _CONSUMERS}

    cold = spark.newSession()  # fresh sessionUUID -> cold _PAIRS_CACHE
    results: dict[str, list] = {}
    errors: dict[str, str] = {}

    def run(k: str) -> None:
        try:
            results[k] = _rows(qs[k](cold, sf_dir))
        except Exception as e:  # noqa: BLE001 — the assert reports it
            errors[k] = repr(e)

    threads = [threading.Thread(target=run, args=(k,)) for k in _CONSUMERS]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errors, f"concurrent consumers crashed: {errors}"
    for k in _CONSUMERS:
        assert results[k] == expected[k], (
            f"{k}: concurrent result diverges from sequential — the "
            "derived-table build raced"
        )


# --------------------------------------------------------------------------
# Cross-tenant fixture isolation: the same query issued CONCURRENTLY at two
# DIFFERENT fixture dirs on one shared session must each read its own data.
#
# The hazard this pins: session-global temp views.  A query written as
# ``createOrReplaceTempView("orders")`` + ``spark.sql`` races on the shared
# name — spark.sql binds views eagerly, so the loser of the registration
# race silently analyzes against the winner's fixture and returns the
# OTHER tenant's answer (wrong data, no error).  The registry's SQL-text
# queries therefore bind tables via parameterized ``spark.sql``
# (``data.run_sql`` / ``{df}`` args), which introduces no shared name.
# The keys below are exactly the former temp-view registrants.
# --------------------------------------------------------------------------

_TENANT_KEYS = [
    "agg_percentile_exact",  # formerly __pct_lineitem
    "udtf_native",           # formerly _udtf_docs (+ LATERAL)
    "filter_subquery",       # formerly orders/lineitem/customer bare views
    "cte_chain",             # formerly orders/customer bare views
]

_ROUNDS = 3


def _other_sf(sf_dir: str) -> str:
    alt = "/root/testdata/sf0.01"
    if os.path.normpath(sf_dir) == os.path.normpath(alt):
        alt = "/root/testdata/sf0.001"
    return alt


def test_same_key_two_fixture_dirs_race_clean(spark, sf_dir):
    other = _other_sf(sf_dir)
    if not os.path.isdir(other):
        pytest.skip(f"second fixture dir missing: {other}")
    qs = eng.queries()
    expected = {
        (k, d): _rows(qs[k](spark, d))
        for k in _TENANT_KEYS
        for d in (sf_dir, other)
    }

    for _ in range(_ROUNDS):
        barrier = threading.Barrier(2 * len(_TENANT_KEYS))
        results: dict[tuple[str, str], list] = {}
        errors: dict[tuple[str, str], str] = {}

        def run(k: str, d: str) -> None:
            try:
                q = qs[k]
                barrier.wait(60)  # maximize registration/analysis overlap
                results[(k, d)] = _rows(q(spark, d))
            except Exception as e:  # noqa: BLE001 — the assert reports it
                errors[(k, d)] = repr(e)

        threads = [
            threading.Thread(target=run, args=(k, d))
            for k in _TENANT_KEYS
            for d in (sf_dir, other)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        assert not errors, f"concurrent tenants crashed: {errors}"
        for key, rows in results.items():
            assert rows == expected[key], (
                f"{key}: concurrent result diverges from sequential — a "
                "session-global name leaked across fixture dirs"
            )


# --------------------------------------------------------------------------
# Full-registry tenant sweep (opt-in: SPARK_GRAFT_TENANT_SWEEP=1): every
# registry key runs oracle-exact on the shared session while an antagonist
# thread continuously re-runs a former temp-view registrant at the OTHER
# fixture dir.  This is the thirteenth regime's catalog pass — the twelve
# data regimes vary what the query reads; this one varies who else is on
# the session while it reads it.  The default-run tripwire above covers
# the four keys whose hazard was proven; the sweep asserts the other 420
# carry no shared-session state of their own (memoized sibling sessions,
# scratch parquet, catalog tables, stream sinks are all per-(key, sf) by
# construction — this verifies it empirically, oracle-exact not no-crash).
# --------------------------------------------------------------------------


def test_full_registry_tenant_sweep(spark, sf_dir):
    if os.environ.get("SPARK_GRAFT_TENANT_SWEEP") != "1":
        pytest.skip("full tenant sweep is opt-in: SPARK_GRAFT_TENANT_SWEEP=1")
    from tests.oracle import compare

    other = _other_sf(sf_dir)
    if not os.path.isdir(other):
        pytest.skip(f"second fixture dir missing: {other}")
    qs, exact = eng.queries(), set(eng.oracle_sql())

    stop = threading.Event()
    antagonist_err: list[str] = []

    def antagonist() -> None:
        # a former bare-view registrant, now parameter-bound: exercises the
        # exact name-collision surface the regime exists for, plus a steady
        # stream of competing jobs/scans at the other tenant's fixture
        q = qs["filter_subquery"]
        while not stop.is_set():
            try:
                q(spark, other).collect()
            except Exception as e:  # noqa: BLE001 — surfaced in the assert
                antagonist_err.append(repr(e))
                return

    t = threading.Thread(target=antagonist, daemon=True)
    t.start()
    failures: dict[str, str] = {}
    try:
        for name in sorted(qs):
            try:
                if name in exact:
                    compare(spark, name, sf_dir)
                else:
                    df = qs[name](spark, sf_dir)
                    assert df.count() >= 0
            except Exception as e:  # noqa: BLE001 — collected for the report
                failures[name] = repr(e)[:300]
    finally:
        stop.set()
        t.join(120)
    assert not antagonist_err, f"antagonist tenant crashed: {antagonist_err[:1]}"
    assert not failures, (
        f"{len(failures)} keys diverged/crashed under a concurrent tenant: "
        f"{dict(sorted(failures.items())[:10])}"
    )
