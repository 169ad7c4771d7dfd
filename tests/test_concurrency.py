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
