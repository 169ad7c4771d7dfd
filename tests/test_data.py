"""Fixture-drift canary for the events loader.

Round-2 postmortem: the driver regenerated ``events.parquet`` from parquet
TIMESTAMP(NANOS) (reads as int64 under ``nanosAsLong``) to timestamp[us]
(reads as TIMESTAMP_NTZ), and the loader's unconditional ``ts div 1000``
broke ~35 operators at analysis time.  This test writes a tiny events table
in BOTH encodings and asserts ``data.load`` returns identical µs-timestamp
values for each, so the next fixture regeneration fails here first, not in
the driver's correctness gate.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from nedp_etl_spark.data import _DF_CACHE, load


# Epoch-micros chosen so nanos (x1000) exceed 2^53 — catches any float
# round-trip sneaking back into the conversion.
_MICROS = [1704067200_000000, 1704067201_123456, 1704070000_999999]


def _write_events(path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(tbl, path)


def test_events_loader_handles_both_fixture_encodings(spark, tmp_path):
    # Generation A: parquet TIMESTAMP(NANOS) — Spark reads int64 under
    # spark.sql.legacy.parquet.nanosAsLong=true.
    dir_ns = tmp_path / "gen_ns"
    dir_ns.mkdir()
    _write_events(
        str(dir_ns / "events.parquet"),
        pa.array([m * 1000 for m in _MICROS], pa.timestamp("ns")),
    )
    # Generation B: timestamp[us] — current driver fixtures.
    dir_us = tmp_path / "gen_us"
    dir_us.mkdir()
    _write_events(
        str(dir_us / "events.parquet"),
        pa.array(_MICROS, pa.timestamp("us")),
    )

    # Exact integer construction: fromtimestamp(m / 1e6) pushes ~1.7e15
    # micros through a double (16 significant digits) and leans on
    # microsecond rounding (ADVICE r3).
    expected = [
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=m)
        for m in _MICROS
    ]
    try:
        for d in (dir_ns, dir_us):
            df = load(spark, str(d), "events")
            assert df.schema["ts"].dataType.typeName() == "timestamp", str(d)
            got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
            assert got == expected, f"{d}: {got} != {expected}"
    finally:
        # Don't pollute the session-scoped plan cache with tmp dirs.
        for k in [k for k in _DF_CACHE if str(tmp_path) in k[1]]:
            del _DF_CACHE[k]


def test_events_loader_real_fixtures(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(1).count() == 1


def test_all_tables_consistent_across_scale_factors(spark):
    """Cross-SF schema canary: every fixture table must load with an
    identical schema at all three scale factors — the generalization of the
    events-encoding lesson (a driver-side fixture regeneration should fail
    HERE, not in the correctness gate)."""
    import os

    from nedp_etl_spark.data import TABLES, load

    dirs = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1") if os.path.isdir(d)]
    assert dirs, "no fixture dirs present"
    for name in TABLES:
        schemas = {d: load(spark, d, name).schema.simpleString() for d in dirs}
        assert len(set(schemas.values())) == 1, (name, schemas)


def test_run_sql_literal_aware_binding(spark):
    """run_sql must not rewrite table words inside string literals or
    comments, and must reject SQL containing raw braces (they would be
    swallowed or misparsed by format-style parameter binding)."""
    import pytest

    from nedp_etl_spark.data import run_sql

    sf = "/root/testdata/sf0.001"
    # 'orders' inside a literal and a comment stays text; the FROM orders
    # reference binds.  The query result proves both behaviors at once.
    rows = run_sql(
        spark,
        sf,
        """
        -- orders in a comment must not bind
        SELECT 'orders' AS lit, COUNT(*) AS n
        FROM orders /* orders again */
        """,
        ["orders"],
    ).collect()
    assert rows[0]["lit"] == "orders" and rows[0]["n"] > 0

    # Escaped-quote literal containing a table word stays intact.
    rows = run_sql(
        spark, sf,
        "SELECT 'it''s the orders table' AS lit FROM region LIMIT 1",
        ["orders", "region"],
    ).collect()
    assert rows[0]["lit"] == "it's the orders table"

    with pytest.raises(ValueError, match="literal '{' or '}'"):
        run_sql(spark, sf, "SELECT '{bad}' FROM orders", ["orders"])
