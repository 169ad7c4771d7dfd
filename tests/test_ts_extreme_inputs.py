"""Timestamp-extremes sweep: EVERY registry key must survive sentinel and
epoch-edge timestamps.

Eighth degenerate regime: corrupt upstream date parsers routinely emit
'9999-12-31' sentinels, zero epochs, and pre-Gregorian junk — parquet
timestamp[us] stores all of it, and Spark's JVM side is fine with it.
The hazard is the Python crossing: pyarrow→pandas conversion is
nanosecond-based, so any key moving a poisoned ts through a Pandas UDF /
applyInPandas / toPandas dies with "Out of bounds nanosecond timestamp"
(probed directly: 9999-12-31 crashes applyInPandas and toPandas).

Planted extremes (events.ts, orders.o_orderdate, lineitem.l_shipdate):
- id % 101 == 0 → 9999-12-31 23:59:59   (the sentinel classic)
- id % 103 == 0 → 1600-01-01 00:00:00   (below the Arrow-ns window,
                                          which starts 1677-09-21)
- id % 107 == 0 → 1970-01-01 00:00:00   (zero epoch, in-window)

Contract: "no crash" — any result shape is fine, raising is not.
"""

from __future__ import annotations

import os
import traceback
from datetime import datetime

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

_TS_COLS = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}
_ID_COLS = {"events": "event_id", "orders": "o_orderkey", "lineitem": "l_orderkey"}

_SENTINEL = datetime(9999, 12, 31, 23, 59, 59)
_ANCIENT = datetime(1600, 1, 1)
_EPOCH0 = datetime(1970, 1, 1)


@pytest.fixture(scope="module")
def tsx_dir(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", "tsx_fixtures")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t in _TS_COLS:
            c, k = _TS_COLS[t], _ID_COLS[t]
            df = df.withColumn(
                c,
                F.when(F.col(k) % 101 == 0, F.lit(_SENTINEL))
                .when(F.col(k) % 103 == 0, F.lit(_ANCIENT))
                .when(F.col(k) % 107 == 0, F.lit(_EPOCH0))
                .otherwise(F.col(c)),
            )
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_timestamp_extremes(spark, tsx_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, tsx_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on extreme timestamps:\n" + "\n".join(failures)


@pytest.mark.parametrize(
    "name", ["ts_gapfill", "ts_interpolate", "ts_forecast_linear"]
)
def test_sentinel_guarded_keys_stay_oracle_exact(spark, tsx_dir, name):
    # The plausible_event_time guard routes sentinel days out on the Spark
    # side; its WHERE mirror lives in the oracle SQL, and duck_connect
    # mirrors load()'s finite→NULL ingestion rewrite.  This pins the FULL
    # operator≡oracle contract on poisoned data — "no crash" alone let the
    # two sides diverge silently (ADVICE r11).
    from tests.oracle import compare

    compare(spark, name, tsx_dir)
