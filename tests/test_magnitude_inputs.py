"""Magnitude-extremes sweep: EVERY registry key must survive finite junk
magnitudes (huge doubles, boundary overflows, denormals).

Fourteenth degenerate regime, the finite cousin of the non-finite sweep:
real computed-float columns carry not just NaN/Inf but finite garbage —
unit-mixup corruptions (epoch-nanos landing in a measurement column reads
as ~1.7e18), sensor glitches at 1e300, and harmless denormals.  Parquet
stores all of them.  The failure mode is WORSE than the non-finite one:
under ANSI, Spark's ``floor(double)`` SATURATES to ``Long.MaxValue``
silently instead of raising, so one poison event silently corrupts every
downstream fixed-point aggregate, while the DuckDB oracle's ``CAST``
throws — divergence with zero errors on the Spark side (round-12 probe:
``floor(1e300*1e6+0.5).cast('long')`` → 9223372036854775807, no
exception).

Convention (extends the non-finite rule): a finite value whose magnitude
breaks the engine's fixed-point domain (|x| >= ``data.VALUE_ABS_MAX`` =
9.2e12, beyond which ``x*1e6`` exceeds int64) carries no usable
magnitude — it NULLs at the ingestion seam, exactly like NaN/Inf.
Denormals and tiny values are VALID magnitudes (they quantize to 0) and
must flow through untouched — the fixture plants them to catch
over-aggressive filtering.

Two legs: the no-crash sweep over all keys, and EXACT oracle compares on
events/embeddings consumers (tests/oracle.py's table views mirror the
ingestion bound, so operator ≡ oracle must hold on the poisoned fixture
too, not just not-crash).
"""

from __future__ import annotations

import hashlib
import os
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, VALUE_ABS_MAX, load

_MAX_DOUBLE = 1.7976931348623157e308
_DENORMAL = 5e-324

# (modulus, planted value, is_valid_magnitude)
_EVENT_PLANTS = [
    (7, 1e300, False),            # huge positive
    (11, -1e300, False),          # huge negative
    (13, 9.3e12, False),          # just over the domain bound
    (17, _MAX_DOUBLE, False),     # largest finite double
    (19, _DENORMAL, True),        # denormal: VALID, must survive
    (23, -1e9, True),             # large-but-in-domain: VALID
]
# Deliberately NOT planted: magnitudes just UNDER the bound (e.g. 9.1e12).
# Per-value they are in-domain, but hundreds of them would overflow even
# an int64 SUM of quantized values — that is the separate sum-headroom
# dimension the osum/limb disciplines own (magnitude × rowcount), not the
# per-value ingestion bound this regime pins.  See SCALE.md round 12.


def _fixture_tag() -> str:
    payload = repr((_EVENT_PLANTS, VALUE_ABS_MAX))
    return hashlib.md5(payload.encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def magnitude_dir(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", f"magnitude_fixtures_{_fixture_tag()}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        if t == "events":
            # plant on the RAW column (read the file directly, bypassing
            # load's normalization): the sweep exercises ingestion itself
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            col = F.col("value")
            for mod, val, _ in _EVENT_PLANTS:
                col = F.when(F.col("event_id") % mod == 0, F.lit(val)).otherwise(
                    col
                )
            df = df.withColumn("value", col)
        elif t == "embeddings":
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 7 == 0,
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i % 5 == 0, F.lit(1e300).cast("float")
                        ).otherwise(x),
                    ),
                )
                .when(
                    F.col("vec_id") % 11 == 0,
                    F.transform(
                        "embedding", lambda x: F.lit(-1e300).cast("float")
                    ),
                )
                .when(
                    F.col("vec_id") % 13 == 0,
                    # denormal elements: VALID magnitudes, must survive
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i % 3 == 0, F.lit(1e-38).cast("float")
                        ).otherwise(x),
                    ),
                )
                .otherwise(F.col("embedding")),
            )
        else:
            df = load(spark, sf_dir, t)
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


def test_ingestion_bound_keeps_valid_magnitudes(spark, magnitude_dir):
    """Denormals and just-under-bound values flow through; junk NULLs."""
    ev = load(spark, magnitude_dir, "events")
    # pure residues only: the when-chain gives composite ids (7·19, 7·23…)
    # the LAST plant's value, so e.g. id % 161 == 0 rows legitimately carry
    # the valid -1e9 plant, not the huge one
    eid = F.col("event_id")
    pure = lambda mod: (eid % mod == 0) & ~sum(  # noqa: E731
        [(eid % m == 0).cast("int") for m, _, _ in _EVENT_PLANTS if m != mod],
        F.lit(0),
    ).cast("boolean")
    rows = ev.select(
        F.count(F.when(pure(19), 1)).alias("n19"),
        F.count(F.when(pure(19) & F.col("value").isNotNull(), 1)).alias(
            "n19_kept"
        ),
        F.count(F.when(pure(7), 1)).alias("n7"),
        F.count(F.when(pure(7) & F.col("value").isNotNull(), 1)).alias(
            "n7_kept"
        ),
    ).collect()[0]
    assert rows["n19"] > 0 and rows["n7"] > 0
    assert rows["n19_kept"] == rows["n19"], "denormals were over-filtered"
    assert rows["n7_kept"] == 0, "huge magnitudes leaked through ingestion"


@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_magnitude_extremes(spark, magnitude_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, magnitude_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on magnitude extremes:\n" + "\n".join(
        failures
    )


def _consumer_keys(table: str, n: int) -> list[str]:
    """First n exact-oracle keys whose source reads ``table``."""
    import inspect

    qs, exact = eng.queries(), set(eng.oracle_sql())
    hits = []
    for k in sorted(exact):
        try:
            src = inspect.getsource(qs[k])
        except (OSError, TypeError):
            continue
        if f'"{table}"' in src:
            hits.append(k)
        if len(hits) >= n:
            break
    return hits


@pytest.mark.parametrize(
    "name", _consumer_keys("events", 4) + _consumer_keys("embeddings", 3)
)
def test_consumers_stay_oracle_exact_on_magnitude_fixture(
    spark, magnitude_dir, name
):
    from tests.oracle import compare

    compare(spark, name, magnitude_dir)
