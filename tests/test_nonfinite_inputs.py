"""Non-finite sweep: EVERY registry key must survive NaN/±Inf doubles.

Seventh degenerate regime, the float cousin of the NULL-riddled sweep:
computed double columns in real pipelines carry NaN and ±Inf (upstream
divide-by-zero, overflowed feature transforms, degenerate encoders
emitting NaN embeddings) — parquet stores them happily.  Under ANSI mode
the repo's fixed-point quantize (`floor(x*1e6+0.5).cast('long')`) RAISES
on a non-finite input instead of silently wrapping, so any key summing a
poisoned column dies loudly — this sweep finds every such site.

Poisoned columns are the realistic computed-float carriers:
`events.value` (NaN on id%7==0, +Inf on id%11==0, -Inf on id%13==0) and
`embeddings.embedding` (NaN elements on id%7==0, an all-+Inf vector on
id%11==0).  TPC-H money columns stay finite — upstream junk there
manifests as NULL (already swept by test_null_inputs.py), not NaN.

Convention (mirrors the NULL sweep): a non-finite value carries no
usable magnitude — it quantizes to NULL (SQL aggregates skip it) or its
row routes out, never a crash and never a silent wraparound.

Contract: "no crash" — any result shape is fine, raising is not.
"""

from __future__ import annotations

import math
import os
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

_NAN, _PINF, _NINF = float("nan"), float("inf"), float("-inf")


@pytest.fixture(scope="module")
def nonfinite_dir(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", "nonfinite_fixtures")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 7 == 0, F.lit(_NAN))
                .when(F.col("event_id") % 11 == 0, F.lit(_PINF))
                .when(F.col("event_id") % 13 == 0, F.lit(_NINF))
                .otherwise(F.col("value")),
            )
        elif t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 7 == 0,
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i % 5 == 0, F.lit(_NAN).cast("float")
                        ).otherwise(x),
                    ),
                )
                .when(
                    F.col("vec_id") % 11 == 0,
                    F.transform("embedding", lambda x: F.lit(_PINF).cast("float")),
                )
                .otherwise(F.col("embedding")),
            )
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_nonfinite_doubles(spark, nonfinite_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, nonfinite_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on non-finite input:\n" + "\n".join(failures)
