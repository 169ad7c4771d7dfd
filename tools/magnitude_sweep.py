#!/usr/bin/env python
"""Full-registry EXACT-oracle sweep on the magnitude-extremes fixture.

Builds (or reuses) the planted fixture from tests/test_magnitude_inputs.py
in ``_scratch/`` and runs ``tests/oracle.py::compare`` for every
exact-oracle key (or a ``--keys a,b,c`` subset), printing one line per
failure and a final tally.  This is the opt-in whole-registry leg the
per-round pytest module samples; round-12 closing left an 8-key
NULL-semantics tail here (SCALE.md).

    python tools/magnitude_sweep.py                  # all exact keys
    python tools/magnitude_sweep.py --keys ts_holt   # subset
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def build_fixture(spark, sf_dir: str) -> str:
    from pyspark.sql import functions as F

    from nedp_etl_spark.data import TABLES, load
    from tests.test_magnitude_inputs import _EVENT_PLANTS, _fixture_tag

    out = os.path.join(ROOT, "_scratch", f"magnitude_fixtures_{_fixture_tag()}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        if t == "events":
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            col = F.col("value")
            for mod, val, _ in _EVENT_PLANTS:
                col = F.when(F.col("event_id") % mod == 0, F.lit(val)).otherwise(col)
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
                    F.transform("embedding", lambda x: F.lit(-1e300).cast("float")),
                )
                .when(
                    F.col("vec_id") % 13 == 0,
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="", help="comma-separated subset")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import nedp_etl_spark as eng
    from tests.oracle import compare

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fdir = build_fixture(spark, args.sf_dir)
    keys = (
        [k for k in args.keys.split(",") if k]
        if args.keys
        else sorted(eng.oracle_sql())
    )
    fails = []
    for i, k in enumerate(keys):
        try:
            compare(spark, k, fdir, allow_empty=True)
        except Exception:
            tail = traceback.format_exc().splitlines()[-1]
            fails.append((k, tail))
            print(f"FAIL {k}: {tail[:200]}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"# {i + 1}/{len(keys)} done, {len(fails)} failures", flush=True)
    print(f"magnitude_sweep: {len(keys) - len(fails)}/{len(keys)} exact, "
          f"{len(fails)} failures")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
