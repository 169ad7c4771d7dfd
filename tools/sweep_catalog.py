#!/usr/bin/env python3
"""Per-key catalog runner for degenerate-fixture sweeps (verbose timing).

Runs every registry key (or the keys given as argv) against a poisoned
fixture dir and prints per-key wall time + crash lines — the exploratory
form behind tests/test_*_inputs.py, useful because a pytest chunk hides
WHICH key is slow.  Fixture dir via SPARK_GRAFT_SWEEP_DIR (default: the
timestamp-extremes scratch fixtures).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402

import nedp_etl_spark as eng  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    qs = eng.queries()
    sweep_dir = os.environ.get(
        "SPARK_GRAFT_SWEEP_DIR", "/root/repo/_scratch/tsx_fixtures"
    )
    fails, slow = [], []
    for k in sys.argv[1:] or sorted(qs):
        t0 = time.time()
        try:
            qs[k](spark, sweep_dir).collect()
            status = "ok"
        except Exception:
            lines = [l for l in traceback.format_exc().splitlines() if l.strip()]
            status = "CRASH " + lines[-1][:160]
            fails.append(k)
        dt = time.time() - t0
        if dt > 20:
            slow.append((k, round(dt, 1)))
        print(f"{dt:7.1f}s {k} {status}", flush=True)
    print("TOTAL CRASHES:", len(fails), fails, flush=True)
    print("SLOW (>20s):", slow, flush=True)


if __name__ == "__main__":
    main()
