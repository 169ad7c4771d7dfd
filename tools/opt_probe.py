#!/usr/bin/env python
"""Optimization probe: for each named registry key, capture
``explain("formatted")`` to plans/<round>/<key>_<tag>.txt, time the query
cold (same ``df.count()`` action as bench.py), and optionally verify
against the DuckDB oracle at a small sf.

Usage:
    python tools/opt_probe.py --keys k1,k2 --tag before \
        [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--runs 2] \
        [--compare-sf /root/testdata/sf0.01] [--plans-dir plans/r13]

Writes one line per key to stdout: key, per-run seconds, compare verdict.
The session mirrors bench.py (local[cpus], AQE on, UTC) so timings are
bench-comparable; _scratch/derived tables are NOT wiped (pass
SPARK_GRAFT_BENCH_ONLY-style isolation through bench.py for official
numbers — this tool is for iterating).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--compare-sf", default=None)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import nedp_etl_spark as eng

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("opt-probe")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = eng.queries()
    # session warmup (mirrors bench.py's untimed warmup)
    try:
        qs["agg_global"](spark, args.sf_dir).count()
    except Exception:
        pass

    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    for k in keys:
        if k not in qs:
            print(f"{k}: UNKNOWN KEY")
            continue
        spark.sparkContext.setJobDescription(f"opt_probe:{k}")
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[k](spark, args.sf_dir)
            df.count()
            times.append(round(time.perf_counter() - t0, 3))
        if args.plans_dir and not args.no_explain:
            os.makedirs(os.path.join(ROOT, args.plans_dir), exist_ok=True)
            df = qs[k](spark, args.sf_dir)
            # execute THIS df's own QueryExecution (count()/noop-write each
            # build a separate one) so AQE's FINAL plan (isFinalPlan=true)
            # prints; registry outputs are small aggregates, collect is safe
            df.collect()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(ROOT, args.plans_dir, f"{k}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
        verdict = ""
        if args.compare_sf:
            from tests.oracle import compare

            try:
                compare(spark, k, args.compare_sf)
                verdict = "oracle-OK"
            except Exception as e:
                verdict = f"ORACLE-FAIL: {str(e)[:200]}"
        print(f"{k}: {times} {verdict}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
