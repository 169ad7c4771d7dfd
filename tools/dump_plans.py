#!/usr/bin/env python
"""Dump executed .explain("formatted") plans for named registry keys.

Each key's DataFrame is executed first (collect) so AQE's FINAL plan prints
(isFinalPlan=true), then the formatted explain is written to
plans/<round>/<key>_<tag>.txt — the before/after evidence convention of the
optimization rounds.

Usage:
    python tools/dump_plans.py --keys k1,k2 --tag after --round r14 \
        [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--out-root plans]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", dest="rnd", default="r14")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--out-root", default=os.path.join(ROOT, "plans"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import nedp_etl_spark as eng

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = eng.queries()
    out_dir = os.path.join(args.out_root, args.rnd)
    os.makedirs(out_dir, exist_ok=True)
    for key in [k.strip() for k in args.keys.split(",") if k.strip()]:
        t0 = time.perf_counter()
        df = qs[key](spark, args.sf_dir)
        df.collect()  # materialize so AQE's final plan prints
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n = buf.getvalue().count("\n")
        print(
            f"# {key}: {time.perf_counter() - t0:.2f}s, {n} plan lines -> {path}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
