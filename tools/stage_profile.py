#!/usr/bin/env python
"""Stage-level profile of one registry key via the Spark UI REST API:
runs the key N times in a bench-shaped session (UI enabled) and prints the
slowest stages with duration, task count, input/shuffle volumes — the
guide-§7.1 empirical loop without a browser.

Usage: python tools/stage_profile.py --key agg_spearman_rho [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import nedp_etl_spark as eng

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("stage-profile")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    qs = eng.queries()
    qs["agg_global"](spark, args.sf_dir).count()

    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    warm = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    warm_ids = {s["stageId"] for s in warm}

    for i in range(args.runs):
        t0 = time.perf_counter()
        qs[args.key](spark, args.sf_dir).count()
        print(f"run {i}: {time.perf_counter() - t0:.2f}s  load={os.getloadavg()[0]:.1f}")

    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    # keep only stages submitted after the warmup mark (ADVICE r13: the
    # mark was computed but unused, pooling warmup stages into the profile)
    stages = [
        s
        for s in stages
        if s.get("status") == "COMPLETE" and s["stageId"] not in warm_ids
    ]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"\ntop stages by executorRunTime (all {args.runs} runs pooled):")
    print(f"{'stage':>6} {'runTime_s':>9} {'wall_s':>7} {'tasks':>5} {'in_MB':>7} {'sh_r_MB':>8} {'sh_w_MB':>8}  name")
    for s in stages[: args.top]:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        wall = ""
        try:
            from datetime import datetime

            f = "%Y-%m-%dT%H:%M:%S.%f%Z"
            wall = f"{(datetime.strptime(comp.replace('GMT',''), '%Y-%m-%dT%H:%M:%S.%f') - datetime.strptime(sub.replace('GMT',''), '%Y-%m-%dT%H:%M:%S.%f')).total_seconds():.2f}"
        except Exception:
            pass
        print(
            f"{s['stageId']:>6} {s['executorRunTime']/1000:>9.2f} {wall:>7} "
            f"{s['numCompleteTasks']:>5} {s['inputBytes']/1e6:>7.1f} "
            f"{s['shuffleReadBytes']/1e6:>8.1f} {s['shuffleWriteBytes']/1e6:>8.1f}  "
            f"{s['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
