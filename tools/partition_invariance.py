#!/usr/bin/env python3
"""Partition-invariance sweep: results must not depend on input layout.

At 100 TB the physical layout of a table — how many files, which rows
share a task partition, the order rows arrive in — is an accident of the
writer, and it CHANGES run to run (AQE coalescing, compaction, upstream
repartitions).  Every claim the repo makes about determinism (fixed-point
limb sums, derandomized sampling, two-phase prefix sums, per-partition
partials) reduces to one mechanical property: the same rows in a
different layout must produce the SAME result.

This sweep rewrites the sf0.001 fixtures twice — once as a single file,
once round-robin across 7 files (prime, ≠ the 8 shuffle partitions) —
and runs every registry key on both, comparing the collected results two
ways:

- q6 (the oracle-gate canonicalization: floats rounded to 6 dp) — a
  mismatch here is a REAL nondeterminism bug: the driver's value hash
  would flip between runs on a re-layout.
- strict (full float repr) — a mismatch here but not at q6 is last-ulp
  IEEE drift from partition-order-dependent double summation; cataloged
  so the fixed-point discipline's boundary is visible.

Usage: python tools/partition_invariance.py [key ...]
Exit code 1 on any q6 mismatch.  Writes a JSON report next to itself.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _norm_cell_strict(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _norm(cols, rows, cell):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def build_fixtures(spark):
    from nedp_etl_spark.data import TABLES, load

    dirs = {}
    for label, n in (("pinv_one", 1), ("pinv_seven", 7)):
        out = os.path.join(REPO, "_scratch", label)
        for t in TABLES:
            p = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(p):
                df = load(spark, SF_DIR, t)
                df = df.coalesce(1) if n == 1 else df.repartition(n)
                df.write.mode("overwrite").parquet(p)
        dirs[label] = out
    return dirs["pinv_one"], dirs["pinv_seven"]


def main() -> int:
    from pyspark.sql import SparkSession

    import nedp_etl_spark as eng
    from oracle import _norm_cell as _norm_cell_q6

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("partition-invariance-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    one_dir, seven_dir = build_fixtures(spark)
    qs = eng.queries()
    # Layout-dependent BY DESIGN: the operator's output IS the physical
    # layout (file count, per-file stats).  Mirrored in
    # tests/test_partition_invariance.py.
    by_design = {"scan_file_metadata"}
    keys = sys.argv[1:] or sorted(k for k in qs if k not in by_design)

    q6_fail, ulp_drift, errors = [], [], []
    t0 = time.time()
    for i, k in enumerate(keys):
        try:
            d1 = qs[k](spark, one_dir)
            r1, c1 = [tuple(r) for r in d1.collect()], d1.columns
            d7 = qs[k](spark, seven_dir)
            r7, c7 = [tuple(r) for r in d7.collect()], d7.columns
            if sorted(c1) != sorted(c7):
                q6_fail.append({"key": k, "why": f"columns {c1} vs {c7}"})
                continue
            n1 = _norm(c1, r1, _norm_cell_q6)
            n7 = _norm(c7, r7, _norm_cell_q6)
            if n1 != n7:
                only1 = [r for r in n1 if r not in set(n7)][:3]
                only7 = [r for r in n7 if r not in set(n1)][:3]
                q6_fail.append(
                    {"key": k, "why": "q6 value mismatch",
                     "rows": (len(n1), len(n7)),
                     "one_only": [list(r) for r in only1],
                     "seven_only": [list(r) for r in only7]}
                )
            elif _norm(c1, r1, _norm_cell_strict) != _norm(
                c7, r7, _norm_cell_strict
            ):
                ulp_drift.append(k)
        except Exception:
            errors.append(
                {"key": k, "why": traceback.format_exc().splitlines()[-1]}
            )
        if (i + 1) % 50 == 0:
            print(
                f"[{i + 1}/{len(keys)}] {time.time() - t0:.0f}s "
                f"q6_fail={len(q6_fail)} ulp={len(ulp_drift)} err={len(errors)}",
                flush=True,
            )

    report = {
        "keys": len(keys),
        "q6_mismatch": q6_fail,
        "ulp_drift_only": sorted(ulp_drift),
        "errors": errors,
        "elapsed_s": round(time.time() - t0, 1),
    }
    out = os.path.join(HERE, "partition_invariance_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                      for k, v in report.items()}))
    print(f"report: {out}")
    spark.stop()
    return 1 if (q6_fail or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
