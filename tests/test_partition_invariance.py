"""Partition-invariance sweep (opt-in): every key must produce the SAME
result when the input tables are re-laid-out — one file vs 7 round-robin
files (prime, ≠ the 8 shuffle partitions), identical rows.

At 100 TB the physical layout is an accident of the writer and changes
run to run (compaction, AQE coalescing, upstream repartitions).  Every
determinism claim in the repo — fixed-point limb sums, derandomized
sampling, two-phase prefix sums, per-partition partials — reduces to this
one mechanical property.  The round-10 catalog ran the FULL 424-key
registry both ways and compared value multisets at the oracle gate's q6
canonicalization AND at strict float repr:

- q6 mismatches: 2 → 1 fixed (`stream_watermark_late` replayed
  file-per-trigger, so a multi-file layout advanced the watermark between
  part files and dropped rows "late" only by accident of layout — now a
  single availableNow batch, `streaming/windows.py`), 1 by design
  (`scan_file_metadata` REPORTS the physical layout: n_files and
  per-file stats are the operator's output, allowlisted below).
- strict (last-ulp IEEE) drift: **0 of 424** — the fixed-point/decimal
  discipline holds bit-exactly under re-layout, not just at q6.

Kept opt-in (two full registry passes, ~8.5 min; the empty/NULL/one-row
sweeps run by default):

    SPARK_GRAFT_PINV_SWEEP=1 python -m pytest tests/test_partition_invariance.py -q

`tools/partition_invariance.py` is the standalone form (adds the strict
ulp-drift catalog and a JSON report).
"""

from __future__ import annotations

import os
import sys
import traceback

import pytest

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle import _norm_cell  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PINV_SWEEP") != "1",
    reason="opt-in wide sweep (catalog ran round 10: 1 fixed, 1 by-design); "
    "set SPARK_GRAFT_PINV_SWEEP=1",
)

# Layout-dependent BY DESIGN: the operator's output IS the physical layout
# (file count, per-file row/byte stats).  Anything else appearing here
# needs a fix, not an allowlist entry.
_LAYOUT_IS_THE_OUTPUT = {"scan_file_metadata"}


@pytest.fixture(scope="module")
def pinv_dirs(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = []
    for label, n in (("pinv_one", 1), ("pinv_seven", 7)):
        out = os.path.join(here, "_scratch", label)
        for t in TABLES:
            p = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(p):
                df = load(spark, sf_dir, t)
                df = df.coalesce(1) if n == 1 else df.repartition(n)
                df.write.mode("overwrite").parquet(p)
        dirs.append(out)
    return tuple(dirs)


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.mark.parametrize("chunk", range(8))
def test_every_key_is_partition_invariant(spark, pinv_dirs, chunk):
    one_dir, seven_dir = pinv_dirs
    qs = eng.queries()
    keys = sorted(k for k in qs if k not in _LAYOUT_IS_THE_OUTPUT)
    failures = []
    for k in keys[chunk::8]:
        try:
            d1 = qs[k](spark, one_dir)
            n1 = _norm(d1.columns, [tuple(r) for r in d1.collect()])
            d7 = qs[k](spark, seven_dir)
            n7 = _norm(d7.columns, [tuple(r) for r in d7.collect()])
            if n1 != n7:
                only1 = [r for r in n1 if r not in set(n7)][:2]
                only7 = [r for r in n7 if r not in set(n1)][:2]
                failures.append(
                    f"{k}: rows {len(n1)} vs {len(n7)}; "
                    f"one-only {only1} seven-only {only7}"
                )
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "layout-dependent keys:\n" + "\n".join(failures)
