"""Spark-free pin of tools/changed_keys.py (the _PRIORITY rotation feed).

The round-10 range (54e3256..12d2512, both committed) is immutable
history, so the harvest over it is a deterministic fixture: the tool must
(a) find the known robustness-fix keys, (b) attribute oracle-SQL hunks to
the key BELOW them (the ts_gapfill oracle edit must not leak to
ts_sessionize — the bug the AST rewrite fixed), and (c) drop keys the
given CORRECTNESS file already verified at the new rev's code version.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "changed_keys.py"


def _run(*args: str) -> str:
    return subprocess.run(
        [sys.executable, str(TOOL), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout


def test_round10_range_harvest():
    out = _run("54e3256", "12d2512", "--not-in", "CORRECTNESS_r10.json")
    keys = set(out.splitlines()[-1].split(","))
    # known round-10 robustness-fix keys (named in VERDICT round 10)
    assert {"agg_chisq_independence", "graph_hits", "llm_embed_covariance"} <= keys
    # keys CORRECTNESS_r10 verified at final round-10 HEAD must be dropped
    assert "agg_spearman_rho" not in keys and "llm_mmr_diversify" not in keys
    # shared modules are out of scope by design
    assert "data.py" not in out and "util.py" not in out


def test_oracle_constant_attributes_to_key_below():
    # the round-11 range edited _TS_GAPFILL_ORACLE (above ts_gapfill's
    # decorator): it must attribute to ts_gapfill, never ts_sessionize
    out = _run("f53d8a4", "b665d76")
    assert "ts_gapfill" in out
    assert "ts_sessionize" not in out


def test_stale_green_keys_invariants():
    """stale_green_keys feeds the _PRIORITY head (round-11 verdict task 1):
    every entry must be a registered key with a green row whose code
    changed since that round's swept rev, ordered oldest-green-first."""
    sys.path.insert(0, str(REPO / "tools"))
    from changed_keys import _latest_green_rounds, stale_green_keys
    from priority_check import registered_keys

    latest = _latest_green_rounds(str(REPO))
    stale = stale_green_keys()
    keys = registered_keys()
    assert set(stale) <= keys
    assert all(k in latest for k in stale)
    rounds = [latest[k] for k in stale]
    assert rounds == sorted(rounds)
    # the two round-11-verdict-named keys are stale until the r12 sweep
    # re-greens them (this assertion self-retires: once their latest green
    # round postdates the derived-table rewrite they drop out of the set)
    for k in ("llm_dedup_near", "llm_simhash"):
        assert latest[k] >= 12 or k in stale
