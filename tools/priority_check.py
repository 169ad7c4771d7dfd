#!/usr/bin/env python
"""Spark-free tripwire: driver-unverified keys must HEAD ``_PRIORITY``.

Round-8 and round-9 postmortems led with the same finding: the external
driver sweeps only a ~50-key PREFIX of the registry each round, and twice
the prefix was occupied by keys the driver had already verified while the
new, unverified keys sat invisible at positions 50+.  The manual rotation
fixed it each time but did not survive the round boundary, because new
keys are appended as they land while sweep results only arrive at round
end.  This check makes the rotation structural:

  * green  = union of CORRECTNESS_r*.json rows with err==None and
    rows_match (the driver's own cumulative record);
  * keys   = every ``register("...")`` site in the package source
    (static grep — no pyspark import, no JVM; runs in <1 s);
  * FAIL if any unverified key is missing from ``_PRIORITY``, or if any
    driver-verified key is listed AHEAD of any unverified key (a stale
    prefix: the driver would re-confirm old greens while the backlog
    stays invisible);
  * FAIL if any CHANGED-AFTER-GREEN key (code hunks since the rev its
    latest green round's sweep tested — computed mechanically by
    ``tools/changed_keys.stale_green_keys``) is missing from ``_PRIORITY``
    or trails an unchanged fresh-green key (round-11 verdict task 1: the
    old check validated only unverified-first, which passed while two
    rewrite-touched keys sat behind the prefix);
  * WARN (non-fatal) if the unverified backlog exceeds the ~50-row sweep
    budget — some keys will wait a round no matter the order.

Wired into ``make hygiene`` and ``.githooks/pre-commit``.  Exit 0 = OK.
"""

from __future__ import annotations

import ast
import glob
import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SWEEP_BUDGET = 50  # observed driver CORRECTNESS row budget per round

# `@register("key", ...)` decorator sites only — the lookbehind excludes
# method calls like `spark.udtf.register("tokenize_udtf", ...)`, which are
# Spark UDTF registrations, not registry keys (the one runtime-gated key
# registers through the same @register decorator as everything else).
_REGISTER_RE = re.compile(r"""(?<![.\w])register\(\s*\n?\s*["']([a-z0-9_]+)["']""")


def registered_keys() -> set[str]:
    keys: set[str] = set()
    for py in (ROOT / "nedp_etl_spark").rglob("*.py"):
        keys.update(_REGISTER_RE.findall(py.read_text()))
    return keys


def green_keys() -> set[str]:
    green: set[str] = set()
    for f in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("err") is None and v.get("rows_match"):
                green.add(k)
    return green


def priority_list() -> list[str]:
    """Parse ``_PRIORITY`` from registry.py source — no imports."""
    tree = ast.parse((ROOT / "nedp_etl_spark" / "registry.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_PRIORITY":
            return [ast.literal_eval(elt) for elt in node.value.elts]
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", "") == "_PRIORITY" for t in node.targets
        ):
            return [ast.literal_eval(elt) for elt in node.value.elts]
    raise SystemExit("priority_check: _PRIORITY not found in registry.py")


def changed_after_green() -> set[str]:
    """Keys whose code changed since the rev their latest green sweep
    tested.  Delegates to tools/changed_keys.py (git + ast, no Spark)."""
    sys.path.insert(0, str(ROOT / "tools"))
    from changed_keys import stale_green_keys

    return set(stale_green_keys("HEAD"))


def main() -> int:
    keys = registered_keys()
    green = green_keys() & keys
    prio = priority_list()
    unknown = [k for k in prio if k not in keys]
    if unknown:
        print(f"priority_check: FAIL — _PRIORITY names unregistered keys: {unknown}")
        return 1
    unverified = keys - green
    missing = sorted(unverified - set(prio))
    if missing:
        print(
            "priority_check: FAIL — driver-unverified keys absent from "
            f"_PRIORITY (they would trail in registration order, invisible "
            f"to the driver's ~{SWEEP_BUDGET}-key sweep): {missing}"
        )
        return 1
    changed = changed_after_green() & keys
    missing_changed = sorted(changed - set(prio) - unverified)
    if missing_changed:
        print(
            "priority_check: FAIL — changed-after-green keys absent from "
            f"_PRIORITY (their code changed since the driver last verified "
            f"them; re-verification must head the sweep): {missing_changed}"
        )
        return 1
    idx = {k: i for i, k in enumerate(prio)}
    # Keys needing (re-)verification: unverified + changed-after-green.
    backlog = unverified | changed
    max_backlog = max(idx[k] for k in backlog) if backlog else -1
    stale = sorted(
        (k for k in prio[: max_backlog + 1] if k in green and k not in backlog),
        key=idx.get,
    )
    if stale:
        print(
            "priority_check: FAIL — stale prefix: fresh-green keys are "
            f"listed ahead of keys needing (re-)verification in _PRIORITY; "
            f"the driver would spend sweep budget re-confirming "
            f"{len(stale)} greens while the backlog waits.  Move these "
            f"behind every backlog key: "
            f"{stale[:10]}{' ...' if len(stale) > 10 else ''}"
        )
        return 1
    if len(backlog) > SWEEP_BUDGET + 5:
        print(
            f"priority_check: WARN — {len(backlog)} backlog keys (unverified "
            f"+ changed-after-green) exceed the ~{SWEEP_BUDGET}-row sweep "
            "budget; some will wait a round. Prefer depth over new keys "
            "(round-9 verdict task 7)."
        )
    print(
        f"priority_check: OK — {len(keys)} keys, {len(green)} driver-green, "
        f"{len(unverified)} unverified, {len(changed)} changed-after-green, "
        "all heading _PRIORITY."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
