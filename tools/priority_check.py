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
    idx = {k: i for i, k in enumerate(prio)}
    max_unver = max(idx[k] for k in unverified) if unverified else -1
    stale = sorted((k for k in prio[: max_unver + 1] if k in green), key=idx.get)
    if stale:
        print(
            "priority_check: FAIL — stale prefix: driver-verified keys are "
            f"listed ahead of unverified ones in _PRIORITY; the driver "
            f"would spend sweep budget re-confirming {len(stale)} greens "
            f"while the backlog waits.  Move these behind every unverified "
            f"key: {stale[:10]}{' ...' if len(stale) > 10 else ''}"
        )
        return 1
    if len(unverified) > SWEEP_BUDGET + 5:
        print(
            f"priority_check: WARN — {len(unverified)} unverified keys exceed "
            f"the ~{SWEEP_BUDGET}-row sweep budget; some will wait a round. "
            "Prefer depth over new keys (round-9 verdict task 7)."
        )
    print(
        f"priority_check: OK — {len(keys)} keys, {len(green)} driver-green, "
        f"{len(unverified)} unverified, all heading _PRIORITY."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
