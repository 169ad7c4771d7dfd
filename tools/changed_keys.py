#!/usr/bin/env python3
"""List registered query keys whose implementing code changed in a git range.

The `_PRIORITY` rotation needs "keys whose code changed AFTER their last
driver-green row" every round; harvesting that list by eye missed keys
twice (round-9/10 postmortems) and took a judge session to reconstruct.
This makes it mechanical and attribution-accurate:

  * each ``@register("key", ...)``-decorated top-level function's span is
    its AST range (first decorator line .. end of body);
  * a diff hunk inside that span changes that key;
  * a hunk BETWEEN spans (oracle SQL constants, per-key helpers — which
    by repo convention sit directly ABOVE their key's decorator) is
    attributed to the NEXT register site below it;
  * shared cross-key modules (data.py, util.py, registry.py) are
    deliberately out of scope — changing those touches everything and
    must be judged by hand.

Spark-free (git + ast only).

Usage:
    python tools/changed_keys.py <old-rev> [<new-rev>]       # default HEAD
    python tools/changed_keys.py <old-rev> --not-in CORRECTNESS_r10.json
        # additionally drop keys already driver-verified at <new-rev>'s
        # code version (rows in the given CORRECTNESS file)
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
import sys

_HUNK_RE = re.compile(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", re.M)
_SHARED = ("nedp_etl_spark/data.py", "nedp_etl_spark/util.py",
           "nedp_etl_spark/registry.py", "nedp_etl_spark/engine.py")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, check=True
    ).stdout


_GATED_RE = re.compile(r"""register\(\s*["']([a-z0-9_]+)["']""")


def _register_name(dec: ast.expr) -> str | None:
    if (
        isinstance(dec, ast.Call)
        and isinstance(dec.func, ast.Name)
        and dec.func.id == "register"
        and dec.args
        and isinstance(dec.args[0], ast.Constant)
        and isinstance(dec.args[0].value, str)
    ):
        return dec.args[0].value
    return None


def _gated_registrars(src: str, tree: ast.Module) -> dict[str, str]:
    """{decorator_name: key} for runtime-gated registration wrappers — a
    bare-Name decorator whose own def calls ``register("key", ...)``
    (e.g. transformstate._register_if_supported, which only registers
    stream_transform_state when the protobuf dep imports)."""
    lines = src.splitlines()
    out: dict[str, str] = {}
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if any(_register_name(d) for d in node.decorator_list):
            continue
        body = "\n".join(lines[node.lineno - 1 : node.end_lineno])
        m = _GATED_RE.search(body)
        if m:
            out[node.name] = m.group(1)
    return out


def _node_key(node: ast.AST, gated: dict[str, str]) -> str | None:
    """The registry key a top-level function registers under, through the
    plain @register decorator or a gated wrapper decorator."""
    for dec in node.decorator_list:
        name = _register_name(dec)
        if name:
            return name
        if isinstance(dec, ast.Name) and dec.id in gated:
            return gated[dec.id]
    return None


def _key_spans(src: str) -> list[tuple[str, int, int]]:
    """[(key, first_decorator_line, body_end_line)] for top-level
    registered functions (plain or gated decorator), in source order."""
    tree = ast.parse(src)
    gated = _gated_registrars(src, tree)
    out = []
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        name = _node_key(node, gated)
        if name:
            start = min(d.lineno for d in node.decorator_list)
            out.append((name, start, node.end_lineno or node.lineno))
    return out


def _helper_spans(src: str) -> list[tuple[str, int, int]]:
    """[(fn_name, start, end)] for top-level defs that are NOT register
    sites — shared helpers whose changes affect every key that calls them,
    including keys in OTHER files (round-12: the _stream_events trigger
    rewrite changed three stateful streaming keys' behavior, two of them
    in files the diff never touched)."""
    tree = ast.parse(src)
    gated = _gated_registrars(src, tree)
    out = []
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if _node_key(node, gated) or node.name in gated:
            continue
        start = min([d.lineno for d in node.decorator_list] + [node.lineno])
        out.append((node.name, start, node.end_lineno or node.lineno))
    return out


_PKG_SRC_CACHE: dict[str, list[tuple[str, str]]] = {}
_REF_CACHE: dict[tuple[str, str], list[str]] = {}


def _pkg_sources(new: str) -> list[tuple[str, str]]:
    """[(path, source)] for every package .py at rev ``new`` (one git
    batch per rev, memoized — _keys_referencing runs per helper hunk)."""
    cached = _PKG_SRC_CACHE.get(new)
    if cached is None:
        cached = []
        for f in _git("ls-tree", "-r", "--name-only", new).splitlines():
            if f.startswith("nedp_etl_spark/") and f.endswith(".py"):
                try:
                    cached.append((f, _git("show", f"{new}:{f}")))
                except subprocess.CalledProcessError:
                    continue
        _PKG_SRC_CACHE[new] = cached
    return cached


def _keys_referencing(helper: str, new: str) -> list[str]:
    """Registered keys (package-wide, at rev ``new``) whose function body
    references ``helper`` by name.  Name-level match — a false positive
    merely re-verifies an unchanged key, which is cheap and safe."""
    memo = _REF_CACHE.get((helper, new))
    if memo is not None:
        return memo
    hits: list[str] = []
    ref = re.compile(rf"(?<![\w.]){re.escape(helper)}\s*\(")
    for f, src in _pkg_sources(new):
        if helper not in src:
            continue
        try:
            tree = ast.parse(src)
        except SyntaxError:
            continue
        gated = _gated_registrars(src, tree)
        lines = src.splitlines()
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            key = _node_key(node, gated)
            if key is None:
                continue
            body = "\n".join(lines[node.lineno - 1 : node.end_lineno])
            if ref.search(body):
                hits.append(key)
    _REF_CACHE[(helper, new)] = hits
    return hits


def changed_keys(old: str, new: str = "HEAD") -> dict[str, list[str]]:
    """{file: [keys]} for every register site the range's new-side diff
    hunks attribute to (span intersection, else next-site-below)."""
    files = [
        f
        for f in _git("diff", "--name-only", f"{old}..{new}").splitlines()
        if f.startswith("nedp_etl_spark/")
        and f.endswith(".py")
        and f not in _SHARED
    ]
    out: dict[str, list[str]] = {}
    for f in files:
        diff = _git("diff", "-U0", f"{old}..{new}", "--", f)
        hunks = [
            (int(m.group(1)), int(m.group(1)) + max(int(m.group(2) or 1), 1) - 1)
            for m in _HUNK_RE.finditer(diff)
        ]
        try:
            src = _git("show", f"{new}:{f}")
        except subprocess.CalledProcessError:
            continue  # deleted file: its keys are gone, nothing to verify
        try:
            spans = _key_spans(src)
        except SyntaxError:
            continue
        try:
            helpers = _helper_spans(src)
        except SyntaxError:
            helpers = []
        hit: list[str] = []
        for h0, h1 in hunks:
            inside = [k for k, a, b in spans if h0 <= b and h1 >= a]
            if inside:
                hit += inside
            else:
                below = [k for k, a, _b in spans if a > h1]
                if below:
                    hit.append(below[0])
            # a hunk inside a shared (non-register) top-level helper also
            # changes every key that CALLS the helper — including keys in
            # files the diff never touched (cross-file consumers).
            for hname, a, b in helpers:
                if h0 <= b and h1 >= a:
                    hit += _keys_referencing(hname, new)
        uniq = sorted(set(hit))
        if uniq:
            out[f] = uniq
    return out


def _latest_green_rounds(root: str = ".") -> dict[str, int]:
    """{key: most recent round with a driver-green CORRECTNESS row}."""
    import glob
    import pathlib

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(str(pathlib.Path(root) / "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", pathlib.Path(f).name)
        if not m:
            continue
        r = int(m.group(1))
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("err") is None and v.get("rows_match"):
                latest[k] = max(latest.get(k, 0), r)
    return latest


def _round_revs() -> dict[int, str]:
    """{round N: git rev the round-N driver sweep actually tested}.

    The driver lands ``CORRECTNESS_rN.json`` in a ``round N: verdict/...``
    commit whose PARENT is the code the sweep ran against (the end-of-round
    snapshot or the builder's last commit).
    """
    revs: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        h, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subj)
        if m:
            n = int(m.group(1))
            if n not in revs:  # log is newest-first; keep the newest
                revs[n] = _git("rev-parse", f"{h}^").strip()
    return revs


def stale_green_keys(new: str = "HEAD") -> list[str]:
    """Keys whose implementing code changed AFTER their latest driver-green
    CORRECTNESS row — the set that must HEAD ``_PRIORITY`` (round-11 verdict
    task 1: re-verification outranks re-confirming fresh greens)."""
    latest = _latest_green_rounds()
    revs = _round_revs()
    changed_since: dict[int, set[str]] = {}
    stale: list[str] = []
    for k, n in latest.items():
        if n not in revs:
            continue  # no verdict commit for that round: cannot attribute
        if n not in changed_since:
            per_file = changed_keys(revs[n], new)
            changed_since[n] = {key for ks in per_file.values() for key in ks}
        if k in changed_since[n]:
            stale.append(k)
    return sorted(stale, key=lambda k: (latest[k], k))


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    if argv[0] == "--stale-green":
        stale = stale_green_keys(argv[1] if len(argv) > 1 else "HEAD")
        print(f"# {len(stale)} keys changed after their last driver-green row:")
        print(",".join(stale))
        return 0
    old = argv[0]
    new = "HEAD"
    skip: set[str] = set()
    rest = argv[1:]
    while rest:
        a = rest.pop(0)
        if a == "--not-in":
            skip |= set(json.load(open(rest.pop(0))))
        else:
            new = a
    per_file = changed_keys(old, new)
    all_keys = sorted({k for ks in per_file.values() for k in ks} - skip)
    for f, ks in sorted(per_file.items()):
        kept = [k for k in ks if k not in skip]
        if kept:
            print(f"{f}: {' '.join(kept)}")
    print(f"# {len(all_keys)} keys need driver re-verification:")
    print(",".join(all_keys))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
