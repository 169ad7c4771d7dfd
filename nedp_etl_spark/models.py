"""Model DAG — dbt-style ``ref()`` dependency graphs over Spark SQL.

The reference is a dbt orchestrator: its whole value is running a DAG of
SQL models in dependency order with a materialization per model
(``/root/reference/dbtoperator.py:273-274`` delegates the SQL to dbt-spark;
``run --select`` at ``dbtoperator.py:35,491`` selects subgraphs).  This
module is that surface in-process:

- models are SQL strings with ``{{ ref('other_model') }}`` templating;
- dependencies are parsed from the refs, the graph is Kahn-topo-sorted
  (cycles raise), and each model materializes in order as a temp view
  (``view``/``ephemeral``) or a parquet-backed table (``table``);
- ``select('model')`` gives the upstream closure — dbt's ``+model``;
- ``incremental`` models support dbt's ``{% if is_incremental() %}`` block
  and ``{{ this }}`` self-reference: the first run full-builds the target,
  later runs evaluate only the incremental slice and MERGE it on
  ``unique_key`` (source wins; unmatched target rows survive — dbt-spark's
  ``merge`` strategy; without a key it appends).

Scale posture: the DAG runner only *sequences* Spark actions; each model
is still one declarative query that Catalyst optimizes independently —
view-materialized models collapse into downstream plans exactly like dbt
ephemeral models compile to CTEs, so a 4-model DAG can still execute as
ONE fused job with pushdown through every layer.  Incremental targets use
versioned parquet paths with a read-latest pointer (the poor-man's atomic
swap; on Delta/Iceberg the same merge compiles to ``MERGE INTO`` with no
rewrite of untouched files), and the anti-join keeps only the incremental
slice's keys on the shuffle — the full target never rehashes when the
slice is small.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_REF_RE = re.compile(r"\{\{\s*ref\(\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}")
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_RE = re.compile(r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.S)


class ModelGraph:
    """A DAG of named SQL models connected by ``{{ ref('...') }}``."""

    def __init__(self) -> None:
        self._sql: dict[str, str] = {}
        self._mat: dict[str, str] = {}
        self._key: dict[str, Optional[str]] = {}
        self._version: dict[str, int] = {}
        self._pre: dict[str, list[str]] = {}
        self._post: dict[str, list[str]] = {}

    def add_model(
        self,
        name: str,
        sql: str,
        materialization: str = "view",
        unique_key: Optional[str] = None,
        pre_hook: Optional[list[str]] = None,
        post_hook: Optional[list[str]] = None,
    ) -> None:
        """``pre_hook``/``post_hook``: SQL statements run around the model's
        materialization (dbt's per-model hooks); ``{{ this }}`` in a hook
        resolves to the materialized model's view name — the dbt audit
        pattern (`INSERT INTO audit SELECT ... FROM {{ this }}`)."""
        if name in self._sql:
            raise ValueError(f"duplicate model: {name}")
        if materialization not in ("view", "table", "ephemeral", "incremental"):
            raise ValueError(f"unknown materialization: {materialization}")
        if materialization != "incremental" and _THIS_RE.search(sql):
            # dbt defines {{ this }} only where a prior materialization
            # exists to refer to; in a view/table model body it would reach
            # spark.sql verbatim and die with an opaque ParseException
            raise ValueError(
                f"model {name}: '{{{{ this }}}}' is only valid in "
                "incremental model SQL (hooks may always use it)"
            )
        self._sql[name] = sql
        self._mat[name] = materialization
        self._key[name] = unique_key
        self._pre[name] = list(pre_hook or [])
        self._post[name] = list(post_hook or [])

    def refs(self, name: str) -> list[str]:
        return sorted(set(_REF_RE.findall(self._sql[name])))

    def topo_order(self, targets: Optional[list[str]] = None) -> list[str]:
        """Kahn topological order over the (optionally target-closed) graph."""
        names = set(self._sql) if targets is None else self._closure(targets)
        missing = {r for n in names for r in self.refs(n)} - set(self._sql)
        if missing:
            raise ValueError(f"unresolved refs: {sorted(missing)}")
        indeg = {n: 0 for n in names}
        out: dict[str, list[str]] = {n: [] for n in names}
        for n in names:
            for r in self.refs(n):
                if r in names:
                    indeg[n] += 1
                    out[r].append(n)
        ready = sorted(n for n, d in indeg.items() if d == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m in sorted(out[n]):
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
        if len(order) != len(names):
            cyc = sorted(set(names) - set(order))
            raise ValueError(f"cycle among models: {cyc}")
        return order

    def _closure(self, targets: list[str]) -> set[str]:
        """Upstream closure of ``targets`` (dbt ``+model`` selection)."""
        seen: set[str] = set()
        stack = list(targets)
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            if n not in self._sql:
                raise ValueError(f"unknown model: {n}")
            seen.add(n)
            stack.extend(self.refs(n))
        return seen

    def run(
        self,
        spark: SparkSession,
        select: Optional[list[str]] = None,
        table_dir: Optional[str] = None,
        on_run_start: Optional[list[str]] = None,
        on_run_end: Optional[list[str]] = None,
    ) -> dict[str, DataFrame]:
        """Materialize models in dependency order; returns name → DataFrame.

        ``view``/``ephemeral`` models become temp views (Catalyst inlines
        them into downstream plans — dbt's ephemeral-as-CTE compilation);
        ``table`` models write parquet under ``table_dir`` and re-read, the
        dbt table materialization; ``incremental`` models full-build on
        their first run and merge the ``is_incremental()``-guarded slice on
        later runs (both require ``table_dir``).  Call ``run`` again on the
        same graph to advance incremental state one batch.

        ``on_run_start``/``on_run_end`` are run-level hook SQL statements
        (dbt's project hooks); per-model ``pre_hook``/``post_hook`` run
        around each materialization with ``{{ this }}`` resolved.
        """
        for stmt in on_run_start or []:
            spark.sql(stmt)
        results: dict[str, DataFrame] = {}
        for name in self.topo_order(select):
            for stmt in self._pre.get(name, []):
                spark.sql(_THIS_RE.sub(name, stmt))
            if self._mat[name] == "incremental":
                df = self._run_incremental(spark, name, table_dir)
            else:
                # compile out is_incremental() guards exactly as dbt does
                # in a non-incremental context (the guard body only applies
                # when merging into an existing target)
                sql = _INCR_RE.sub("", self._sql[name])
                sql = _REF_RE.sub(lambda m: m.group(1), sql)
                df = spark.sql(sql)
                if self._mat[name] == "table":
                    if table_dir is None:
                        raise ValueError(f"model {name}: table needs table_dir")
                    path = f"{table_dir}/{name}"
                    df.write.mode("overwrite").parquet(path)
                    df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            for stmt in self._post.get(name, []):
                spark.sql(_THIS_RE.sub(name, stmt))
            results[name] = df
        for stmt in on_run_end or []:
            spark.sql(stmt)
        return results

    def _run_incremental(
        self, spark: SparkSession, name: str, table_dir: Optional[str]
    ) -> DataFrame:
        """One incremental batch: full build first, merge-on-key after.

        Each batch writes a NEW versioned path and flips the read pointer —
        parquet has no atomic MERGE, and Spark cannot overwrite a path it is
        reading; on Delta/Iceberg this whole method is one ``MERGE INTO``.
        """
        if table_dir is None:
            raise ValueError(f"model {name}: incremental needs table_dir")
        ver = self._version.get(name, 0)
        is_inc = ver > 0
        this_view = f"{name}__current"
        sql = _INCR_RE.sub(lambda m: m.group(1) if is_inc else "", self._sql[name])
        sql = _THIS_RE.sub(this_view, sql)
        sql = _REF_RE.sub(lambda m: m.group(1), sql)
        if is_inc:
            existing = spark.read.parquet(f"{table_dir}/{name}/v{ver}")
            existing.createOrReplaceTempView(this_view)
        df = spark.sql(sql)
        if is_inc:
            key = self._key[name]
            if key is not None:
                # dbt-spark `merge`: source wins on key match; target rows
                # without a match survive.  Only the slice's keys shuffle.
                kept = existing.join(df.select(key).distinct(), on=key, how="left_anti")
            else:
                kept = existing  # `append` strategy
            df = df.unionByName(kept)
        path = f"{table_dir}/{name}/v{ver + 1}"
        # WRITE FIRST, then flip the pointer: the model SQL evaluates
        # lazily inside the write, so a failed batch (ANSI error in the
        # slice, disk full, interruption) must leave the pointer at the
        # last good version — a pre-flipped pointer would brick the model
        # (every later run reads a v{ver+1} that never materialized).
        df.write.mode("overwrite").parquet(path)
        self._version[name] = ver + 1
        # prune versions nobody can read anymore (two behind the pointer:
        # v{ver} may still back a caller's lazily-evaluated DataFrame from
        # the PREVIOUS batch, so keep one superseded copy) — without this,
        # every batch permanently adds a full copy of the target table
        import shutil

        for old in range(1, ver):
            shutil.rmtree(f"{table_dir}/{name}/v{old}", ignore_errors=True)
        return spark.read.parquet(path)
