"""Query registry — the single source of truth for the operator inventory.

Each operator from ``SURVEY.md §2`` registers exactly once via the
:func:`register` decorator, pairing the Spark implementation with its DuckDB
oracle SQL (or ``None`` for the rows-only checks the driver allows for
non-SQL-expressible operators).  ``__spark_entry__.py`` re-exports the two
dicts this module accumulates.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL twin.

    The oracle SQL must produce identical column names (the driver sorts
    columns by name before value-hashing) and value-identical output at
    sf=0.01 — float aggregates rounded to 6 dp on BOTH sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
