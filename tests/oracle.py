"""In-repo replica of the driver's t2 correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
fixtures, then compares row count, sorted column names, and an
order-insensitive value multiset (floats rounded to 6 dp, everything
stringified).  Keeping this strictly as strong as the driver's hash check
means a green test here predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from nedp_etl_spark.data import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, name: str, sf_dir: str) -> None:
    """Assert Spark output ≡ oracle output for query ``name``."""
    import nedp_etl_spark as eng

    sdf = eng.queries()[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        res = con.execute(eng.oracle_sql()[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sn, on = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
    if sn != on:
        diff_s = [r for r in sn if r not in set(on)][:5]
        diff_o = [r for r in on if r not in set(sn)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only (≤5): {diff_s}\n oracle-only (≤5): {diff_o}"
        )
