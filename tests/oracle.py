"""In-repo replica of the driver's t2 correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
fixtures, then compares row count, sorted column names, an order-insensitive
value multiset (floats rounded to 6 dp, everything stringified), AND a
type-level "driver shape" check: per-column type tags derived from the Spark
schema vs DuckDB ``DESCRIBE`` of the oracle SQL.

The shape check exists because of the round-1 ``sink_jsonl`` incident: the
values matched under stringification but DuckDB returned ``SUM(BIGINT)`` as
HUGEINT while Spark returned bigint, and the driver's value-hash (evidently
representation-sensitive, e.g. pandas ``float64`` for HUGEINT) diverged.
Tag-level parity makes that entire class fail in-repo first.
"""

from __future__ import annotations

import math
import re
from typing import Any

import duckdb

from nedp_etl_spark.data import TABLES


# Mirrors of the Spark side's ingestion normalization (data.load): on the
# driver's clean fixtures these are no-ops, but the degenerate sweep
# fixtures carry NaN/Inf and NULL-element vectors, and without the mirror
# the declared operator≡oracle contract silently diverges there (the
# sweeps alone assert only "no crash" — ADVICE r11).
_VIEW_NORMALIZE = {
    # finite_or_null on the computed-float column: NaN, ±Inf, and finite
    # magnitudes beyond the engine's fixed-point domain (data.VALUE_ABS_MAX,
    # same 9.2e12 literal) all carry no usable magnitude -> NULL
    "events": (
        "* REPLACE (CASE WHEN isnan(value) OR abs(value) >= 9.2e12 THEN NULL "
        "ELSE value END AS value)"
    ),
    # a vector with ANY non-finite, out-of-domain, or NULL element is
    # corrupt wholesale
    "embeddings": (
        "* REPLACE (CASE WHEN len(list_filter(embedding, "
        "x -> x IS NULL OR isnan(x) OR abs(x) >= 9.2e12)) > 0 THEN NULL "
        "ELSE embedding END AS embedding)"
    ),
}


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        sel = _VIEW_NORMALIZE.get(t, "*")
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written sweep fixtures: a directory
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')"
        )
    return con


def _spark_type_tag(dt) -> str:
    """Canonical tag for a Spark data type (width-insensitive, scale-aware)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal(s={dt.scale})"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"array<{_spark_type_tag(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{_spark_type_tag(dt.keyType)},{_spark_type_tag(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        return "struct"
    return dt.simpleString()


def _duck_type_tag(t: str) -> str:
    """Canonical tag for a DuckDB column type string (from DESCRIBE)."""
    t = t.strip()
    u = t.upper()
    if u.endswith("[]"):
        return f"array<{_duck_type_tag(t[:-2])}>"
    m = re.match(r"MAP\((.*),\s*([^,]*)\)$", t, re.IGNORECASE)
    if m:
        return f"map<{_duck_type_tag(m.group(1))},{_duck_type_tag(m.group(2))}>"
    if u.startswith("STRUCT"):
        return "struct"
    m = re.match(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", u)
    if m:
        return f"decimal(s={m.group(1)})"
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
             "UINTEGER", "INT", "LONG"):
        return "int"
    # HUGEINT / UBIGINT / UHUGEINT deliberately keep their own tag: they never
    # round-trip to the same pandas representation as a Spark bigint, so they
    # must never appear in oracle output (cast them in the oracle SQL).
    if u in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return u.lower()
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR", "JSON"):
        # JSON: driver-benign — round-1 fn_struct (JSON output) hash-matched,
        # so DuckDB JSON evidently reaches the hash as its string form.
        return "str"
    if u in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "bytes"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    return u.lower()


def shape_mismatches(spark_schema, duck_cols: list[tuple[str, str]]) -> list[str]:
    """Compare per-column type tags (columns matched by name).  Returns a list
    of human-readable mismatch strings; empty means driver-shape parity."""
    s_tags = {f.name: _spark_type_tag(f.dataType) for f in spark_schema.fields}
    d_tags = {name: _duck_type_tag(t) for name, t in duck_cols}
    out = []
    for col in sorted(set(s_tags) | set(d_tags)):
        st, ot = s_tags.get(col, "<absent>"), d_tags.get(col, "<absent>")
        if st != ot:
            out.append(f"{col}: spark={st} oracle={ot}")
    return out


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


def driver_canon(cols: list[str], rows: list[tuple]) -> None:
    """Replica of the driver's pandas canonicalization (round-10 incident).

    The external gate builds a pandas DataFrame from the result and
    ``sort_values``-es over every column before hashing; a container-typed
    cell (list/dict/Row) is unhashable there and turns the whole key into an
    ``err`` row even when values are oracle-exact.  Running the exact same
    canonicalization in-repo makes that class fail here first.
    """
    import pandas as pd

    # Detect container cells directly rather than relying on pandas to
    # fail: sort_values over object columns of lists raises TypeError on
    # some pandas versions, ValueError (numpy ambiguous-truth) on others,
    # and can succeed outright — any of which would let a container-typed
    # output slip past this replica (round-12 ADVICE).
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, (list, dict, set, tuple)) or type(v).__name__ in (
                "Row",
                "ndarray",
            ):
                raise TypeError(
                    f"container-typed cell in column {cols[i]!r}: {type(v).__name__}"
                )
    df = pd.DataFrame(rows, columns=cols)
    if len(df.columns):
        df.sort_values(by=sorted(df.columns), inplace=True, kind="stable")


def compare(spark, name: str, sf_dir: str, allow_empty: bool = False) -> None:
    """Assert Spark output ≡ oracle output for query ``name``.

    ``allow_empty=True`` accepts a BOTH-sides-empty result (schema still
    compared) instead of failing as vacuous — for degenerate-fixture
    sweeps where a predicate legitimately empties the output (e.g.
    agg_gpd_tail's tail vanishes on the magnitude fixture).  Driver-
    fixture tests keep the strict default: an empty oracle there means
    the check proves nothing and the query must be adapted.
    """
    import nedp_etl_spark as eng

    sdf = eng.queries()[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    try:
        driver_canon(s_cols, s_rows)
    except (TypeError, ValueError) as e:
        raise AssertionError(
            f"{name}: output is not driver-canonicalizable (pandas sort_values "
            f"over all columns raised {e!r}) — a container-typed column must be "
            f"stringified before it leaves the query"
        ) from e

    con = duck_connect(sf_dir)
    try:
        sql = eng.oracle_sql()[name]
        duck_cols = [
            (r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
        ]
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    shape_diff = shape_mismatches(sdf.schema, duck_cols)
    assert not shape_diff, (
        f"{name}: driver-shape (type) mismatch — the driver's value hash is "
        f"representation-sensitive; cast the oracle or the Spark side:\n  "
        + "\n  ".join(shape_diff)
    )
    assert allow_empty or len(o_rows) > 0, (
        f"{name}: oracle returned 0 rows — the check is vacuous (an empty "
        f"result proves nothing); adapt the query's predicates to the fixture"
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
