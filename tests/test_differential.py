"""Randomized differential testing: generated filter+aggregate queries run
through BOTH engines and must agree exactly.

This goes beyond the fixed §2 inventory — it fuzzes the *composition* space
(random predicates × random group keys × random aggregates) with seeded
RNG, so failures are reproducible.  The SQL text is shared verbatim: Spark
executes it via ``spark.sql`` over fixture temp views, DuckDB over the same
parquet — any divergence is an engine-semantics bug in our query layer
(conf, loader, timezone), exactly what the t2 gate would trip on.
"""

from __future__ import annotations

import os
import random

import pytest

from nedp_etl_spark.data import views
from tests.oracle import duck_connect, _norm_rows

# Opt-in wide sweep (like the scale smoke): SPARK_GRAFT_FUZZ_WIDE=1 widens
# every generator's seed range by +300 fresh seeds (~2100 extra engine
# comparisons, ~8 min) — the hunt mode that ran clean at round 5.
_WIDE = 300 if os.environ.get("SPARK_GRAFT_FUZZ_WIDE") == "1" else 0


def _seeds(lo: int, hi: int) -> range:
    return range(lo, hi + _WIDE)

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_KEY_COLS = ["l_returnflag", "l_linestatus", "l_suppkey"]
_STR_COLS = ["l_returnflag", "l_linestatus"]


def _gen_predicate(rng: random.Random) -> str:
    kind = rng.choice(["num_cmp", "str_in", "between", "not"])
    if kind == "num_cmp":
        col = rng.choice(_NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        val = round(rng.uniform(0, 50), 2) if col == "l_quantity" else round(rng.uniform(0, 0.1), 3)
        return f"{col} {op} {val}"
    if kind == "str_in":
        col = rng.choice(_STR_COLS)
        vals = rng.sample(["'A'", "'N'", "'R'", "'O'", "'F'"], rng.randint(1, 3))
        return f"{col} IN ({', '.join(vals)})"
    if kind == "between":
        lo = rng.randint(0, 20)
        return f"l_quantity BETWEEN {lo} AND {lo + rng.randint(1, 30)}"
    return f"NOT ({_gen_predicate(rng)})"


def _gen_query(seed: int) -> str:
    rng = random.Random(seed)
    preds = [_gen_predicate(rng) for _ in range(rng.randint(1, 3))]
    where = " AND ".join(f"({p})" for p in preds)
    keys = rng.sample(_KEY_COLS, rng.randint(1, 2))
    aggs = ["COUNT(*) AS n"]
    for i in range(rng.randint(1, 3)):
        col = rng.choice(_NUM_COLS)
        fn = rng.choice(["MIN", "MAX", "COUNT"])
        aggs.append(f"ROUND({fn}({col}), 6) AS a{i}")
    # exact decimal-accumulated SUM (the engine's dsum contract)
    aggs.append(
        f"CAST(SUM(CAST({rng.choice(_NUM_COLS)} AS DECIMAL(25,6))) AS DOUBLE) AS total"
    )
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM lineitem "
        f"WHERE {where} GROUP BY {', '.join(keys)}"
    )


def _gen_join_query(seed: int) -> str:
    rng = random.Random(seed)
    pred = _gen_predicate(rng)
    dim_key = rng.choice(["o_orderstatus", "o_orderpriority"])
    fn = rng.choice(["MIN", "MAX"])
    col = rng.choice(_NUM_COLS)
    return (
        f"SELECT o.{dim_key}, COUNT(*) AS n, "
        f"ROUND({fn}(l.{col}), 6) AS m, "
        f"CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS total "
        f"FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"WHERE ({pred}) GROUP BY o.{dim_key}"
    )


@pytest.mark.parametrize("seed", _seeds(25, 40))
def test_generated_join_differential(spark, sf_dir, seed):
    sql = _gen_join_query(seed)
    views(spark, sf_dir, "lineitem", "orders")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


@pytest.mark.parametrize("seed", _seeds(0, 25))
def test_generated_query_differential(spark, sf_dir, seed):
    sql = _gen_query(seed)
    views(spark, sf_dir, "lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), sql
    assert len(s_rows) == len(o_rows), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


def _gen_window_query(seed: int) -> str:
    rng = random.Random(seed)
    part = rng.choice(["l_returnflag", "l_suppkey", "l_linestatus"])
    order_col = rng.choice(_NUM_COLS)
    fn = rng.choice(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()",
         f"ROUND(SUM({order_col}) OVER w2, 4)", "COUNT(*) OVER w2"]
    )
    head = fn if "OVER" in fn else fn + " OVER w"
    pred = _gen_predicate(rng)
    return (
        f"SELECT l_orderkey, l_linenumber, {head} AS wv "
        f"FROM lineitem WHERE ({pred}) "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {order_col}, l_orderkey, l_linenumber), "
        f"w2 AS (PARTITION BY {part} ORDER BY {order_col}, l_orderkey, l_linenumber "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )


@pytest.mark.parametrize("seed", _seeds(40, 55))
def test_generated_window_differential(spark, sf_dir, seed):
    sql = _gen_window_query(seed)
    views(spark, sf_dir, "lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


def _gen_scalar_expr(rng: random.Random) -> str:
    kind = rng.choice(["str", "math", "case", "date", "null"])
    if kind == "str":
        c = rng.choice(_STR_COLS)
        return rng.choice(
            [
                f"upper({c})",
                f"lower({c}) || '_' || {rng.choice(_STR_COLS)}",
                f"CAST(length({c}) AS BIGINT)",
                f"replace({c}, 'A', 'x')",
            ]
        )
    if kind == "math":
        n = rng.choice(_NUM_COLS)
        return rng.choice(
            [
                f"ROUND(abs({n}) + {rng.randint(1, 9)}, 4)",
                f"CAST(floor({n}) AS BIGINT)",
                f"ROUND(greatest({n}, {rng.choice(_NUM_COLS)}), 6)",
                f"CAST(l_orderkey % {rng.choice([7, 97, 101])} AS BIGINT)",
            ]
        )
    if kind == "case":
        return f"CASE WHEN {_gen_predicate(rng)} THEN 'hi' ELSE 'lo' END"
    if kind == "date":
        return rng.choice(
            [
                f"CAST(EXTRACT({rng.choice(['year', 'month', 'day'])} FROM l_shipdate) AS BIGINT)",
                "CAST(CAST(l_shipdate AS DATE) AS STRING)",
            ]
        )
    return f"coalesce(nullif({rng.choice(_STR_COLS)}, 'N'), 'none')"


def _gen_scalar_query(seed: int) -> str:
    rng = random.Random(seed)
    exprs = [f"{_gen_scalar_expr(rng)} AS e{i}" for i in range(3)]
    pred = _gen_predicate(rng)
    return (
        f"SELECT l_orderkey, l_linenumber, {', '.join(exprs)} "
        f"FROM lineitem WHERE l_orderkey < 1500 AND ({pred})"
    )


@pytest.mark.parametrize("seed", _seeds(55, 70))
def test_generated_scalar_differential(spark, sf_dir, seed):
    sql = _gen_scalar_query(seed)
    views(spark, sf_dir, "lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


def _gen_grouping_query(seed: int) -> str:
    rng = random.Random(seed)
    pred = _gen_predicate(rng)
    keys = rng.sample(_KEY_COLS, 2)
    shape = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if shape == "SETS":
        clause = (
            f"GROUPING SETS (({keys[0]}, {keys[1]}), ({keys[0]}), ())"
        )
    else:
        clause = f"{shape} ({keys[0]}, {keys[1]})"
    col = rng.choice(_NUM_COLS)
    return (
        f"SELECT {keys[0]}, {keys[1]}, "
        f"CAST(GROUPING({keys[0]}) AS INT) AS g0, "
        f"CAST(GROUPING({keys[1]}) AS INT) AS g1, "
        f"COUNT(*) AS n, "
        f"CAST(SUM(CAST({col} AS DECIMAL(25,6))) AS DOUBLE) AS total "
        f"FROM lineitem WHERE ({pred}) GROUP BY {clause} "
        # Known engine divergence, not a bug in our layer: on EMPTY input
        # DuckDB emits the SQL-standard grand-total row for the () grouping
        # set (n=0), Spark emits no rows.  The HAVING guard removes that
        # row on both sides so the template compares the non-degenerate
        # space (seed 82's predicate is vacuous: l_linestatus is O/F).
        f"HAVING COUNT(*) > 0"
    )


def _gen_setop_query(seed: int) -> str:
    rng = random.Random(seed)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    cols = rng.sample(
        ["l_returnflag", "l_linestatus", "l_suppkey", "l_linenumber"], 2
    )
    p1, p2 = _gen_predicate(rng), _gen_predicate(rng)
    sel = ", ".join(cols)
    return (
        f"SELECT {sel} FROM lineitem WHERE ({p1}) "
        f"{op} "
        f"SELECT {sel} FROM lineitem WHERE ({p2})"
        # EXCEPT/INTERSECT/UNION are set-distinct in both engines; UNION ALL
        # is a bag — compare as multisets either way (the harness sorts).
    )


@pytest.mark.parametrize("seed", _seeds(85, 100))
def test_generated_setop_differential(spark, sf_dir, seed):
    sql = _gen_setop_query(seed)
    views(spark, sf_dir, "lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


@pytest.mark.parametrize("seed", _seeds(70, 85))
def test_generated_grouping_differential(spark, sf_dir, seed):
    sql = _gen_grouping_query(seed)
    views(spark, sf_dir, "lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


def _gen_date_expr(rng: random.Random) -> str:
    """Date/interval expressions valid verbatim in BOTH engines."""
    kind = rng.choice(["extract", "trunc", "interval", "case", "least"])
    if kind == "extract":
        part = rng.choice(["YEAR", "MONTH", "DAY", "QUARTER"])
        return f"CAST(EXTRACT({part} FROM o_orderdate) AS BIGINT)"
    if kind == "trunc":
        part = rng.choice(["month", "quarter", "year", "week"])
        return f"CAST(date_trunc('{part}', o_orderdate) AS DATE)"
    if kind == "interval":
        n = rng.randint(1, 400)
        unit = rng.choice(["DAY", "MONTH"])
        op = rng.choice(["+", "-"])
        return f"CAST(o_orderdate {op} INTERVAL {n} {unit} AS DATE)"
    if kind == "case":
        m = rng.randint(1, 12)
        return (
            f"CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= {m} "
            f"THEN 'H1' ELSE 'H2' END"
        )
    d = f"DATE '199{rng.randint(2, 8)}-0{rng.randint(1, 9)}-15'"
    fn = rng.choice(["GREATEST", "LEAST"])
    return f"CAST({fn}(CAST(o_orderdate AS DATE), {d}) AS DATE)"


def _gen_date_query(seed: int) -> str:
    rng = random.Random(seed)
    exprs = [f"{_gen_date_expr(rng)} AS e{i}" for i in range(rng.randint(2, 4))]
    lo = f"199{rng.randint(2, 7)}-01-01"
    return (
        f"SELECT o_orderkey, {', '.join(exprs)} FROM orders "
        f"WHERE o_orderdate >= DATE '{lo}' "
        f"AND o_orderkey % {rng.randint(3, 11)} = 0"
    )


@pytest.mark.parametrize("seed", _seeds(85, 100))
def test_generated_date_differential(spark, sf_dir, seed):
    sql = _gen_date_query(seed)
    views(spark, sf_dir, "orders")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql


def _gen_text_expr(rng: random.Random) -> str:
    """Text expressions valid verbatim in BOTH engines over documents.text."""
    kind = rng.choice(["len", "substr", "upperlower", "replace", "split",
                       "concat", "trim", "position"])
    if kind == "len":
        return "CAST(length(text) AS BIGINT)"
    if kind == "substr":
        a, b = rng.randint(1, 20), rng.randint(1, 30)
        return f"substr(text, {a}, {b})"
    if kind == "upperlower":
        return rng.choice(["upper(substr(text, 1, 12))", "lower(substr(text, 1, 12))"])
    if kind == "replace":
        return f"replace(substr(text, 1, 40), '{rng.choice('aeiou')}', '_')"
    if kind == "split":
        # size of the split array — DuckDB len(...) / Spark ... both via a
        # shared spelling: string_split is DuckDB-only, split is Spark-only;
        # the portable form counts separators
        return "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)"
    if kind == "concat":
        return "lang || ':' || source"
    if kind == "trim":
        return "trim(substr(text, 1, 25))"
    return f"CAST(position('{rng.choice('etaon')}' IN text) AS BIGINT)"


def _gen_text_query(seed: int) -> str:
    rng = random.Random(seed)
    exprs = [f"{_gen_text_expr(rng)} AS e{i}" for i in range(rng.randint(2, 4))]
    m = rng.randint(2, 9)
    return (
        f"SELECT doc_id, {', '.join(exprs)} FROM documents "
        f"WHERE doc_id % {m} = 0 AND length(text) > {rng.randint(0, 50)}"
    )


@pytest.mark.parametrize("seed", _seeds(300, 330))
def test_generated_text_differential(spark, sf_dir, seed):
    # Extends the fuzz surface to the documents table — the text-function
    # compositions the llm_* operator family is built from.
    sql = _gen_text_query(seed)
    views(spark, sf_dir, "documents")
    sdf = spark.sql(sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(s_cols) == sorted(o_cols), sql
    assert _norm_rows(s_cols, s_rows) == _norm_rows(o_cols, o_rows), sql
