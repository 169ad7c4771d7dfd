"""Additional SQL-surface operators beyond SURVEY §2's baseline inventory:
FILTER-clause aggregates, IGNORE NULLS window functions, LATERAL joins.
All three run as shared SQL text (both engines accept the identical
statement — the strongest parity form).  URL parsing (``fn_url``) lives in
``functions/scalar.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nedp_etl_spark.data import run_sql
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import osum

# --------------------------------------------------------------------------
# agg_filter_clause — per-aggregate FILTER (WHERE ...) predicates: one scan,
# many conditional aggregates (the idiomatic replacement for N subqueries).
# --------------------------------------------------------------------------

_AGG_FILTER_SQL = f"""
SELECT
  l_returnflag,
  COUNT(*) AS n_all,
  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
  COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
  {osum('l_extendedprice')} AS sum_all,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) FILTER (WHERE l_quantity > 25) AS DOUBLE) AS sum_big
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_filter_clause", oracle=_AGG_FILTER_SQL)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _AGG_FILTER_SQL, ["lineitem"])


# --------------------------------------------------------------------------
# win_ignore_nulls — LAG / LAST_VALUE with IGNORE NULLS (gap-fill /
# last-observation-carried-forward, the standard time-series fill idiom).
# --------------------------------------------------------------------------

# Spark: `LAG(x) IGNORE NULLS OVER ...`; DuckDB puts the modifier inside
# the call: `LAG(x IGNORE NULLS) OVER ...` — same semantics, two texts.
_WIN_IGNORE_NULLS_TEMPLATE = """
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE ROUND(o_totalprice, 6) END AS price_gap
  FROM orders
)
SELECT o_custkey, o_orderkey, price_gap,
       {lag} OVER w AS prev_known,
       {last} OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""

_WIN_IGNORE_NULLS_SPARK = _WIN_IGNORE_NULLS_TEMPLATE.format(
    lag="LAG(price_gap) IGNORE NULLS", last="LAST_VALUE(price_gap) IGNORE NULLS"
)
_WIN_IGNORE_NULLS_DUCK = _WIN_IGNORE_NULLS_TEMPLATE.format(
    lag="LAG(price_gap IGNORE NULLS)", last="LAST_VALUE(price_gap IGNORE NULLS)"
)


@register("win_ignore_nulls", oracle=_WIN_IGNORE_NULLS_DUCK)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _WIN_IGNORE_NULLS_SPARK, ["orders"])


# --------------------------------------------------------------------------
# join_lateral — correlated LATERAL subquery (per-row derived table;
# Catalyst decorrelates to a join, same as DuckDB's planner).
# --------------------------------------------------------------------------

_JOIN_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.max_price
FROM customer c,
LATERAL (
  SELECT COUNT(*) AS n_orders, ROUND(MAX(o.o_totalprice), 6) AS max_price
  FROM orders o WHERE o.o_custkey = c.c_custkey
) t
WHERE t.n_orders > 0
"""


@register("join_lateral", oracle=_JOIN_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _JOIN_LATERAL_SQL, ["customer", "orders"])
