"""CTE-structured queries — the shape every dbt model compiles to
(staged CTEs), plus recursive CTEs (Spark 4.x).

Both run as shared SQL text over fixture temp views: in the reference stack
this is literally what dbt renders and ships to Spark
(``/root/reference/dbtoperator.py:342-347``), so executing the same text in
both engines is the strongest possible parity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nedp_etl_spark.data import run_sql
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import osum

# --------------------------------------------------------------------------
# cte_chain — multi-stage CTE pipeline (the canonical dbt model shape).
# --------------------------------------------------------------------------

_CTE_CHAIN_SQL = f"""
WITH stg_orders AS (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderstatus = 'F'
),
stg_customers AS (
  SELECT c_custkey, c_mktsegment FROM customer
),
joined AS (
  SELECT c.c_mktsegment, o.o_totalprice
  FROM stg_orders o JOIN stg_customers c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {osum('o_totalprice')} AS total_value
FROM joined
GROUP BY c_mktsegment
"""


@register("cte_chain", oracle=_CTE_CHAIN_SQL)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _CTE_CHAIN_SQL, ["orders", "customer"])


# --------------------------------------------------------------------------
# cte_recursive — WITH RECURSIVE (Spark 4.x): a generated month spine
# left-joined to monthly order counts (the calendar-spine idiom).
# --------------------------------------------------------------------------

_CTE_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT 1
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
)
SELECT CAST(months.m AS INT) AS month_num,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
FROM months
LEFT JOIN (
  SELECT CAST(month(o_orderdate) AS INT) AS mo, COUNT(*) AS n
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
) c ON c.mo = months.m
"""


@register("cte_recursive", oracle=_CTE_RECURSIVE_SQL)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _CTE_RECURSIVE_SQL, ["orders"])
