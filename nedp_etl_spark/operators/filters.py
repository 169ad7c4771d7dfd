"""Projection / filter / predicate operators (SURVEY.md §2).

All map-side: no shuffle at any scale.  Catalyst pushes every predicate here
into the parquet scan (verified by the plan tests) and prunes to exactly the
projected columns — at 100 TB these queries read only the row groups whose
min/max statistics survive the filter.

Reference parity: reached in the reference only as dbt-model SQL on Spark
(``/root/reference/dbtoperator.py:273-274``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load, run_sql
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# project_select — column pruning, aliasing, computed columns.
# --------------------------------------------------------------------------

_PROJECT_SELECT_ORACLE = """
SELECT
  p_partkey,
  p_name AS part_name,
  ROUND(p_retailprice * 1.1, 6) AS inflated_price,
  p_size + 1 AS size_plus,
  p_brand || '/' || p_type AS brand_type
FROM part
"""


@register("project_select", oracle=_PROJECT_SELECT_ORACLE)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey"),
        F.col("p_name").alias("part_name"),
        F.round(F.col("p_retailprice") * 1.1, 6).alias("inflated_price"),
        (F.col("p_size") + 1).alias("size_plus"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
    )


# --------------------------------------------------------------------------
# filter_pred — comparisons + boolean connectives.
# --------------------------------------------------------------------------

_FILTER_PRED_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
FROM lineitem
WHERE (l_quantity > 30 AND l_returnflag IN ('A', 'R'))
   OR (NOT (l_linestatus = 'O') AND l_discount >= 0.05)
"""


@register("filter_pred", oracle=_FILTER_PRED_ORACLE)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & F.col("l_returnflag").isin("A", "R")) | (
        ~(F.col("l_linestatus") == "O") & (F.col("l_discount") >= 0.05)
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )


# --------------------------------------------------------------------------
# filter_null — three-valued logic (fixtures are null-free, so nulls are
# manufactured with NULLIF and then handled with coalesce / null-safe =).
# --------------------------------------------------------------------------

_FILTER_NULL_ORACLE = """
SELECT
  o_orderkey,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
  (NULLIF(o_orderstatus, 'F') IS NOT DISTINCT FROM NULL) AS was_f,
  (NULLIF(o_orderstatus, 'P') IS NULL) AS was_p
FROM orders
WHERE NULLIF(o_orderstatus, 'X') IS NOT NULL
"""


@register("filter_null", oracle=_FILTER_NULL_ORACLE)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    return o.filter(F.nullif(status, F.lit("X")).isNotNull()).select(
        F.col("o_orderkey"),
        F.coalesce(F.nullif(status, F.lit("O")), F.lit("OPEN")).alias("status_norm"),
        F.nullif(status, F.lit("F")).eqNullSafe(F.lit(None).cast("string")).alias("was_f"),
        F.nullif(status, F.lit("P")).isNull().alias("was_p"),
    )


# --------------------------------------------------------------------------
# filter_like_in_between — pattern / membership / range predicates.
# --------------------------------------------------------------------------

_FILTER_LIKE_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE p_name LIKE '%bolt%'
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#10', 'Brand#11')
  AND p_size BETWEEN 5 AND 40
  AND regexp_matches(p_type, '^(SMALL|MEDIUM|LARGE)$')
"""


@register("filter_like_in_between", oracle=_FILTER_LIKE_ORACLE)
def filter_like_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#10", "Brand#11")
        & F.col("p_size").between(5, 40)
        & F.col("p_type").rlike("^(SMALL|MEDIUM|LARGE)$")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


# --------------------------------------------------------------------------
# filter_subquery — scalar subquery + EXISTS + IN (Catalyst decorrelates
# these into joins; no per-row re-execution at any scale).
# --------------------------------------------------------------------------

_FILTER_SUBQUERY_SQL = """
SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
FROM orders o
WHERE o.o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2)
  AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48
      )
  AND o.o_custkey IN (SELECT c.c_custkey FROM customer c WHERE c.c_acctbal > 0)
"""


@register("filter_subquery", oracle=_FILTER_SUBQUERY_SQL)
def filter_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark SQL text with parameter-bound tables: the scalar subquery becomes
    # a broadcast of a 1-row aggregate; EXISTS/IN become left-semi joins after
    # Catalyst's RewritePredicateSubquery — the same SQL is its own oracle.
    return run_sql(
        spark, sf_dir, _FILTER_SUBQUERY_SQL, ["orders", "lineitem", "customer"]
    )


# --------------------------------------------------------------------------
# filter_corr_subquery — correlated scalar subquery (per-row aggregate over
# the same table; Catalyst decorrelates it into an aggregate + join, so no
# per-row re-execution at any scale).
# --------------------------------------------------------------------------

_FILTER_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 6) AS o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


@register("filter_corr_subquery", oracle=_FILTER_CORR_SQL)
def filter_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _FILTER_CORR_SQL, ["orders"])
