"""Set operators (SURVEY.md §2 'Set operations').

UNION/INTERSECT/EXCEPT (+ALL) are native Catalyst operators: distinct
variants are hash-aggregates on the full row, ALL variants are count-matched
— both partial-aggregated before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# set_union — UNION ALL / UNION (dedup) / union-by-name.
# --------------------------------------------------------------------------

_SET_UNION_ORACLE = """
WITH all_keys AS (
  SELECT c_nationkey AS k, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_nationkey AS k, 'supplier' AS src FROM supplier
)
SELECT k, src, COUNT(*) AS n,
       (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer
                              UNION SELECT DISTINCT s_nationkey FROM supplier)) AS n_distinct_keys
FROM all_keys
GROUP BY k, src
"""


@register("set_union", oracle=_SET_UNION_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"), F.lit("customer").alias("src")
    )
    # unionByName: columns deliberately authored in the other order.
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_nationkey").alias("k")
    )
    both = c.unionByName(s)
    distinct_keys = (
        c.select("k").union(s.select("k")).distinct().agg(F.count(F.lit(1)).alias("ndk"))
    )
    return (
        both.groupBy("k", "src")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(distinct_keys))
        .withColumnRenamed("ndk", "n_distinct_keys")
    )


# --------------------------------------------------------------------------
# set_intersect_except — INTERSECT / EXCEPT and their ALL variants, tagged
# and unioned into one result.
# --------------------------------------------------------------------------

_SET_IX_ORACLE = """
SELECT 'intersect' AS op, k FROM
  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, k FROM
  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect_all' AS op, k FROM
  (SELECT s_nationkey AS k FROM supplier INTERSECT ALL SELECT c_nationkey FROM customer)
UNION ALL
SELECT 'except_all' AS op, k FROM
  (SELECT s_nationkey AS k FROM supplier EXCEPT ALL SELECT c_nationkey FROM customer)
"""


@register("set_intersect_except", oracle=_SET_IX_ORACLE)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ck = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    sk = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "k")  # noqa: E731
    return (
        tag(ck.intersect(sk), "intersect")
        .unionAll(tag(ck.subtract(sk), "except"))
        .unionAll(tag(sk.intersectAll(ck), "intersect_all"))
        .unionAll(tag(sk.exceptAll(ck), "except_all"))
    )


# --------------------------------------------------------------------------
# dedup_exact — duplicate elimination.
# --------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


@register("dedup_exact", oracle=_DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dropDuplicates on the projected key set ≡ DISTINCT; keeping only the
    # key columns makes "which row survives" deterministic (SURVEY §7
    # known-hard list).  Row-level exact dedup at scale is llm_dedup_exact.
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()
