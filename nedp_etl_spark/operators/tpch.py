"""Classic TPC-H-shaped queries expressible on the driver fixtures (the
fixtures omit partsupp/shipmode/commitdate, so Q3/Q6/Q10/Q18 are the
canonical shapes available).  These are the recognizable end-to-end
workloads a dbt-on-Spark user runs daily; each is a single DataFrame chain
whose plan composes the operators proven individually elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

# --------------------------------------------------------------------------
# Q3 — shipping priority.
# --------------------------------------------------------------------------

_TPCH_Q3_ORACLE = f"""
SELECT
  l.l_orderkey,
  {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
"""


@register("tpch_q3", oracle=_TPCH_Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-filter-agg; at scale this is
# the pushdown showcase: 3 pushed predicates, 3 read columns).
# --------------------------------------------------------------------------

_TPCH_Q6_ORACLE = f"""
SELECT {osum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", oracle=_TPCH_Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --------------------------------------------------------------------------
# Q10 — returned item reporting.
# --------------------------------------------------------------------------

_TPCH_Q10_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  ROUND(c.c_acctbal, 6) AS c_acctbal,
  n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
"""


@register("tpch_q10", oracle=_TPCH_Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.round("c_acctbal", 6).alias("c_acctbal"), "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (agg → having → join back).
# --------------------------------------------------------------------------

_TPCH_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       ROUND(o.o_totalprice, 6) AS o_totalprice,
       {osum('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("tpch_q18", oracle=_TPCH_Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.round("o_totalprice", 6).alias("o_totalprice"),
        )
        .agg(dsum("l_quantity").alias("total_qty"))
        .select("c_name", "c_custkey", "o_orderkey", "orderdate", "o_totalprice", "total_qty")
    )


# --------------------------------------------------------------------------
# profile_table — per-column data profiling (the ETL data-quality staple):
# one pass, one row per profiled column.
# --------------------------------------------------------------------------

_PROFILE_ORACLE = """
SELECT 'o_totalprice' AS col, COUNT(*) AS n, COUNT(o_totalprice) AS n_nonnull,
       COUNT(DISTINCT o_totalprice) AS n_distinct,
       CAST(ROUND(MIN(o_totalprice), 6) AS VARCHAR) AS min_v,
       CAST(ROUND(MAX(o_totalprice), 6) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
       COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
"""


@register("profile_table", oracle=_PROFILE_ORACLE)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def prof(col: str, render) -> DataFrame:
        return o.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_v"),
            render(F.max(col)).alias("max_v"),
        ).select(F.lit(col).alias("col"), "n", "n_nonnull", "n_distinct", "min_v", "max_v")

    num = lambda c: F.round(c, 6).cast("string")  # noqa: E731
    raw = lambda c: c.cast("string")  # noqa: E731
    return (
        prof("o_totalprice", num)
        .unionAll(prof("o_orderstatus", raw))
        .unionAll(prof("o_custkey", raw))
    )
