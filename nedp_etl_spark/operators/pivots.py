"""Pivot / unpivot operators — beyond SURVEY §2's inventory but part of a
complete analytics surface (dbt models routinely pivot).

``pivot`` with an explicit value list keeps the plan a single aggregate
(no extra pass to discover values — at 100 TB the discovery scan would be
the bottleneck); ``unpivot`` is the zero-shuffle inverse (an Expand node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import osum

# --------------------------------------------------------------------------
# agg_pivot — one row per l_linestatus, one column per return flag.
# --------------------------------------------------------------------------

_AGG_PIVOT_ORACLE = f"""
SELECT
  l_linestatus,
  {osum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_A,
  {osum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_N,
  {osum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_R
FROM lineitem
GROUP BY l_linestatus
"""


@register("agg_pivot", oracle=_AGG_PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])  # explicit values: one pass
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double"))
    )
    return pv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


# --------------------------------------------------------------------------
# agg_unpivot — wide → long (the inverse shape, Expand node, no shuffle).
# --------------------------------------------------------------------------

_AGG_UNPIVOT_ORACLE = """
SELECT c_custkey, 'acctbal' AS metric, ROUND(c_acctbal, 6) AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
"""


@register("agg_unpivot", oracle=_AGG_UNPIVOT_ORACLE)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 6).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
