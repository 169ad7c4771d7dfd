"""Sort / limit / top-k operators (SURVEY.md §2 'Sort / limit / top-k').

The driver's value-hash is order-insensitive, so sort correctness is made
*observable* by materializing the global position with row_number over the
same total order — if the sort were wrong, positions (and the hash) change.

Scale note: global orderBy is a range-partitioned sort (sampled boundaries)
— fine when required; ``limit_topk`` instead compiles to
TakeOrderedAndProject: each partition keeps k rows, the driver merges k·p —
no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# sort_multi — multi-key sort with explicit direction and NULL placement
# (Spark default NULLS FIRST asc / NULLS LAST desc differs from DuckDB's
# NULLS LAST-always — both sides spell it out; SURVEY §2).
# --------------------------------------------------------------------------

_SORT_MULTI_ORACLE = """
SELECT
  o_orderpriority,
  maybe_status,
  o_orderkey,
  ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC,
                              maybe_status DESC NULLS LAST,
                              o_totalprice DESC,
                              o_orderkey ASC) AS global_pos
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         NULLIF(o_orderstatus, 'O') AS maybe_status
  FROM orders
  WHERE o_orderkey < 2000
)
"""


@register("sort_multi", oracle=_SORT_MULTI_ORACLE)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
    )
    order = [
        F.col("o_orderpriority").asc_nulls_first(),
        F.col("maybe_status").desc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    return (
        base.orderBy(*order)
        .withColumn("global_pos", F.row_number().over(Window.orderBy(*order)))
        .select("o_orderpriority", "maybe_status", "o_orderkey", "global_pos")
    )


# --------------------------------------------------------------------------
# limit_topk — global top-k with a total-order tiebreaker.
# --------------------------------------------------------------------------

_LIMIT_TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 6) AS l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


@register("limit_topk", oracle=_LIMIT_TOPK_ORACLE)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 6).alias("l_extendedprice"),
        )
    )
