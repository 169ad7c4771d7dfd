"""Skew-mitigated join (SURVEY §4 / 100 TB posture): manual key salting.

AQE's skew-join splitting (on by default here) handles most skew at
runtime; salting is the explicit fallback when one key dominates so badly
that even split partitions overwhelm an executor.  The fact side gets a
random-ish-but-deterministic salt appended to the key; the dimension side
is exploded once per salt value, so the join key becomes (key, salt) and
the hot key spreads over N partitions.

Registered as an exact query: salting must never change results, so the
oracle is the plain unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

_N_SALTS = 8

_JOIN_SALTED_ORACLE = f"""
SELECT
  o.o_orderpriority,
  COUNT(*) AS n_lines,
  {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("join_skew_salted", oracle=_JOIN_SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    # deterministic salt from a high-cardinality column (pmod keeps it in [0, N))
    salted_fact = li.withColumn(
        "salt", F.pmod(F.col("l_partkey").cast("int"), F.lit(_N_SALTS))
    )
    # dimension side replicated once per salt value
    salted_dim = o.crossJoin(
        F.broadcast(spark.range(_N_SALTS).select(F.col("id").cast("int").alias("salt")))
    )
    return (
        salted_fact.join(
            salted_dim,
            (salted_fact.l_orderkey == salted_dim.o_orderkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
