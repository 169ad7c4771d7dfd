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


# --------------------------------------------------------------------------
# agg_skew_twophase — two-phase (salted) aggregation for skewed group keys.
# events has ~5 event_type values over the whole corpus: a single
# groupBy(event_type) funnels every row of a hot key through one reduce
# task.  Phase 1 aggregates by (event_type, salt) — 16-way fan-out of each
# hot key, map-side partials stay balanced — phase 2 merges the ≤ 5×16
# partial rows.  The per-salt partial keeps the *scaled long* sum from the
# fixed-point trick (no early division), so merging partials is exact and
# the result is bit-identical to the single-phase oracle.
# --------------------------------------------------------------------------

_TWOPHASE_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {osum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register("agg_skew_twophase", oracle=_TWOPHASE_ORACLE)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn(
            "salt", F.pmod(F.col("event_id").cast("int"), F.lit(2 * _N_SALTS))
        )
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            # scaled-long partial: division deferred to the merge phase
            F.sum(
                F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("long")
            ).alias("pq"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("pq") / 1_000_000.0).alias("total_value"),
    )
