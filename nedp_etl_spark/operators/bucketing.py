"""Bucketed co-located join (SURVEY §4 / 100 TB posture): both sides
pre-bucketed on the join key so the join needs NO shuffle at read time —
the layout every recurring fact⋈fact join should have at scale.

``tests/test_plans.py`` asserts the bucketed join plan contains no
Exchange on the join key (with broadcast disabled to force the issue);
here the query itself returns the joined result, exact-checked against the
oracle computed from the raw tables — bucketing must never change results.

Tables are saved through the session catalog with explicit repo-local
paths (``_scratch``), so nothing lands in the driver's cwd warehouse.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.operators.scans import _scratch
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

_N_BUCKETS = 8

_JOIN_BUCKETED_ORACLE = f"""
SELECT
  c.c_mktsegment,
  COUNT(*) AS n_orders,
  {osum('o.o_totalprice')} AS segment_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def _bucket_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize bucketed copies of orders/customer (idempotent per sf)."""
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    t_orders, t_cust = f"b_orders_{tag}", f"b_customer_{tag}"
    for tname, src, key, cols in (
        (t_orders, "orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        (t_cust, "customer", "c_custkey", ["c_custkey", "c_mktsegment"]),
    ):
        if not spark.catalog.tableExists(tname):
            (
                load(spark, sf_dir, src)
                .select(*cols)
                .write.bucketBy(_N_BUCKETS, key)
                .sortBy(key)
                .option("path", _scratch(f"bucketed/{tname}", sf_dir))
                .mode("overwrite")
                .saveAsTable(tname)
            )
    return t_orders, t_cust


@register("join_bucketed", oracle=_JOIN_BUCKETED_ORACLE)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_cust = _bucket_tables(spark, sf_dir)
    o, c = spark.table(t_orders), spark.table(t_cust)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("segment_revenue"),
        )
    )
