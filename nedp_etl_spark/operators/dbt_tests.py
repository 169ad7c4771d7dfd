"""dbt-test parity (SURVEY.md §5): the reference's only in-repo test surface
is ``operator.run_dbt_command(['test'])`` (``/root/reference/
dbtoperator.py:334``), i.e. dbt schema tests compiled to SQL on Spark.
This module implements the four core schema tests — ``not_null``,
``unique``, ``accepted_values``, ``relationships`` — as one assertion query
over the fixtures: each row is a test with its violation count (0 = pass),
exactly what ``dbt test`` reports.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

_DBT_TESTS_ORACLE = """
SELECT 'not_null_orders_o_orderkey' AS test_name,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS violations
UNION ALL
SELECT 'unique_orders_o_orderkey',
       (SELECT COUNT(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
UNION ALL
SELECT 'accepted_values_orders_o_orderstatus',
       (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('P','O','F'))
UNION ALL
SELECT 'relationships_lineitem_orders',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'relationships_orders_customer',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
"""


@register("dbt_schema_tests", oracle=_DBT_TESTS_ORACLE)
def dbt_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("test_name"), "violations"
        )

    tests = [
        one("not_null_orders_o_orderkey", o.filter(F.col("o_orderkey").isNull())),
        one(
            "unique_orders_o_orderkey",
            o.groupBy("o_orderkey").count().filter(F.col("count") > 1),
        ),
        one(
            "accepted_values_orders_o_orderstatus",
            o.filter(~F.col("o_orderstatus").isin("P", "O", "F")),
        ),
        one(
            "relationships_lineitem_orders",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        one(
            "relationships_orders_customer",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
    ]
    return reduce(DataFrame.unionAll, tests)
