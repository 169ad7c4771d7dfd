"""Bitwise + cryptographic-hash scalar functions — completing the scalar
surface (both families are plain Spark SQL builtins the reference reaches
through dbt models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

_FN_BITWISE_ORACLE = """
SELECT
  o_orderkey,
  o_orderkey & 255 AS low_byte,
  o_orderkey | 15 AS with_nibble,
  xor(o_orderkey, 21845) AS xored,
  o_orderkey << 2 AS shl2,
  o_orderkey >> 3 AS shr3,
  CAST(bit_count(o_orderkey) AS INT) AS popcount
FROM orders
"""


@register("fn_bitwise", oracle=_FN_BITWISE_ORACLE)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("o_orderkey"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("with_nibble"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


_FN_HASH_ORACLE = """
SELECT
  doc_id,
  md5(text) AS h_md5,
  sha256(text) AS h_sha256,
  md5(text || ':salt') AS h_salted
FROM documents WHERE doc_id < 100
"""


@register("fn_hash", oracle=_FN_HASH_ORACLE)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.md5(F.concat(F.col("text"), F.lit(":salt"))).alias("h_salted"),
    )
