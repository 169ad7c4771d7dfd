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


# --------------------------------------------------------------------------
# fn_bitpack_roundtrip — columnar bit-packing primitive: eight 8-bit
# lanes (deterministically derived from o_orderkey) pack into ONE int64
# via shift-or, unpack via shift-mask, and the roundtrip equality is an
# output column — the storage-engine trick behind dictionary/delta
# encodings, stated as pure relational expressions (zero shuffle).
# Lane 7 stays ≤ 127 so the packed word never sets the sign bit (int64
# stays non-negative on both engines — no signed-shift divergence).
# --------------------------------------------------------------------------

_BITPACK_ORACLE = """
WITH lanes AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 256 AS BIGINT) AS l0,
         CAST((o_orderkey // 7) % 256 AS BIGINT) AS l1,
         CAST((o_orderkey // 11) % 256 AS BIGINT) AS l2,
         CAST((o_orderkey // 13) % 256 AS BIGINT) AS l3,
         CAST((o_orderkey // 17) % 256 AS BIGINT) AS l4,
         CAST((o_orderkey // 19) % 256 AS BIGINT) AS l5,
         CAST((o_orderkey // 23) % 256 AS BIGINT) AS l6,
         CAST((o_orderkey // 29) % 128 AS BIGINT) AS l7
  FROM orders WHERE o_orderkey < 4000
),
packed AS (
  SELECT *,
         l0 + l1 * 256 + l2 * 65536 + l3 * 16777216
         + l4 * 4294967296 + l5 * 1099511627776
         + l6 * 281474976710656 + l7 * 72057594037927936 AS word
  FROM lanes
)
SELECT o_orderkey, word,
       CAST(word % 256 AS BIGINT) AS u0,
       CAST((word // 4294967296) % 256 AS BIGINT) AS u4,
       CAST(word // 72057594037927936 AS BIGINT) AS u7,
       (word % 256 = l0
        AND (word // 4294967296) % 256 = l4
        AND word // 72057594037927936 = l7) AS roundtrip_ok
FROM packed
"""


@register("fn_bitpack_roundtrip", oracle=_BITPACK_ORACLE)
def fn_bitpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    # `div`, never `/` + cast: float division of values near 2^63 loses
    # integer precision; Spark's div and DuckDB's // are both exact
    # integer floor division on non-negatives.
    lanes = {
        "l0": "o_orderkey % 256",
        "l1": "(o_orderkey div 7) % 256",
        "l2": "(o_orderkey div 11) % 256",
        "l3": "(o_orderkey div 13) % 256",
        "l4": "(o_orderkey div 17) % 256",
        "l5": "(o_orderkey div 19) % 256",
        "l6": "(o_orderkey div 23) % 256",
        "l7": "(o_orderkey div 29) % 128",
    }
    df = o.select(
        "o_orderkey",
        *[F.expr(v).cast("bigint").alias(kk) for kk, v in lanes.items()],
    )
    word = (
        F.col("l0")
        + F.col("l1") * 256
        + F.col("l2") * 65536
        + F.col("l3") * 16777216
        + F.col("l4") * 4294967296
        + F.col("l5") * 1099511627776
        + F.col("l6") * 281474976710656
        + F.col("l7") * 72057594037927936
    )
    p = df.withColumn("word", word)
    u0 = F.expr("word % 256").cast("bigint")
    u4 = F.expr("(word div 4294967296) % 256").cast("bigint")
    u7 = F.expr("word div 72057594037927936").cast("bigint")
    return p.select(
        "o_orderkey",
        "word",
        u0.alias("u0"),
        u4.alias("u4"),
        u7.alias("u7"),
        (
            (u0 == F.col("l0")) & (u4 == F.col("l4")) & (u7 == F.col("l7"))
        ).alias("roundtrip_ok"),
    )
