"""UDF / UDAF / UDTF surface (SURVEY.md §2 'UDF / UDAF / UDTF surface').

The hierarchy, in preference order for the 100 TB posture:

1. built-in functions (everything else in this repo) — JVM, codegen'd;
2. ``@pandas_udf`` / ``applyInPandas`` — Arrow-batched columnar transfer,
   ~10-100× over row UDFs; the ONLY acceptable Python on a hot path;
3. row-at-a-time ``F.udf`` — registered here strictly to cover the operator
   surface; its query is identical to ``udf_pandas`` so the bench output
   directly shows the penalty.

Each UDF's logic is pure double/string arithmetic so the DuckDB oracle can
mirror it in SQL exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# udf_scalar — row-at-a-time Python UDF.
# --------------------------------------------------------------------------

_UDF_SCALAR_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
FROM lineitem
WHERE l_quantity >= 45
"""


@register("udf_scalar", oracle=_UDF_SCALAR_ORACLE)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=T.DoubleType())
    def charge(price: float, disc: float, tax: float) -> float:
        # IEEE double ops — bit-identical to the SQL expression.
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


# --------------------------------------------------------------------------
# udf_pandas — Arrow-vectorized scalar UDF (same logic, batched).
# --------------------------------------------------------------------------

_UDF_PANDAS_ORACLE = _UDF_SCALAR_ORACLE


@register("udf_pandas", oracle=_UDF_PANDAS_ORACLE)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


# --------------------------------------------------------------------------
# udaf_pandas — grouped custom aggregate via applyInPandas.
# --------------------------------------------------------------------------

_UDAF_PANDAS_ORACLE = """
SELECT
  l_suppkey,
  ROUND(SUM(l_extendedprice * l_discount) / SUM(l_extendedprice), 6) AS weighted_disc,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_suppkey
"""


@register("udaf_pandas", oracle=_UDAF_PANDAS_ORACLE)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def weighted(key, pdf: pd.DataFrame) -> pd.DataFrame:
        w = (pdf.l_extendedprice * pdf.l_discount).sum() / pdf.l_extendedprice.sum()
        return pd.DataFrame(
            {"l_suppkey": [key[0]], "weighted_disc": [round(w, 6)], "n": [len(pdf)]}
        )

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Grouped by a high-cardinality key so groups spread across all cores —
    # one Arrow batch per group; state bounded by the largest group.  A
    # low-cardinality key would serialize the whole table through a handful
    # of Python workers.
    return li.groupBy("l_suppkey").applyInPandas(
        weighted, "l_suppkey bigint, weighted_disc double, n bigint"
    )


# --------------------------------------------------------------------------
# udtf_explode — table function: 1 document row → N token rows.
# --------------------------------------------------------------------------

_UDTF_EXPLODE_ORACLE = """
SELECT d.doc_id, t.token, length(t.token) AS token_len
FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
WHERE d.doc_id < 200
"""


@register("udtf_explode", oracle=_UDTF_EXPLODE_ORACLE)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The set-returning shape: array-producing expression + explode (lateral
    # view).  Row count multiplies; everything stays JVM-side.
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("token_len", F.length("token").cast("bigint"))


# --------------------------------------------------------------------------
# udtf_native — Spark 3.5+ Python UDTF class (the first-class table-function
# API, vs. the explode idiom above).
# --------------------------------------------------------------------------

_UDTF_NATIVE_ORACLE = """
SELECT d.doc_id, CAST(t.i - 1 AS INT) AS pos, string_split(d.text, ' ')[CAST(t.i AS INT)] AS token
FROM documents d, range(1, 2000) t(i)
WHERE d.doc_id < 50 AND t.i <= len(string_split(d.text, ' '))
"""


@register("udtf_native", oracle=_UDTF_NATIVE_ORACLE)
def udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # NULL document → zero rows (LATERAL drops it)
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    # lateral-join the UDTF against each document row; the docs relation is
    # parameter-bound (no session-global temp-view name — a fixed name would
    # race when two threads run this at different sf_dirs on one session).
    # The FUNCTION registration stays session-wide, but its definition is
    # identical on every call, so re-registration is idempotent.
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM {d} d, LATERAL tokenize_udtf(d.text) t",
        d=d,
    )
