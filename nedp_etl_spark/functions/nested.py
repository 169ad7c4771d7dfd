"""Nested / semi-structured functions (SURVEY.md §2 'fn_array', 'fn_map',
'fn_json') over ``embeddings.embedding`` (array<float>) and ``events.props``
(JSON-in-string).

Everything stays in built-in higher-order functions (``transform`` /
``filter`` / ``aggregate``) — codegen'd JVM lambdas, no Python.  Array and
map outputs are rendered to scalar/string form so the cross-engine value
hash is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# fn_array — size/contains/sort/slice/distinct + higher-order fold, plus a
# posexplode over a slice (row-generating path).
# --------------------------------------------------------------------------

_FN_ARRAY_ORACLE = """
WITH base AS (
  SELECT
    vec_id,
    len(embedding) AS emb_len,
    ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS emb_sum,
    ROUND(list_sum(list_transform(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x > 0), x -> x)), 6) AS pos_sum,
    len(list_distinct(embedding)) AS n_distinct,
    ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS emb_min,
    ROUND(CAST(list_sort(embedding)[len(embedding)] AS DOUBLE), 6) AS emb_max,
    list_slice(embedding, 1, 4) AS head4
  FROM embeddings
)
SELECT
  b.vec_id, b.emb_len, b.emb_sum, b.pos_sum, b.n_distinct, b.emb_min, b.emb_max,
  CAST(t.i - 1 AS INT) AS pos,
  ROUND(CAST(b.head4[CAST(t.i AS INT)] AS DOUBLE), 6) AS head_val
-- filter to the ACTUAL list positions: a corrupt (NULL) vector emits no
-- rows, matching posexplode's drop; short lists emit only their elements
FROM base b, range(1, 5) t(i)
WHERE t.i <= COALESCE(len(b.head4), 0)
"""


@register("fn_array", oracle=_FN_ARRAY_ORACLE)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    dvec = F.transform(vec, lambda x: x.cast("double"))
    base = emb.select(
        F.col("vec_id"),
        F.size(vec).cast("bigint").alias("emb_len"),
        # fold left-to-right — same accumulation order as DuckDB list_sum
        F.round(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x), 6).alias("emb_sum"),
        F.round(
            F.aggregate(F.filter(dvec, lambda x: x > 0), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("pos_sum"),
        F.size(F.array_distinct(vec)).cast("bigint").alias("n_distinct"),
        F.round(F.sort_array(vec)[0].cast("double"), 6).alias("emb_min"),
        F.round(F.sort_array(vec)[F.size(vec) - 1].cast("double"), 6).alias("emb_max"),
        F.slice(vec, 1, 4).alias("head4"),
    )
    exploded = base.select(
        "vec_id", "emb_len", "emb_sum", "pos_sum", "n_distinct", "emb_min", "emb_max",
        F.posexplode("head4").alias("pos", "head_val"),
    )
    return exploded.withColumn("head_val", F.round(F.col("head_val").cast("double"), 6))


# --------------------------------------------------------------------------
# fn_map — construction, keys/values, element_at, map_from_entries.  Output
# is scalars/strings (map cell reprs differ between engines); the oracle
# computes the same values without MAP syntax, which is the point: the map
# round-trips back to its inputs.
# --------------------------------------------------------------------------

_FN_MAP_ORACLE = """
SELECT
  s_suppkey,
  s_name AS name_via_map,
  ROUND(s_acctbal, 6) AS bal_via_map,
  'acctbal,name,nation' AS sorted_keys,
  CAST(s_nationkey AS BIGINT) AS nation_via_entries,
  2 AS n_entries
FROM supplier
"""


@register("fn_map", oracle=_FN_MAP_ORACLE)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    m = F.create_map(
        F.lit("name"), F.col("s_name"),
        F.lit("nation"), F.col("s_nationkey").cast("string"),
        F.lit("acctbal"), F.col("s_acctbal").cast("string"),
    )
    entries = F.map_from_entries(
        F.array(
            F.struct(F.lit("k1").alias("k"), F.col("s_nationkey").cast("bigint").alias("v")),
            F.struct(F.lit("k2").alias("k"), F.col("s_suppkey").alias("v")),
        )
    )
    return s.select(
        F.col("s_suppkey"),
        F.element_at(m, "name").alias("name_via_map"),
        F.round(F.element_at(m, "acctbal").cast("double"), 6).alias("bal_via_map"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("sorted_keys"),
        F.element_at(entries, "k1").alias("nation_via_entries"),
        F.size(F.map_values(entries)).alias("n_entries"),
    )


# --------------------------------------------------------------------------
# fn_json — get_json_object / from_json / json_tuple / to_json over
# events.props ('{"k": 87}'-shaped).
# --------------------------------------------------------------------------

_FN_JSON_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_tuple,
  json_extract_string(props, '$.missing') AS k_missing,
  '{"event_type":"' || event_type || '","k":' || json_extract_string(props, '$.k') || '}' AS rebuilt
FROM events
"""


@register("fn_json", oracle=_FN_JSON_ORACLE)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    props = F.col("props")
    schema = T.StructType([T.StructField("k", T.LongType())])
    # json_tuple is a generator (one per select) — extract it first.
    base = ev.select(
        "event_id", "event_type", "props", F.json_tuple(props, "k").alias("jt")
    )
    return base.select(
        F.col("event_id"),
        F.get_json_object(props, "$.k").alias("k_str"),
        F.from_json(props, schema)["k"].alias("k_int"),
        # try_cast, not cast: real event streams carry junk payloads where
        # $.k is a non-numeric string, and the ANSI cast turns one bad row
        # into a job failure (round-11 adversarial-JSON catalog — a 1 MB
        # string value crashed the whole key); junk extraction routes to
        # NULL like every other ingestion-seam junk class.  TRY_CAST
        # mirrors it in the oracle; identical on numeric payloads.
        F.col("jt").try_cast("bigint").alias("k_tuple"),
        F.get_json_object(props, "$.missing").alias("k_missing"),
        F.to_json(
            F.struct(
                F.col("event_type"),
                F.from_json(props, schema)["k"].alias("k"),
            )
        ).alias("rebuilt"),
    )


# --------------------------------------------------------------------------
# fn_variant — the VARIANT semi-structured type (Spark 4): parse once into
# the binary variant encoding, then typed path extraction without
# re-parsing JSON text per access.  At 100 TB this is the schema-on-read
# path for ragged event payloads: variant columns store shredded binary,
# so `variant_get` is a field probe, not a string parse, and untouched
# fields are never decoded.  ``try_variant_get`` is the error-tolerant
# form (NULL, not failure, on path/type misses).
# Reference parity: semi-structured access reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

# TRY_CAST / extraction-from-TRY_CAST, mirroring the Spark side's
# try_parse_json/try_variant_get tolerance: on junk payloads both sides
# NULL the row instead of throwing, so the parity contract stays probeable
# on junk-bearing fixtures (round-12 ADVICE: the strict CAST/json() forms
# here would have thrown where the operator NULLs).  Identical output on
# well-formed payloads — the driver-fixture hash is unchanged.
_FN_VARIANT_ORACLE = """
SELECT
  event_id,
  TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k_int,
  json_extract_string(TRY_CAST(props AS JSON), '$.k') AS k_str,
  json_extract_string(TRY_CAST(props AS JSON), '$.missing') AS missing,
  CAST(json_extract(TRY_CAST(props AS JSON), '$') AS VARCHAR) AS roundtrip
FROM events WHERE event_id % 7 = 0
"""


@register("fn_variant", oracle=_FN_VARIANT_ORACLE)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    # try_parse_json / try_variant_get, not the throwing forms: one
    # malformed payload or one non-numeric $.k must NULL its row, not
    # fail the job (round-11 adversarial-JSON catalog).  Identical to the
    # strict forms on well-formed numeric payloads, so the oracle hash is
    # unchanged on the driver fixtures.
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
        F.to_json(v).alias("roundtrip"),
    )
