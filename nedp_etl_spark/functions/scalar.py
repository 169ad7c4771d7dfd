"""Scalar function families (SURVEY.md §2 'Scalar functions').

One composite query per family, touching every listed function.  Every
expression is a built-in ``pyspark.sql.functions`` call — JVM-side, inside
whole-stage codegen; no Python on the hot path.

Cross-engine gotchas handled here (documented in SURVEY §2):
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday.
- Spark ``pmod`` vs DuckDB ``%`` sign semantics.
- Spark ``regexp_replace`` is global; DuckDB needs the ``'g'`` flag.
- DuckDB lacks ``initcap`` — emulated with upper/lower/substr.
- Decimal outputs rendered as strings (engine-stable representation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# fn_string
# --------------------------------------------------------------------------

_FN_STRING_ORACLE = """
SELECT
  p_partkey,
  p_name || '|' || p_brand AS cat,
  substr(p_name, 1, 4) AS sub4,
  length(p_name) AS name_len,
  lower(p_type) AS type_lo,
  upper(p_name) AS name_up,
  trim('  ' || p_name || ' ') AS trimmed,
  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
  split_part(p_name, ' ', 1) AS first_word,
  regexp_extract(p_name, '^(\\w+)', 1) AS rx_word,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
  replace(p_name, ' ', '-') AS dashed,
  instr(p_name, 'o') AS o_pos,
  upper(substr(p_brand, 1, 1)) || lower(substr(p_brand, 2)) AS brand_cap
FROM part
"""


@register("fn_string", oracle=_FN_STRING_ORACLE)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    name, brand = F.col("p_name"), F.col("p_brand")
    return p.select(
        F.col("p_partkey"),
        F.concat_ws("|", name, brand).alias("cat"),
        F.substring(name, 1, 4).alias("sub4"),
        F.length(name).cast("bigint").alias("name_len"),
        F.lower(F.col("p_type")).alias("type_lo"),
        F.upper(name).alias("name_up"),
        F.trim(F.concat(F.lit("  "), name, F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_pad"),
        F.split(name, " ")[0].alias("first_word"),
        F.regexp_extract(name, r"^(\w+)", 1).alias("rx_word"),
        F.regexp_replace(name, "[aeiou]", "_").alias("devowel"),
        F.replace(name, F.lit(" "), F.lit("-")).alias("dashed"),
        F.instr(name, "o").cast("bigint").alias("o_pos"),
        # initcap on a single token — matches the upper+lower emulation DuckDB
        # needs (it has no initcap builtin).
        F.initcap(brand).alias("brand_cap"),
    )


# --------------------------------------------------------------------------
# fn_date
# --------------------------------------------------------------------------

_FN_DATE_ORACLE = """
SELECT
  o_orderkey,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mo,
  day(o_orderdate) AS dy,
  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
  CAST(CAST(o_orderdate AS DATE) - 7 AS VARCHAR) AS minus7,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  CAST(date_diff('month',
       CAST(date_trunc('month', TIMESTAMP '1995-06-01 00:00:00') AS DATE),
       CAST(date_trunc('month', o_orderdate) AS DATE)) AS DOUBLE) AS months_since,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
  CAST(make_date(year(o_orderdate), 1, 1) AS VARCHAR) AS year_start,
  dayofweek(o_orderdate) + 1 AS dow
FROM orders
"""


@register("fn_date", oracle=_FN_DATE_ORACLE)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    od, odd = F.col("o_orderdate"), F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey"),
        F.year(od).cast("bigint").alias("yr"),
        F.month(od).cast("bigint").alias("mo"),
        F.dayofmonth(od).cast("bigint").alias("dy"),
        F.date_trunc("month", od).cast("date").cast("string").alias("month_start"),
        F.date_add(odd, 30).cast("string").alias("plus30"),
        F.date_sub(odd, 7).cast("string").alias("minus7"),
        F.datediff(F.lit("2000-01-01").cast("date"), odd).cast("bigint").alias("days_to_y2k"),
        # months_between on month-truncated dates is an exact month count —
        # the form DuckDB can mirror with date_diff('month', ...).
        F.months_between(
            F.date_trunc("month", od), F.lit("1995-06-01").cast("timestamp")
        ).alias("months_since"),
        F.last_day(odd).cast("string").alias("month_end"),
        F.unix_timestamp(od).alias("epoch_s"),
        F.make_date(F.year(od), F.lit(1), F.lit(1)).cast("string").alias("year_start"),
        F.dayofweek(od).cast("bigint").alias("dow"),
    )


# --------------------------------------------------------------------------
# fn_math
# --------------------------------------------------------------------------

_FN_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(l_extendedprice, 1) AS price_r1,
  ABS(l_discount - 0.05) AS disc_dev,
  CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil,
  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_floor,
  ROUND(POW(l_discount, 2), 6) AS disc_sq,
  ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
  ROUND(EXP(l_discount), 6) AS disc_exp,
  ROUND(LN(l_extendedprice), 6) AS price_ln,
  ROUND(LOG10(l_extendedprice), 6) AS price_log10,
  CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  CAST(((CAST(l_quantity AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS qty_pmod,
  GREATEST(l_quantity, 25.0) AS qty_hi,
  LEAST(l_quantity, 25.0) AS qty_lo
FROM lineitem
"""


@register("fn_math", oracle=_FN_MATH_ORACLE)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q, d, p = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.round(p, 1).alias("price_r1"),
        F.abs(d - 0.05).alias("disc_dev"),
        F.ceil(q / 7).alias("qty_ceil"),
        F.floor(q / 7).alias("qty_floor"),
        F.round(F.pow(d, 2), 6).alias("disc_sq"),
        F.round(F.sqrt(q), 6).alias("qty_sqrt"),
        F.round(F.exp(d), 6).alias("disc_exp"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.signum(d - 0.05).alias("disc_sign"),
        # Spark pmod ≡ ((a % b) + b) % b on the oracle side.
        F.pmod(q.cast("bigint"), F.lit(7)).alias("qty_pmod"),
        F.greatest(q, F.lit(25.0)).alias("qty_hi"),
        F.least(q, F.lit(25.0)).alias("qty_lo"),
    )


# --------------------------------------------------------------------------
# fn_conditional
# --------------------------------------------------------------------------

_FN_CONDITIONAL_ORACLE = """
SELECT
  o_orderkey,
  CASE o_orderstatus WHEN 'F' THEN 'closed' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word,
  CASE
    WHEN o_totalprice >= 300000 THEN 'large'
    WHEN o_totalprice >= 100000 THEN 'medium'
    ELSE 'small'
  END AS size_band,
  CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS is_urgent,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS nvl_status,
  NULLIF(o_orderstatus, 'O') AS maybe_status
FROM orders
"""


@register("fn_conditional", oracle=_FN_CONDITIONAL_ORACLE)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    st, tp = F.col("o_orderstatus"), F.col("o_totalprice")
    return o.select(
        F.col("o_orderkey"),
        F.when(st == "F", "closed").when(st == "O", "open").otherwise("other").alias("status_word"),
        F.when(tp >= 300000, "large").when(tp >= 100000, "medium").otherwise("small").alias("size_band"),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("is_urgent"),
        F.nvl(F.nullif(st, F.lit("P")), F.lit("PENDING")).alias("nvl_status"),
        F.nullif(st, F.lit("O")).alias("maybe_status"),
    )


# --------------------------------------------------------------------------
# fn_cast_decimal — decimal money math + try_cast; decimals rendered as
# strings so the value-hash is representation-stable in both engines.
# --------------------------------------------------------------------------

_FN_CAST_DECIMAL_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS line_total,
  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) - CAST(l_extendedprice * l_discount AS DECIMAL(18,4)) AS VARCHAR) AS net_dec,
  CAST(l_quantity AS BIGINT) AS qty_int,
  CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_key,
  TRY_CAST(l_returnflag AS INT) AS bad_int,
  TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_again
FROM lineitem
"""


@register("fn_cast_decimal", oracle=_FN_CAST_DECIMAL_ORACLE)
def fn_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        p.cast("decimal(12,2)").cast("string").alias("price_dec"),
        (p.cast("decimal(12,2)") * q.cast("decimal(12,2)")).cast("string").alias("line_total"),
        (p.cast("decimal(18,4)") - (p * F.col("l_discount")).cast("decimal(18,4)")).cast("string").alias("net_dec"),
        q.cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("roundtrip_key"),
        F.col("l_returnflag").try_cast("int").alias("bad_int"),
        q.cast("string").try_cast("double").alias("qty_again"),
    )


# --------------------------------------------------------------------------
# fn_try_safe — ANSI-mode error-safe arithmetic: try_divide/try_add/
# try_multiply return NULL instead of raising on division-by-zero and
# overflow (the ingestion posture for dirty numeric data — a single bad row
# must not kill a 100 TB job).  The oracle reproduces the NULL semantics
# with explicit guards; overflow probes use BIGINT bounds that genuinely
# overflow int64.
# --------------------------------------------------------------------------

_FN_TRY_SAFE_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CASE WHEN (CAST(l_quantity AS BIGINT) % 5) = 0 THEN NULL
       ELSE ROUND(l_extendedprice / (CAST(l_quantity AS BIGINT) % 5), 6)
  END AS price_per_bucket,
  CASE WHEN CAST(l_quantity AS BIGINT) = 0 THEN NULL
       ELSE CAST(FLOOR(CAST(FLOOR(l_extendedprice) AS BIGINT)
                       / CAST(l_quantity AS BIGINT)) AS BIGINT)
  END AS int_div,
  CASE WHEN l_orderkey * 7 > 10 THEN NULL
       ELSE (9223372036854775807 - 10) + l_orderkey * 7
  END AS near_overflow_add
FROM lineitem
WHERE l_orderkey < 100
"""


@register("fn_try_safe", oracle=_FN_TRY_SAFE_ORACLE)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    qb = F.col("l_quantity").cast("bigint") % 5
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), qb), 6).alias(
            "price_per_bucket"
        ),
        # floor() before the divide on BOTH sides: DuckDB rounds
        # double->bigint casts while Spark truncates, so only an explicit
        # floor is engine-neutral.
        F.floor(
            F.try_divide(
                F.floor("l_extendedprice").cast("bigint"),
                F.col("l_quantity").cast("bigint"),
            )
        ).cast("bigint").alias("int_div"),
        # try_add returns NULL on int64 overflow; the lit is max_long - 10,
        # so ONLY key 1 stays in range (7 <= 10) — key 2 already overflows
        # (14 > 10), and the oracle's `l_orderkey * 7 > 10 THEN NULL` twin
        # encodes exactly that boundary.
        F.try_add(
            F.lit(9223372036854775807 - 10), F.col("l_orderkey") * 7
        ).alias("near_overflow_add"),
    )


# --------------------------------------------------------------------------
# fn_url — URL parsing (host / path / query / fragment / single query
# parameter), the scalar family crawl-curation pipelines live on (the
# llm_url_dedup canonicalizer's building blocks exposed as functions).
# URLs are synthesized deterministically from the documents table with
# three shapes — full (query + fragment), query-only, and bare — so the
# missing-component NULL contract is exercised, not just the happy path.
#
# Cross-engine: Spark evaluates java.net.URI-backed parse_url; the
# oracle re-derives every component with RFC-3986-generic regexps +
# NULLIF (DuckDB's regexp_extract yields '' on no-match where parse_url
# yields NULL) — different parsers agreeing is the point of the gate.
# Scale: pure map-side scalar work, no shuffle beyond the final compare.
# Reference parity: URL SQL reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_URL_ORACLE = r"""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || doc_id
         || CASE WHEN doc_id % 5 = 0 THEN ''
                 ELSE '?q=spark&ref=' || lang END
         || CASE WHEN doc_id % 3 = 0 THEN '' ELSE '#s' || (doc_id % 4) END
           AS url
  FROM documents
)
SELECT doc_id, url,
       NULLIF(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '') AS host,
       NULLIF(regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1), '') AS path,
       NULLIF(regexp_extract(url, '\?([^#]*)', 1), '') AS query,
       NULLIF(regexp_extract(url, '#(.*)$', 1), '') AS fragment,
       NULLIF(regexp_extract(url, '(?:^|[?&])ref=([^&#]*)', 1), '') AS ref_param
FROM u
"""


@register("fn_url", oracle=_URL_ORACLE)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("?q=spark&ref="), F.col("lang"))
        ),
        F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("#s"), (F.col("doc_id") % 4).cast("string"))
        ),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("REF")).alias("fragment"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


# --------------------------------------------------------------------------
# fn_ipv4 — IPv4 parsing and CIDR membership via portable integer math
# (log-enrichment ETL: neither engine needs an inet extension).  Addresses
# synthesize deterministically from customer keys; the op parses octets,
# packs the 32-bit integer form, tests membership in 10.0.0.0/8 and
# 10.42.0.0/16, and extracts the /24 network prefix — the enrichment
# columns a clickstream pipeline joins on.  Pure map-side string/integer
# expressions; zero shuffles beyond the final aggregate-free projection.
# Reference parity: enrichment SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_FN_IPV4_ORACLE = """
WITH ip AS (
  SELECT c_custkey,
         CAST(CASE WHEN c_custkey % 3 = 0 THEN 10 ELSE 192 END AS BIGINT) AS o1,
         CAST(CASE WHEN c_custkey % 2 = 0 THEN 42 ELSE c_custkey % 200 END AS BIGINT) AS o2,
         CAST(c_custkey % 256 AS BIGINT) AS o3,
         CAST((c_custkey * 7) % 256 AS BIGINT) AS o4
  FROM customer
)
SELECT c_custkey,
       CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
         || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip,
       o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_int,
       o1 = 10 AS in_10_slash8,
       (o1 = 10 AND o2 = 42) AS in_10_42_slash16,
       CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
         || CAST(o3 AS VARCHAR) || '.0/24' AS net24
FROM ip
"""


@register("fn_ipv4", oracle=_FN_IPV4_ORACLE)
def fn_ipv4(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    o1 = F.when(k % 3 == 0, 10).otherwise(192).cast("bigint")
    o2 = F.when(k % 2 == 0, 42).otherwise(k % 200).cast("bigint")
    o3 = (k % 256).cast("bigint")
    o4 = ((k * 7) % 256).cast("bigint")
    ip = F.concat_ws(
        ".", o1.cast("string"), o2.cast("string"), o3.cast("string"), o4.cast("string")
    )
    return c.select(
        "c_custkey",
        ip.alias("ip"),
        (o1 * 16777216 + o2 * 65536 + o3 * 256 + o4).alias("ip_int"),
        (o1 == 10).alias("in_10_slash8"),
        ((o1 == 10) & (o2 == 42)).alias("in_10_42_slash16"),
        F.concat(
            F.concat_ws(".", o1.cast("string"), o2.cast("string"), o3.cast("string")),
            F.lit(".0/24"),
        ).alias("net24"),
    )


# --------------------------------------------------------------------------
# fn_timezone — IANA timezone conversion family over event timestamps:
# UTC instants rendered as wall-clock time in named zones (whole-hour,
# half-hour, and DST-observing offsets), local-hour extraction, and the
# "did the local calendar day roll over" flag international reporting
# needs.  ONLY the instant→wall direction is used: it is a total function
# (every instant has exactly one wall reading per zone), whereas
# wall→instant is ambiguous/undefined inside DST transitions and its
# disambiguation rule is engine-specific — the one-way discipline keeps
# the operator deterministic on BOTH engines (parity verified across the
# 2024 US DST boundaries; Spark `from_utc_timestamp` ≡ DuckDB
# `timezone(tz, ts AT TIME ZONE 'UTC')`, both anchored to UTC explicitly,
# independent of either engine's session timezone).
#
# Scale shape: pure per-row projection — map-side, no shuffle, whole-
# stage-codegen eligible; the probe filter bounds the compared output
# while 100 TB would stream through the same expressions.
# Reference parity: date/time SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT event_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS utc_ts,
       strftime(timezone('America/New_York', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS ny_ts,
       strftime(timezone('Asia/Kolkata', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS kolkata_ts,
       strftime(timezone('Asia/Tokyo', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS tokyo_ts,
       CAST(hour(timezone('America/New_York', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')) AS INT)
         AS ny_hour,
       CAST(date_trunc('day', timezone('Asia/Tokyo', CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'))
              AS DATE)
         <> CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS tokyo_day_rolled
FROM events
WHERE event_id < 500
"""


@register("fn_timezone", oracle=_TZ_ORACLE)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    fmt = "yyyy-MM-dd HH:mm:ss"
    ny = F.from_utc_timestamp("ts", "America/New_York")
    kk = F.from_utc_timestamp("ts", "Asia/Kolkata")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return ev.select(
        "event_id",
        F.date_format("ts", fmt).alias("utc_ts"),
        F.date_format(ny, fmt).alias("ny_ts"),
        F.date_format(kk, fmt).alias("kolkata_ts"),
        F.date_format(tk, fmt).alias("tokyo_ts"),
        F.hour(ny).cast("int").alias("ny_hour"),
        (F.to_date(tk) != F.to_date("ts")).alias("tokyo_day_rolled"),
    )
