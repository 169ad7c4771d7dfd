"""Remaining scalar/aggregate/window surface: boolean aggregates,
nth_value windows, trigonometry, printf-style formatting.  All built-ins;
trig outputs are rounded to 6 dp (libm last-ulp differences between
engines are far below that at these magnitudes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# agg_any_all — bool_and / bool_or per group.
# --------------------------------------------------------------------------

_AGG_ANY_ALL_ORACLE = """
SELECT
  o_orderstatus,
  bool_and(o_totalprice > 1000) AS all_over_1k,
  bool_or(o_totalprice > 400000) AS any_over_400k,
  COUNT(*) FILTER (WHERE o_totalprice > 400000) AS n_over_400k
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_any_all", oracle=_AGG_ANY_ALL_ORACLE)
def agg_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 400000
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(big).alias("any_over_400k"),
        F.count(F.when(big, 1)).alias("n_over_400k"),
    )


# --------------------------------------------------------------------------
# win_nth_value — nth_value with a total order.
# --------------------------------------------------------------------------

_WIN_NTH_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS second_highest,
       ROUND(NTH_VALUE(o_totalprice, 3) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS third_highest
FROM orders
"""


@register("win_nth_value", oracle=_WIN_NTH_ORACLE)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.nth_value("o_totalprice", 2).over(w), 6).alias("second_highest"),
        F.round(F.nth_value("o_totalprice", 3).over(w), 6).alias("third_highest"),
    )


# --------------------------------------------------------------------------
# fn_trig — trigonometric / inverse-trig functions.
# --------------------------------------------------------------------------

_FN_TRIG_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  ROUND(sin(l_discount), 6) AS sin_d,
  ROUND(cos(l_discount), 6) AS cos_d,
  ROUND(tan(l_discount), 6) AS tan_d,
  ROUND(atan2(l_discount, l_tax + 0.01), 6) AS atan2_dt,
  ROUND(asin(l_discount), 6) AS asin_d,
  ROUND(degrees(l_discount), 6) AS deg_d,
  ROUND(pi(), 6) AS pi_v
FROM lineitem WHERE l_orderkey < 2000
"""


@register("fn_trig", oracle=_FN_TRIG_ORACLE)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    d, t = F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(d), 6).alias("sin_d"),
        F.round(F.cos(d), 6).alias("cos_d"),
        F.round(F.tan(d), 6).alias("tan_d"),
        F.round(F.atan2(d, t + 0.01), 6).alias("atan2_dt"),
        F.round(F.asin(d), 6).alias("asin_d"),
        F.round(F.degrees(d), 6).alias("deg_d"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_v"),
    )


# --------------------------------------------------------------------------
# fn_format — printf-style string formatting.
# --------------------------------------------------------------------------

_FN_FORMAT_ORACLE = """
SELECT
  o_orderkey,
  printf('%d/%s', o_orderkey, o_orderstatus) AS key_status,
  printf('%08d', o_orderkey) AS key_pad,
  printf('%.2f', ROUND(o_totalprice, 2)) AS price_2dp
FROM orders WHERE o_orderkey < 3000
"""


@register("fn_format", oracle=_FN_FORMAT_ORACLE)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.format_string("%d/%s", "o_orderkey", "o_orderstatus").alias("key_status"),
        F.format_string("%08d", "o_orderkey").alias("key_pad"),
        F.format_string("%.2f", F.round("o_totalprice", 2)).alias("price_2dp"),
    )


# --------------------------------------------------------------------------
# join_fuzzy_levenshtein — fuzzy string matching (entity-resolution staple):
# candidate pairs of part names within edit distance 3.  Blocked on length
# bands: edit distance <= 3 implies |len(a)-len(b)| <= 3, so equi-joining on
# width-4 length bands (one side exploded to its band +/- 1) is lossless and
# keeps the plan a hash join — the quadratic edit-distance only runs inside
# a band.  At 100 TB the band key would also fold in a cheap canonical
# prefix; the shape (explode small constant factor -> equi join) is the same.
# --------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 150)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM p a JOIN p b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@register("join_fuzzy_levenshtein", oracle=_FUZZY_ORACLE)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    band = F.floor(F.length("p_name") / 4)
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        band.alias("band"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "band")
        .filter((F.col("key_a") < F.col("key_b")) & (dist <= 3))
        .select("key_a", "key_b", "name_a", "name_b", dist.cast("bigint").alias("edit_dist"))
    )


# --------------------------------------------------------------------------
# agg_histogram — fixed-width binning (profiling/distribution staple).
# width_bucket has no DuckDB twin; the floor-division bin is the portable
# (and at-scale identical) formulation.
# --------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
       CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bin_lo,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice), 4) AS bin_avg
FROM orders
GROUP BY 1, 2
"""


@register("agg_histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000)
    return (
        o.groupBy(
            bin_.cast("bigint").alias("bin"),
            (bin_ * 50000).cast("bigint").alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("bin_avg"),
        )
    )


# --------------------------------------------------------------------------
# fn_geo_haversine — geospatial enrichment of the customer dimension:
# deterministic synthetic coordinates (integer-mod derivation from
# c_custkey, identical on both engines), great-circle distance and initial
# bearing to a fixed reference point (haversine / forward-azimuth
# formulas), and the 1°×1° grid cell id — the map-side geo bucketing that
# feeds join_spatial_grid's cell equi-join.  The reference reaches geo
# logic only as dbt-model SQL (dbtoperator.py:273-274).
#
# Cross-engine determinism: degrees→radians uses the explicit literal
# 0.017453292519943295 (same decimal string parses to the same double on
# both engines — the graph_pagerank _TELEPORT discipline) rather than
# RADIANS(), whose internal constant is engine-private; sin/asin/atan2
# pass the q6 quantize like fn_trig.  Scale: pure map-side projection.
# --------------------------------------------------------------------------

_GEO_RAD = "0.017453292519943295"  # pi/180, shared literal
_GEO_R2 = "12742.0176"             # 2 * mean Earth radius (km)
_GEO_LAT0 = "40.7128"              # reference point (NYC)
_GEO_LON0 = "-74.006"

_FN_GEO_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 18000) / 100.0 - 90.0 + 0.005 AS lat,
         (c_custkey * 104729 % 36000) / 100.0 - 180.0 + 0.005 AS lon
  FROM customer
),
r AS (
  SELECT c_custkey, lat, lon,
         lat * {_GEO_RAD} AS p1, {_GEO_LAT0} * {_GEO_RAD} AS p2,
         ({_GEO_LAT0} - lat) * {_GEO_RAD} AS dp,
         ({_GEO_LON0} - lon) * {_GEO_RAD} AS dl
  FROM pts
)
SELECT c_custkey, lat, lon,
       CAST(FLOOR(lat) AS BIGINT) || ':' || CAST(FLOOR(lon) AS BIGINT)
         AS grid_cell,
       FLOOR({_GEO_R2} * ASIN(SQRT(
           SIN(dp / 2.0) * SIN(dp / 2.0)
           + COS(p1) * COS(p2) * SIN(dl / 2.0) * SIN(dl / 2.0)))
         * 1000000.0 + 0.5) / 1000000.0 AS dist_km,
       FLOOR(FMOD(ATAN2(SIN(dl) * COS(p2),
                        COS(p1) * SIN(p2) - SIN(p1) * COS(p2) * COS(dl))
                   / {_GEO_RAD} + 360.0, 360.0)
             * 1000000.0 + 0.5) / 1000000.0 AS bearing_deg
FROM r
"""


@register("fn_geo_haversine", oracle=_FN_GEO_ORACLE)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    rad = float(_GEO_RAD)
    lat = (F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0 + 0.005
    lon = (F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0 + 0.005
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    p1 = F.col("lat") * rad
    p2 = F.lit(float(_GEO_LAT0)) * rad
    dp = (F.lit(float(_GEO_LAT0)) - F.col("lat")) * rad
    dl = (F.lit(float(_GEO_LON0)) - F.col("lon")) * rad
    hav = (
        F.sin(dp / 2.0) * F.sin(dp / 2.0)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2.0) * F.sin(dl / 2.0)
    )
    bearing = (
        F.atan2(
            F.sin(dl) * F.cos(p2),
            F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
        )
        / rad
        + 360.0
    ) % 360.0
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.concat(
            F.floor("lat").cast("bigint").cast("string"),
            F.lit(":"),
            F.floor("lon").cast("bigint").cast("string"),
        ).alias("grid_cell"),
        (
            F.floor(
                F.lit(float(_GEO_R2)) * F.asin(F.sqrt(hav)) * 1_000_000.0 + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("dist_km"),
        (F.floor(bearing * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "bearing_deg"
        ),
    )


# --------------------------------------------------------------------------
# fn_luhn — Luhn mod-10 checksum over synthetic 16-digit account numbers
# (deterministically derived from c_custkey so both engines validate the
# identical payloads): the standard PII-detection primitive — a
# "looks like a card number" regex hit is only actionable if the Luhn
# check passes, so a scrubbing pipeline (llm_pii_scrub) runs exactly this
# digit fold.  Every 2nd digit from the RIGHT doubles (minus 9 when > 9)
# — the rightmost check digit itself never doubles; valid ⇔ total % 10 == 0.  One synthetic number per customer plus a
# deliberately-corrupted variant (last digit +1 mod 10) that must FAIL.
#
# Scale: pure map-side digit folds over one scan; the 16-step fold is a
# fixed-size transform over the digit array on both engines.
# --------------------------------------------------------------------------

_LUHN_NUM_SQL = "lpad(CAST(4000000000000000 + (c_custkey * 685417 % 999999999999) AS VARCHAR), 16, '0')"


def _luhn_total_sql(s: str) -> str:
    # 1-based position i from the LEFT in a 16-digit string: the check
    # digit (i=16) is NEVER doubled; doubling starts second-from-right,
    # i.e. ODD positions from the left here.
    return (
        f"(SELECT SUM(CASE WHEN i % 2 = 1 THEN "
        f"CASE WHEN 2 * CAST(substr({s}, CAST(i AS INT), 1) AS INT) > 9 "
        f"THEN 2 * CAST(substr({s}, CAST(i AS INT), 1) AS INT) - 9 "
        f"ELSE 2 * CAST(substr({s}, CAST(i AS INT), 1) AS INT) END "
        f"ELSE CAST(substr({s}, CAST(i AS INT), 1) AS INT) END) "
        f"FROM generate_series(1, 16) t(i))"
    )


_FN_LUHN_ORACLE = f"""
WITH nums AS (
  SELECT c_custkey, {_LUHN_NUM_SQL} AS num FROM customer
),
adj AS (
  SELECT c_custkey, num,
         {_luhn_total_sql('num')} AS total
  FROM nums
),
fixed AS (
  -- repair the check digit so `valid_num` ALWAYS passes Luhn
  SELECT c_custkey,
         substr(num, 1, 15)
           || CAST((CAST(substr(num, 16, 1) AS INT) + 10
                    - total % 10) % 10 AS VARCHAR) AS valid_num
  FROM adj
),
probes AS (
  SELECT c_custkey, valid_num,
         substr(valid_num, 1, 15)
           || CAST((CAST(substr(valid_num, 16, 1) AS INT) + 1) % 10
                   AS VARCHAR) AS corrupt_num
  FROM fixed
)
SELECT c_custkey, valid_num,
       ({_luhn_total_sql('valid_num')}) % 10 = 0 AS valid_passes,
       ({_luhn_total_sql('corrupt_num')}) % 10 = 0 AS corrupt_passes
FROM probes
"""


@register("fn_luhn", oracle=_FN_LUHN_ORACLE)
def fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    num = F.lpad(
        (
            F.lit(4000000000000000)
            + (F.col("c_custkey") * 685417 % 999999999999)
        ).cast("string"),
        16,
        "0",
    )

    def luhn_total(s):
        # digits with 1-based index over a materialized char array
        digits = F.split(s, "")
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.when(
                    i % 2 == 1,
                    F.when(
                        2 * F.element_at(digits, i).cast("int") > 9,
                        2 * F.element_at(digits, i).cast("int") - 9,
                    ).otherwise(2 * F.element_at(digits, i).cast("int")),
                ).otherwise(F.element_at(digits, i).cast("int")),
            ),
            F.lit(0),
            lambda a, v: a + v,
        )

    adj = c.select("c_custkey", num.alias("num")).withColumn(
        "total", luhn_total(F.col("num"))
    )
    fixed = adj.select(
        "c_custkey",
        F.concat(
            F.substring("num", 1, 15),
            (
                (F.substring("num", 16, 1).cast("int") + 10 - F.col("total") % 10)
                % 10
            ).cast("string"),
        ).alias("valid_num"),
    )
    probes = fixed.select(
        "c_custkey",
        "valid_num",
        F.concat(
            F.substring("valid_num", 1, 15),
            ((F.substring("valid_num", 16, 1).cast("int") + 1) % 10).cast("string"),
        ).alias("corrupt_num"),
    )
    return probes.select(
        "c_custkey",
        "valid_num",
        (luhn_total(F.col("valid_num")) % 10 == 0).alias("valid_passes"),
        (luhn_total(F.col("corrupt_num")) % 10 == 0).alias("corrupt_passes"),
    )


# --------------------------------------------------------------------------
# fn_geohash — geohash encode/decode (Niemeyer 2008, public domain): the
# prefix-joinable spatial key — equal 4-char prefixes ⇒ same ~40 km cell,
# so geo joins become string-prefix equi-joins (the hierarchical upgrade
# of fn_geo_haversine's flat 1°×1° grid).  Classic bisection is a loop;
# here both engines compute the IDENTICAL branch-free form: scale
# lat/lon to 20-bit integers (binary bisection ≡ floor scaling), Horner-
# interleave lon/lat bits into the 40-bit code over a literal range
# (shift-by-column doesn't exist in either engine — exact pow(2,k)
# doubles cast to BIGINT do), then 8× base32 substr.  The decoded cell
# center is recovered FROM the code (not the inputs), proving the
# interleave invertible.
#
# Scale: pure map-side projection, zero shuffles.  Parity: every power
# of two is exact in binary doubles; centers q6.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"

_FN_GEOHASH_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 18000) / 100.0 - 90.0 + 0.005 AS lat,
         (c_custkey * 104729 % 36000) / 100.0 - 180.0 + 0.005 AS lon
  FROM customer WHERE c_custkey < 400
),
bits AS (
  SELECT c_custkey, lat, lon,
         LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 1048576.0) AS BIGINT),
               1048575) AS latb,
         LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * 1048576.0) AS BIGINT),
               1048575) AS lonb
  FROM pts
),
z AS (
  SELECT c_custkey, lat, lon, latb, lonb,
         list_sum(list_transform(range(0, 20), k ->
           ((lonb // CAST(pow(2.0, k) AS BIGINT)) % 2)
             * CAST(pow(2.0, 2 * k + 1) AS BIGINT)
           + ((latb // CAST(pow(2.0, k) AS BIGINT)) % 2)
             * CAST(pow(2.0, 2 * k) AS BIGINT))) AS code
  FROM bits
),
dec AS (
  SELECT c_custkey, lat, lon, code,
         list_sum(list_transform(range(0, 20), k ->
           ((code // CAST(pow(2.0, 2 * k) AS BIGINT)) % 2)
             * CAST(pow(2.0, k) AS BIGINT))) AS latd,
         list_sum(list_transform(range(0, 20), k ->
           ((code // CAST(pow(2.0, 2 * k + 1) AS BIGINT)) % 2)
             * CAST(pow(2.0, k) AS BIGINT))) AS lond
  FROM z
),
gh AS (
  SELECT c_custkey, lat, lon, latd, lond,
         substr('{_GH_ALPHA}',
                CAST((code // 34359738368) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 1073741824) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 33554432) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 1048576) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 32768) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 1024) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST((code // 32) % 32 AS INT) + 1, 1)
         || substr('{_GH_ALPHA}',
                CAST(code % 32 AS INT) + 1, 1) AS geohash
  FROM dec
)
SELECT c_custkey, lat, lon, geohash, substr(geohash, 1, 4) AS geohash4,
       FLOOR(((latd + 0.5) / 1048576.0 * 180.0 - 90.0) * 1000000.0 + 0.5)
         / 1000000.0 AS center_lat,
       FLOOR(((lond + 0.5) / 1048576.0 * 360.0 - 180.0) * 1000000.0 + 0.5)
         / 1000000.0 AS center_lon
FROM gh
"""


@register("fn_geohash", oracle=_FN_GEOHASH_ORACLE)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    lat = (F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0 + 0.005
    lon = (F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0 + 0.005
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    latb = F.least(
        F.floor((F.col("lat") + 90.0) / 180.0 * 1048576.0).cast("bigint"),
        F.lit(1048575),
    )
    lonb = F.least(
        F.floor((F.col("lon") + 180.0) / 360.0 * 1048576.0).cast("bigint"),
        F.lit(1048575),
    )
    bits = pts.select("c_custkey", "lat", "lon", latb.alias("latb"), lonb.alias("lonb"))

    def _interleave(lo: F.Column, la: F.Column) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(19)),
            F.lit(0).cast("bigint"),
            lambda acc, k: acc
            + (lo / F.pow(F.lit(2.0), k).cast("bigint")).cast("bigint") % 2
            * F.pow(F.lit(2.0), 2 * k + 1).cast("bigint")
            + (la / F.pow(F.lit(2.0), k).cast("bigint")).cast("bigint") % 2
            * F.pow(F.lit(2.0), 2 * k).cast("bigint"),
        )

    z = bits.withColumn("code", _interleave(F.col("lonb"), F.col("latb")))

    def _debits(code: F.Column, odd: int) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(19)),
            F.lit(0).cast("bigint"),
            lambda acc, k: acc
            + (code / F.pow(F.lit(2.0), 2 * k + odd).cast("bigint")).cast("bigint")
            % 2
            * F.pow(F.lit(2.0), k).cast("bigint"),
        )

    dec = z.select(
        "c_custkey",
        "lat",
        "lon",
        "code",
        _debits(F.col("code"), 0).alias("latd"),
        _debits(F.col("code"), 1).alias("lond"),
    )
    # base32 digit lookup: element_at over the split alphabet (F.substring
    # needs a literal position; the digit index is a column)
    alpha = F.split(F.lit(" ".join(_GH_ALPHA)), " ")
    gh = F.concat(
        *[
            F.element_at(
                alpha,
                (
                    (F.col("code") / F.lit(2 ** (35 - 5 * i)).cast("bigint"))
                    .cast("bigint")
                    % 32
                ).cast("int")
                + 1,
            )
            for i in range(8)
        ]
    )
    out = dec.withColumn("geohash", gh)
    return out.select(
        "c_custkey",
        "lat",
        "lon",
        "geohash",
        F.substring("geohash", 1, 4).alias("geohash4"),
        (
            F.floor(
                ((F.col("latd") + 0.5) / 1048576.0 * 180.0 - 90.0) * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("center_lat"),
        (
            F.floor(
                ((F.col("lond") + 0.5) / 1048576.0 * 360.0 - 180.0) * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("center_lon"),
    )


# --------------------------------------------------------------------------
# join_spatial_neighbors — nearest-neighbor geo join with 3×3 neighbor-
# cell expansion: join_spatial_grid's plain cell equi-join MISSES pairs
# that straddle a cell boundary (two points metres apart in adjacent
# cells).  The standard fix at scale: expand the probe side to its 9
# surrounding 1° cells map-side (×9, constant), equi-join on cell id
# (longitude wraps at ±180°), score candidates with the exact haversine,
# and keep each point's nearest neighbor within the 3×3 patch.  Correct
# whenever the search radius ≤ one cell (~111 km here — points further
# than that from everyone report no neighbor, by design).
#
# Scale shape: ×9 map-side expansion, ONE cell equi-join (never
# all-pairs), per-point ranking windows bounded by the 9-cell candidate
# population.  Parity: the fn_geo_haversine literals and q6 ladder;
# nearest-neighbor ties break on neighbor key.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SPATIAL_NBR_ORACLE = f"""
WITH pts AS (
  -- denser regional derivation than fn_geo_haversine's global scatter:
  -- 400 points over a 20 x 40 degree region so adjacent cells are populated
  SELECT c_custkey,
         (c_custkey * 7919 % 2000) / 100.0 + 0.005 AS lat,
         (c_custkey * 104729 % 4000) / 100.0 + 0.005 AS lon,
         CAST(FLOOR((c_custkey * 7919 % 2000) / 100.0 + 0.005)
              AS BIGINT) AS cy,
         CAST(FLOOR((c_custkey * 104729 % 4000) / 100.0 + 0.005)
              AS BIGINT) AS cx
  FROM customer WHERE c_custkey < 400
),
probe AS (
  SELECT p.*, p.cy + dy.dy AS ny,
         ((p.cx + dx.dx + 180 + 360) % 360) - 180 AS nx
  FROM pts p,
       UNNEST([-1, 0, 1]) dy(dy),
       UNNEST([-1, 0, 1]) dx(dx)
),
cand AS (
  SELECT a.c_custkey, a.lat AS alat, a.lon AS alon,
         b.c_custkey AS neighbor_key, b.lat AS blat, b.lon AS blon,
         a.cy = b.cy AND a.cx = b.cx AS same_cell
  FROM probe a JOIN pts b ON b.cy = a.ny AND b.cx = a.nx
  WHERE b.c_custkey <> a.c_custkey
),
scored AS (
  SELECT c_custkey, neighbor_key, same_cell,
         FLOOR({_GEO_R2} * ASIN(SQRT(
             SIN((blat - alat) * {_GEO_RAD} / 2.0)
               * SIN((blat - alat) * {_GEO_RAD} / 2.0)
             + COS(alat * {_GEO_RAD}) * COS(blat * {_GEO_RAD})
               * SIN((blon - alon) * {_GEO_RAD} / 2.0)
               * SIN((blon - alon) * {_GEO_RAD} / 2.0)))
           * 1000000.0 + 0.5) / 1000000.0 AS dist_km
  FROM cand
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                               ORDER BY dist_km, neighbor_key) AS rn
  FROM scored
)
SELECT c_custkey, neighbor_key, dist_km, same_cell
FROM rk WHERE rn = 1
"""


@register("join_spatial_neighbors", oracle=_SPATIAL_NBR_ORACLE)
def join_spatial_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    rad, r2 = float(_GEO_RAD), float(_GEO_R2)
    # regional derivation (20 x 40 degrees) — see oracle comment
    lat = (F.col("c_custkey") * 7919 % 2000) / 100.0 + 0.005
    lon = (F.col("c_custkey") * 104729 % 4000) / 100.0 + 0.005
    pts = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat).cast("bigint").alias("cy"),
        F.floor(lon).cast("bigint").alias("cx"),
    ).localCheckpoint(eager=True)  # probe and build sides
    probe = pts.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy")
    ).select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).select(
        "c_custkey",
        "lat",
        "lon",
        "cy",
        "cx",
        (F.col("cy") + F.col("dy")).alias("ny"),
        (((F.col("cx") + F.col("dx") + 180 + 360) % 360) - 180).alias("nx"),
    )
    b = pts.select(
        F.col("c_custkey").alias("neighbor_key"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        F.col("cy").alias("ny"),
        F.col("cx").alias("nx"),
        F.col("cy").alias("bcy"),
        F.col("cx").alias("bcx"),
    )
    cand = probe.join(b, ["ny", "nx"]).filter(
        F.col("neighbor_key") != F.col("c_custkey")
    )
    dlat = (F.col("blat") - F.col("lat")) * rad / 2.0
    dlon = (F.col("blon") - F.col("lon")) * rad / 2.0
    dist = (
        F.floor(
            r2
            * F.asin(
                F.sqrt(
                    F.sin(dlat) * F.sin(dlat)
                    + F.cos(F.col("lat") * rad)
                    * F.cos(F.col("blat") * rad)
                    * F.sin(dlon)
                    * F.sin(dlon)
                )
            )
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    scored = cand.select(
        "c_custkey",
        "neighbor_key",
        ((F.col("cy") == F.col("bcy")) & (F.col("cx") == F.col("bcx"))).alias(
            "same_cell"
        ),
        dist.alias("dist_km"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "neighbor_key")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "neighbor_key", "dist_km", "same_cell")
    )
