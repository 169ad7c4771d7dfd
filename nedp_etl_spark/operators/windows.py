"""Window-function operators (SURVEY.md §2 'Window functions').

Determinism discipline: ranking functions that depend on a total order
(row_number, ntile, lag/lead) use a window spec with a unique tiebreaker
column; functions defined on the *value* order (rank, dense_rank,
percent_rank, cume_dist) use the value-only spec so ties behave per spec.
Both engines then agree exactly.

Scale note: every window here partitions by a key (o_custkey) — state per
partition is one customer's orders, so the shuffle is the only cost and no
executor ever materializes more than a partition.  Global (unpartitioned)
windows appear only in sort_multi (see sorts.py) where the output is
intentionally tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.operators.timeseries import _DAILY_CTE as _TS_DAILY_CTE
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import ts_str

# --------------------------------------------------------------------------
# win_ranking — row_number / rank / dense_rank / ntile / percent_rank.
# --------------------------------------------------------------------------

_WIN_RANKING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk,
  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
  ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority), 6) AS prank
FROM orders
"""


@register("win_ranking", oracle=_WIN_RANKING_ORACLE)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # total order (unique tiebreak) for row_number/ntile …
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    # … value order (ties allowed) for rank-family semantics.
    w_value = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_value).alias("rnk"),
        F.dense_rank().over(w_value).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
        F.round(F.percent_rank().over(w_value), 6).alias("prank"),
    )


# --------------------------------------------------------------------------
# win_analytic — lag / lead / first / last / cume_dist.
# --------------------------------------------------------------------------

_WIN_ANALYTIC_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROUND(LAG(o_totalprice, 1) OVER w, 6) AS prev_price,
  ROUND(LEAD(o_totalprice, 1) OVER w, 6) AS next_price,
  ROUND(LAG(o_totalprice, 2, -1.0) OVER w, 6) AS prev2_price,
  ROUND(FIRST_VALUE(o_totalprice) OVER w, 6) AS first_price,
  ROUND(LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS last_price,
  ROUND(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority), 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("win_analytic", oracle=_WIN_ANALYTIC_ORACLE)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cd = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    price = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag(price, 1).over(w), 6).alias("prev_price"),
        F.round(F.lead(price, 1).over(w), 6).alias("next_price"),
        F.round(F.lag(price, 2, -1.0).over(w), 6).alias("prev2_price"),
        F.round(F.first(price).over(w), 6).alias("first_price"),
        F.round(F.last(price).over(w_full), 6).alias("last_price"),
        F.round(F.cume_dist().over(w_cd), 6).alias("cd"),
    )


# --------------------------------------------------------------------------
# win_frame_rows — running sum + moving average with ROWS frames.
# --------------------------------------------------------------------------

_WIN_FRAME_ROWS_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
  ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM orders
"""


@register("win_frame_rows", oracle=_WIN_FRAME_ROWS_ORACLE)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    price = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(price).over(run), 4).alias("running_total"),
        F.round(F.avg(price).over(mov), 4).alias("moving_avg3"),
        F.count(F.lit(1)).over(run).alias("n_so_far"),
    )


# --------------------------------------------------------------------------
# win_frame_range — value-based RANGE frames.
# --------------------------------------------------------------------------

_WIN_FRAME_RANGE_ORACLE = """
SELECT
  c_nationkey,
  c_custkey,
  COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000,
  COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS n_band_500
FROM customer
"""


@register("win_frame_range", oracle=_WIN_FRAME_RANGE_ORACLE)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.count(F.lit(1)).over(w.rangeBetween(-1000, Window.currentRow)).alias("n_within_1000"),
        F.count(F.lit(1)).over(w.rangeBetween(-500, 500)).alias("n_band_500"),
    )


# --------------------------------------------------------------------------
# win_topk_per_group — classic rank-filter top-k.
# --------------------------------------------------------------------------

_WIN_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice, rn AS rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("win_topk_per_group", oracle=_WIN_TOPK_ORACLE)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalyst (3.5+) rewrites rank<=k filters into a WindowGroupLimit —
    # each shuffle partition keeps only k rows per group before the sort.
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            F.col("rn").alias("rank_in_cust"),
        )
    )


# --------------------------------------------------------------------------
# win_frame_interval — TIME-interval RANGE frames (trailing one hour per
# event): Spark windows take numeric RANGE bounds, so the idiom is
# ORDER BY unix seconds with the interval expressed in seconds — the
# per-event sliding aggregate that complements the bucketed stream
# windows (stream_sliding gives one row per window; this gives one row
# per EVENT with its trailing-hour context, e.g. for rate limiting or
# velocity features).  One shuffle on user_id; frame state is bounded by
# one user's events in one hour.
# --------------------------------------------------------------------------

_WIN_FRAME_INTERVAL_ORACLE = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("win_frame_interval", oracle=_WIN_FRAME_INTERVAL_ORACLE)
def win_frame_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Microsecond-precision ordering: unix_timestamp() truncates to whole
    # seconds, which would shift the frame boundary off the oracle's
    # full-precision INTERVAL arithmetic for sub-second timestamps.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double").alias("sum_trailing_1h"),
    )


# --------------------------------------------------------------------------
# win_rolling_median — exact rolling quantiles over a ROWS frame (the
# anomaly-detection primitive: compare each point to its trailing window's
# median/p90 instead of a mean that outliers drag).  Spark's PERCENTILE is
# a true aggregate, so it runs over any window frame; DuckDB's
# quantile_cont matches its linear interpolation exactly.  Scale: one
# shuffle on the partition key; frame state is the 7-row buffer per
# position — independent of corpus size.
# --------------------------------------------------------------------------

_WIN_ROLLING_MEDIAN_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROUND(quantile_cont(o_totalprice, 0.5) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_median7,
  ROUND(quantile_cont(o_totalprice, 0.9) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_p90_7
FROM orders
"""


@register("win_rolling_median", oracle=_WIN_ROLLING_MEDIAN_ORACLE)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    price = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percentile(price, 0.5).over(w), 6).alias("rolling_median7"),
        F.round(F.percentile(price, 0.9).over(w), 6).alias("rolling_p90_7"),
    )


# --------------------------------------------------------------------------
# win_pattern_match — MATCH_RECOGNIZE-style sequential pattern detection,
# an operator Spark SQL lacks natively (Flink CEP / Trino / Snowflake ship
# it as MATCH_RECOGNIZE): find STRICTLY-CONSECUTIVE view -> click ->
# purchase runs in each user's event stream.  Fixed-length patterns
# compile to lag() flags over one keyed window — the whole per-user event
# history is never materialized into a row (contrast ts_funnel, which
# answers the across-history ordered-steps question via per-step
# first-timestamps).  The tiebreaker (ts, event_id) totally orders each
# stream so both engines see the identical sequence.
#
# Scale shape: one shuffle on user_id; window state is one user's events;
# the match flags and the final per-user aggregate reuse that
# partitioning.  Variable-length patterns (A+ B*) would chain a
# gaps-and-islands run-id (the ts_streaks device) before the flags —
# still one keyed window, noted as the upgrade path.
# Reference parity: pattern SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PATTERN_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type, 2) OVER w AS p2,
         lag(event_type, 1) OVER w AS p1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hits AS (
  SELECT user_id, ts
  FROM seq
  WHERE p2 = 'view' AND p1 = 'click' AND event_type = 'purchase'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       strftime(CAST(MIN(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS first_match_ts
FROM hits
GROUP BY user_id
"""


@register("win_pattern_match", oracle=_PATTERN_ORACLE)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "ts", "event_type",
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
    )
    hits = seq.filter(
        (F.col("p2") == "view")
        & (F.col("p1") == "click")
        & (F.col("event_type") == "purchase")
    )
    # ts_str rendering: raw TimestampType would collect through the
    # driver's LOCAL timezone (datetime.fromtimestamp) while DuckDB hands
    # back naive wall-clock — string rendering is the repo's
    # deterministic-timestamp convention (util.ts_str).
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        ts_str(F.min("ts")).alias("first_match_ts"),
    )


# --------------------------------------------------------------------------
# win_pattern_var — VARIABLE-LENGTH sequential pattern detection (the
# win_pattern_match docstring's named upgrade path): match
# ``view+ click purchase`` — one or more strictly-consecutive views,
# then exactly one click, then a purchase — per user stream, greedy V+
# with skip-past-last-row, i.e. MATCH_RECOGNIZE's default semantics.
#
# The variable-length element compiles via RUN COMPRESSION (the
# ts_streaks gaps-and-islands device): a break flag (event_type changed
# vs lag) cumulates into a run id, runs collapse to one row each
# (etype, run_len, start), and on the RUN sequence the pattern becomes
# FIXED-length again — purchase-run preceded by a click-run of length
# exactly 1 preceded by a view-run — two lag flags, exactly like
# win_pattern_match.  (Length-1 click-run is load-bearing: in
# "view click click purchase" no alignment of V+ C P matches, because
# the element before the purchase-adjacent click is a click, not a
# view.)  n_views per match is the view-run length — the V+ measure
# MATCH_RECOGNIZE exposes as COUNT(V.*).
#
# Scale shape: ONE shuffle on user_id serves the row-numbering window,
# the run-id cumulation, and (after the run groupBy reuses the same key)
# the run-sequence window — window state is one user's events, the run
# table is strictly smaller than the event table, and no un-partitioned
# window exists anywhere (registry plan audit).
# Reference parity: pattern SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PATTERN_VAR_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER w AS rn,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
  FROM seq
),
runs AS (
  SELECT user_id, run_id, MIN(event_type) AS etype,
         COUNT(*) AS run_len, MIN(ts) AS start_ts, MIN(rn) AS start_rn
  FROM numbered GROUP BY user_id, run_id
),
flagged AS (
  SELECT user_id, etype, start_ts,
         lag(etype, 2) OVER w AS t2, lag(run_len, 2) OVER w AS l2,
         lag(etype, 1) OVER w AS t1, lag(run_len, 1) OVER w AS l1
  FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY start_rn)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MAX(l2) AS BIGINT) AS max_views,
       strftime(CAST(MIN(start_ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS first_match_ts
FROM flagged
WHERE etype = 'purchase' AND t1 = 'click' AND l1 = 1 AND t2 = 'view'
GROUP BY user_id
"""


@register("win_pattern_var", oracle=_PATTERN_VAR_ORACLE)
def win_pattern_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.row_number().over(w).alias("rn"),
        # IS DISTINCT FROM (null-safe): the first row of each user (lag is
        # NULL) must open a run, and a NULL event_type must not glue onto
        # a neighboring run.
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("brk"),
    )
    w_rn = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = seq.withColumn("run_id", F.sum("brk").over(w_rn))
    runs = numbered.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("etype"),
        F.count(F.lit(1)).alias("run_len"),
        F.min("ts").alias("start_ts"),
        F.min("rn").alias("start_rn"),
    )
    w_run = Window.partitionBy("user_id").orderBy("start_rn")
    flagged = runs.select(
        "user_id", "etype", "start_ts",
        F.lag("etype", 2).over(w_run).alias("t2"),
        F.lag("run_len", 2).over(w_run).alias("l2"),
        F.lag("etype", 1).over(w_run).alias("t1"),
        F.lag("run_len", 1).over(w_run).alias("l1"),
    )
    hits = flagged.filter(
        (F.col("etype") == "purchase")
        & (F.col("t1") == "click")
        & (F.col("l1") == 1)
        & (F.col("t2") == "view")
    )
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.max("l2").cast("bigint").alias("max_views"),
        ts_str(F.min("start_ts")).alias("first_match_ts"),
    )


# --------------------------------------------------------------------------
# win_distribution — the DISTRIBUTION window family win_ranking leaves
# out: percent_rank (relative rank in [0,1]), cume_dist (empirical CDF
# value), and ntile(4) (equal-height quartile assignment), per priority
# class ordered by order value.  These are the SQL:2003 distribution
# functions BI layers lean on for percentile bands and quartile cohorts.
#
# Determinism: the ORDER BY carries the unique o_orderkey tiebreaker, so
# rank is total and both engines compute identical (rank-1)/(n-1) and
# rank/n doubles from identical integer inputs (6-dp rounded for the
# hash gate); ntile's uneven-bucket rule (first n % 4 buckets get the
# extra row) is the same SQL-standard definition in Spark and DuckDB.
# Scale shape: one hash exchange on the priority key serves all three
# functions in a single Window operator; partition state is one priority
# class's rows.
# Reference parity: distribution-function SQL reaches the reference only
# as dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("win_distribution", oracle=_DISTRIBUTION_ORACLE)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# win_rolling_regression — per-series rolling OLS trend: over the last 7
# daily observations (ROWS frame), the least-squares slope of value vs
# epoch-day — the windowed upgrade of ts_forecast_linear's global fit and
# the standard "is this metric accelerating" monitor.
#
# Exactness discipline (the sliding-frame rule from SCALE.md): frame sums
# of doubles accumulate in engine-specific order, so every summed term is
# an INTEGER — v quantized to 6-dp fixed point (vq), x as epoch days —
# and the OLS numerator/denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) are
# exact int64 arithmetic on both engines; the single float division
# happens once per row on identical integers.  Degenerate frames (n = 1,
# den = 0) are guarded on the EXACT integer den, not a float epsilon.
#
# Scale shape: the corpus collapses to (series, day) daily partials first
# (map-side combine — the ts_holt shape); the five frame sums share ONE
# series-keyed sort window; no self-joins, no global exchange.
# Reference parity: trend SQL reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ROLL_REG_ORACLE = f"""
WITH {_TS_DAILY_CTE},
q AS (
  SELECT event_type, d, v,
         d - DATE '1970-01-01' AS x,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
s AS (
  SELECT event_type, d, v,
         COUNT(*) OVER w AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(vq) OVER w AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * vq) OVER w AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM q
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, d, v, CAST(n AS INT) AS n_window,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE FLOOR(CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy
                            AS VARCHAR) AS DOUBLE) / 1000000.0
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                       * 1000000.0 + 0.5) / 1000000.0
       END AS slope
FROM s
"""


@register("win_rolling_regression", oracle=_ROLL_REG_ORACLE)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.operators.timeseries import _daily

    daily = _daily(load(spark, sf_dir, "events"))
    q = daily.select(
        "event_type",
        "d",
        "v",
        F.datediff("d", F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("bigint").alias("vq"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    s = q.select(
        "event_type",
        "d",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("vq").over(w).alias("sy"),
        # x·vq ≈ 2e4·9.2e18 at the full value domain — integer
        # decimal/HUGEINT product, never long (round-12 magnitude sweep)
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("vq")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    # FLOOR(x·1e6 + 0.5)/1e6, not ROUND(x, 6): Spark's round goes through
    # BigDecimal's shortest-decimal repr (HALF_UP on "-0.5073285") while
    # DuckDB rounds the binary double (…2849999… → down) — they disagree
    # on half-ulp boundaries (found at sf0.01).  The explicit quantize is
    # the same IEEE op sequence on both engines, so it's bit-identical.
    raw = num.cast("double") / 1_000_000.0 / den.cast("double")
    return s.select(
        "event_type",
        "d",
        "v",
        F.col("n").cast("int").alias("n_window"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.floor(raw * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0)
        .alias("slope"),
    )
