"""Time-series operators: sessionization, calendar gap-fill, ROLLUP.

The reference only reaches time-series semantics through dbt-generated SQL
(``/root/reference/dbtoperator.py:273-274``); these are the hypertable-style
operations an analytics engine is expected to provide natively.

Scale notes:
- ``ts_sessionize`` is two windows over the same ``user_id`` partitioning —
  one shuffle total, per-key state bounded by one user's events.  At 100 TB
  the user_id key space is wide, so partitions stay balanced.
- ``ts_gapfill`` builds the calendar *per group* by exploding
  ``sequence(min_day, max_day)`` inside the grouped row — no driver loop, no
  cross join; the explode output is proportional to (groups x days), which is
  the result size itself.  The forward-fill is one more window over the same
  ``event_type`` partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import (
    dsum,
    dsum_prod,
    ohuge_dbl,
    oqprod,
    osum,
    osum_prod,
    q6,
    qprod,
    ts_str,
)

# --------------------------------------------------------------------------
# agg_rollup — ROLLUP over two keys (hierarchical subtotals; 3 grouping sets
# in one Expand pass, vs CUBE's 4 — see aggregates.agg_cube).
# --------------------------------------------------------------------------

_AGG_ROLLUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
  COUNT(*) AS n,
  {osum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=_AGG_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
    )


# --------------------------------------------------------------------------
# ts_sessionize — batch sessionization: a new session starts when a user's
# inter-event gap exceeds 30 minutes.  lag → boundary flag → running sum
# assigns session numbers; then one grouped aggregate per session.
# --------------------------------------------------------------------------

_TS_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_num
  FROM flagged
)
SELECT
  user_id,
  CAST(session_num AS INT) AS session_num,
  COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess
GROUP BY user_id, session_num
"""


@register("ts_sessionize", oracle=_TS_SESSIONIZE_ORACLE)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: cast("long") floors to whole SECONDS, which
    # disagrees with the oracle's exact interval compare for true gaps in
    # (1800 s, 1801 s) — e.g. events at :00.1 and 30:00.9 are one session
    # under a floored diff (1800 ≯ 1800) but two under the real 1800.8 s
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = flagged.withColumn(
        "session_num",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        "user_id", F.col("session_num").cast("int").alias("session_num")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_str(F.min("ts")).alias("session_start"),
        ts_str(F.max("ts")).alias("session_end"),
    )


# --------------------------------------------------------------------------
# ts_gapfill — dense daily calendar per event_type over that type's active
# range; days with no events appear with n_events = 0 and the daily average
# value forward-filled from the last observed day.  The 6-dp round happens
# BEFORE the carry-forward so both engines carry identical values.
# --------------------------------------------------------------------------

_TS_GAPFILL_ORACLE = """
WITH daily AS (
  -- mirror of the Spark side's plausible_event_time guard on the daily
  -- grid key (sentinel days are junk, not observations — ADVICE r11):
  -- NULL ts stays on the NULL path, out-of-window days are routed out
  SELECT event_type, CAST(ts AS DATE) AS d,
         COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_val
  FROM events
  WHERE ts IS NULL
     OR CAST(ts AS DATE) BETWEEN DATE '1677-09-22' AND DATE '2262-04-10'
  GROUP BY event_type, CAST(ts AS DATE)
),
spans AS (
  SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY event_type
),
cal AS (
  SELECT s.event_type, CAST(u.day AS DATE) AS d
  FROM spans s,
       LATERAL unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS u(day)
)
SELECT
  cal.event_type,
  strftime(cal.d, '%Y-%m-%d') AS day,
  COALESCE(daily.n, 0) AS n_events,
  last_value(daily.avg_val IGNORE NULLS) OVER (
    PARTITION BY cal.event_type ORDER BY cal.d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_avg_val
FROM cal LEFT JOIN daily
  ON daily.event_type = cal.event_type AND daily.d = cal.d
"""


@register("ts_gapfill", oracle=_TS_GAPFILL_ORACLE)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import plausible_event_time

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_val"),
    ).filter(plausible_event_time("d"))
    # ^ the grid below is sequence(min d, max d): ONE '9999-12-31' parser
    # sentinel would stretch it to ~3M days per group (timestamp-extremes
    # sweep: 1 s → 122 s at sf0.001; at 100 TB a silent 1000× output).
    # Sentinel days are junk, not observations — they neither anchor nor
    # receive gapfilled rows.
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("d"),
        )
    )
    joined = cal.join(daily, ["event_type", "d"], "left")
    wff = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("avg_val", ignorenulls=True).over(wff).alias("ff_avg_val"),
    )


# --------------------------------------------------------------------------
# ts_bucket_rollup — hypertable continuous-aggregate pattern: raw events →
# 6-hour bucket partials (count + exact decimal sum) → daily level
# re-aggregated FROM the partials, never from raw rows.  That second hop is
# the scale story: a 100 TB table re-rolls from the (groups x buckets)-sized
# partial table, and the daily avg derives from carried sums, not a re-scan.
# --------------------------------------------------------------------------

_TS_BUCKET_ROLLUP_ORACLE = """
WITH b AS (
  SELECT event_type,
         time_bucket(INTERVAL '6 hours', ts) AS bucket,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS s
  FROM events GROUP BY event_type, time_bucket(INTERVAL '6 hours', ts)
)
SELECT
  event_type,
  strftime(CAST(bucket AS DATE), '%Y-%m-%d') AS day,
  CAST(COUNT(*) AS INT) AS n_buckets,
  CAST(SUM(n) AS BIGINT) AS n_events,
  CAST(SUM(s) AS DOUBLE) AS sum_value,
  ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6) AS avg_value
FROM b GROUP BY event_type, CAST(bucket AS DATE)
"""


@register("ts_bucket_rollup", oracle=_TS_BUCKET_ROLLUP_ORACLE)
def ts_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.window("ts", "6 hours").start.alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
    )
    return buckets.groupBy(
        "event_type", F.date_format(F.col("bucket").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets"),
        F.sum("n").alias("n_events"),
        F.sum("s").cast("double").alias("sum_value"),
        F.round(F.sum("s").cast("double") / F.sum("n"), 6).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# ts_anomaly — trailing-window z-score anomaly detection on the daily event
# counts per type: each day is scored against the mean/stddev of the 7
# PRECEDING days (frame excludes the current row, so the detector never
# "explains away" the spike it is scoring).  One shuffle on event_type; the
# window state is 7 rows per key regardless of corpus size, so the plan is
# identical at 100 TB — the daily pre-aggregation (map-side partial count)
# is what touches the raw rows.
# Reference parity: anomaly SQL reaches the reference only via dbt models
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_TS_ANOMALY_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
         AVG(n) OVER w AS mean7,
         STDDEV_SAMP(n) OVER w AS sd7,
         COUNT(*) OVER w AS n_hist
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       ROUND(mean7, 6) AS mean7,
       ROUND(CASE WHEN sd7 > 0 THEN (n - mean7) / sd7 END, 6) AS z,
       COALESCE(sd7 > 0 AND abs((n - mean7) / sd7) > 2, FALSE) AS is_anomaly
FROM s WHERE n_hist >= 4
"""


@register("ts_anomaly", oracle=_TS_ANOMALY_ORACLE)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    mean7 = F.avg("n").over(w)
    sd7 = F.stddev_samp("n").over(w)
    z = F.when(sd7 > 0, (F.col("n") - mean7) / sd7)
    return (
        d.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(mean7, 6).alias("mean7"),
            F.round(z, 6).alias("z"),
            F.coalesce((sd7 > 0) & (F.abs(z) > 2), F.lit(False)).alias("is_anomaly"),
            F.count(F.lit(1)).over(w).alias("n_hist"),
        )
        .filter(F.col("n_hist") >= 4)
        .drop("n_hist")
    )


# --------------------------------------------------------------------------
# ts_downsample — extreme-preserving decimation (the dashboard/monitoring
# downsampler): per (event_type, day) bucket keep only the min-value and
# max-value points, so a 100 TB series renders from bucket_count × 2 rows
# while spikes and dips survive (naive every-Nth decimation erases them).
# Two rank windows over the SAME (event_type, day) partitioning — one
# shuffle; per-bucket state is one day of one event type.  Ties break on
# event_id so re-runs are deterministic.
# --------------------------------------------------------------------------

_TS_DOWNSAMPLE_ORACLE = """
WITH r AS (
  SELECT event_type, CAST(ts AS DATE) AS day, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY value ASC, event_id) AS rn_min,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY value DESC, event_id) AS rn_max
  -- NULL values carry no magnitude and cannot be extremes; without the
  -- filter Spark ranks NULLS FIRST on ASC while DuckDB ranks them LAST
  -- (round-12 NULL-gap tail)
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, 'min' AS kind,
       event_id, ROUND(value, 6) AS value
FROM r WHERE rn_min = 1
UNION ALL
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, 'max' AS kind,
       event_id, ROUND(value, 6) AS value
FROM r WHERE rn_max = 1
"""


@register("ts_downsample", oracle=_TS_DOWNSAMPLE_ORACLE)
def ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # NULL-value points are not renderable extremes — mirror the oracle's
    # IS NOT NULL (Spark/DuckDB disagree on NULL placement in rank order)
    d = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("ts").cast("date").alias("day"), "event_id", "value"
    )
    part = Window.partitionBy("event_type", "day")
    r = d.select(
        "*",
        F.row_number()
        .over(part.orderBy(F.col("value").asc(), "event_id"))
        .alias("rn_min"),
        F.row_number()
        .over(part.orderBy(F.col("value").desc(), "event_id"))
        .alias("rn_max"),
    )
    # One pass over the windowed relation: a unionAll of two filtered
    # branches would re-evaluate the whole two-window subtree per branch
    # (the exchange is reused at best; the sorts and window evaluation run
    # twice).  Keep min-or-max rows once and explode the (≤2) kinds — a
    # single-row day is BOTH min and max and still yields two rows, like
    # the oracle's UNION ALL.
    day_s = F.date_format("day", "yyyy-MM-dd").alias("day")
    kinds = F.filter(
        F.array(
            F.when(F.col("rn_min") == 1, F.lit("min")),
            F.when(F.col("rn_max") == 1, F.lit("max")),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        r.filter((F.col("rn_min") == 1) | (F.col("rn_max") == 1))
        .select(
            "event_type", day_s, F.explode(kinds).alias("kind"),
            "event_id", F.round("value", 6).alias("value"),
        )
    )


# --------------------------------------------------------------------------
# ts_ohlc — hourly OHLC (open/high/low/close) candle resampling per series,
# the canonical financial downsample (reference surface: dbt-generated SQL,
# /root/reference/dbtoperator.py:273-274).  open/close come from one
# unbounded-frame window (first/last by (ts, event_id) within the hour);
# high/low/volume from the grouped aggregate over the SAME
# (event_type, hour) keys — Catalyst reuses the window shuffle for the
# aggregate, so the whole candle build is ONE exchange.  At 100 TB the
# (series, hour) key space is wide and uniform: no skew, state bounded by
# one hour of one series per task.
# --------------------------------------------------------------------------

_TS_OHLC_ORACLE = """
WITH w AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, value,
         first_value(value) OVER (PARTITION BY event_type, date_trunc('hour', ts)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
         last_value(value) OVER (PARTITION BY event_type, date_trunc('hour', ts)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
  FROM events
)
SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       ROUND(MIN(o), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(MIN(c), 6) AS close
FROM w GROUP BY event_type, hr
"""


@register("ts_ohlc", oracle=_TS_OHLC_ORACLE)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hr"), "ts", "event_id", "value"
    )
    frame = (
        Window.partitionBy("event_type", "hr")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = ev.select(
        "event_type",
        "hr",
        "value",
        F.first("value").over(frame).alias("o"),
        F.last("value").over(frame).alias("c"),
    )
    return w.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.round(F.min("o"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.min("c"), 6).alias("close"),
    ).select(
        "event_type", ts_str("hr").alias("hour"),
        "n_ticks", "open", "high", "low", "close",
    )


# --------------------------------------------------------------------------
# ts_ewma — exponentially weighted moving average (α=0.3) over each series,
# bounded to the trailing 10 ticks so the window state is O(k) per row.
# The trailing values are collected into an in-row array by a ROWS frame,
# then the weighted fold happens in a higher-order function — no Python, no
# self-join, one shuffle on the series key.  The geometric normalizer uses
# the closed form (1-β^n)/(1-β), not a second fold.  An unbounded EWMA
# needs a true running recurrence (applyInPandasWithState in streaming —
# see stream_custom_state); the k-bounded form is what batch backfills use
# because weights below β^k are numerically irrelevant.
# --------------------------------------------------------------------------

_TS_EWMA_ORACLE = """
WITH t AS (
  -- FILTER mirrors Spark's collect_list, which SKIPS NULL values: the
  -- frame still counts 10 ROWS, but routed-out (NULL) measurements
  -- neither occupy a weight slot nor change the normalizer (round-12
  -- magnitude sweep: the unfiltered list weighted by raw position)
  SELECT event_type, event_id, ts, value,
         list(value) FILTER (WHERE value IS NOT NULL)
             OVER (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT event_type, event_id, ROUND(value, 6) AS value,
       -- literal weight/normalizer tables, not pow(): JVM Math.pow and
       -- libm pow differ by an ulp on some exponents, which a 1e9-scale
       -- value amplifies past the 6-dp grid; list_reduce folds in
       -- Spark-aggregate order
       CASE WHEN len(l) > 0 THEN FLOOR(
         list_reduce(list_transform(l,
             (x, i) -> x * ([1.0, 0.7, 0.48999999999999994, 0.3429999999999999, 0.24009999999999995, 0.16806999999999994, 0.11764899999999996, 0.08235429999999996, 0.05764800999999997, 0.04035360699999998])[len(l) - i + 1]),
             (x, y) -> x + y)
         / ([1.0000000000000002, 1.7000000000000002, 2.1900000000000004, 2.5330000000000004, 2.7731000000000003, 2.94117, 3.058819, 3.1411733, 3.19882131, 3.239174917])[len(l)] * 1000000.0 + 0.5) / 1000000.0
       END AS ewma
FROM t
"""


@register("ts_ewma", oracle=_TS_EWMA_ORACLE)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    frame = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-9, 0)
    t = ev.select(
        "event_type", "event_id", "value",
        F.collect_list("value").over(frame).alias("l"),
    )
    # Spark transform index is 0-based; DuckDB list_transform is 1-based —
    # both weight the j-th most recent tick by the LITERAL 0.7^j table
    # (pow() differs by an ulp between JVM and libm; see the oracle note)
    num = F.expr(
        "aggregate(transform(l, (x, i) -> x * element_at(array(1.0, 0.7, 0.48999999999999994, 0.3429999999999999, 0.24009999999999995, 0.16806999999999994, 0.11764899999999996, 0.08235429999999996, 0.05764800999999997, 0.04035360699999998),"
        " size(l) - i)), 0D, (acc, v) -> acc + v)"
    )
    denom = F.element_at(
        F.array(*[F.lit(x) for x in [1.0000000000000002, 1.7000000000000002, 2.1900000000000004, 2.5330000000000004, 2.7731000000000003, 2.94117, 3.058819, 3.1411733, 3.19882131, 3.239174917]]), F.size("l")
    )
    # collect_list skips NULL values, so a frame whose 10 ticks are all
    # routed-out (NULL/non-finite) measurements leaves l empty and denom 0
    # (ANSI divide-by-zero) — no observations means no EWMA: NULL.
    return t.select(
        "event_type", "event_id",
        F.round("value", 6).alias("value"),
        # q6, not round: ROUND disagrees across engines on half-ulp
        # boundaries at large magnitudes (hit by the magnitude fixture)
        F.when(F.size("l") > 0, q6(num / denom)).alias("ewma"),
    )


# --------------------------------------------------------------------------
# ts_interpolate — linear interpolation at unobserved grid points (the
# hypertable `interpolate()` twin of ts_gapfill's locf).  Observations are
# deterministically sparsified (every 3rd day kept) so gaps exist at any
# fixture scale; each missing day gets prev + (next-prev)·(d-d_prev)/
# (d_next-d_prev) from its bracketing observations.  Same scale shape as
# gapfill: the calendar explodes per group (output-sized), and the
# prev/next lookups are four IGNORE-NULLS window passes over ONE
# (event_type, day) ordering — no self-joins, no point-query loops.
# --------------------------------------------------------------------------

_TS_INTERPOLATE_ORACLE = """
WITH daily AS (
  -- same sentinel-day guard mirror as _TS_GAPFILL_ORACLE (ADVICE r11)
  SELECT event_type, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS v
  FROM events
  WHERE ts IS NULL
     OR CAST(ts AS DATE) BETWEEN DATE '1677-09-22' AND DATE '2262-04-10'
  GROUP BY event_type, CAST(ts AS DATE)
),
obs AS (
  SELECT event_type, d,
         CASE WHEN day(d) % 3 = 0 THEN v END AS v
  FROM daily
),
spans AS (
  SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM obs GROUP BY event_type
),
cal AS (
  SELECT s.event_type, CAST(u.day AS DATE) AS d
  FROM spans s,
       LATERAL unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS u(day)
),
g AS (
  SELECT cal.event_type, cal.d, obs.v,
         datediff('day', DATE '1970-01-01', cal.d) AS x
  FROM cal LEFT JOIN obs ON obs.event_type = cal.event_type AND obs.d = cal.d
),
w AS (
  SELECT event_type, d, v, x,
         last_value(v IGNORE NULLS) OVER pb AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
           OVER pb AS px,
         first_value(v IGNORE NULLS) OVER fb AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
           OVER fb AS nx
  FROM g
  WINDOW pb AS (PARTITION BY event_type ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fb AS (PARTITION BY event_type ORDER BY x
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
       ROUND(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * (x - px) * 1.0 / (nx - px)
       END, 6) AS value
FROM w
"""


@register("ts_interpolate", oracle=_TS_INTERPOLATE_ORACLE)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import plausible_event_time

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.round(F.avg("value"), 6).alias("v0")).filter(
        # same sentinel guard as ts_gapfill: the grid is sequence(min, max)
        plausible_event_time("d")
    )
    obs = daily.select(
        "event_type",
        "d",
        F.when(F.dayofmonth("d") % 3 == 0, F.col("v0")).alias("v"),
    )
    cal = (
        obs.groupBy("event_type")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    g = cal.join(obs, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        "v",
        F.datediff("d", F.lit("1970-01-01").cast("date")).alias("x"),
    )
    pb = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "Next observation" via a DESC-ordered running frame, not
    # first(...) over [currentRow, unboundedFollowing]: Spark computes
    # growing [unboundedPreceding, currentRow] frames incrementally (O(n)
    # per partition) but re-scans shrinking following-frames per row
    # (O(n²) — the timestamp-extremes sweep clocked a 20k-day grid at
    # 27 s; same rows this way: sub-second).  last() over the reversed
    # order is the identical value.
    nb = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vx = F.when(F.col("v").isNotNull(), F.col("x"))
    w = g.select(
        "event_type",
        "d",
        "v",
        "x",
        F.last("v", ignorenulls=True).over(pb).alias("pv"),
        F.last(vx, ignorenulls=True).over(pb).alias("px"),
        F.last("v", ignorenulls=True).over(nb).alias("nv"),
        F.last(vx, ignorenulls=True).over(nb).alias("nx"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("x") - F.col("px"))
            * 1.0
            / (F.col("nx") - F.col("px"))
        )
    )
    return w.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("interpolated"),
        F.round(interp, 6).alias("value"),
    )


# --------------------------------------------------------------------------
# ts_seasonal_decompose — additive day-of-week decomposition: daily totals
# split into a weekly seasonal component (day-of-week mean) and a residual
# (the anomaly signal after seasonality removal).  Determinism: daily
# totals are dsum-stable doubles quantized to integer micros, the seasonal
# mean is SUM(long)/COUNT — one double division of exact integers — so both
# engines produce bit-identical components.  Day-of-week comes from
# epoch-day arithmetic (datediff from a known Monday, mod 7), avoiding
# engine-specific dayofweek() numbering.  Scale: two tiny aggregates over
# the daily grain (O(days), already reduced map-side from raw events).
# --------------------------------------------------------------------------

_TS_SEASONAL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, {osum('value')} AS total
  FROM events GROUP BY 1
),
q AS (
  SELECT day, total,
         CAST(date_diff('day', DATE '1970-01-05', day) % 7 AS INT) AS dow,
         CAST(FLOOR(total * 1000000.0 + 0.5) AS BIGINT) AS tmicros
  FROM daily
),
seas AS (
  SELECT dow,
         CAST(SUM(tmicros) AS DOUBLE) / COUNT(*) AS mean_micros
  FROM q GROUP BY dow
)
SELECT q.day, q.dow,
       ROUND(q.total, 6) AS daily_total,
       ROUND(s.mean_micros / 1000000.0, 6) AS seasonal,
       ROUND((CAST(q.tmicros AS DOUBLE) - s.mean_micros) / 1000000.0, 6)
         AS residual
FROM q JOIN seas s ON q.dow = s.dow
"""


@register("ts_seasonal_decompose", oracle=_TS_SEASONAL_ORACLE)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("total")
    )
    q = daily.select(
        "day",
        "total",
        (F.datediff("day", F.lit("1970-01-05").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
        F.floor(F.col("total") * 1000000.0 + 0.5).cast("long").alias("tmicros"),
    )
    seas = q.groupBy("dow").agg(
        (F.sum("tmicros").cast("double") / F.count(F.lit(1))).alias("mean_micros")
    )
    return q.join(F.broadcast(seas), "dow").select(
        "day",
        "dow",
        F.round("total", 6).alias("daily_total"),
        F.round(F.col("mean_micros") / 1000000.0, 6).alias("seasonal"),
        F.round(
            (F.col("tmicros").cast("double") - F.col("mean_micros")) / 1000000.0, 6
        ).alias("residual"),
    )


# --------------------------------------------------------------------------
# ts_forecast_linear — per-key ordinary-least-squares trend + forecast:
# daily totals per event_type regressed on the day index, then extrapolated
# 7 days past the observed window (the capacity-planning primitive).
# Determinism: y is quantized to integer micros and x is the integer day
# index, so the OLS sums (Σx, Σy, Σxy, Σx²) are EXACT longs aggregated
# order-independently; slope/intercept are single double divisions of
# exact integers — bit-identical in both engines (regr_slope over raw
# doubles would be partition-order-sensitive).  Scale: one daily rollup
# (map-side partial) + one O(keys) aggregate.
# --------------------------------------------------------------------------

_TS_FORECAST_ORACLE = f"""
WITH daily AS (
  -- sentinel-day guard mirror (ADVICE r11): a single '9999-12-31' parser
  -- sentinel is an x≈2.9e6 leverage point that dominates slope/intercept
  -- and sets last_x — the same plausible_event_time policy as
  -- ts_gapfill/ts_interpolate, applied on BOTH sides
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(FLOOR(({osum('value')}) * 1000000.0 + 0.5) AS BIGINT) AS ymicros
  FROM events
  WHERE ts IS NULL
     OR CAST(ts AS DATE) BETWEEN DATE '1677-09-22' AND DATE '2262-04-10'
  GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(ymicros) AS sy,
         SUM(x * ymicros) AS sxy, SUM(x * x) AS sxx,
         MAX(x) AS last_x
  FROM daily GROUP BY event_type
  -- n >= 2: with a single observed day the fit denominator n*sxx - sx*sx
  -- is 0 and the engines disagree (Spark non-ANSI divide -> NULL, DuckDB
  -- double divide -> inf/NaN); a 1-point series has no defined slope
  -- anyway (ADVICE r3).
  HAVING COUNT(*) >= 2
),
fit AS (
  SELECT event_type, n, last_x,
         (CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)) AS slope_micros,
         (CAST(sy AS DOUBLE)
           - (CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS icpt_micros
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       ROUND(slope_micros / 1000000.0, 6) AS slope_per_day,
       ROUND(icpt_micros / 1000000.0, 6) AS intercept,
       ROUND((icpt_micros + slope_micros * (last_x + 7)) / 1000000.0, 6)
         AS forecast_7d
FROM fit
"""


@register("ts_forecast_linear", oracle=_TS_FORECAST_ORACLE)
def ts_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import plausible_event_time

    ev = load(spark, sf_dir, "events")
    # Sentinel days are junk, not observations: one '9999-12-31' parser
    # sentinel would be an x≈2.9e6 leverage point dominating the OLS fit
    # and setting last_x — route it out BEFORE the rollup, same policy as
    # ts_gapfill/ts_interpolate (mirrored in the oracle's WHERE).  The
    # map-side filter keeps the rollup's partial aggregation intact.
    daily = ev.filter(plausible_event_time(F.col("ts").cast("date"))).groupBy(
        "event_type",
        # datediff is 32-bit: widen to long before products (the in-window
        # x is small, but the widening costs nothing and stays ANSI-safe).
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(
        F.floor(dsum("value") * 1000000.0 + 0.5).cast("long").alias("ymicros")
    )
    # sxy and the normal-equation products run in decimal(38,0): the DuckDB
    # oracle accumulates these in HUGEINT (int128), while a bigint Spark
    # side would overflow near the dsum magnitude bound over multi-year
    # spans (n*sxy ~ 1e21+) — under Spark 4's default ANSI mode that is an
    # ARITHMETIC_OVERFLOW error, not even a quiet mismatch.  Both engines
    # compute the same exact integers, so the double casts agree exactly.
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(dec(F.col("ymicros"))).alias("sy"),
        # cast BEFORE the product: a bigint x*ymicros would overflow first
        F.sum(dec(F.col("x")) * dec(F.col("ymicros"))).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("last_x"),
    ).filter(F.col("n") >= 2)  # 1-day series: zero fit denominator (ADVICE r3)
    slope = (
        (dec(F.col("n")) * F.col("sxy") - dec(F.col("sx")) * F.col("sy")).cast(
            "double"
        )
        / (
            dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))
        ).cast("double")
    )
    fit = s.select(
        "event_type", "n", "last_x",
        slope.alias("slope_micros"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("icpt_micros"),
    )
    return fit.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("slope_micros") / 1000000.0, 6).alias("slope_per_day"),
        F.round(F.col("icpt_micros") / 1000000.0, 6).alias("intercept"),
        F.round(
            (F.col("icpt_micros") + F.col("slope_micros") * (F.col("last_x") + 7))
            / 1000000.0,
            6,
        ).alias("forecast_7d"),
    )


# --------------------------------------------------------------------------
# ts_changepoint — CUSUM mean-shift detection per series (the classic
# cumulative-deviation chart): for each event_type's daily-total series,
# the candidate changepoint is the day maximizing |Σ_{i<=t}(x_i - mean)|.
# All arithmetic is exact-integer so both engines agree bit-for-bit:
# daily totals are fixed-point micro-units (the dsum idiom), and the
# cumulative deviation is computed scaled by n —
# C_scaled(t) = n·cumsum(t) - t·total — with the n·/t· products widened to
# decimal(38,0) (Spark) / HUGEINT (DuckDB): at 100 TB a series' micro-unit
# total can pass 1e17 and days·total would overflow int64, which under
# Spark 4's default ANSI mode is an ARITHMETIC_OVERFLOW error (the same
# hazard ts_forecast_linear hardens against).  No float accumulation order
# to disagree on; the reported magnitude divides back at the end.  The running sum is windowed PER SERIES (partitionBy
# event_type), and rows-per-series is calendar-bounded (days), so the
# window state stays tiny at any corpus size; the argmax reuses the same
# partitioning — one exchange on event_type after the daily pre-aggregate.
# Reference parity: time-series semantics reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_TS_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS xq
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
cum AS (
  SELECT event_type, day, xq,
         SUM(xq) OVER w AS cs,
         ROW_NUMBER() OVER w AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(xq) OVER (PARTITION BY event_type) AS total
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dev AS (
  SELECT event_type, day, n,
         abs(CAST(n AS HUGEINT) * cs - CAST(t AS HUGEINT) * total) AS c_abs
  FROM cum
)
SELECT event_type,
       CAST(day AS VARCHAR) AS cp_date,
       -- q6 idiom, not ROUND: Spark F.round (BigDecimal HALF_UP on the
       -- shortest repr) and DuckDB ROUND (binary) disagree by 1 ulp on
       -- half-boundary quotients at 1e9-scale peaks (round-12 tail)
       FLOOR(CAST(c_abs AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             * 1000000.0 + 0.5) / 1000000.0
         AS cusum_peak,
       CAST(n AS BIGINT) AS n_days
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY c_abs DESC, day) AS rn FROM dev)
WHERE rn = 1
"""


@register("ts_changepoint", oracle=_TS_CHANGEPOINT_ORACLE)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")).alias("xq"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("xq").over(w).alias("cs"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("xq").over(wall).alias("total"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dev = cum.select(
        "event_type",
        "day",
        "n",
        F.abs(d38(F.col("n")) * d38(F.col("cs")) - d38(F.col("t")) * d38(F.col("total"))).alias(
            "c_abs"
        ),
    )
    peak = (
        dev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.col("c_abs").desc(), "day")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return peak.select(
        "event_type",
        F.col("day").cast("string").alias("cp_date"),
        q6(
            F.col("c_abs").cast("double") / (F.col("n").cast("double") * 1000000.0)
        ).alias("cusum_peak"),
        F.col("n").cast("long").alias("n_days"),
    )


# --------------------------------------------------------------------------
# ts_streaks — consecutive-day activity streaks per user (the classic
# gaps-and-islands shape): collapse events to distinct (user, day), number
# the days per user, and group by day-minus-rownumber — consecutive days
# share the constant, so each island is one streak.  Complements
# ts_sessionize (timestamp-gap sessions) with calendar-day semantics.
#
# Scale shape: one distinct shuffle on (user_id, day) — the day collapse
# pre-aggregates map-side, so the shuffle carries at most (users x active
# days) rows, not events; the numbering window partitions by user_id
# (per-key state = one user's active days, bounded by the calendar); the
# two following aggregates reuse the same user_id hash partitioning.  No
# global window, no driver loop, linear at any event volume.
# Reference parity: streak SQL reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
numbered AS (
  SELECT user_id, d,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
),
islands AS (
  SELECT user_id, d - CAST(rn AS INT) AS grp, COUNT(*) AS len
  FROM numbered GROUP BY user_id, d - CAST(rn AS INT)
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM islands
GROUP BY user_id
"""


@register("ts_streaks", oracle=_STREAKS_ORACLE)
def ts_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    numbered = days.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    )
    islands = numbered.groupBy(
        "user_id", F.date_sub(F.col("d"), F.col("rn")).alias("grp")
    ).agg(F.count(F.lit(1)).alias("len"))
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


# --------------------------------------------------------------------------
# Shared (series, day) daily partial — the first stage of ts_holt /
# ts_mad_anomaly / ts_acf.  ONE definition on each engine so the daily
# contract (6-dp deterministic average via the fixed-point sum, observed
# days only) cannot drift between the three operators.  The HAVING/filter
# drops all-NULL-value days: such a day would reach pandas as NaN but
# stay NULL in SQL, and NaN != NULL under the value hash.
# --------------------------------------------------------------------------

_DAILY_CTE = f"""daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         ROUND({osum('value')} / COUNT(value), 6) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
  HAVING {osum('value')} IS NOT NULL
)"""


def _daily(ev: DataFrame) -> DataFrame:
    """Spark twin of ``_DAILY_CTE``.

    COUNT(value), not COUNT(*): the sum skips NULLs, so dividing by the
    all-rows count would silently shrink the mean on a day mixing NULL
    and observed values (both engines would agree on the wrong number —
    the hash gate can't catch it; review catch, pinned by the mixed-NULL
    edge test)."""
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(dsum("value") / F.count("value"), 6).alias("v"))
        .filter(F.col("v").isNotNull())
    )


# --------------------------------------------------------------------------
# ts_holt — Holt's linear-trend double exponential smoothing per series:
# level l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1}),
# trend b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}, initialized l_1 = x_1,
# b_1 = 0.  A TRUE two-variable recurrence — no closed form exists (unlike
# ts_ewma's k-bounded geometric fold), so this is the repo's batch
# instance of the "custom operator via Arrow-batched grouped map"
# category: ``applyInPandas`` runs the recurrence per series, exactly the
# shape Spark's built-ins cannot express.
#
# Scale shape: the corpus collapses FIRST to (series, day) daily partials
# — a map-side partial aggregate, so the shuffle carries daily rows, not
# events — and the grouped map sees one series' calendar-bounded daily
# rows per Arrow batch (the ts_changepoint bound).  Series key count
# spreads groups across executors; raw events never reach Python.
#
# Cross-engine determinism WITHOUT per-step rounding: α = β = 0.5 are
# exact binary fractions, so every recurrence step is IEEE-exact scaling
# + adds; both engines execute the identical op sequence on the identical
# 6-dp-rounded daily inputs, so the trajectories agree bit-for-bit (the
# oracle recomputes l_t inline in the trend line — same ops, same value).
# Reference parity: smoothing reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HOLT_ORACLE = f"""
WITH RECURSIVE {_DAILY_CTE},
numbered AS (
  SELECT event_type, d, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
holt AS (
  SELECT event_type, d, v, rn, v AS level, CAST(0 AS DOUBLE) AS trend
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.d, n.v, n.rn,
         0.5 * n.v + 0.5 * (h.level + h.trend),
         0.5 * ((0.5 * n.v + 0.5 * (h.level + h.trend)) - h.level)
           + 0.5 * h.trend
  FROM numbered n
  -- IS NOT DISTINCT FROM: a NULL-keyed series is a real group on the
  -- Spark side (groupBy keeps it), and a plain = join would silently
  -- truncate its recursion after the rn=1 anchor (review catch)
  JOIN holt h ON n.event_type IS NOT DISTINCT FROM h.event_type
             AND n.rn = h.rn + 1
)
SELECT event_type, d, v,
       -- q6, not ROUND: the trajectories are bit-identical, but Spark
       -- F.round (BigDecimal HALF_UP) and DuckDB ROUND (binary) disagree
       -- on half-boundary levels at 1e8+ magnitudes (round-12 tail)
       FLOOR(level * 1000000.0 + 0.5) / 1000000.0 AS level,
       FLOOR(trend * 1000000.0 + 0.5) / 1000000.0 AS trend,
       FLOOR((level + trend) * 1000000.0 + 0.5) / 1000000.0 AS forecast_next
FROM holt
"""


@register("ts_holt", oracle=_HOLT_ORACLE)
def ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    daily = _daily(ev)

    def _holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        levels, trends = [], []
        l_prev, b_prev = 0.0, 0.0
        for i, x in enumerate(pdf["v"]):
            if i == 0:
                lvl, tr = x, 0.0
            else:
                lvl = 0.5 * x + 0.5 * (l_prev + b_prev)
                tr = 0.5 * (lvl - l_prev) + 0.5 * b_prev
            levels.append(lvl)
            trends.append(tr)
            l_prev, b_prev = lvl, tr
        pdf["level"] = levels
        pdf["trend"] = trends
        return pdf

    # Display rounding happens Spark-side via the q6 idiom (explicit
    # FLOOR op sequence, identical IEEE on both engines) — F.round's
    # BigDecimal HALF_UP diverges from DuckDB ROUND on half-boundary
    # levels at 1e8+ magnitudes, and Python's round() is banker's.
    raw = daily.groupBy("event_type").applyInPandas(
        _holt,
        "event_type string, d date, v double, level double, trend double",
    )
    return raw.select(
        "event_type", "d", "v",
        q6(F.col("level")).alias("level"),
        q6(F.col("trend")).alias("trend"),
        q6(F.col("level") + F.col("trend")).alias("forecast_next"),
    )


# --------------------------------------------------------------------------
# ts_mad_anomaly — robust outlier detection per series via median absolute
# deviation: a point is anomalous when |x - median| > 3 * 1.4826 * MAD
# (1.4826 scales MAD to sigma-equivalent under normality).  The robust
# complement to ts_anomaly's rolling z-score: mean/stddev are themselves
# dragged by the outliers they're meant to find, median/MAD are not.
#
# Scale shape: raw events collapse to (series, day) daily partials first
# (map-side combine — the ts_holt shape), so the exact median buffers
# only one series' calendar-bounded daily rows (the agg_percentile_exact
# stance: exact percentiles are safe when group size is bounded by
# construction; unbounded groups take the agg_percentile_histogram
# route).  The median is the DISCRETE lower-of-midpair element
# (sorted[ceil(n/2)]) on BOTH engines — an interpolated even-count
# median is engine-arithmetic-dependent within an ULP and could flip the
# 6-dp round cross-engine (round-5 advisory).  The median and MAD tables are
# series-count-sized and broadcast back — two bounded joins, no window
# over raw data.
#
# MAD = 0 (over half the days share the median value) degrades
# deterministically on both engines: robust_z is NULL (NULLIF guard) and
# any nonzero deviation is flagged.
# Reference parity: anomaly SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_MAD_ORACLE = f"""
WITH {_DAILY_CTE},
med AS (
  SELECT event_type,
         ROUND((list_sort(list(v) FILTER (WHERE v IS NOT NULL)))[CAST(ceil(COUNT(v) / 2.0) AS INT)], 6) AS med
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT daily.event_type, daily.d, daily.v,
         ROUND(ABS(daily.v - med.med), 6) AS dev
  FROM daily JOIN med ON daily.event_type = med.event_type
),
mad AS (
  SELECT event_type,
         ROUND((list_sort(list(dev) FILTER (WHERE dev IS NOT NULL)))[CAST(ceil(COUNT(dev) / 2.0) AS INT)], 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, strftime(dev.d, '%Y-%m-%d') AS day, dev.v,
       ROUND(dev.dev / NULLIF(1.4826 * mad.mad, 0.0), 6) AS robust_z,
       (dev.dev > 3 * 1.4826 * mad.mad) AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type
"""


@register("ts_mad_anomaly", oracle=_MAD_ORACLE)
def ts_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # checkpoint: med / dev / mad / output all branch off `daily` —
    # without it each branch re-runs the events scan + daily aggregation
    # (the plan showed 4 FileScans; review catch).
    daily = _daily(ev).localCheckpoint(eager=True)

    # Lower-of-midpair DISCRETE median (sorted[ceil(n/2)], 1-based): an
    # actual element of the group, so no cross-engine interpolation — the
    # interpolated midpoint of an even-count group could land within an ULP
    # of a 6-dp rounding boundary and flip the rounded med/mad between
    # engines (round-5 advisory).  Group size is calendar-bounded (daily
    # partials), so the collect_list buffers are small by construction.
    def _disc_median(col: str):
        arr = F.sort_array(F.collect_list(col))
        idx = F.ceil(F.count(col) / F.lit(2.0)).cast("int")
        return F.round(F.element_at(arr, idx), 6)

    med = daily.groupBy("event_type").agg(_disc_median("v").alias("med"))
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type", "d", "v",
        F.round(F.abs(F.col("v") - F.col("med")), 6).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(_disc_median("dev").alias("mad"))
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "v",
        F.round(
            F.col("dev") / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0)), 6
        ).alias("robust_z"),
        (F.col("dev") > F.lit(3) * F.lit(1.4826) * F.col("mad")).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# ts_acf — autocorrelation function per series at calendar lags 1..7 days,
# the seasonality detector that complements ts_seasonal_decompose (which
# assumes a period; ACF peaks reveal it).  acf(k) = sum(x_t * x_{t+k}) /
# sum(x_t^2) over mean-centered daily values — lag pairing is an
# EQUI-JOIN on (series, day + k), not 7 window passes: true calendar
# lags (a gap day breaks the pair, as it should) and one hash join
# keyed (event_type, day) instead of 7 sorts.
#
# Scale shape: raw events collapse to daily partials map-side (the
# ts_holt shape); the series means and sum-of-squares denominators are
# series-count-sized broadcasts; the lag join's build side is the daily
# table exploded x7 — still (series x days x 7), output-proportional.
# Determinism: v and the mean are 6-dp rounded, so centered values are
# bit-identical across engines; products are rounded then fixed-point
# summed (util.dsum), so acf never drifts with partitioning.  A constant
# series (zero variance) yields NULL acf via NULLIF on both engines.
# Reference parity: correlation SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ACF_ORACLE = f"""
WITH {_DAILY_CTE},
stats AS (
  SELECT event_type, ROUND({osum('v')} / COUNT(*), 6) AS m FROM daily
  GROUP BY event_type
),
x AS (
  SELECT daily.event_type, daily.d, daily.v - stats.m AS x
  FROM daily JOIN stats ON daily.event_type = stats.event_type
),
den AS (
  SELECT event_type, {osum_prod('x', 'x')} AS ss FROM x GROUP BY event_type
),
pairs AS (
  SELECT a.event_type, k.k, a.x AS xa, b.x AS xb
  FROM x a
  JOIN (SELECT UNNEST(range(1, 8)) AS k) k ON TRUE
  JOIN x b ON b.event_type = a.event_type AND b.d = a.d + CAST(k.k AS INT)
)
SELECT p.event_type, CAST(p.k AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND({osum_prod('p.xa', 'p.xb')} / NULLIF(den.ss, 0.0), 6) AS acf
FROM pairs p JOIN den ON p.event_type = den.event_type
GROUP BY p.event_type, p.k, den.ss
"""


@register("ts_acf", oracle=_ACF_ORACLE)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # checkpoint: stats and the three x-consumers (den, both join sides)
    # all branch off `daily` — without it the plan re-ran the events scan
    # + daily aggregation 7 times (review catch); x itself recomputes from
    # the checkpointed daily (a broadcast join + projection, no scan).
    daily = _daily(ev).localCheckpoint(eager=True)
    stats = daily.groupBy("event_type").agg(
        F.round(dsum("v") / F.count(F.lit(1)), 6).alias("m")
    )
    x = daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "d", (F.col("v") - F.col("m")).alias("x")
    )
    den = x.groupBy("event_type").agg(dsum_prod("x", "x").alias("ss"))
    lagged = x.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"),
        F.col("d").alias("d0"),
        F.col("x").alias("xa"),
    ).withColumn("d_pair", F.expr("date_add(d0, k)"))
    pairs = lagged.join(
        x.select("event_type", F.col("d").alias("d_pair"), F.col("x").alias("xb")),
        ["event_type", "d_pair"],
    )
    return (
        pairs.groupBy("event_type", F.col("k").cast("int").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            dsum_prod("xa", "xb").alias("num"),
        )
        .join(F.broadcast(den), "event_type")
        .select(
            "event_type", "k", "n_pairs",
            F.round(F.col("num") / F.nullif(F.col("ss"), F.lit(0.0)), 6).alias("acf"),
        )
    )


# --------------------------------------------------------------------------
# ts_rolling_corr — 7-day rolling Pearson correlation between a series'
# daily mean value and its daily event volume (value/volume coupling
# drift — e.g. "do high-traffic days move the metric?").  The corpus
# collapses FIRST to (event_type, day) partials; every window is keyed by
# event_type and spans a 7-ROW frame, so per-partition state is bounded.
#
# Cross-engine exactness: sliding-frame SUMs over doubles accumulate in
# engine-specific order (running vs segment tree), so the low bits — and a
# 6-dp round at the boundary — could differ.  All five frame sums here are
# therefore over INTEGERS: the daily mean is quantized to 6-dp fixed point
# (exact — it is already a 6-dp value), counts are already integral, and
# Pearson r is scale-invariant so the 1e6 factor cancels.  The final
# num/sqrt(dx·dy) happens once per row in doubles (dx, dy cast to double
# BEFORE their product, which would overflow int64).
# Reference parity: windowed SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ROLLING_CORR_ORACLE = f"""
WITH daily2 AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(FLOOR(ROUND({osum('value')} / COUNT(value), 6) * 1000000.0 + 0.5)
              AS BIGINT) AS vq,
         COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
  HAVING {osum('value')} IS NOT NULL
),
s AS (
  SELECT event_type, d, vq, n,
         COUNT(*)    OVER w AS m,
         SUM(vq)     OVER w AS sx,
         SUM(n)      OVER w AS sy,
         SUM(CAST(vq AS HUGEINT) * n) OVER w AS sxy,
         SUM(CAST(vq AS HUGEINT) * vq) OVER w AS sxx,
         SUM(n * n)  OVER w AS syy
  FROM daily2
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_events,
       ROUND(vq / 1000000.0, 6) AS v,
       CASE WHEN m >= 2 AND m * sxx - CAST(sx AS HUGEINT) * sx > 0
                 AND m * syy - sy * sy > 0
            THEN ROUND(CAST(CAST(m * sxy - CAST(sx AS HUGEINT) * sy
                            AS VARCHAR) AS DOUBLE)
                       / sqrt(CAST(CAST(m * sxx - CAST(sx AS HUGEINT) * sx
                                   AS VARCHAR) AS DOUBLE)
                              * CAST(m * syy - sy * sy AS DOUBLE)), 6)
            END AS corr7
FROM s
"""


@register("ts_rolling_corr", oracle=_ROLLING_CORR_ORACLE)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily2 = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.floor(F.round(dsum("value") / F.count("value"), 6) * 1_000_000.0 + 0.5)
            .cast("bigint")
            .alias("vq"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("vq").isNotNull())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    # frame sums and variance products in DECIMAL: DuckDB promotes
    # SUM(BIGINT) to HUGEINT, and m·sxx − sx² reaches 49·vq² — int64 would
    # overflow once |daily mean| ≥ ~4e2·1e6 quantized (the
    # ts_forecast_linear discipline); the window input is the tiny daily
    # relation, so the decimal path costs nothing
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = daily2.select(
        "event_type",
        "d",
        "vq",
        "n",
        F.count(F.lit(1)).over(w).alias("m"),
        F.sum(dec(F.col("vq"))).over(w).alias("sx"),
        F.sum(dec(F.col("n"))).over(w).alias("sy"),
        F.sum(dec(F.col("vq")) * dec(F.col("n"))).over(w).alias("sxy"),
        F.sum(dec(F.col("vq")) * dec(F.col("vq"))).over(w).alias("sxx"),
        F.sum(dec(F.col("n")) * dec(F.col("n"))).over(w).alias("syy"),
    )
    nd = F.col("m").cast("decimal(19,0)")
    dx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    corr = F.when(
        (F.col("m") >= 2) & (dx > 0) & (dy > 0),
        F.round(num / F.sqrt(dx.cast("double") * dy.cast("double")), 6),
    )
    return s.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("vq") / 1_000_000.0, 6).alias("v"),
        corr.alias("corr7"),
    )


# --------------------------------------------------------------------------
# ts_time_weighted_avg — LOCF time-weighted average per (event_type, day)
# (the TimescaleDB `time_weight('LOCF')` shape): each sample's value holds
# until the next sample, so irregular sampling doesn't bias the mean the
# way a plain AVG does (a burst of readings at one level would otherwise
# swamp a long steady period at another).  TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₁);
# the last sample carries no weight; a single-sample (or zero-span) day
# degenerates to its first value.
#
# Exactness: gap durations are exact integer MILLISECONDS (epoch-µs
# integer-division — both engines agree bit-for-bit), values quantize to
# 6-dp micros, and the integral Σ vq·Δt accumulates as exact integers in
# decimal(38,0)/HUGEINT — vq·Δt reaches |v|ₘₐₓ·1e6·8.64e7 ≈ 8e26 at the
# full value domain, past int64 (round-12 magnitude sweep); Σ Δt still
# telescopes to ≤ one day so the SUM stays far under 1e38.  Order ties
# break on
# event_id so LEAD is total on both engines.
# Scale shape: one event_type-keyed window (LEAD) + one keyed aggregate;
# per-partition state is one series.
# Reference parity: windowed SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_TWA_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
         event_id
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT event_type, d, tms, vq,
         LEAD(tms) OVER (PARTITION BY event_type, d
                         ORDER BY tms, event_id) AS nxt,
         FIRST_VALUE(vq) OVER (PARTITION BY event_type, d
                               ORDER BY tms, event_id) AS v1
  FROM s
),
a AS (
  SELECT event_type, d,
         SUM(CASE WHEN nxt IS NOT NULL
                  THEN CAST(vq AS HUGEINT) * (nxt - tms) END) AS ws,
         MAX(tms) - MIN(tms) AS span_ms,
         COUNT(*) AS n,
         MIN(v1) AS v1
  FROM g GROUP BY event_type, d
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_samples,
       CAST(span_ms AS BIGINT) AS span_ms,
       CASE WHEN span_ms > 0
            THEN ROUND((CAST(CAST(ws AS VARCHAR) AS DOUBLE) / CAST(span_ms AS DOUBLE)) / 1000000.0, 6)
            ELSE ROUND(v1 / 1000000.0, 6) END AS twa
FROM a
"""


@register("ts_time_weighted_avg", oracle=_TWA_ORACLE)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.expr("unix_micros(ts) div 1000").alias("tms"),  # exact int division
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("long").alias("vq"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "d").orderBy("tms", "event_id")
    g = s.select(
        "event_type",
        "d",
        "tms",
        "vq",
        F.lead("tms").over(w).alias("nxt"),
        F.first("vq").over(w).alias("v1"),
    )
    a = g.groupBy("event_type", "d").agg(
        F.sum(
            F.when(
                F.col("nxt").isNotNull(),
                F.col("vq").cast("decimal(38,0)") * (F.col("nxt") - F.col("tms")),
            )
        ).alias("ws"),
        (F.max("tms") - F.min("tms")).alias("span_ms"),
        F.count(F.lit(1)).alias("n"),
        F.min("v1").alias("v1"),
    )
    twa = F.when(
        F.col("span_ms") > 0,
        F.round(
            (F.col("ws").cast("double") / F.col("span_ms").cast("double"))
            / 1_000_000.0,
            6,
        ),
    ).otherwise(F.round(F.col("v1") / 1_000_000.0, 6))
    return a.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_samples"),
        F.col("span_ms").cast("bigint").alias("span_ms"),
        twa.alias("twa"),
    )


# --------------------------------------------------------------------------
# ts_lttb — Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
# the visual-fidelity decimator behind Grafana/Timescale rendering), in
# its PARALLEL variant: each of K buckets elects the point forming the
# largest triangle with the NEIGHBOR BUCKETS' centroids (classic LTTB
# anchors on the previously-elected point — an inherently sequential
# chain; substituting the previous bucket's centroid removes the
# cross-bucket dependency so all buckets elect concurrently, the standard
# scale-out adaptation).  First and last buckets keep their boundary
# points, preserving the series endpoints.
#
# Determinism: centroids divide exact int64 sums (identical doubles both
# engines), triangle areas compute in one fixed expression order and are
# ROUNDED to 6 dp before the argmax, ties break on event_id (the
# llm_pq_encode argmin discipline).
# Scale shape: two event_type-keyed windows (position, then per-bucket
# argmax), one bucket-level aggregate (K rows per series) re-joined by
# (type, bucket) — the join's build side is series×K rows.  No
# cross-bucket sequential dependency: 100 TB of points decimate in one
# pass.
# Reference parity: windowed SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_LTTB_K = 12

_LTTB_ORACLE = f"""
WITH s AS (
  SELECT event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS t,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
p AS (
  SELECT *, ROW_NUMBER() OVER w AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id)
),
b AS (
  SELECT *, CAST(FLOOR((rn - 1) * {_LTTB_K} * 1.0 / n) AS BIGINT) AS bucket FROM p
),
c AS (
  SELECT event_type, bucket,
         CAST(SUM(t) AS DOUBLE) / COUNT(*) AS cx,
         CAST(SUM(vq) AS DOUBLE) / COUNT(*) AS cy
  FROM b GROUP BY event_type, bucket
),
nbr AS (
  SELECT event_type, bucket,
         LAG(cx)  OVER w AS px, LAG(cy)  OVER w AS py,
         LEAD(cx) OVER w AS nx, LEAD(cy) OVER w AS ny
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
scored AS (
  SELECT b.event_type, b.bucket, b.event_id, b.t, b.vq, b.rn, b.n,
         CASE WHEN nbr.px IS NULL OR nbr.nx IS NULL THEN NULL
              ELSE ROUND(ABS((nbr.px - nbr.nx) * (b.vq - nbr.py)
                           - (nbr.px - b.t) * (nbr.ny - nbr.py)), 6) END AS area
  FROM b JOIN nbr ON b.event_type = nbr.event_type AND b.bucket = nbr.bucket
),
elected AS (
  SELECT * FROM (
    SELECT *,
           ROW_NUMBER() OVER (
             PARTITION BY event_type, bucket
             ORDER BY CASE WHEN area IS NULL AND bucket = 0 THEN rn
                           WHEN area IS NULL THEN -rn END,
                      area DESC, event_id) AS pick
    FROM scored) WHERE pick = 1
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket, event_id,
       CAST(t AS BIGINT) AS t_ms, ROUND(vq / 1000000.0, 6) AS v
FROM elected
"""


@register("ts_lttb", oracle=_LTTB_ORACLE)
def ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(ts) div 1000").alias("t"),
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("long").alias("vq"),
    )
    wo = Window.partitionBy("event_type").orderBy("t", "event_id")
    wt = Window.partitionBy("event_type")
    p = s.select(
        "*", F.row_number().over(wo).alias("rn"), F.count(F.lit(1)).over(wt).alias("n")
    )
    b = p.withColumn(
        "bucket", F.floor((F.col("rn") - 1) * _LTTB_K * 1.0 / F.col("n")).cast("bigint")
    )
    c = b.groupBy("event_type", "bucket").agg(
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("cx"),
        (F.sum("vq").cast("double") / F.count(F.lit(1))).alias("cy"),
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    nbr = c.select(
        "event_type",
        "bucket",
        F.lag("cx").over(wb).alias("px"),
        F.lag("cy").over(wb).alias("py"),
        F.lead("cx").over(wb).alias("nx"),
        F.lead("cy").over(wb).alias("ny"),
    )
    scored = b.join(nbr, ["event_type", "bucket"]).withColumn(
        "area",
        F.when(
            F.col("px").isNull() | F.col("nx").isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.round(
                F.abs(
                    (F.col("px") - F.col("nx")) * (F.col("vq") - F.col("py"))
                    - (F.col("px") - F.col("t")) * (F.col("ny") - F.col("py"))
                ),
                6,
            )
        ),
    )
    pick_order = F.when(
        F.col("area").isNull() & (F.col("bucket") == 0), F.col("rn")
    ).when(F.col("area").isNull(), -F.col("rn"))
    wpick = Window.partitionBy("event_type", "bucket").orderBy(
        pick_order, F.col("area").desc(), "event_id"
    )
    elected = (
        scored.withColumn("pick", F.row_number().over(wpick))
        .filter(F.col("pick") == 1)
    )
    return elected.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        "event_id",
        F.col("t").cast("bigint").alias("t_ms"),
        F.round(F.col("vq") / 1_000_000.0, 6).alias("v"),
    )


# --------------------------------------------------------------------------
# ts_holt_winters — additive Holt-Winters triple exponential smoothing
# (level + trend + weekly seasonal, α=β=γ=0.5), completing the forecasting
# family: ts_ewma (level), ts_holt (level+trend), this key (full
# seasonality).  A THREE-variable recurrence whose seasonal state is a
# 7-slot vector — the Arrow-batched grouped-map shape again, with the
# oracle carrying the seasonal vector as a LIST column through a recursive
# CTE (a different state encoding, so a shared recurrence bug cannot
# self-confirm).
#
# Init (first full week): level = mean of the first 7 daily values,
# trend = 0, seasonal_i = x_i − level; outputs start at day 8.  Series
# shorter than 8 days emit nothing.  All arithmetic runs in exact-micros
# DOUBLE space (the daily partial is already 6-dp; halves are exact), so
# both engines execute bit-identical IEEE sequences.
# Scale shape: corpus → (series, day) partials first; the recurrence sees
# O(days) rows per series, never raw events; state per group is 7+2
# doubles.
# Reference parity: forecasting SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HW_M = 7

_HW_ORACLE = f"""
WITH RECURSIVE {_DAILY_CTE},
numbered AS (
  SELECT event_type, d, v,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
init_l AS (
  SELECT event_type, CAST(SUM(vq) AS DOUBLE) / {_HW_M} AS l0
  FROM numbered WHERE rn <= {_HW_M}
  GROUP BY event_type
  HAVING COUNT(*) = {_HW_M}
),
init AS (
  SELECT n.event_type, i.l0,
         list(CAST(n.vq AS DOUBLE) - i.l0 ORDER BY n.rn) AS seas0
  FROM numbered n
  JOIN init_l i ON n.event_type IS NOT DISTINCT FROM i.event_type
  WHERE n.rn <= {_HW_M}
  GROUP BY n.event_type, i.l0
),
hw AS (
  SELECT n.event_type, n.d, n.rn, CAST(n.vq AS DOUBLE) AS x,
         i.l0 AS level, CAST(0 AS DOUBLE) AS trend, i.seas0 AS seas
  FROM numbered n JOIN init i ON n.event_type IS NOT DISTINCT FROM i.event_type
  WHERE n.rn = {_HW_M}
  UNION ALL
  SELECT n.event_type, n.d, n.rn, CAST(n.vq AS DOUBLE),
         0.5 * (CAST(n.vq AS DOUBLE) - h.seas[1]) + 0.5 * (h.level + h.trend),
         0.5 * ((0.5 * (CAST(n.vq AS DOUBLE) - h.seas[1])
                 + 0.5 * (h.level + h.trend)) - h.level) + 0.5 * h.trend,
         list_append(h.seas[2:{_HW_M}],
           0.5 * (CAST(n.vq AS DOUBLE)
                  - (0.5 * (CAST(n.vq AS DOUBLE) - h.seas[1])
                     + 0.5 * (h.level + h.trend)))
           + 0.5 * h.seas[1])
  FROM numbered n
  JOIN hw h ON n.event_type IS NOT DISTINCT FROM h.event_type
           AND n.rn = h.rn + 1
)
SELECT event_type, d,
       ROUND(x / 1000000.0, 6) AS v,
       ROUND(level / 1000000.0, 6) AS level,
       ROUND(trend / 1000000.0, 6) AS trend,
       ROUND(seas[{_HW_M}] / 1000000.0, 6) AS seasonal,
       ROUND((level + trend + seas[1]) / 1000000.0, 6) AS forecast_next
FROM hw WHERE rn > {_HW_M}
"""


@register("ts_holt_winters", oracle=_HW_ORACLE)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).withColumn(
        "vq", F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("long")
    )

    def _hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        cols = ["event_type", "d", "x", "level", "trend", "seasonal",
                "forecast_next"]
        n = len(pdf)
        if n <= _HW_M:
            # schema-exact empty frame — pdf's own columns (v, vq) would
            # trip applyInPandas' RESULT_COLUMN_NAMES_MISMATCH
            return pd.DataFrame([], columns=cols)
        xs = [float(q) for q in pdf["vq"]]
        # init: exact integer sum then one division (matches the oracle's
        # CAST(SUM(vq) AS DOUBLE)/7 bit-for-bit)
        level = float(sum(int(q) for q in pdf["vq"][:_HW_M])) / _HW_M
        trend = 0.0
        seas = [x - level for x in xs[:_HW_M]]
        rows = []
        for t in range(_HW_M, n):
            x = xs[t]
            s_old = seas[0]
            l_new = 0.5 * (x - s_old) + 0.5 * (level + trend)
            b_new = 0.5 * (l_new - level) + 0.5 * trend
            s_new = 0.5 * (x - l_new) + 0.5 * s_old
            seas = seas[1:] + [s_new]
            level, trend = l_new, b_new
            rows.append((pdf["event_type"][t], pdf["d"][t], x, l_new, b_new,
                         s_new, l_new + b_new + seas[0]))
        return pd.DataFrame(rows, columns=cols)

    raw = daily.groupBy("event_type").applyInPandas(
        _hw,
        "event_type string, d date, x double, level double, trend double, "
        "seasonal double, forecast_next double",
    )
    return raw.select(
        "event_type",
        "d",
        F.round(F.col("x") / 1_000_000.0, 6).alias("v"),
        F.round(F.col("level") / 1_000_000.0, 6).alias("level"),
        F.round(F.col("trend") / 1_000_000.0, 6).alias("trend"),
        F.round(F.col("seasonal") / 1_000_000.0, 6).alias("seasonal"),
        F.round(F.col("forecast_next") / 1_000_000.0, 6).alias("forecast_next"),
    )


# --------------------------------------------------------------------------
# ts_m4_downsample — M4 aggregation (Jugel et al., VLDB 2014): per pixel
# bucket keep min, max, FIRST and LAST points — the four points whose
# line-join provably reproduces the pixel-exact rendering of the full
# series (min/max alone — ts_downsample — distorts inter-bucket
# connecting segments; LTTB — ts_lttb — is perceptual, not pixel-exact).
# One row per (series, day, role); a point filling several roles appears
# once per role, as M4 defines.
#
# Scale shape: ONE (event_type, day)-keyed window computes all four rank
# orders over one hash exchange; ties break on event_id so every role is
# total on both engines.  100 TB of points reduce to buckets × 4 rows.
# Reference parity: windowed SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_M4_ORACLE = """
WITH r AS (
  SELECT event_type, CAST(ts AS DATE) AS day, event_id, value, ts,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY value ASC, event_id) AS rn_min,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY value DESC, event_id) AS rn_max,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts ASC, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id) AS rn_last
  -- NULL-value points are unplottable; drop them before ranking (the
  -- ts_downsample NULL-placement parity fix, applied to all four roles)
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, 'min' AS role,
       event_id, ROUND(value, 6) AS value FROM r WHERE rn_min = 1
UNION ALL
SELECT event_type, strftime(day, '%Y-%m-%d'), 'max',
       event_id, ROUND(value, 6) FROM r WHERE rn_max = 1
UNION ALL
SELECT event_type, strftime(day, '%Y-%m-%d'), 'first',
       event_id, ROUND(value, 6) FROM r WHERE rn_first = 1
UNION ALL
SELECT event_type, strftime(day, '%Y-%m-%d'), 'last',
       event_id, ROUND(value, 6) FROM r WHERE rn_last = 1
"""


@register("ts_m4_downsample", oracle=_M4_ORACLE)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # unplottable NULL-value points drop before ranking (oracle mirror)
    d = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("ts").cast("date").alias("day"), "event_id", "value", "ts"
    )
    part = Window.partitionBy("event_type", "day")
    r = d.select(
        "event_type",
        "day",
        "event_id",
        "value",
        F.row_number()
        .over(part.orderBy(F.col("value").asc(), "event_id"))
        .alias("rn_min"),
        F.row_number()
        .over(part.orderBy(F.col("value").desc(), "event_id"))
        .alias("rn_max"),
        F.row_number()
        .over(part.orderBy(F.col("ts").asc(), "event_id"))
        .alias("rn_first"),
        F.row_number()
        .over(part.orderBy(F.col("ts").desc(), "event_id"))
        .alias("rn_last"),
    )

    def _role(flag: str, name: str) -> DataFrame:
        return r.filter(F.col(flag) == 1).select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.lit(name).alias("role"),
            "event_id",
            F.round("value", 6).alias("value"),
        )

    return (
        _role("rn_min", "min")
        .unionAll(_role("rn_max", "max"))
        .unionAll(_role("rn_first", "first"))
        .unionAll(_role("rn_last", "last"))
    )


# --------------------------------------------------------------------------
# ts_kalman — 1-D random-walk Kalman filter per series over the daily
# aggregate: the optimal online denoiser for "true level drifts, sensor is
# noisy" (process variance q = 0.25, observation variance r = 1.0).
# Per step:  p_pred = p + q;  gain k = p_pred / (p_pred + r);
# x_t = x_{t-1} + k·(z_t − x_{t-1});  p_t = (1 − k)·p_pred;
# initialized x_1 = z_1, p_1 = 1.  A true recurrence with data-dependent
# gain — no closed form — so like ts_holt it runs as an Arrow-batched
# grouped map (``applyInPandas``), the custom-operator escape hatch.
#
# Scale shape: the corpus collapses FIRST to (series, day) daily partials
# (map-side combine — the ts_holt shape); the grouped map sees one
# series' calendar-bounded daily rows per batch; raw events never reach
# Python.
#
# Cross-engine determinism: both engines execute the IDENTICAL IEEE op
# sequence on the identical 6-dp daily inputs — q and r are exact binary
# fractions and the gain division is a single deterministic IEEE op, so
# the trajectories agree bit-for-bit (the oracle repeats the gain
# expression textually where Python binds it to a variable — same ops,
# same value).  Rounding is display-only, Spark-side F.round ≡ DuckDB
# ROUND.  Reference parity: smoothing reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_KALMAN_ORACLE = f"""
WITH RECURSIVE {_DAILY_CTE},
numbered AS (
  SELECT event_type, d, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
kal AS (
  SELECT event_type, d, v, rn, v AS x, CAST(1.0 AS DOUBLE) AS p
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.d, n.v, n.rn,
         k.x + ((k.p + 0.25) / ((k.p + 0.25) + 1.0)) * (n.v - k.x),
         (1.0 - ((k.p + 0.25) / ((k.p + 0.25) + 1.0))) * (k.p + 0.25)
  FROM numbered n
  JOIN kal k ON n.event_type IS NOT DISTINCT FROM k.event_type
            AND n.rn = k.rn + 1
)
SELECT event_type, d, v,
       ROUND(x, 6) AS x_filt,
       ROUND(p, 6) AS p_var
FROM kal
"""


@register("ts_kalman", oracle=_KALMAN_ORACLE)
def ts_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    daily = _daily(ev)

    def _kalman(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        xs, ps = [], []
        x_prev, p_prev = 0.0, 0.0
        for i, z in enumerate(pdf["v"]):
            if i == 0:
                x, p = z, 1.0
            else:
                p_pred = p_prev + 0.25
                k = p_pred / (p_pred + 1.0)
                x = x_prev + k * (z - x_prev)
                p = (1.0 - k) * p_pred
            xs.append(x)
            ps.append(p)
            x_prev, p_prev = x, p
        pdf["x"] = xs
        pdf["p"] = ps
        return pdf

    raw = daily.groupBy("event_type").applyInPandas(
        _kalman, "event_type string, d date, v double, x double, p double"
    )
    return raw.select(
        "event_type", "d", "v",
        F.round("x", 6).alias("x_filt"),
        F.round("p", 6).alias("p_var"),
    )


# --------------------------------------------------------------------------
# ts_mase_backtest — seasonal-naive forecast backtest scored by MASE
# (Hyndman & Koehler 2006, the scale-free forecast-accuracy standard):
# forecast_t = v_{t-7 rows} per series, MAE over the testable rows,
# normalized by the in-sample one-step naive MAE (|v_t − v_{t−1}| mean).
# MASE < 1 ⇔ the seasonal forecast beats the naive random walk.
#
# Scale shape: the corpus collapses to (series, day) daily partials
# first (map-side combine); both lags share ONE series-keyed window over
# the daily relation; the scoring aggregate is |series| rows.
# Exactness: per-row errors round to 6 dp, means are dsum/COUNT of the
# rounded terms, and the final ratio quantizes via FLOOR(x·1e6+0.5)/1e6
# (the cross-engine half-ulp discipline).  Zero denominators (constant
# series) guard to NULL on the exact fixed-point sum.
# Reference parity: backtest SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_MASE_ORACLE = f"""
WITH {_DAILY_CTE},
lagged AS (
  SELECT event_type, d, v,
         LAG(v, 7) OVER w AS v7,
         LAG(v, 1) OVER w AS v1
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
err AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         COUNT(v7) AS n_test,
         {osum('CASE WHEN v7 IS NOT NULL THEN ROUND(ABS(v - v7), 6) END')} AS sae7,
         COUNT(v1) AS n_naive,
         {osum('CASE WHEN v1 IS NOT NULL THEN ROUND(ABS(v - v1), 6) END')} AS sae1
  FROM lagged GROUP BY event_type
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(n_test AS BIGINT) AS n_test,
       CASE WHEN n_test = 0 THEN NULL
            ELSE FLOOR(sae7 / n_test * 1000000.0 + 0.5) / 1000000.0
       END AS mae_seasonal,
       CASE WHEN n_test = 0 OR n_naive = 0 OR sae1 = 0 THEN NULL
            ELSE FLOOR((sae7 / n_test) / (sae1 / n_naive) * 1000000.0 + 0.5)
                 / 1000000.0
       END AS mase
FROM err
"""


@register("ts_mase_backtest", oracle=_MASE_ORACLE)
def ts_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(load(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 7).over(w).alias("v7"),
        F.lag("v", 1).over(w).alias("v1"),
    )
    e7 = F.when(F.col("v7").isNotNull(), F.round(F.abs(F.col("v") - F.col("v7")), 6))
    e1 = F.when(F.col("v1").isNotNull(), F.round(F.abs(F.col("v") - F.col("v1")), 6))
    err = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count("v7").alias("n_test"),
        dsum(e7).alias("sae7"),
        F.count("v1").alias("n_naive"),
        dsum(e1).alias("sae1"),
    )
    n_test, n_naive = F.col("n_test"), F.col("n_naive")
    sae7, sae1 = F.col("sae7"), F.col("sae1")
    from nedp_etl_spark.util import q6

    return err.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        n_test.cast("bigint").alias("n_test"),
        F.when(n_test == 0, F.lit(None).cast("double"))
        .otherwise(q6(sae7 / n_test))
        .alias("mae_seasonal"),
        F.when(
            (n_test == 0) | (n_naive == 0) | (sae1 == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(q6((sae7 / n_test) / (sae1 / n_naive)))
        .alias("mase"),
    )



# --------------------------------------------------------------------------
# ts_stl_decompose — classical additive trend+seasonal decomposition (the
# moving-average method behind statsmodels' seasonal_decompose; the
# deterministic cousin of STL): trend = centered
# 7-day moving average (NULL at the edges where the window is partial),
# weekly seasonal = per-day-of-week mean of the detrended series,
# re-centered to sum to zero, residual = v − trend − seasonal.
#
# Scale shape: daily partials first; the centered MA is ONE series-keyed
# window; the seasonal factors are a (series, dow) aggregate — ≤ 7 rows
# per series — re-centered via a series-keyed mean and joined back to the
# daily relation (both joins are |series·7|-sized).
# Exactness: v quantizes to 1e-6 int64 for the frame sum (the sliding-
# frame float-order trap); every mean is exact-int or dsum fixed point
# with the FLOOR(x·1e6+0.5)/1e6 quantize; day-of-week is Sunday-based
# 0..6 on both engines (Spark dayofweek()−1 ≡ DuckDB dayofweek()).
# --------------------------------------------------------------------------

_STL_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d, v,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
ma AS (
  SELECT event_type, d, v,
         CASE WHEN COUNT(*) OVER w = 7
              THEN FLOOR(CAST(SUM(vq) OVER w AS DOUBLE) / 7.0 + 0.5) / 1000000.0
         END AS trend
  FROM q
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT event_type, d, v, trend, dayofweek(d) AS dow,
         ROUND(v - trend, 6) AS dt
  FROM ma
),
sdow AS (
  SELECT event_type, dow,
         FLOOR({osum('dt')} / COUNT(dt) * 1000000.0 + 0.5) / 1000000.0 AS s_raw
  FROM det WHERE dt IS NOT NULL GROUP BY event_type, dow
),
scen AS (
  SELECT event_type,
         FLOOR({osum('s_raw')} / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS s_mean
  FROM sdow GROUP BY event_type
),
sfin AS (
  SELECT s.event_type, s.dow, ROUND(s.s_raw - c.s_mean, 6) AS seasonal
  FROM sdow s JOIN scen c ON c.event_type = s.event_type
)
SELECT m.event_type, CAST(m.d AS VARCHAR) AS d, m.v, m.trend,
       f.seasonal,
       CASE WHEN m.trend IS NOT NULL
            THEN ROUND(m.v - m.trend - f.seasonal, 6) END AS resid
FROM det m
JOIN sfin f ON f.event_type = m.event_type AND f.dow = m.dow
"""


@register("ts_stl_decompose", oracle=_STL_ORACLE)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(load(spark, sf_dir, "events"))
    from nedp_etl_spark.util import q6

    q = daily.select(
        "event_type",
        "d",
        "v",
        F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    ma = q.select(
        "event_type",
        "d",
        "v",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.floor(F.sum("vq").over(w).cast("double") / 7.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("trend"),
    )
    det = ma.select(
        "event_type",
        "d",
        "v",
        "trend",
        (F.dayofweek("d") - 1).alias("dow"),
        F.round(F.col("v") - F.col("trend"), 6).alias("dt"),
    )
    from nedp_etl_spark.util import dsum

    sdow = (
        det.filter(F.col("dt").isNotNull())
        .groupBy("event_type", "dow")
        .agg(q6(dsum("dt") / F.count("dt")).alias("s_raw"))
    )
    scen = sdow.groupBy("event_type").agg(
        q6(dsum("s_raw") / F.count(F.lit(1))).alias("s_mean")
    )
    sfin = sdow.join(scen, "event_type").select(
        "event_type", "dow", F.round(F.col("s_raw") - F.col("s_mean"), 6).alias("seasonal")
    )
    return det.join(sfin, ["event_type", "dow"]).select(
        "event_type",
        F.col("d").cast("string").alias("d"),
        "v",
        "trend",
        "seasonal",
        F.when(
            F.col("trend").isNotNull(),
            F.round(F.col("v") - F.col("trend") - F.col("seasonal"), 6),
        ).alias("resid"),
    )


# --------------------------------------------------------------------------
# ts_periodogram — discrete-Fourier power at candidate periods 2..7 days
# per event_type, over the shared daily mean series (_DAILY_CTE): the
# frequency-domain seasonality DETECTOR that tells ts_seasonal_decompose /
# ts_stl_decompose which period to decompose at.  The reference reaches
# spectral analysis only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
#
# Cross-engine determinism: cos/sin are evaluated at only p distinct
# arguments per period (t mod p), each value quantized to a 6-dp INTEGER
# (micro-units) immediately after the transcendental; the daily mean
# (already an exact 6-dp value) is likewise lifted to integer micro-units,
# so every per-day contribution v_int * trig_int is an exact integer
# product in decimal(38,0)/HUGEINT and the per-(event_type, period) sums
# are order-independent.  |contribution| <= 1e6*|v|*1e6 ≈ 9e24 at the
# full value domain — past int64 (round-12 magnitude sweep), far under
# 1e38.  re/im come back as int/1e12 (identical IEEE
# division), power = re^2 + im^2 then the q6 FLOOR quantize.
#
# Scale shape: one groupBy (event_type, day) over the events scan, a
# 6-way map-side explode of the period candidates, one keyed aggregate
# by (event_type, period) — no joins, no windows, no driver loops.
# --------------------------------------------------------------------------

_TWO_PI = "6.283185307179586"
_PG_PERIODS = (2, 3, 4, 5, 6, 7)

_PERIODOGRAM_ORACLE = f"""
WITH {_DAILY_CTE},
base AS (
  SELECT event_type, CAST(d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
x AS (
  SELECT event_type, pr.p, t, vq,
         CAST(FLOOR(COS({_TWO_PI} * (CAST(t % pr.p AS DOUBLE) / pr.p))
                    * 1000000.0 + 0.5) AS BIGINT) AS cq,
         CAST(FLOOR(SIN({_TWO_PI} * (CAST(t % pr.p AS DOUBLE) / pr.p))
                    * 1000000.0 + 0.5) AS BIGINT) AS sq
  FROM base CROSS JOIN range({_PG_PERIODS[0]}, {_PG_PERIODS[-1] + 1}) pr(p)
),
agg AS (
  SELECT event_type, CAST(p AS INT) AS period,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(CAST(SUM(CAST(vq AS HUGEINT) * cq) AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS re,
         CAST(CAST(SUM(CAST(vq AS HUGEINT) * sq) AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS im
  FROM x GROUP BY event_type, p
)
, outq AS (
  SELECT event_type, period, n_days,
         FLOOR(re * 1000000.0 + 0.5) / 1000000.0 AS re,
         FLOOR(im * 1000000.0 + 0.5) / 1000000.0 AS im
  FROM agg
)
SELECT event_type, period, n_days, re, im,
       FLOOR((re * re + im * im) * 1000000.0 + 0.5) / 1000000.0 AS power
FROM outq
"""


@register("ts_periodogram", oracle=_PERIODOGRAM_ORACLE)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import q6

    daily = _daily(load(spark, sf_dir, "events"))
    base = daily.select(
        "event_type",
        F.datediff(F.col("d"), F.lit("1970-01-01")).cast("bigint").alias("t"),
        F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    x = base.select(
        "event_type",
        "t",
        "vq",
        F.explode(F.array([F.lit(p).cast("bigint") for p in _PG_PERIODS])).alias("p"),
    )
    two_pi = F.lit(float(_TWO_PI))
    ang = two_pi * ((F.col("t") % F.col("p")).cast("double") / F.col("p"))
    x = x.select(
        "event_type",
        "p",
        "vq",
        F.floor(F.cos(ang) * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("cq"),
        F.floor(F.sin(ang) * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("sq"),
    )
    agg = x.groupBy("event_type", F.col("p").cast("int").alias("period")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (
            F.sum(F.col("vq").cast("decimal(38,0)") * F.col("cq")).cast("double")
            / 1_000_000_000_000.0
        ).alias("re"),
        (
            F.sum(F.col("vq").cast("decimal(38,0)") * F.col("sq")).cast("double")
            / 1_000_000_000_000.0
        ).alias("im"),
    )
    out = agg.select(
        "event_type",
        "period",
        "n_days",
        q6(F.col("re")).alias("re"),
        q6(F.col("im")).alias("im"),
    )
    # power from the QUANTIZED re/im: the raw decimal→double (Spark) vs
    # HUGEINT→double (DuckDB) conversions can differ by 1 ulp at ~1e24
    # sums, and the square amplifies it past the 6-dp round; the quantized
    # values are exact on both engines
    re, im = F.col("re"), F.col("im")
    return out.withColumn("power", q6(re * re + im * im))


# --------------------------------------------------------------------------
# ts_croston — Croston's method for INTERMITTENT demand (spare-parts /
# sparse-event forecasting): separate exponential smoothing of the
# nonzero-demand sizes (z) and the inter-demand intervals (p); the rate
# forecast is z/p.  Demand days are deterministically sparsified to every
# 3rd epoch day (the ts_interpolate trick) so the series is genuinely
# intermittent at any fixture scale.  Like ts_ewma, the smoothing uses the
# k-bounded geometric fold (last 8 demand points, α=0.2, normalized
# truncated weights) — a closed form both engines state identically, no
# recurrence needed.  The reference reaches forecasting only as dbt-model
# SQL (dbtoperator.py:273-274).
#
# Scale shape: corpus collapses FIRST to (series, day) via the shared
# daily rollup; windows partition by series over DEMAND DAYS only
# (sparser than the calendar); per-tick geometric folds are map-side
# array math.  Weighted folds run in fixed list order on both engines.
# --------------------------------------------------------------------------

_CROSTON_A = 0.2   # smoothing constant
_CROSTON_K = 8     # fold depth (geometric weights below 0.8^8 truncated)

_TS_CROSTON_ORACLE = f"""
WITH {_DAILY_CTE},
dd AS (
  SELECT event_type, d, v
  FROM daily
  WHERE date_diff('day', DATE '1970-01-01', d) % 3 = 0
),
iv AS (
  SELECT event_type, d, v,
         date_diff('day',
                   LAG(d) OVER (PARTITION BY event_type ORDER BY d), d) AS gap
  FROM dd
),
w AS (
  SELECT event_type, d, v, gap,
         list(v) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN {_CROSTON_K - 1} PRECEDING AND CURRENT ROW) AS lv,
         list(gap) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN {_CROSTON_K - 1} PRECEDING AND CURRENT ROW) AS lg
  FROM iv WHERE gap IS NOT NULL
),
sm AS (
  SELECT event_type, d, v, gap,
         ROUND(list_sum(list_transform(lv, (x, i) -> x * pow(0.8, len(lv) - i)))
               / ((1 - pow(0.8, len(lv))) / {_CROSTON_A}), 6) AS z,
         ROUND(list_sum(list_transform(lg, (x, i) -> x * pow(0.8, len(lg) - i)))
               / ((1 - pow(0.8, len(lg))) / {_CROSTON_A}), 6) AS p
  FROM w
)
SELECT event_type, d AS day, v AS demand, CAST(gap AS BIGINT) AS interval,
       z, p,
       FLOOR(z / p * 1000000.0 + 0.5) / 1000000.0 AS croston
FROM sm
"""


@register("ts_croston", oracle=_TS_CROSTON_ORACLE)
def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dd = _daily(ev).filter(
        F.datediff(F.col("d"), F.lit("1970-01-01")) % 3 == 0
    )
    wlag = Window.partitionBy("event_type").orderBy("d")
    iv = dd.withColumn(
        "gap", F.datediff(F.col("d"), F.lag("d").over(wlag))
    ).filter(F.col("gap").isNotNull())
    frame = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(_CROSTON_K - 1), 0)
    )
    w = iv.select(
        "event_type",
        "d",
        "v",
        "gap",
        F.collect_list("v").over(frame).alias("lv"),
        F.collect_list(F.col("gap").cast("double")).over(frame).alias("lg"),
    )

    def _fold(col: str) -> Column:
        # Spark transform index is 0-based; DuckDB list_transform is
        # 1-based — both weight the j-th most recent tick by 0.8^j.
        num = F.expr(
            f"aggregate(transform({col}, (x, i) -> x * pow(0.8,"
            f" size({col}) - 1 - i)), 0D, (acc, v) -> acc + v)"
        )
        den = (F.lit(1.0) - F.pow(F.lit(0.8), F.size(col))) / F.lit(_CROSTON_A)
        return F.round(num / den, 6)

    sm = w.select(
        "event_type",
        "d",
        "v",
        "gap",
        _fold("lv").alias("z"),
        _fold("lg").alias("p"),
    )
    return sm.select(
        "event_type",
        F.col("d").alias("day"),
        F.col("v").alias("demand"),
        F.col("gap").cast("bigint").alias("interval"),
        "z",
        "p",
        (F.floor(F.col("z") / F.col("p") * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0)
        .alias("croston"),
    )


# --------------------------------------------------------------------------
# ts_bollinger_bands — 7-day rolling mean ± 2σ envelope per series with
# %B position (where today's value sits inside the band): the standard
# mean-reversion / volatility readout over the daily rollup.  The
# reference reaches technical indicators only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism (the sliding-frame discipline from memory of
# win_rolling_regression): daily values are ALREADY 6-dp; they quantize
# to int64 micro-units and the rolling Σx, Σx² run as exact integer
# window sums — order-free; mean/variance reconstruct in identical
# doubles, sqrt is correctly rounded, and every output passes q6.
# Scale: corpus collapses to (series, day) first; windows partition by
# series over daily rows.  Σx² runs as decimal(38,0)/HUGEINT integer
# products of the int64 micro-units — exact for the full value domain
# (round-12 magnitude sweep: int64 products overflow per value at ~3e6).
# --------------------------------------------------------------------------

_BOLL_N = 7

_TS_BOLLINGER_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d, v,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
w AS (
  SELECT event_type, d, v,
         CAST(SUM(vq) OVER win AS BIGINT) AS sq,
         SUM(CAST(vq AS HUGEINT) * vq) OVER win AS ssq,
         CAST(COUNT(*) OVER win AS BIGINT) AS n
  FROM q
  WINDOW win AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT event_type, d, v, n,
         CAST(sq AS DOUBLE) / n / 1000000.0 AS mean,
         CASE WHEN n >= 2
              THEN GREATEST((CAST(CAST(ssq AS VARCHAR) AS DOUBLE) / 1000000000000.0
                             - n * (CAST(sq AS DOUBLE) / n / 1000000.0)
                               * (CAST(sq AS DOUBLE) / n / 1000000.0))
                            / (n - 1.0), 0.0)
              ELSE 0.0 END AS var
  FROM w
)
SELECT event_type, d AS day, v AS close, n,
       FLOOR(mean * 1000000.0 + 0.5) / 1000000.0 AS sma,
       FLOOR((mean - 2.0 * SQRT(var)) * 1000000.0 + 0.5) / 1000000.0 AS lower,
       FLOOR((mean + 2.0 * SQRT(var)) * 1000000.0 + 0.5) / 1000000.0 AS upper,
       CASE WHEN SQRT(var) = 0.0 THEN NULL
            ELSE FLOOR((v - (mean - 2.0 * SQRT(var))) / (4.0 * SQRT(var))
                       * 1000000.0 + 0.5) / 1000000.0 END AS pct_b
FROM m
"""


@register("ts_bollinger_bands", oracle=_TS_BOLLINGER_ORACLE)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = _daily(ev).withColumn(
        "vq", F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(_BOLL_N - 1), 0)
    )
    w = q.select(
        "event_type",
        "d",
        "v",
        F.sum("vq").over(win).cast("bigint").alias("sq"),
        F.sum(
            F.col("vq").cast("decimal(38,0)") * F.col("vq").cast("decimal(38,0)")
        ).over(win).alias("ssq"),
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
    )
    mean = F.col("sq").cast("double") / F.col("n") / 1_000_000.0
    var = F.when(
        F.col("n") >= 2,
        F.greatest(
            (F.col("ssq").cast("double") / 1_000_000_000_000.0
             - F.col("n") * mean * mean)
            / (F.col("n") - 1.0),
            F.lit(0.0),
        ),
    ).otherwise(F.lit(0.0))
    m = w.select("event_type", "d", "v", "n", mean.alias("mean"), var.alias("var"))
    sd = F.sqrt(F.col("var"))
    from nedp_etl_spark.util import q6 as q6l  # saturation-guarded quantize
    return m.select(
        "event_type",
        F.col("d").alias("day"),
        F.col("v").alias("close"),
        "n",
        q6l(F.col("mean")).alias("sma"),
        q6l(F.col("mean") - 2.0 * sd).alias("lower"),
        q6l(F.col("mean") + 2.0 * sd).alias("upper"),
        F.when(sd == 0.0, F.lit(None).cast("double"))
        .otherwise(q6l((F.col("v") - (F.col("mean") - 2.0 * sd)) / (4.0 * sd)))
        .alias("pct_b"),
    )


# --------------------------------------------------------------------------
# agg_gumbel_extremes — extreme-value analysis per metric: daily block
# maxima fitted to a Gumbel distribution by the method of moments
# (β = s·√6/π, μ = m̄ − γ·β with Euler–Mascheroni γ), plus the T=100-block
# return level μ − β·ln(−ln(1 − 1/T)) — the capacity-planning readout
# ("what daily peak do we see once per 100 days?").  The reference
# reaches extreme-value stats only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: block maxima are exact per-day MAX values; their mean and
# variance come from int64 micro-unit sums (order-free); β/μ/return
# level use the shared √6/π and γ literals and pass q6.  Scale: one
# (metric, day) keyed aggregate, one per-metric rollup.
# --------------------------------------------------------------------------

_GUMBEL_SQRT6_PI = "0.7796968012336761"   # √6/π
_GUMBEL_GAMMA = "0.5772156649015329"      # Euler–Mascheroni
_GUMBEL_T = 100

_GUMBEL_ORACLE = f"""
WITH mx AS (
  -- 1e-3 quantize (not 1e-6): the SQUARE sum must stay int64 — at 1e-6
  -- scale ssq was within ~2.2x of 2^63 on the sf0.1 fixture (review
  -- finding); 1e-3 gives ~6 orders of headroom (values ≤ 1e6 over 1e7
  -- blocks) at precision far beyond a moments-fit's needs
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(FLOOR(MAX(value) * 1000.0 + 0.5) AS BIGINT) AS mq
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mq) AS BIGINT) AS sq,
         CAST(SUM(mq * mq) AS BIGINT) AS ssq
  FROM mx GROUP BY event_type
),
p AS (
  SELECT event_type, n,
         CAST(sq AS DOUBLE) / n / 1000.0 AS m,
         CASE WHEN n >= 2
              THEN SQRT(GREATEST((CAST(ssq AS DOUBLE) / 1000000.0
                        - n * (CAST(sq AS DOUBLE) / n / 1000.0)
                          * (CAST(sq AS DOUBLE) / n / 1000.0)) / (n - 1.0),
                        0.0))
              ELSE NULL END AS sd
  FROM s
)
SELECT event_type, n AS n_blocks,
       FLOOR(m * 1000000.0 + 0.5) / 1000000.0 AS block_mean,
       CASE WHEN sd IS NULL THEN NULL
            ELSE FLOOR(sd * {_GUMBEL_SQRT6_PI} * 1000000.0 + 0.5) / 1000000.0
       END AS beta,
       CASE WHEN sd IS NULL THEN NULL
            ELSE FLOOR((m - {_GUMBEL_GAMMA} * sd * {_GUMBEL_SQRT6_PI})
                       * 1000000.0 + 0.5) / 1000000.0
       END AS mu,
       CASE WHEN sd IS NULL THEN NULL
            ELSE FLOOR((m - {_GUMBEL_GAMMA} * sd * {_GUMBEL_SQRT6_PI}
                        - sd * {_GUMBEL_SQRT6_PI}
                          * LN(-LN(1.0 - 1.0 / {_GUMBEL_T}.0)))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS return_level_100
FROM p
"""


@register("agg_gumbel_extremes", oracle=_GUMBEL_ORACLE)
def agg_gumbel_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mx = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.floor(F.max("value") * 1_000.0 + F.lit(0.5)).cast("bigint").alias("mq")
    )
    s = mx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mq").cast("bigint").alias("sq"),
        F.sum(F.col("mq") * F.col("mq")).cast("bigint").alias("ssq"),
    )
    n = F.col("n")
    m = F.col("sq").cast("double") / n / 1_000.0
    sd = F.when(
        n >= 2,
        F.sqrt(
            F.greatest(
                (F.col("ssq").cast("double") / 1_000_000.0 - n * m * m)
                / (n - 1.0),
                F.lit(0.0),
            )
        ),
    ).otherwise(F.lit(None).cast("double"))
    p = s.select("event_type", n.alias("n_blocks"), m.alias("m"), sd.alias("sd"))
    c_s6pi = float(_GUMBEL_SQRT6_PI)
    c_gam = float(_GUMBEL_GAMMA)
    import math as _math

    lnln = _math.log(-_math.log(1.0 - 1.0 / _GUMBEL_T))
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    sd_c, m_c = F.col("sd"), F.col("m")
    return p.select(
        "event_type",
        "n_blocks",
        q6c(m_c).alias("block_mean"),
        F.when(sd_c.isNull(), F.lit(None).cast("double"))
        .otherwise(q6c(sd_c * c_s6pi))
        .alias("beta"),
        F.when(sd_c.isNull(), F.lit(None).cast("double"))
        .otherwise(q6c(m_c - c_gam * sd_c * c_s6pi))
        .alias("mu"),
        F.when(sd_c.isNull(), F.lit(None).cast("double"))
        .otherwise(
            q6c(m_c - c_gam * sd_c * c_s6pi - sd_c * c_s6pi * F.lit(lnln))
        )
        .alias("return_level_100"),
    )


# --------------------------------------------------------------------------
# ts_control_chart — Shewhart individuals/moving-range chart per metric
# over the daily rollup: center line = mean of daily values, control
# limits = mean ± 2.66·MR̄ (the standard d2-based individuals-chart
# constant for n=2 moving ranges), plus the out-of-control violation
# census — the SPC readout an ops dashboard runs next to ts_cusum's
# changepoint detector.  The reference reaches SPC only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: daily values are 6-dp; value and moving-range sums run as
# int64 micro-unit aggregates (order-free); the 2.66 constant is a
# shared literal; limits and the violation compare use q6-quantized
# doubles identically on both engines.  Scale: daily rollup first; one
# lag window per series over daily rows; one keyed rollup.
# --------------------------------------------------------------------------

_SPC_K = "2.66"  # d2-based individuals-chart constant (n=2 moving range)

_TS_SPC_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d, v,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq,
         ABS(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)
             - LAG(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY d)) AS mrq
  FROM daily
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(vq) AS BIGINT) AS svq,
         CAST(SUM(mrq) AS BIGINT) AS smrq,
         CAST(COUNT(mrq) AS BIGINT) AS nmr
  FROM q GROUP BY event_type
),
lim AS (
  SELECT event_type, n_days,
         CAST(svq AS DOUBLE) / n_days / 1000000.0 AS center,
         CASE WHEN nmr = 0 THEN NULL
              ELSE {_SPC_K} * (CAST(smrq AS DOUBLE) / nmr / 1000000.0)
         END AS band
  FROM s
)
SELECT q.event_type, lim.n_days,
       FLOOR(lim.center * 1000000.0 + 0.5) / 1000000.0 AS center,
       FLOOR((lim.center - lim.band) * 1000000.0 + 0.5) / 1000000.0 AS lcl,
       FLOOR((lim.center + lim.band) * 1000000.0 + 0.5) / 1000000.0 AS ucl,
       CAST(SUM(CASE WHEN q.v < FLOOR((lim.center - lim.band) * 1000000.0 + 0.5) / 1000000.0
                       OR q.v > FLOOR((lim.center + lim.band) * 1000000.0 + 0.5) / 1000000.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM q JOIN lim ON lim.event_type = q.event_type
GROUP BY q.event_type, lim.n_days, lim.center, lim.band
"""


@register("ts_control_chart", oracle=_TS_SPC_ORACLE)
def ts_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    vq = F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint")
    wlag = Window.partitionBy("event_type").orderBy("d")
    q = (
        _daily(ev)
        .withColumn("vq", vq)
        .withColumn("mrq", F.abs(F.col("vq") - F.lag("vq").over(wlag)))
        .localCheckpoint(eager=True)  # daily relation: stats + violation scan
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("vq").cast("bigint").alias("svq"),
        F.sum("mrq").cast("bigint").alias("smrq"),
        F.count("mrq").cast("bigint").alias("nmr"),
    )
    center = F.col("svq").cast("double") / F.col("n_days") / 1_000_000.0
    band = F.when(
        F.col("nmr") == 0, F.lit(None).cast("double")
    ).otherwise(
        F.lit(float(_SPC_K)) * (F.col("smrq").cast("double") / F.col("nmr") / 1_000_000.0)
    )
    lim = s.select(
        "event_type", "n_days", center.alias("center"), band.alias("band")
    )
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    lcl = q6c(F.col("center") - F.col("band"))
    ucl = q6c(F.col("center") + F.col("band"))
    return (
        q.join(lim, "event_type")
        .groupBy("event_type", "n_days", "center", "band")
        .agg(
            F.sum(
                F.when((F.col("v") < lcl) | (F.col("v") > ucl), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_violations")
        )
        .select(
            "event_type",
            "n_days",
            q6c(F.col("center")).alias("center"),
            lcl.alias("lcl"),
            ucl.alias("ucl"),
            "n_violations",
        )
    )


# --------------------------------------------------------------------------
# ts_drawdown — maximum drawdown per metric over the daily rollup: the
# largest peak-to-trough drop of the running cumulative series, plus the
# peak/trough days — the risk readout (worst historical decline) every
# balance/engagement dashboard publishes.  Running peak is a
# [unbounded preceding, current] MAX window — Spark's O(1)-per-row fast
# path (the join_nearest_1d lesson); drawdown rows then reduce by one
# keyed max_by.  All masses are exact int64 micro-units.
# --------------------------------------------------------------------------

_TS_DRAWDOWN_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
c AS (
  SELECT event_type, d, vq,
         SUM(vq) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM q
),
p AS (
  SELECT event_type, d, cum,
         MAX(cum) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM c
),
dd AS (
  SELECT event_type, d, CAST(peak - cum AS BIGINT) AS draw_q
  FROM p
)
SELECT event_type,
       CAST(MAX(draw_q) AS BIGINT) / 1000000.0 AS max_drawdown,
       CAST(MIN(CASE WHEN draw_q = (SELECT MAX(d2.draw_q) FROM dd d2
                                    WHERE d2.event_type = dd.event_type)
                     THEN d END) AS VARCHAR) AS trough_day
FROM dd GROUP BY event_type
"""


@register("ts_drawdown", oracle=_TS_DRAWDOWN_ORACLE)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = _daily(ev).select(
        "event_type",
        "d",
        F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = q.withColumn("cum", F.sum("vq").over(run))
    p = c.withColumn("peak", F.max("cum").over(run))
    dd = p.select(
        "event_type", "d", (F.col("peak") - F.col("cum")).cast("bigint").alias("draw_q")
    )
    # keyed reduce: per-type max drawdown joined back to find the FIRST
    # day it occurred (min day on ties) — keyed aggregate + keyed join,
    # no window over the drawdown rows
    ddc = dd.localCheckpoint(eager=True)  # 2 consumers of the window pass
    mx = ddc.groupBy("event_type").agg(F.max("draw_q").alias("mxq"))
    return (
        ddc.join(mx, "event_type")
        .filter(F.col("draw_q") == F.col("mxq"))
        .groupBy("event_type")
        .agg(
            (F.max("mxq").cast("bigint") / 1_000_000.0).alias("max_drawdown"),
            F.min("d").cast("string").alias("trough_day"),
        )
    )


# --------------------------------------------------------------------------
# ts_new_vs_returning — the product-analytics daily census: per day, how
# many active users are NEW (first-ever activity) vs returning, plus the
# cumulative user base — the growth-accounting readout every engagement
# dashboard leads with.  New = the user's min activity day equals the
# day; the cumulative series is a running sum over the per-day aggregate
# (bounded by calendar days — the justified global-window class).
#
# Scale shape: first-seen days are ONE user-keyed aggregate; the daily
# census is a (day)-keyed aggregate over (user, day) distinct activity;
# only the bounded per-day relation sees a window.
# --------------------------------------------------------------------------

_NEWRET_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
fs AS (SELECT user_id, MIN(d) AS first_d FROM act GROUP BY user_id),
census AS (
  SELECT act.d,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN act.d = fs.first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new
  FROM act JOIN fs ON fs.user_id = act.user_id
  GROUP BY act.d
)
SELECT CAST(d AS VARCHAR) AS day, n_active, n_new,
       n_active - n_new AS n_returning,
       CAST(SUM(n_new) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM census
"""


@register("ts_new_vs_returning", oracle=_NEWRET_ORACLE)
def ts_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    fs = act.groupBy("user_id").agg(F.min("d").alias("first_d"))
    census = (
        act.join(fs, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
    )
    run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return census.select(
        F.col("d").cast("string").alias("day"),
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(run).cast("bigint").alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# ts_period_growth — week-over-week growth per metric: ISO-week rollup of
# the daily values, previous-week comparison, WoW growth rate, and the
# 4-week trailing total — the plain period-over-period readout every
# business dashboard leads with (ts_downsample changes grain;
# this op adds the COMPARISons).  Weeks key on the Monday date
# (date_trunc 'week' agrees on both engines).
#
# Determinism: weekly sums are int64 micro-unit aggregates of the 6-dp
# daily values; growth = (w − prev)/prev over exact ints, q6, NULL when
# prev ≤ 0; trailing total from a 4-row running frame (fast path).
# --------------------------------------------------------------------------

_TS_GROWTH_ORACLE = f"""
WITH {_DAILY_CTE},
w AS (
  SELECT event_type, CAST(date_trunc('week', d) AS DATE) AS wk,
         CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS wq
  FROM daily GROUP BY event_type, date_trunc('week', d)
),
l AS (
  SELECT event_type, wk, wq,
         LAG(wq) OVER (PARTITION BY event_type ORDER BY wk) AS prev_q,
         CAST(SUM(wq) OVER (PARTITION BY event_type ORDER BY wk
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_q
  FROM w
)
SELECT event_type, CAST(wk AS VARCHAR) AS week_start,
       wq / 1000000.0 AS week_total,
       CASE WHEN prev_q IS NULL OR prev_q <= 0 THEN NULL
            ELSE FLOOR((CAST(wq AS DOUBLE) - prev_q) / prev_q
                       * 1000000.0 + 0.5) / 1000000.0 END AS wow_growth,
       trail_q / 1000000.0 AS trailing_4w
FROM l
"""


@register("ts_period_growth", oracle=_TS_GROWTH_ORACLE)
def ts_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        _daily(ev)
        .groupBy(
            "event_type", F.date_trunc("week", "d").cast("date").alias("wk")
        )
        .agg(
            F.sum(F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("wq")
        )
    )
    order = Window.partitionBy("event_type").orderBy("wk")
    trail = order.rowsBetween(-3, 0)
    l = w.select(
        "event_type",
        "wk",
        "wq",
        F.lag("wq").over(order).alias("prev_q"),
        F.sum("wq").over(trail).cast("bigint").alias("trail_q"),
    )
    return l.select(
        "event_type",
        F.col("wk").cast("string").alias("week_start"),
        (F.col("wq") / 1_000_000.0).alias("week_total"),
        F.when(
            F.col("prev_q").isNull() | (F.col("prev_q") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.floor(
                (F.col("wq").cast("double") - F.col("prev_q"))
                / F.col("prev_q")
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        )
        .alias("wow_growth"),
        (F.col("trail_q") / 1_000_000.0).alias("trailing_4w"),
    )


# --------------------------------------------------------------------------
# ts_cohort_ltv — lifetime-value curves by signup cohort: users cohort on
# their first-activity WEEK; each later week contributes its value sum at
# age = weeks-since-signup; the output is the (cohort, age) LTV matrix
# with per-cohort cumulative value — the curve a growth team reads to
# compare cohort quality over time (ts_retention_cohort counts the USERS;
# this accumulates the VALUE).
#
# Determinism: value sums ride the int64 micro-unit fixed-point; ages
# are exact integer week diffs; the cumulative runs as a fast-path
# running frame per cohort.  Scale: first-seen is ONE user-keyed
# aggregate joined back; the matrix is a (cohort, age) keyed aggregate.
# --------------------------------------------------------------------------

_COHORT_LTV_ORACLE = """
WITH act AS (
  SELECT user_id, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
fs AS (SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY user_id),
m AS (
  SELECT fs.cohort,
         CAST(date_diff('week', fs.cohort, act.wk) AS BIGINT) AS age_weeks,
         CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users,
         CAST(SUM(act.vq) AS BIGINT) AS wq
  FROM act JOIN fs ON fs.user_id = act.user_id
  GROUP BY fs.cohort, date_diff('week', fs.cohort, act.wk)
)
SELECT CAST(cohort AS VARCHAR) AS cohort_week, age_weeks, n_users,
       wq / 1000000.0 AS week_value,
       CAST(SUM(wq) OVER (PARTITION BY cohort ORDER BY age_weeks
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         / 1000000.0 AS cumulative_value
FROM m
"""


@register("ts_cohort_ltv", oracle=_COHORT_LTV_ORACLE)
def ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    act = ev.select(
        "user_id",
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk"),
        F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
    )
    fs = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    age = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("bigint")
    m = (
        act.join(fs, "user_id")
        .groupBy("cohort", age.alias("age_weeks"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("vq").cast("bigint").alias("wq"),
        )
    )
    run = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return m.select(
        F.col("cohort").cast("string").alias("cohort_week"),
        "age_weeks",
        "n_users",
        (F.col("wq") / 1_000_000.0).alias("week_value"),
        (F.sum("wq").over(run).cast("bigint") / 1_000_000.0).alias(
            "cumulative_value"
        ),
    )


# --------------------------------------------------------------------------
# ts_backtest_cv — rolling-origin cross-validation of the per-series
# linear trend model: at each weekly cutoff, fit OLS on all days ≤ cutoff
# (closed-form normal equations from exact integer sums) and score the
# forecast against the NEXT 7 actual days — the honest out-of-sample
# error a forecasting pipeline publishes instead of in-sample fit
# (ts_forecast_linear fits once; ts_mase_backtest scores the seasonal-
# naive baseline; this one scores the model).
#
# Scale shape: the (series, cutoff) training sums come from ONE keyed
# aggregate over the (daily row × cutoff spine) membership join — the
# spine is O(#weeks), calendar-bounded, broadcast; test rows join the
# O(series × cutoffs) fit table keyed.  Determinism: x = day index
# (exact int), y quantized to int64 micro-units; slope/intercept are
# identical double closed forms over exact ints; per-day absolute errors
# re-quantize to int64 before the MAE sum; q6 outputs.
# --------------------------------------------------------------------------

_BACKTEST_HORIZON = 7

_TS_BACKTEST_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d,
         CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS yq, v
  FROM daily
),
spine AS (
  SELECT DISTINCT CAST(date_trunc('week', d) AS DATE) AS cutoff FROM daily
),
fit AS (
  SELECT q.event_type, s.cutoff,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q.x) AS BIGINT) AS sx,
         CAST(SUM(q.yq) AS BIGINT) AS sy,
         SUM(CAST(q.x AS HUGEINT) * q.yq) AS sxy,
         CAST(SUM(q.x * q.x) AS BIGINT) AS sxx
  FROM q JOIN spine s ON q.d <= s.cutoff
  GROUP BY q.event_type, s.cutoff
  HAVING COUNT(*) >= 2
),
co0 AS (
  SELECT event_type, cutoff, n,
         -- slope/intercept quantize to 6 dp before prediction: the raw
         -- double forms agree only to ~1 ulp across engines, and the
         -- pred quantize amplifies that into MAE diffs (round-12 sweep)
         FLOOR((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 1000000.0
           * 1000000.0 + 0.5) / 1000000.0 AS slope,
         sx, sy
  FROM fit
  WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0
),
co AS (
  -- centered form: pred = (sy/1e6 + slope*(n*x - sx))/n.  The intercept
  -- form cancels two ~1e11 terms to a ~1e8 prediction, amplifying 1-ulp
  -- cross-engine drift past the 6-dp grid (round-12 sweep); here every
  -- operand is small or exact and the op sequence is identical IEEE
  SELECT event_type, cutoff, n, slope, sx, sy FROM co0
),
scored AS (
  -- saturation guard (q6/q6l class): an extrapolated prediction on a
  -- near-degenerate det can push |pred·1e6| past 2^63 even with all
  -- inputs in-domain — Spark's floor(double) would silently pin while
  -- this CAST throws.  NULL the row on BOTH engines instead.
  SELECT co.event_type, co.cutoff,
         CASE WHEN ABS((CAST(co.sy AS DOUBLE) / 1000000.0
                        + co.slope * (co.n * q.x - co.sx)) / co.n
                       * 1000000.0 + 0.5) < 9.223372036854775808e18
              THEN CAST(ABS(CAST(FLOOR((CAST(co.sy AS DOUBLE) / 1000000.0
                                        + co.slope * (co.n * q.x - co.sx))
                                       / co.n * 1000000.0 + 0.5)
                            AS BIGINT) - q.yq) AS BIGINT)
         END AS aeq
  FROM co
  JOIN q ON q.event_type = co.event_type
        AND q.d > co.cutoff
        AND q.d <= co.cutoff + INTERVAL {_BACKTEST_HORIZON} DAY
)
SELECT event_type, CAST(cutoff AS VARCHAR) AS cutoff_week,
       CAST(COUNT(*) AS BIGINT) AS n_test_days,
       FLOOR(CAST(SUM(aeq) AS DOUBLE) / 1000000.0 / COUNT(*) * 1000000.0 + 0.5)
         / 1000000.0 AS mae
FROM scored GROUP BY event_type, cutoff
"""


@register("ts_backtest_cv", oracle=_TS_BACKTEST_ORACLE)
def ts_backtest_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)  # spine + fit + score reuse
    q = daily.select(
        "event_type",
        "d",
        F.datediff(F.col("d"), F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("yq"),
    )
    spine = daily.select(
        F.date_trunc("week", "d").cast("date").alias("cutoff")
    ).distinct()
    fit = (
        q.join(F.broadcast(spine), q["d"] <= F.col("cutoff"))
        .groupBy("event_type", "cutoff")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("yq").cast("bigint").alias("sy"),
            # x·yq reaches ~2e4·9.2e18 ≈ 1.9e23 at the full value
            # domain — integer decimal/HUGEINT product, never long
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("yq")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    det = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    # explicit double casts on BOTH engines: DuckDB otherwise keeps the
    # integral-double × HUGEINT product in integer domain (exact) while
    # Spark rounds each double op — 1.5e-5 slope drift (round-12 sweep)
    slope = (
        (nd * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / det
        / 1_000_000.0
    )
    from nedp_etl_spark.util import q6

    # quantized slope + centered prediction (see the oracle comment)
    co = fit.filter(det != 0).select(
        "event_type", "cutoff", "n", "sx", "sy", q6(slope).alias("slope")
    )
    scored = co.join(
        q.select(F.col("event_type").alias("et"), "d", "x", "yq"),
        (F.col("et") == F.col("event_type"))
        & (F.col("d") > F.col("cutoff"))
        & (F.col("d") <= F.date_add(F.col("cutoff"), _BACKTEST_HORIZON)),
    )
    predq = (
        F.col("sy").cast("double") / 1_000_000.0
        + F.col("slope") * (F.col("n") * F.col("x") - F.col("sx"))
    ) / F.col("n") * 1_000_000.0 + F.lit(0.5)
    # saturation guard mirrored in the oracle's scored CTE: floor(double)
    # silently pins at ±2^63 on Spark while the oracle CAST throws —
    # NULL the quantize on both engines past the int64 edge
    scored = scored.select(
        "event_type",
        "cutoff",
        F.when(
            F.abs(predq) < F.lit(float(1 << 63)),
            F.abs(F.floor(predq).cast("bigint") - F.col("yq")).cast("bigint"),
        ).alias("aeq"),
    )
    return scored.groupBy("event_type", "cutoff").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
        (
            F.floor(
                F.sum("aeq").cast("double")
                / 1_000_000.0
                / F.count(F.lit(1))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("mae"),
    ).select(
        "event_type",
        F.col("cutoff").cast("string").alias("cutoff_week"),
        "n_test_days",
        "mae",
    )


# --------------------------------------------------------------------------
# ts_esd_anomaly — generalized-ESD-style iterative masked outlier removal
# (Rosner 1983, the "Twitter anomaly detection" core): per series, K=3
# rounds each recompute mean/std over the REMAINING days and remove the
# largest |x-mean|/std — masking lets a gross outlier stop hiding a
# second one, which the one-shot z-score/MAD screens (ts_mad_anomaly,
# ts_control_chart) structurally cannot do.  R > 3.0 is the fixed
# flagging threshold (the classic 3-sigma variant; the t-quantile lambda
# schedule is a constant-table refinement, deliberately out of scope).
#
# Scale shape: the corpus collapses once to the (series, day) daily
# relation; each round is one keyed moment aggregate + one keyed
# rank-1 selection + one anti-join, all on #series x #days rows.
# Exactness: daily v is q6 -> int64 micros exactly; moment sums in
# decimal/HUGEINT (vq^2 sums pass int64 at ~month length); mean/std/R in
# double from exact integers with identical formula text; argmax by
# (R desc, day) ROW_NUMBER both engines.
# --------------------------------------------------------------------------

_ESD_ROUNDS = 3
_ESD_FLAG = "3.0"


def _esd_oracle() -> str:
    parts = [
        _DAILY_CTE,
        """rem0 AS (
  SELECT event_type, d, CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
)""".strip(),
    ]
    for r in range(1, _ESD_ROUNDS + 1):
        prev = f"rem{r - 1}"
        parts.append(f"""
st{r} AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(vq AS HUGEINT)) AS s,
         SUM(CAST(vq AS HUGEINT) * vq) AS ss
  FROM {prev} GROUP BY event_type
),
sc{r} AS (
  SELECT p.event_type, p.d, p.vq,
         FLOOR(ABS(CAST(p.vq AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
               / sqrt((CAST(t.n AS DOUBLE) * CAST(t.ss AS DOUBLE)
                       - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                      / (CAST(t.n AS DOUBLE) * CAST(t.n - 1 AS DOUBLE)))
               * 1000000.0 + 0.5) / 1000000.0 AS r_stat
  FROM {prev} p JOIN st{r} t ON t.event_type = p.event_type
  WHERE t.n >= 3 AND t.n * t.ss - t.s * t.s > 0
),
out{r} AS (
  SELECT event_type, d, vq, r_stat, {r} AS round FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY r_stat DESC, d) AS rn
    FROM sc{r}) WHERE rn = 1
),
rem{r} AS (
  SELECT p.* FROM {prev} p
  LEFT JOIN out{r} o ON o.event_type = p.event_type AND o.d = p.d
  WHERE o.d IS NULL
)""".strip())
    union = " UNION ALL ".join(f"SELECT * FROM out{r}" for r in range(1, _ESD_ROUNDS + 1))
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT event_type, d AS day, CAST(vq AS DOUBLE) / 1000000.0 AS v,
       r_stat, CAST(round AS INT) AS round, r_stat > {_ESD_FLAG} AS flagged
FROM ({union})
"""
    )


_ESD_ORACLE = _esd_oracle()


@register("ts_esd_anomaly", oracle=_ESD_ORACLE)
def ts_esd_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    rem = _daily(ev).select(
        "event_type",
        "d",
        F.floor(F.col("v") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
    ).localCheckpoint(eager=False)  # feeds all three rounds' lineages
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    outs = []
    for r in range(1, _ESD_ROUNDS + 1):
        st = rem.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("vq")).alias("s"),
            F.sum(dec("vq") * F.col("vq")).alias("ss"),
        )
        nd = F.col("n").cast("double")
        sd, ssd = F.col("s").cast("double"), F.col("ss").cast("double")
        std = F.sqrt(
            (nd * ssd - sd * sd) / (nd * (F.col("n") - 1).cast("double"))
        )
        r_stat = (
            F.floor(
                F.abs(F.col("vq").cast("double") - sd / nd) / std * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        )
        sc = (
            rem.join(st, "event_type")
            .filter(
                (F.col("n") >= 3)
                & (F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0)
            )
            .select("event_type", "d", "vq", r_stat.alias("r_stat"))
        )
        rn = F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("r_stat").desc(), "d")
        )
        out = (
            sc.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("event_type", "d", "vq", "r_stat", F.lit(r).alias("round"))
            .localCheckpoint(eager=False)  # removed set reused by the anti-join
        )
        outs.append(out)
        rem = rem.join(out.select("event_type", "d"), ["event_type", "d"], "left_anti")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "event_type",
        F.col("d").alias("day"),
        (F.col("vq").cast("double") / 1_000_000.0).alias("v"),
        "r_stat",
        F.col("round").cast("int").alias("round"),
        (F.col("r_stat") > F.lit(float(_ESD_FLAG))).alias("flagged"),
    )


# --------------------------------------------------------------------------
# ts_mann_kendall — non-parametric monotonic-trend test per series (Mann
# 1945 / Kendall 1975) with Sen's slope (Sen 1968): S = Σ_{i<j}
# sign(x_j − x_i) over the daily means, tie-corrected variance
# Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, continuity-corrected
# Z = (S∓1)/√Var(S), and the robust slope estimate = median of all
# pairwise slopes.  The standard "is this KPI actually trending" test —
# distribution-free where ts_forecast_linear's OLS assumes normal errors.
#
# Scale shape: pairwise work runs on the CALENDAR-BOUNDED daily rollup
# (≤ #days rows per series, the ts_esd_anomaly bound) via an equi-join on
# event_type — never on raw events; the Sen median ranks within
# per-series windows over those bounded pair sets.  At 100 TB the daily
# relation still has #series × #days rows.
#
# Parity discipline: S and the tie term are exact integers; slopes
# quantize to 1e-6 fixed-point BEFORE the median rank (so ordering and
# the two middle order statistics are integer-exact); the median of the
# two middle values is SUM/COUNT in doubles — identical expression both
# engines.  All-tied series: Var(S) = 0 exactly → Z NULL, 'no trend'.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_MK_Z_CRIT = 1.959964  # two-sided 5% normal critical value

_MK_ORACLE = f"""
WITH {_DAILY_CTE},
p AS (
  SELECT a.event_type,
         CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg,
         CAST(FLOOR((b.v - a.v) / date_diff('day', a.d, b.d) * 1000000.0 + 0.5)
              AS BIGINT) AS slope_q
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.d > a.d
),
s AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat FROM p GROUP BY event_type
),
nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY event_type
),
ties AS (
  SELECT event_type,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, v)
  GROUP BY event_type
),
rk AS (
  SELECT event_type, slope_q,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_q) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM p
),
sen AS (
  SELECT event_type,
         FLOOR(CAST(SUM(slope_q) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0
           AS sen_slope
  FROM rk
  WHERE rn = CAST(FLOOR((m + 1) / 2.0) AS BIGINT)
     OR rn = CAST(FLOOR((m + 2) / 2.0) AS BIGINT)
  GROUP BY event_type
),
v AS (
  SELECT nn.event_type, nn.n, s.s_stat, sen.sen_slope,
         (CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) AS DOUBLE)
          - CAST(ties.tie_term AS DOUBLE)) / 18.0 AS var_s
  FROM nn JOIN s ON s.event_type = nn.event_type
  JOIN ties ON ties.event_type = nn.event_type
  JOIN sen ON sen.event_type = nn.event_type
),
z AS (
  SELECT event_type, n, s_stat, sen_slope,
         FLOOR(var_s * 1000000.0 + 0.5) / 1000000.0 AS var_s,
         CASE WHEN var_s <= 0 THEN NULL
              WHEN s_stat > 0 THEN
                FLOOR((s_stat - 1) / sqrt(var_s) * 1000000.0 + 0.5) / 1000000.0
              WHEN s_stat < 0 THEN
                FLOOR((s_stat + 1) / sqrt(var_s) * 1000000.0 + 0.5) / 1000000.0
              ELSE 0.0 END AS z_stat
  FROM v
)
SELECT event_type, n AS n_days, s_stat, var_s, z_stat, sen_slope,
       CASE WHEN z_stat IS NULL THEN 'no trend'
            WHEN z_stat > {_MK_Z_CRIT} THEN 'increasing'
            WHEN z_stat < -{_MK_Z_CRIT} THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM z
"""


@register("ts_mann_kendall", oracle=_MK_ORACLE)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=False)  # feeds 4 branches
    a, b = daily.alias("a"), daily.alias("b")
    av, bv = F.col("a.v"), F.col("b.v")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(bv > av, 1).when(bv < av, -1).otherwise(0).alias("sg"),
        F.floor(
            (bv - av) / F.datediff(F.col("b.d"), F.col("a.d")) * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("slope_q"),
    )
    s = pairs.groupBy("event_type").agg(F.sum("sg").cast("bigint").alias("s_stat"))
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).cast("bigint").alias("tie_term"))
    )
    w = Window.partitionBy("event_type").orderBy("slope_q")
    wm = Window.partitionBy("event_type")
    rk = pairs.select(
        "event_type",
        "slope_q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    m = F.col("m")
    sen = (
        rk.filter(
            (F.col("rn") == F.floor((m + 1) / 2.0).cast("bigint"))
            | (F.col("rn") == F.floor((m + 2) / 2.0).cast("bigint"))
        )
        .groupBy("event_type")
        .agg(
            (
                F.floor(
                    F.sum("slope_q").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("sen_slope")
        )
    )
    n = F.col("n")
    v = (
        nn.join(s, "event_type")
        .join(ties, "event_type")
        .join(sen, "event_type")
        .withColumn(
            "var_s_raw",
            (
                (n * (n - 1) * (2 * n + 5)).cast("double")
                - F.col("tie_term").cast("double")
            )
            / 18.0,
        )
    )
    ss, vr = F.col("s_stat"), F.col("var_s_raw")
    z = v.select(
        "event_type",
        "n",
        "s_stat",
        "sen_slope",
        (F.floor(vr * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias("var_s"),
        F.when(vr <= 0, F.lit(None).cast("double"))
        .when(
            ss > 0,
            F.floor((ss - 1) / F.sqrt(vr) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        )
        .when(
            ss < 0,
            F.floor((ss + 1) / F.sqrt(vr) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        )
        .otherwise(0.0)
        .alias("z_stat"),
    )
    zc = F.col("z_stat")
    return z.select(
        "event_type",
        n.alias("n_days"),
        "s_stat",
        "var_s",
        "z_stat",
        "sen_slope",
        F.when(zc.isNull(), "no trend")
        .when(zc > _MK_Z_CRIT, "increasing")
        .when(zc < -_MK_Z_CRIT, "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


# --------------------------------------------------------------------------
# ts_ljung_box — portmanteau white-noise test per series (Ljung & Box
# 1978): Q(m) = n(n+2)·Σ_{k=1..m} ρ̂_k²/(n−k) over the ts_acf calendar-lag
# autocorrelations (lags 1..7 days of the shared daily rollup), compared
# to the χ²(m) 5% critical value.  The "is there ANY autocorrelation
# left" gate a forecasting pipeline runs on its residuals before trusting
# prediction intervals — the omnibus companion to ts_acf's per-lag view.
#
# Scale shape: identical to ts_acf (daily rollup → self-join at 7
# calendar offsets, all relations calendar-bounded); the Q combine runs
# on ≤ 7 rows per series.  Zero-variance series (ss = 0) are excluded —
# the statistic is undefined there.
#
# Parity discipline: ρ̂_k inherits ts_acf's exact construction (dsum
# numerators / denominators, ROUND 6); per-lag terms ρ²/(n−k) quantize to
# 1e-12 fixed-point BEFORE the cross-lag sum (k-order independent), and
# Q, the constant χ² critical-value CASE (df = m_lags), and the reject
# flag are identical expressions both engines.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_LB_CHI2_95 = {  # qchisq(0.95, df), df 1..7 — shared literals, both engines
    1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
    5: 11.070498, 6: 12.591587, 7: 14.067140,
}

_LB_CRIT_SQL = "CASE m_lags " + " ".join(
    f"WHEN {df} THEN {v}" for df, v in _LB_CHI2_95.items()
) + " END"

_LJUNG_BOX_ORACLE = f"""
WITH {_DAILY_CTE},
stats AS (
  SELECT event_type, ROUND({osum('v')} / COUNT(*), 6) AS m FROM daily
  GROUP BY event_type
),
x AS (
  SELECT daily.event_type, daily.d, daily.v - stats.m AS x
  FROM daily JOIN stats ON daily.event_type = stats.event_type
),
den AS (
  SELECT event_type, {osum_prod('x', 'x')} AS ss FROM x GROUP BY event_type
),
pairs AS (
  SELECT a.event_type, k.k, a.x AS xa, b.x AS xb
  FROM x a
  JOIN (SELECT UNNEST(range(1, 8)) AS k) k ON TRUE
  JOIN x b ON b.event_type = a.event_type AND b.d = a.d + CAST(k.k AS INT)
),
rho AS (
  SELECT p.event_type, p.k, ROUND({osum_prod('p.xa', 'p.xb')} / den.ss, 6) AS rho
  FROM pairs p JOIN den ON p.event_type = den.event_type
  WHERE den.ss > 0
  GROUP BY p.event_type, p.k, den.ss
),
nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY event_type
),
terms AS (
  SELECT r.event_type, nn.n,
         CAST(COUNT(*) AS INT) AS m_lags,
         SUM(CAST(FLOOR(r.rho * r.rho / (nn.n - r.k) * 1000000000000.0 + 0.5)
                  AS BIGINT)) AS sq
  FROM rho r JOIN nn ON nn.event_type = r.event_type
  GROUP BY r.event_type, nn.n
)
SELECT event_type, n AS n_days, m_lags,
       FLOOR(n * (n + 2) * (CAST(sq AS DOUBLE) / 1000000000000.0)
             * 1000000.0 + 0.5) / 1000000.0 AS q_stat,
       CAST({_LB_CRIT_SQL} AS DOUBLE) AS chi2_crit_95,
       FLOOR(n * (n + 2) * (CAST(sq AS DOUBLE) / 1000000000000.0)
             * 1000000.0 + 0.5) / 1000000.0 > {_LB_CRIT_SQL}
         AS reject_white_noise
FROM terms
"""


@register("ts_ljung_box", oracle=_LJUNG_BOX_ORACLE)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)  # ts_acf's shared-branch fix
    stats = daily.groupBy("event_type").agg(
        F.round(dsum("v") / F.count(F.lit(1)), 6).alias("m")
    )
    x = daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "d", (F.col("v") - F.col("m")).alias("x")
    )
    den = x.groupBy("event_type").agg(dsum_prod("x", "x").alias("ss"))
    lagged = x.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"),
        F.col("d").alias("d0"),
        F.col("x").alias("xa"),
    ).withColumn("d_pair", F.expr("date_add(d0, k)"))
    pairs = lagged.join(
        x.select("event_type", F.col("d").alias("d_pair"), F.col("x").alias("xb")),
        ["event_type", "d_pair"],
    )
    rho = (
        pairs.groupBy("event_type", "k")
        .agg(dsum_prod("xa", "xb").alias("num"))
        .join(F.broadcast(den.filter(F.col("ss") > 0)), "event_type")
        .select(
            "event_type", "k", F.round(F.col("num") / F.col("ss"), 6).alias("rho")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    terms = (
        rho.join(F.broadcast(nn), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.count(F.lit(1)).cast("int").alias("m_lags"),
            F.sum(
                F.floor(
                    F.col("rho") * F.col("rho") / (F.col("n") - F.col("k"))
                    * 1_000_000_000_000.0
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("sq"),
        )
    )
    n = F.col("n")
    q_stat = (
        F.floor(
            n * (n + 2) * (F.col("sq").cast("double") / 1_000_000_000_000.0)
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    crit = F.lit(None).cast("double")
    for df_, v in sorted(_LB_CHI2_95.items(), reverse=True):
        crit = F.when(F.col("m_lags") == df_, F.lit(v)).otherwise(crit)
    return terms.select(
        "event_type",
        n.alias("n_days"),
        "m_lags",
        q_stat.alias("q_stat"),
        crit.alias("chi2_crit_95"),
        (q_stat > crit).alias("reject_white_noise"),
    )


# --------------------------------------------------------------------------
# ts_hurst_exponent — long-memory estimation by rescaled-range analysis
# (Hurst 1951; Mandelbrot & Wallis 1969): chop each series' daily values
# into full blocks of n ∈ {8,16,32} days, compute the rescaled range
# R/S per block (range of cumulative deviations over population std),
# average per scale, and fit log2(mean R/S) against log2(n) — the slope
# is H.  H≈0.5 random walk, H→1 persistent/trending, H→0 mean-reverting:
# the "does this KPI trend or revert" fingerprint behind retention and
# load forecasting choices.
#
# Scale shape: everything runs on the calendar-bounded daily rollup
# (eagerly checkpointed — scale explosion ×3 and the regression branch
# reuse it); windows partition by (series, scale, block) — never global.
# The regression runs on ≤ 3 rows per series.
#
# Parity discipline: block means ROUND 6 (the _daily ladder); per-day
# squared deviations quantize 1e-12 before the block sum; cumulative
# deviations sum in day order under identical window frames (same IEEE
# sequence both engines); R/S quantizes q6, per-scale means are exact
# fixed-point ratios; log2 is written ln(x)/ln(2.0) TEXTUALLY on both
# engines and quantizes q9 before the exact-integer regression sums;
# log2(n) is exact (3,4,5).  Series with <2 populated scales yield NULL.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HURST_SCALES = [8, 16, 32]

_HURST_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
  FROM daily
),
nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
  GROUP BY event_type
),
blocks AS (
  SELECT i.event_type, s.n, CAST(FLOOR((i.t - 1) / s.n) AS BIGINT) AS blk,
         i.t, i.v
  FROM idx i JOIN (SELECT UNNEST([{', '.join(str(x) for x in _HURST_SCALES)}]) AS n) s
    ON TRUE
),
fullb AS (
  SELECT event_type, n, blk
  FROM blocks GROUP BY event_type, n, blk HAVING COUNT(*) = MAX(n)
),
bm AS (
  SELECT b.event_type, b.n, b.blk,
         ROUND({osum('b.v')} / COUNT(*), 6) AS m
  FROM blocks b JOIN fullb f
    ON f.event_type = b.event_type AND f.n = b.n AND f.blk = b.blk
  GROUP BY b.event_type, b.n, b.blk
),
dev AS (
  SELECT b.event_type, b.n, b.blk, b.t, b.v - bm.m AS dv,
         SUM(b.v - bm.m) OVER (PARTITION BY b.event_type, b.n, b.blk
                               ORDER BY b.t) AS z
  FROM blocks b JOIN bm
    ON bm.event_type = b.event_type AND bm.n = b.n AND bm.blk = b.blk
),
rs AS (
  SELECT event_type, n, blk,
         MAX(z) - MIN(z) AS r,
         SUM({oqprod('dv', 'dv')}) AS ssq
  FROM dev GROUP BY event_type, n, blk
),
rsq AS (
  SELECT event_type, n,
         CAST(FLOOR(r / sqrt(CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
                             / 1000000000000.0 / n)
                    * 1000000.0 + 0.5) AS BIGINT) AS rs_q
  FROM rs WHERE ssq > 0
),
sc AS (
  SELECT event_type, n,
         CAST(FLOOR(ln(CAST(SUM(rs_q) AS DOUBLE) / COUNT(*) / 1000000.0)
                    / ln(2.0) * 1000000000.0 + 0.5) AS BIGINT) AS yq,
         CAST(CASE n WHEN 8 THEN 3 WHEN 16 THEN 4 WHEN 32 THEN 5 END
              AS BIGINT) AS x
  FROM rsq GROUP BY event_type, n
),
fit AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(x * yq) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM sc GROUP BY event_type
)
SELECT nn.event_type, nn.n_days, COALESCE(fit.k, 0) AS n_scales,
       CASE WHEN fit.k >= 2 THEN
         FLOOR(CAST(fit.k * fit.sxy - fit.sx * fit.sy AS DOUBLE)
               / CAST(fit.k * fit.sxx - fit.sx * fit.sx AS DOUBLE)
               / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0
       END AS hurst
FROM nn LEFT JOIN fit ON fit.event_type = nn.event_type
"""


@register("ts_hurst_exponent", oracle=_HURST_ORACLE)
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)  # ×3 scales + count branch
    idx = daily.select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    blocks = idx.select(
        "event_type",
        "v",
        "t",
        F.explode(F.array(*[F.lit(x) for x in _HURST_SCALES])).alias("n"),
    ).withColumn("blk", F.floor((F.col("t") - 1) / F.col("n")).cast("bigint"))
    fullb = (
        blocks.groupBy("event_type", "n", "blk")
        .agg(F.count(F.lit(1)).alias("c"), F.max("n").alias("mn"))
        .filter(F.col("c") == F.col("mn"))
        .select("event_type", "n", "blk")
    )
    kept = blocks.join(fullb, ["event_type", "n", "blk"])
    bm = kept.groupBy("event_type", "n", "blk").agg(
        F.round(dsum("v") / F.count(F.lit(1)), 6).alias("m")
    )
    wz = Window.partitionBy("event_type", "n", "blk").orderBy("t")
    dev = kept.join(bm, ["event_type", "n", "blk"]).select(
        "event_type",
        "n",
        "blk",
        "t",
        (F.col("v") - F.col("m")).alias("dv"),
    ).withColumn("z", F.sum("dv").over(wz))
    rs = dev.groupBy("event_type", "n", "blk").agg(
        (F.max("z") - F.min("z")).alias("r"),
        # factor-quantized integer product: dv²·1e12 overflows the
        # int64 quantize per VALUE for in-domain dv (round-12 sweep)
        F.sum(qprod(F.col("dv"), F.col("dv"))).alias("ssq"),
    )
    rsq = rs.filter(F.col("ssq") > 0).select(
        "event_type",
        "n",
        F.floor(
            F.col("r")
            / F.sqrt(F.col("ssq").cast("double") / 1_000_000_000_000.0 / F.col("n"))
            * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rs_q"),
    )
    xmap = F.when(F.col("n") == 8, 3).when(F.col("n") == 16, 4).otherwise(5)
    sc = rsq.groupBy("event_type", "n").agg(
        F.floor(
            F.log(F.sum("rs_q").cast("double") / F.count(F.lit(1)) / 1_000_000.0)
            / F.log(F.lit(2.0))
            * 1_000_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("yq"),
    ).withColumn("x", xmap.cast("bigint"))
    fit = sc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    k = F.col("k")
    return nn.join(fit, "event_type", "left").select(
        "event_type",
        "n_days",
        F.coalesce(k, F.lit(0)).cast("bigint").alias("n_scales"),
        F.when(
            k >= 2,
            F.floor(
                (k * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (k * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                / 1_000_000_000.0
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("hurst"),
    )


# --------------------------------------------------------------------------
# ts_sax_symbolize — Symbolic Aggregate approXimation per series (Lin,
# Keogh et al. 2003): z-normalize the daily values, Piecewise Aggregate
# Approximate into 7-day frames, and map each frame mean to a 4-letter
# alphabet by the N(0,1) quartile breakpoints (−0.6745, 0, 0.6745).  The
# classic dimensionality reduction that turns a series into a short WORD
# — the index key for whole-corpus motif search, similarity grouping, and
# anomaly triage at 100 TB (words join/group in constant space).
#
# Scale shape: one daily rollup (calendar-bounded, checkpointed), exact
# per-series moments (fixed-point Σ / decimal Σ² — no second pass), frame
# means over ≤7-row windows partitioned by (series, frame), word assembly
# via sort_array(collect_list) over ≤⌈days/7⌉ frames per series.
#
# Parity discipline: z-scores quantize q6 ((v−m)/s on ROUND-6 m and q6 s
# from exact moments); frame means are fixed-point ratios; symbol CASE
# thresholds compare q6 values against shared literals; zero-variance
# series yield a NULL word (z undefined) rather than a fake constant.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SAX_FRAME = 7
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)  # N(0,1) quartiles, alphabet a..d

_SAX_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
  FROM daily
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
         SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)
             * CAST(FLOOR(v * 1000000.0 + 0.5) AS HUGEINT)) AS ssq
  FROM daily GROUP BY event_type
),
mom AS (
  SELECT event_type, n,
         ROUND(CAST(sq AS DOUBLE) / 1000000.0 / n, 6) AS m,
         CASE WHEN n * ssq - CAST(sq AS HUGEINT) * sq > 0 THEN
           FLOOR(sqrt(CAST(CAST(n * ssq - CAST(sq AS HUGEINT) * sq
                             AS VARCHAR) AS DOUBLE))
                 / n / 1000000.0 * 1000000.0 + 0.5) / 1000000.0
         END AS s
  FROM st
),
z AS (
  SELECT i.event_type, mom.n, CAST(FLOOR((i.t - 1) / {_SAX_FRAME}) AS BIGINT)
           AS seg,
         FLOOR((i.v - mom.m) / mom.s * 1000000.0 + 0.5) / 1000000.0 AS z
  FROM idx i JOIN mom ON mom.event_type = i.event_type
  WHERE mom.s IS NOT NULL
),
paa AS (
  SELECT event_type, n, seg,
         CAST(SUM(CAST(FLOOR(z * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000.0 AS pm
  FROM z GROUP BY event_type, n, seg
),
sym AS (
  SELECT event_type, n, seg,
         CASE WHEN pm < {_SAX_BREAKS[0]} THEN 'a'
              WHEN pm < {_SAX_BREAKS[1]} THEN 'b'
              WHEN pm < {_SAX_BREAKS[2]} THEN 'c'
              ELSE 'd' END AS sy
  FROM paa
),
words AS (
  SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS n_segments,
         string_agg(sy, '' ORDER BY seg) AS sax_word
  FROM sym GROUP BY event_type, n
),
nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
  GROUP BY event_type
)
SELECT nn.event_type, nn.n_days,
       COALESCE(w.n_segments, 0) AS n_segments, w.sax_word
FROM nn LEFT JOIN words w ON w.event_type = nn.event_type
"""


@register("ts_sax_symbolize", oracle=_SAX_ORACLE)
def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)  # idx/moments/count branches
    idx = daily.select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    vq = F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("bigint")
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vq).cast("bigint").alias("sq"),
        F.sum(vq.cast("decimal(38,0)") * vq.cast("decimal(38,0)")).alias("ssq"),
    )
    n, sq = F.col("n"), F.col("sq")
    var_num = n.cast("decimal(38,0)") * F.col("ssq") - sq.cast(
        "decimal(38,0)"
    ) * sq
    mom = st.select(
        "event_type",
        "n",
        F.round(sq.cast("double") / 1_000_000.0 / n, 6).alias("m"),
        F.when(
            var_num > 0,
            F.floor(
                F.sqrt(var_num.cast("double")) / n / 1_000_000.0 * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("s"),
    )
    z = (
        idx.join(F.broadcast(mom.filter(F.col("s").isNotNull())), "event_type")
        .select(
            "event_type",
            "n",
            F.floor((F.col("t") - 1) / _SAX_FRAME).cast("bigint").alias("seg"),
            (
                F.floor(
                    (F.col("v") - F.col("m")) / F.col("s") * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("z"),
        )
    )
    paa = z.groupBy("event_type", "n", "seg").agg(
        (
            F.sum(F.floor(F.col("z") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1))
            / 1_000_000.0
        ).alias("pm")
    )
    pm = F.col("pm")
    sym = paa.select(
        "event_type",
        "n",
        "seg",
        F.when(pm < _SAX_BREAKS[0], "a")
        .when(pm < _SAX_BREAKS[1], "b")
        .when(pm < _SAX_BREAKS[2], "c")
        .otherwise("d")
        .alias("sy"),
    )
    words = sym.groupBy("event_type", "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg", "sy"))),
                lambda x: x["sy"],
            ),
        ).alias("sax_word"),
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return nn.join(words.drop("n"), "event_type", "left").select(
        "event_type",
        "n_days",
        F.coalesce(F.col("n_segments"), F.lit(0)).cast("bigint").alias(
            "n_segments"
        ),
        "sax_word",
    )


# --------------------------------------------------------------------------
# ts_conformal_interval — split conformal prediction interval for the
# next-day forecast (Vovk et al. 2005; Lei et al. 2018): fit OLS trend on
# the first half of each series, score absolute residuals on the held-out
# second half, and take the ⌈(n_cal+1)(1−α)⌉-th smallest residual as the
# interval half-width.  DISTRIBUTION-FREE ≥(1−α) coverage — no normality
# assumption, unlike the z-based bands elsewhere in the repo; the modern
# UQ wrapper every forecast ships with.
#
# Scale shape: the shared calendar-bounded daily rollup (checkpointed),
# exact-integer OLS sums on the train half, residual ranking via windows
# partitioned BY SERIES over ≤ #days rows.  α = 0.1 and the rank
# k* = ⌈9(n_cal+1)/10⌉ are INTEGER arithmetic — (n+1)·0.9 in binary
# doubles crosses ceil boundaries wrong (10·0.9 ↛ 9 exactly).
#
# Parity discipline: vq fixed-point, slope/intercept q9 from exact sums,
# residuals q6, identical IEEE forecast expression; series with
# k* > n_cal (too few calibration days for the requested coverage) yield
# NULL interval — never a fake band.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CONF_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT)
           AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
tr AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(t) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS syq,
         CAST(SUM(t * CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sxyq,
         CAST(SUM(t * t) AS BIGINT) AS sxx
  FROM idx WHERE t <= n / 2 GROUP BY event_type
),
fit AS (
  SELECT event_type, k,
         FLOOR(CAST(k * sxyq - CAST(sx AS HUGEINT) * syq AS DOUBLE)
               / CAST(k * sxx - sx * sx AS DOUBLE) / 1000000.0
               * 1000000000.0 + 0.5) / 1000000000.0 AS b
  FROM tr WHERE k >= 2 AND k * sxx - sx * sx > 0
),
fit2 AS (
  SELECT f.event_type, f.k, f.b,
         FLOOR((CAST(t.syq AS DOUBLE) / 1000000.0 - f.b * t.sx) / f.k
               * 1000000000.0 + 0.5) / 1000000000.0 AS a
  FROM fit f JOIN tr t ON t.event_type = f.event_type
),
res AS (
  SELECT i.event_type, i.n, f.a, f.b,
         FLOOR(abs(i.v - (f.a + f.b * i.t)) * 1000000.0 + 0.5) / 1000000.0 AS r
  FROM idx i JOIN fit2 f ON f.event_type = i.event_type
  WHERE i.t > i.n / 2
),
rk AS (
  SELECT event_type, n, a, b, r,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
  FROM res
),
q AS (
  SELECT event_type, n, a, b, n_cal, r AS qhat
  FROM rk WHERE rn = (9 * (n_cal + 1) + 9) // 10
)
SELECT r0.event_type,
       CAST(FLOOR(r0.n / 2) AS BIGINT) AS n_train,
       r0.n_cal,
       FLOOR((r0.a + r0.b * (r0.n + 1)) * 1000000.0 + 0.5) / 1000000.0
         AS yhat_next,
       q.qhat AS q_conformal,
       FLOOR((r0.a + r0.b * (r0.n + 1) - q.qhat) * 1000000.0 + 0.5) / 1000000.0
         AS lo,
       FLOOR((r0.a + r0.b * (r0.n + 1) + q.qhat) * 1000000.0 + 0.5) / 1000000.0
         AS hi
FROM (SELECT DISTINCT event_type, n, a, b, n_cal FROM rk) r0
LEFT JOIN q ON q.event_type = r0.event_type
"""


@register("ts_conformal_interval", oracle=_CONF_ORACLE)
def ts_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("d")).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    ).localCheckpoint(eager=True)  # train + calib branches
    vq = F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("bigint")
    tr = (
        idx.filter(F.col("t") <= (F.col("n") / 2).cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum("t").cast("bigint").alias("sx"),
            F.sum(vq).cast("bigint").alias("syq"),
            F.sum((F.col("t") * vq).cast("decimal(38,0)")).alias("sxyq"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
        )
    )
    k, sx, sxx = F.col("k"), F.col("sx"), F.col("sxx")
    den = k * sxx - sx * sx
    fit = tr.filter((k >= 2) & (den > 0)).select(
        "event_type",
        "k",
        "sx",
        "syq",
        (
            F.floor(
                (
                    k.cast("decimal(38,0)") * F.col("sxyq")
                    - sx.cast("decimal(38,0)") * F.col("syq")
                ).cast("double")
                / den.cast("double")
                / 1_000_000.0
                * 1_000_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000_000.0
        ).alias("b"),
    )
    fit2 = fit.select(
        "event_type",
        "b",
        (
            F.floor(
                (F.col("syq").cast("double") / 1_000_000.0 - F.col("b") * sx)
                / k
                * 1_000_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000_000.0
        ).alias("a"),
    )
    res = (
        idx.filter(F.col("t") > (F.col("n") / 2).cast("bigint"))
        .join(F.broadcast(fit2), "event_type")
        .select(
            "event_type",
            "n",
            "a",
            "b",
            (
                F.floor(
                    F.abs(F.col("v") - (F.col("a") + F.col("b") * F.col("t")))
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("r"),
        )
    )
    wrk = Window.partitionBy("event_type")
    rk = res.select(
        "event_type",
        "n",
        "a",
        "b",
        "r",
        F.row_number().over(wrk.orderBy("r")).alias("rn"),
        F.count(F.lit(1)).over(wrk).cast("bigint").alias("n_cal"),
    )
    q = rk.filter(
        F.col("rn") == F.floor((9 * (F.col("n_cal") + 1) + 9) / 10).cast("int")
    ).select("event_type", F.col("r").alias("qhat"))
    base = rk.select("event_type", "n", "a", "b", "n_cal").distinct()
    yhat = F.col("a") + F.col("b") * (F.col("n") + 1)
    return base.join(q, "event_type", "left").select(
        "event_type",
        (F.col("n") / 2).cast("bigint").alias("n_train"),
        "n_cal",
        (F.floor(yhat * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias("yhat_next"),
        F.col("qhat").alias("q_conformal"),
        (
            F.floor((yhat - F.col("qhat")) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).alias("lo"),
        (
            F.floor((yhat + F.col("qhat")) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).alias("hi"),
    )


# --------------------------------------------------------------------------
# ts_theta_forecast — the Theta method (Assimakopoulos & Nikolopoulos
# 2000; winner of the M3 forecasting competition), in its classical
# equivalent form (Hyndman & Billah 2003): forecast = SES level of the
# series + h·(b̂/2), where b̂ is the OLS slope — i.e. simple exponential
# smoothing WITH half the linear drift.  The strongest cheap univariate
# baseline; complements ts_holt (adaptive trend) and ts_forecast_linear
# (pure trend) with the hybrid that beat both at M3.
#
# Scale shape: daily rollup (calendar-bounded, checkpointed), OLS slope
# from exact integer sums (the ts_conformal_interval algebra), and the
# SES level as a CLOSED-FORM weighted sum — α = 0.5 makes every weight
# α(1−α)^{n−i} = 2^{-(n-i+1)} an EXACT binary double (no libm pow
# parity risk), so the recurrence needs no iteration at all: one
# aggregate per series with 1e-9 fixed-point terms.  h = 1..3 horizons
# explode from a literal.
#
# Parity discipline: weighted terms and the init term quantize 1e-9
# before their sums; slope q9; forecasts q6; series with n < 2 or zero
# x-variance fall back to drift 0 (SES level alone).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_THETA_H = 3

_THETA_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT)
           AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
ses AS (
  SELECT event_type, MAX(n) AS n,
         CAST(SUM(CASE WHEN t >= 2 THEN
           CAST(FLOOR(v * pow(2.0, -(n - t + 1))
                      * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
           / 1000000000.0
         + CAST(SUM(CASE WHEN t = 1 THEN
             CAST(FLOOR(v * pow(2.0, -(n - 1)) * 1000000000.0 + 0.5) AS BIGINT)
           ELSE 0 END) AS DOUBLE) / 1000000000.0 AS level
  FROM idx GROUP BY event_type
),
tr AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(t) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS syq,
         CAST(SUM(t * CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sxyq,
         CAST(SUM(t * t) AS BIGINT) AS sxx
  FROM idx GROUP BY event_type
),
sl AS (
  SELECT event_type,
         CASE WHEN k >= 2 AND k * sxx - sx * sx > 0 THEN
           FLOOR(CAST(k * sxyq - CAST(sx AS HUGEINT) * syq AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE) / 1000000.0
                 * 1000000000.0 + 0.5) / 1000000000.0
         ELSE 0.0 END AS b
  FROM tr
)
SELECT s.event_type, s.n AS n_days, CAST(h.h AS INT) AS horizon,
       FLOOR((s.level + h.h * sl.b / 2.0) * 1000000.0 + 0.5) / 1000000.0
         AS theta_forecast
FROM ses s JOIN sl ON sl.event_type = s.event_type,
     UNNEST(range(1, {_THETA_H + 1})) h(h)
"""


@register("ts_theta_forecast", oracle=_THETA_ORACLE)
def ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("d")).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    ).localCheckpoint(eager=True)  # ses + trend branches
    wgt = F.pow(F.lit(2.0), -(F.col("n") - F.col("t") + 1))
    winit = F.pow(F.lit(2.0), -(F.col("n") - 1))
    ses = idx.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (
            (
                F.sum(
                    F.when(
                        F.col("t") >= 2,
                        F.floor(
                            F.col("v") * wgt * 1_000_000_000.0 + F.lit(0.5)
                        ).cast("bigint"),
                    ).otherwise(F.lit(0).cast("bigint"))
                ).cast("double")
                / 1_000_000_000.0
            )
            + (
                F.sum(
                    F.when(
                        F.col("t") == 1,
                        F.floor(
                            F.col("v") * winit * 1_000_000_000.0 + F.lit(0.5)
                        ).cast("bigint"),
                    ).otherwise(F.lit(0).cast("bigint"))
                ).cast("double")
                / 1_000_000_000.0
            )
        ).alias("level"),
    )
    vq = F.floor(F.col("v") * 1_000_000.0 + 0.5).cast("bigint")
    tr = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("t").cast("bigint").alias("sx"),
        F.sum(vq).cast("bigint").alias("syq"),
        F.sum((F.col("t") * vq).cast("decimal(38,0)")).alias("sxyq"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("sxx"),
    )
    k, sx, sxx = F.col("k"), F.col("sx"), F.col("sxx")
    den = k * sxx - sx * sx
    sl = tr.select(
        "event_type",
        F.when(
            (k >= 2) & (den > 0),
            F.floor(
                (
                    k.cast("decimal(38,0)") * F.col("sxyq")
                    - sx.cast("decimal(38,0)") * F.col("syq")
                ).cast("double")
                / den.cast("double")
                / 1_000_000.0
                * 1_000_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000_000.0,
        )
        .otherwise(0.0)
        .alias("b"),
    )
    return (
        ses.join(sl, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "level",
            "b",
            F.explode(F.sequence(F.lit(1), F.lit(_THETA_H))).alias("horizon"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("horizon").cast("int").alias("horizon"),
            (
                F.floor(
                    (F.col("level") + F.col("horizon") * F.col("b") / 2.0)
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("theta_forecast"),
        )
    )


# --------------------------------------------------------------------------
# ts_variance_ratio_test — Lo & MacKinlay (1988) variance-ratio test for
# the random-walk hypothesis, on daily LEVELS diffs: if a series is a
# random walk, the variance of q-step increments is q× the one-step
# variance, so VR(q) = Var(v_t − v_{t−q}) / (q·Var(v_t − v_{t−1})) ≈ 1;
# VR < 1 ⇒ mean reversion, VR > 1 ⇒ trending/momentum.  The hypothesis-
# test companion to ts_hurst_exponent's descriptive H (same question,
# different machinery: a z-statistic under the homoskedastic null,
# z = (VR−1)/√(2(2q−1)(q−1)/(3q·m))).
#
# Scale shape: lag windows and moment sums over the calendar-bounded
# daily rollup, partitioned by series; one checkpoint, no joins beyond
# the broadcast of per-series means.
#
# Parity discipline: μ from exact fixed-point sums (q9); squared
# deviations quantize 1e-12 BEFORE the cross-row sums; VR and z are
# identical IEEE expressions, q6; degenerate series (fewer than q+2
# returns, or zero one-step variance) yield NULLs.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_VR_Q = 4

_VR_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
  FROM daily
),
lagd AS (
  SELECT event_type, v, t,
         v - LAG(v, 1) OVER (PARTITION BY event_type ORDER BY t) AS r1,
         v - LAG(v, {_VR_Q}) OVER (PARTITION BY event_type ORDER BY t) AS rq
  FROM idx
),
mu AS (
  SELECT event_type,
         CAST(COUNT(r1) AS BIGINT) AS m,
         FLOOR(CAST(SUM(CAST(FLOOR(r1 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000.0 / COUNT(r1) * 1000000000.0 + 0.5) / 1000000000.0
           AS mu
  FROM lagd GROUP BY event_type
),
vv AS (
  SELECT l.event_type, mu.m, mu.mu,
         CAST(CAST(SUM(CASE WHEN l.r1 IS NOT NULL THEN
           {oqprod('l.r1 - mu.mu', 'l.r1 - mu.mu')} END) AS VARCHAR) AS DOUBLE)
           / 1000000000000.0 AS ss1,
         CAST(CAST(SUM(CASE WHEN l.rq IS NOT NULL THEN
           {oqprod(f'l.rq - {_VR_Q} * mu.mu', f'l.rq - {_VR_Q} * mu.mu')} END)
           AS VARCHAR) AS DOUBLE)
           / 1000000000000.0 AS ssq,
         CAST(COUNT(l.rq) AS BIGINT) AS mq
  FROM lagd l JOIN mu ON mu.event_type = l.event_type
  GROUP BY l.event_type, mu.m, mu.mu
)
SELECT event_type, m AS n_returns,
       CASE WHEN m >= {_VR_Q} + 2 AND ss1 > 0 AND mq > 0 THEN
         FLOOR((ssq / mq) / ({_VR_Q}.0 * ss1 / m) * 1000000.0 + 0.5) / 1000000.0
       END AS vr,
       CASE WHEN m >= {_VR_Q} + 2 AND ss1 > 0 AND mq > 0 THEN
         FLOOR(((ssq / mq) / ({_VR_Q}.0 * ss1 / m) - 1.0)
               / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                      / (3.0 * {_VR_Q} * m))
               * 1000000.0 + 0.5) / 1000000.0
       END AS z_stat,
       CASE WHEN m < {_VR_Q} + 2 OR ss1 <= 0 OR mq = 0 THEN NULL
            WHEN FLOOR(((ssq / mq) / ({_VR_Q}.0 * ss1 / m) - 1.0)
                       / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                              / (3.0 * {_VR_Q} * m))
                       * 1000000.0 + 0.5) / 1000000.0 > 1.959964
              THEN 'trending'
            WHEN FLOOR(((ssq / mq) / ({_VR_Q}.0 * ss1 / m) - 1.0)
                       / sqrt(2.0 * (2 * {_VR_Q} - 1) * ({_VR_Q} - 1)
                              / (3.0 * {_VR_Q} * m))
                       * 1000000.0 + 0.5) / 1000000.0 < -1.959964
              THEN 'mean_reverting'
            ELSE 'random_walk' END AS regime
FROM vv
"""


@register("ts_variance_ratio_test", oracle=_VR_ORACLE)
def ts_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)
    wo = Window.partitionBy("event_type").orderBy("t")
    idx = daily.select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    lagd = idx.select(
        "event_type",
        "v",
        "t",
        (F.col("v") - F.lag("v", 1).over(wo)).alias("r1"),
        (F.col("v") - F.lag("v", _VR_Q).over(wo)).alias("rq"),
    )
    mu = lagd.groupBy("event_type").agg(
        F.count("r1").cast("bigint").alias("m"),
        (
            F.floor(
                F.sum(F.floor(F.col("r1") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
                .cast("double")
                / 1_000_000.0
                / F.count("r1")
                * 1_000_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000_000.0
        ).alias("mu"),
    )
    d1 = F.col("r1") - F.col("mu")
    dq = F.col("rq") - _VR_Q * F.col("mu")
    vv = (
        lagd.join(F.broadcast(mu), "event_type")
        .groupBy("event_type", "m", "mu")
        .agg(
            (
                F.sum(F.when(F.col("r1").isNotNull(), qprod(d1, d1)))
                .cast("double")
                / 1_000_000_000_000.0
            ).alias("ss1"),
            (
                F.sum(F.when(F.col("rq").isNotNull(), qprod(dq, dq)))
                .cast("double")
                / 1_000_000_000_000.0
            ).alias("ssq"),
            F.count("rq").cast("bigint").alias("mq"),
        )
    )
    m, ss1, ssq, mq = F.col("m"), F.col("ss1"), F.col("ssq"), F.col("mq")
    ok = (m >= _VR_Q + 2) & (ss1 > 0) & (mq > 0)
    vr = F.floor((ssq / mq) / (float(_VR_Q) * ss1 / m) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
    se = F.sqrt(
        2.0 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3.0 * _VR_Q * m)
    )
    z = (
        F.floor(
            ((ssq / mq) / (float(_VR_Q) * ss1 / m) - 1.0) / se * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    return vv.select(
        "event_type",
        m.alias("n_returns"),
        F.when(ok, vr).alias("vr"),
        F.when(ok, z).alias("z_stat"),
        F.when(~ok, F.lit(None).cast("string"))
        .when(z > 1.959964, "trending")
        .when(z < -1.959964, "mean_reverting")
        .otherwise("random_walk")
        .alias("regime"),
    )


# --------------------------------------------------------------------------
# ts_forecast_reconcile — hierarchical forecast reconciliation
# (Hyndman et al. 2011's coherence problem; bottom-up vs top-down of
# Gross & Sohl 1990): independent per-nation and per-region OLS forecasts
# of daily order volume are INCOHERENT (region ≠ Σ nations); emit both
# classical reconciliations — bottom-up (sum the leaves) and top-down
# (split the region forecast by historical proportions) — plus the
# coherence gap each one closes.  The planning readout every org with a
# geography rollup produces nightly.
#
# Scale shape: one orders⋈customer⋈nation pass (broadcast dims) into a
# calendar-bounded (nation, day) rollup; OLS sums per nation and per
# region are exact-integer aggregates on it; the forecast horizon
# (global max day + 1) is a 1-row broadcast.  No windows.
#
# Parity: counts exact; slopes/intercepts q9 from exact sums; forecasts
# q6; bottom-up sums fixed-point over leaf q6 values; shares q6 of exact
# totals.  Degenerate series (n < 2 or zero x-variance) forecast their
# historical daily mean instead (q6) — flat-line fallback, flagged.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_RECON_ORACLE = """
WITH daily AS (
  SELECT n.n_regionkey AS rk, n.n_nationkey AS nk,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2, 3
),
hz AS (SELECT MAX(x) + 1 AS xs FROM daily),
nfit AS (
  SELECT rk, nk, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM daily GROUP BY rk, nk
),
nfc AS (
  SELECT rk, nk, m, sy,
         CASE WHEN m >= 2 AND m * sxx - sx * sx > 0 THEN
           FLOOR(GREATEST(
             (CAST(sy AS DOUBLE) - FLOOR(CAST(m * sxy - sx * sy AS DOUBLE)
                / CAST(m * sxx - sx * sx AS DOUBLE) * 1000000000.0 + 0.5)
                / 1000000000.0 * CAST(sx AS DOUBLE)) / m
             + FLOOR(CAST(m * sxy - sx * sy AS DOUBLE)
                / CAST(m * sxx - sx * sx AS DOUBLE) * 1000000000.0 + 0.5)
                / 1000000000.0 * hz.xs,
             0.0) * 1000000.0 + 0.5) / 1000000.0
         ELSE FLOOR(CAST(sy AS DOUBLE) / m * 1000000.0 + 0.5) / 1000000.0
         END AS nation_fc,
         NOT (m >= 2 AND m * sxx - sx * sx > 0) AS fallback_mean
  FROM nfit, hz
),
rdaily AS (
  SELECT rk, x, CAST(SUM(y) AS BIGINT) AS y FROM daily GROUP BY rk, x
),
rfit AS (
  SELECT rk, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM rdaily GROUP BY rk
),
rfc AS (
  SELECT rk,
         CASE WHEN m >= 2 AND m * sxx - sx * sx > 0 THEN
           FLOOR(GREATEST(
             (CAST(sy AS DOUBLE) - FLOOR(CAST(m * sxy - sx * sy AS DOUBLE)
                / CAST(m * sxx - sx * sx AS DOUBLE) * 1000000000.0 + 0.5)
                / 1000000000.0 * CAST(sx AS DOUBLE)) / m
             + FLOOR(CAST(m * sxy - sx * sy AS DOUBLE)
                / CAST(m * sxx - sx * sx AS DOUBLE) * 1000000000.0 + 0.5)
                / 1000000000.0 * hz.xs,
             0.0) * 1000000.0 + 0.5) / 1000000.0
         ELSE FLOOR(CAST(sy AS DOUBLE) / m * 1000000.0 + 0.5) / 1000000.0
         END AS region_fc
  FROM rfit, hz
),
bu AS (
  SELECT rk,
         CAST(SUM(CAST(FLOOR(nation_fc * 1000000.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000.0 AS bottom_up_fc
  FROM nfc GROUP BY rk
),
tot AS (
  SELECT rk, CAST(SUM(sy) AS BIGINT) AS rtot FROM nfit GROUP BY rk
)
SELECT f.rk AS region_key, f.nk AS nation_key,
       f.nation_fc, f.fallback_mean,
       r.region_fc, b.bottom_up_fc,
       FLOOR(CAST(f.sy AS DOUBLE) / t.rtot * 1000000.0 + 0.5) / 1000000.0
         AS td_share,
       FLOOR(r.region_fc
             * (FLOOR(CAST(f.sy AS DOUBLE) / t.rtot * 1000000.0 + 0.5)
                / 1000000.0)
             * 1000000.0 + 0.5) / 1000000.0 AS top_down_fc,
       FLOOR((r.region_fc - b.bottom_up_fc) * 1000000.0 + 0.5) / 1000000.0
         AS coherence_gap
FROM nfc f
JOIN rfc r ON r.rk = f.rk
JOIN bu b ON b.rk = f.rk
JOIN tot t ON t.rk = f.rk
"""


def _ols_fc(m, sx, sy, sxy, sxx, xs):
    den = m * sxx - sx * sx
    b = (
        F.floor(
            (m * sxy - sx * sy).cast("double") / den.cast("double")
            * 1_000_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000_000.0
    )
    fc = F.greatest(
        (sy.cast("double") - b * sx.cast("double")) / m + b * xs, F.lit(0.0)
    )
    ok = (m >= 2) & (den > 0)
    return (
        F.when(
            ok, F.floor(fc * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).otherwise(
            F.floor(sy.cast("double") / m * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ),
        ~ok,
    )


@register("ts_forecast_reconcile", oracle=_RECON_ORACLE)
def ts_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_regionkey").alias("rk"),
            F.col("n_nationkey").alias("nk"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("bigint").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # nation fits, region fits, horizon
    )
    hz = daily.agg((F.max("x") + 1).alias("xs"))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731

    def _fit(df: DataFrame, keys: list) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum("x").cast("decimal(38,0)").alias("sx"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            F.sum(dec("x") * F.col("y")).alias("sxy"),
            F.sum(dec("x") * F.col("x")).alias("sxx"),
        )

    nfit = _fit(daily, ["rk", "nk"])
    nfc_col, nfall = _ols_fc(
        F.col("m"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx"),
        F.col("xs"),
    )
    nfc = nfit.crossJoin(F.broadcast(hz)).select(
        "rk", "nk", "sy", nfc_col.alias("nation_fc"), nfall.alias("fallback_mean")
    )
    rdaily = daily.groupBy("rk", "x").agg(F.sum("y").cast("bigint").alias("y"))
    rfit = _fit(rdaily, ["rk"])
    rfc_col, _ = _ols_fc(
        F.col("m"), F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx"),
        F.col("xs"),
    )
    rfc = rfit.crossJoin(F.broadcast(hz)).select("rk", rfc_col.alias("region_fc"))
    bu = nfc.groupBy("rk").agg(
        (
            F.sum(
                F.floor(F.col("nation_fc") * 1_000_000.0 + F.lit(0.5)).cast("bigint")
            ).cast("double")
            / 1_000_000.0
        ).alias("bottom_up_fc")
    )
    tot = nfit.groupBy("rk").agg(F.sum("sy").cast("bigint").alias("rtot"))
    share = (
        F.floor(
            F.col("sy").cast("double") / F.col("rtot") * 1_000_000.0 + F.lit(0.5)
        )
        / 1_000_000.0
    )
    return (
        nfc.join(F.broadcast(rfc), "rk")
        .join(F.broadcast(bu), "rk")
        .join(F.broadcast(tot), "rk")
        .select(
            F.col("rk").alias("region_key"),
            F.col("nk").alias("nation_key"),
            "nation_fc",
            "fallback_mean",
            "region_fc",
            "bottom_up_fc",
            share.alias("td_share"),
            (
                F.floor(
                    F.col("region_fc") * share * 1_000_000.0 + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("top_down_fc"),
            (
                F.floor(
                    (F.col("region_fc") - F.col("bottom_up_fc")) * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("coherence_gap"),
        )
    )


# --------------------------------------------------------------------------
# ts_haar_energy — multi-resolution energy decomposition by the Haar
# wavelet transform (Haar 1910; the Mallat 1989 pyramid in its simplest
# basis): three rounds of pairwise average/difference split each series'
# daily values into detail energies at 2-, 4- and 8-day scales — "is the
# volatility intraweek noise or week-over-week drift" in one relation,
# the time-frequency complement of ts_periodogram (global frequencies)
# and ts_hurst_exponent (one summary exponent).
#
# Scale shape: each pyramid round is a keyed AGGREGATE on a halving,
# calendar-bounded relation (pair id = ⌈t/2⌉; no windows beyond the
# per-series day index); series truncate to ⌊n/8⌋ full 8-day blocks so
# every pair is complete.
#
# Parity: the unnormalized Haar split (x±y)/2 is EXACT binary arithmetic
# on the q6 daily values — the pyramid introduces no rounding at all;
# only the squared-energy sums quantize (1e-12 fixed point).  Series
# shorter than 8 days are dropped (no full block).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HAAR_ORACLE = f"""
WITH {_DAILY_CTE},
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t,
         CAST(FLOOR(COUNT(*) OVER (PARTITION BY event_type) / 8) * 8 AS BIGINT)
           AS n8
  FROM daily
),
x0 AS (SELECT event_type, t, v AS a FROM idx WHERE t <= n8),
l1 AS (
  SELECT event_type, CAST(CEIL(t / 2.0) AS BIGINT) AS t,
         SUM(a) / 2.0 AS a,
         SUM(CASE WHEN t % 2 = 1 THEN a ELSE -a END) / 2.0 AS dd
  FROM x0 GROUP BY event_type, CAST(CEIL(t / 2.0) AS BIGINT)
),
l2 AS (
  SELECT event_type, CAST(CEIL(t / 2.0) AS BIGINT) AS t,
         SUM(a) / 2.0 AS a,
         SUM(CASE WHEN t % 2 = 1 THEN a ELSE -a END) / 2.0 AS dd
  FROM l1 GROUP BY event_type, CAST(CEIL(t / 2.0) AS BIGINT)
),
l3 AS (
  SELECT event_type, CAST(CEIL(t / 2.0) AS BIGINT) AS t,
         SUM(a) / 2.0 AS a,
         SUM(CASE WHEN t % 2 = 1 THEN a ELSE -a END) / 2.0 AS dd
  FROM l2 GROUP BY event_type, CAST(CEIL(t / 2.0) AS BIGINT)
),
en AS (
  -- exact integer micro-square sums (eq): totals and fractions derive
  -- from the integers so no order-dependent double addition exists
  SELECT event_type, 1 AS level, SUM({oqprod('dd', 'dd')}) AS eq
  FROM l1 GROUP BY event_type
  UNION ALL
  SELECT event_type, 2, SUM({oqprod('dd', 'dd')}) FROM l2 GROUP BY event_type
  UNION ALL
  SELECT event_type, 3, SUM({oqprod('dd', 'dd')}) FROM l3 GROUP BY event_type
),
tot AS (
  SELECT event_type, SUM(eq) AS eqt FROM en GROUP BY event_type
)
SELECT en.event_type, CAST(en.level AS INT) AS level,
       FLOOR(CAST(CAST(en.eq AS VARCHAR) AS DOUBLE) / 1000000000000.0
             * 1000000.0 + 0.5) / 1000000.0 AS energy,
       CASE WHEN tot.eqt > 0 THEN
         FLOOR(CAST(CAST(en.eq AS VARCHAR) AS DOUBLE)
               / CAST(CAST(tot.eqt AS VARCHAR) AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0
       END AS energy_frac
FROM en JOIN tot ON tot.event_type = en.event_type
"""


@register("ts_haar_energy", oracle=_HAAR_ORACLE)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev).localCheckpoint(eager=True)
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "v",
        F.row_number().over(w.orderBy("d")).alias("t"),
        (F.floor(F.count(F.lit(1)).over(w) / 8) * 8).cast("bigint").alias("n8"),
    )
    cur = idx.filter(F.col("t") <= F.col("n8")).select(
        "event_type", "t", F.col("v").alias("a")
    )
    levels = []
    for _ in range(3):
        nxt = cur.groupBy(
            "event_type", F.ceil(F.col("t") / 2.0).cast("bigint").alias("t")
        ).agg(
            (F.sum("a") / 2.0).alias("a"),
            (
                F.sum(
                    F.when(F.col("t") % 2 == 1, F.col("a")).otherwise(-F.col("a"))
                )
                / 2.0
            ).alias("dd"),
        ).localCheckpoint(eager=False)
        levels.append(nxt)
        cur = nxt
    en = None
    for lv, df in enumerate(levels, start=1):
        e = df.groupBy("event_type").agg(
            F.sum(qprod(F.col("dd"), F.col("dd"))).alias("eq")
        ).select("event_type", F.lit(lv).cast("int").alias("level"), "eq")
        en = e if en is None else en.unionByName(e)
    from nedp_etl_spark.util import q6

    tot = en.groupBy("event_type").agg(F.sum("eq").alias("eqt"))
    energy_raw = F.col("eq").cast("double") / 1_000_000_000_000.0
    return en.join(tot, "event_type").select(
        "event_type",
        "level",
        q6(energy_raw).alias("energy"),
        F.when(
            F.col("eqt") > 0,
            q6(F.col("eq").cast("double") / F.col("eqt").cast("double")),
        ).alias("energy_frac"),
    )


# --------------------------------------------------------------------------
# ts_event_study — stacked event-study lift curve (the MacKinlay 1997
# event-study design applied to product analytics): align every user's
# activity on their purchase days (offset 0), average activity value at
# each relative day in a ±3-day window across ALL anchors, and report
# each offset's lift over the pre-period mean — "what does behavior do
# around conversion", the descriptive-causal readout behind incrementality
# reviews.  Complements agg_diff_in_diff (two groups, one cutoff) with
# the per-offset dynamic curve; multiple purchases stack as independent
# anchors, the standard design.
#
# Scale shape: a calendar-bounded (user, day) activity rollup joined to
# the anchor relation ON USER with the |offset| ≤ 3 band — work ∝
# anchors × window, never a cross of users; the offset relation is 7
# rows.  Pre-period baseline is a 1-row broadcast.
#
# Parity: daily values dsum-exact; offset means fixed-point ratios (q6);
# lift = mean − pre-mean on q6 values; offsets with no observations are
# absent (never fabricated zeros); lift NULL when no pre-period exists.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_EVSTUDY_W = 3

_EVSTUDY_ORACLE = f"""
WITH act AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS svq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type <> 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
anchor AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad
  FROM events WHERE event_type = 'purchase'
),
win AS (
  SELECT date_diff('day', an.ad, a.d) AS rel, a.svq, a.n
  FROM anchor an JOIN act a
    ON a.user_id = an.user_id
   AND a.d BETWEEN an.ad - {_EVSTUDY_W} AND an.ad + {_EVSTUDY_W}
),
per AS (
  SELECT CAST(rel AS INT) AS rel_day,
         CAST(SUM(n) AS BIGINT) AS n_obs,
         FLOOR(CAST(SUM(svq) AS DOUBLE) / 1000000.0 / SUM(n) * 1000000.0 + 0.5)
           / 1000000.0 AS mean_value
  FROM win GROUP BY rel
),
pre AS (
  SELECT CASE WHEN SUM(n) > 0 THEN
           FLOOR(CAST(SUM(svq) AS DOUBLE) / 1000000.0 / SUM(n) * 1000000.0
                 + 0.5) / 1000000.0 END AS pre_mean
  FROM win WHERE rel < 0
)
SELECT p.rel_day, p.n_obs, p.mean_value,
       CASE WHEN pre.pre_mean IS NOT NULL THEN
         FLOOR((p.mean_value - pre.pre_mean) * 1000000.0 + 0.5) / 1000000.0
       END AS lift_vs_pre
FROM per p, pre
"""


@register("ts_event_study", oracle=_EVSTUDY_ORACLE)
def ts_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    act = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("svq"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    anchor = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("ad"))
        .distinct()
    )
    win = (
        anchor.join(act, "user_id")
        .filter(
            (F.col("d") >= F.date_sub(F.col("ad"), _EVSTUDY_W))
            & (F.col("d") <= F.date_add(F.col("ad"), _EVSTUDY_W))
        )
        .select(
            F.datediff(F.col("d"), F.col("ad")).alias("rel"),
            "svq",
            "n",
        )
        .localCheckpoint(eager=True)  # per-offset means + pre baseline
    )
    mean_q6 = (
        F.floor(
            F.sum("svq").cast("double") / 1_000_000.0 / F.sum("n") * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    per = win.groupBy(F.col("rel").cast("int").alias("rel_day")).agg(
        F.sum("n").cast("bigint").alias("n_obs"),
        mean_q6.alias("mean_value"),
    )
    pre = win.filter(F.col("rel") < 0).agg(
        F.when(F.sum("n") > 0, mean_q6).alias("pre_mean")
    )
    return per.crossJoin(F.broadcast(pre)).select(
        "rel_day",
        "n_obs",
        "mean_value",
        F.when(
            F.col("pre_mean").isNotNull(),
            F.floor(
                (F.col("mean_value") - F.col("pre_mean")) * 1_000_000.0 + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("lift_vs_pre"),
    )


# --------------------------------------------------------------------------
# ts_seasonality_strength — the tsfeatures strength-of-components measures
# (Wang, Smith & Hyndman 2006; the F_T/F_S features behind every
# "which series deserve a seasonal model" triage): on the
# ts_stl_decompose output, F_T = max(0, 1 − Var(resid)/Var(v − seasonal))
# and F_S = max(0, 1 − Var(resid)/Var(v − trend)) — near 1 ⇒ the
# component dominates, near 0 ⇒ noise.  The single-row-per-series triage
# the full decomposition relation is too wide for.
#
# Scale shape: COMPOSES the registered ts_stl_decompose (same plan, same
# checkpoint discipline) and adds one variance aggregate per series over
# the interior days (trend non-NULL).  Oracle deliberately re-states the
# decomposition chain (allowlisted as similar to ts_stl_decompose — the
# strengths are defined ON that decomposition).
#
# Parity: components quantize q6; variances from exact int64/HUGEINT
# sums; strengths q6 with the max(0,·) clamp; zero component variance →
# NULL strength.  Threshold 0.64 (Hyndman's seasonal cutoff) flags.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SEAS_STRENGTH_ORACLE = f"""
WITH {_DAILY_CTE},
q AS (
  SELECT event_type, d, v,
         CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM daily
),
ma AS (
  SELECT event_type, d, v,
         CASE WHEN COUNT(*) OVER w = 7
              THEN FLOOR(CAST(SUM(vq) OVER w AS DOUBLE) / 7.0 + 0.5) / 1000000.0
         END AS trend
  FROM q
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT event_type, d, v, trend, dayofweek(d) AS dow,
         ROUND(v - trend, 6) AS dt
  FROM ma
),
sdow AS (
  SELECT event_type, dow,
         FLOOR({osum('dt')} / COUNT(dt) * 1000000.0 + 0.5) / 1000000.0 AS s_raw
  FROM det WHERE dt IS NOT NULL GROUP BY event_type, dow
),
scen AS (
  SELECT event_type,
         FLOOR({osum('s_raw')} / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS s_mean
  FROM sdow GROUP BY event_type
),
sfin AS (
  SELECT s.event_type, s.dow, ROUND(s.s_raw - c.s_mean, 6) AS seasonal
  FROM sdow s JOIN scen c ON c.event_type = s.event_type
),
rows_ AS (
  SELECT m.event_type,
         CAST(FLOOR(ROUND(m.v - m.trend - f.seasonal, 6) * 1000000.0 + 0.5)
              AS BIGINT) AS rq,
         CAST(FLOOR(ROUND(m.v - f.seasonal, 6) * 1000000.0 + 0.5) AS BIGINT)
           AS aq,
         CAST(FLOOR(ROUND(m.v - m.trend, 6) * 1000000.0 + 0.5) AS BIGINT) AS dq
  FROM det m JOIN sfin f ON f.event_type = m.event_type AND f.dow = m.dow
  WHERE m.trend IS NOT NULL
),
vs AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rq) AS HUGEINT) AS sr, SUM(rq * CAST(rq AS HUGEINT)) AS srr,
         CAST(SUM(aq) AS HUGEINT) AS sa, SUM(aq * CAST(aq AS HUGEINT)) AS saa,
         CAST(SUM(dq) AS HUGEINT) AS sd, SUM(dq * CAST(dq AS HUGEINT)) AS sdd
  FROM rows_ GROUP BY event_type
)
SELECT event_type, n AS n_days_used,
       CASE WHEN n * saa - sa * sa > 0 THEN
         FLOOR(GREATEST(0.0, 1.0 - CAST(CAST(n * srr - sr * sr AS VARCHAR) AS DOUBLE)
                                   / CAST(CAST(n * saa - sa * sa AS VARCHAR) AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 END AS f_trend,
       CASE WHEN n * sdd - sd * sd > 0 THEN
         FLOOR(GREATEST(0.0, 1.0 - CAST(CAST(n * srr - sr * sr AS VARCHAR) AS DOUBLE)
                                   / CAST(CAST(n * sdd - sd * sd AS VARCHAR) AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 END AS f_seasonal,
       CASE WHEN n * sdd - sd * sd > 0 THEN
         FLOOR(GREATEST(0.0, 1.0 - CAST(CAST(n * srr - sr * sr AS VARCHAR) AS DOUBLE)
                                   / CAST(CAST(n * sdd - sd * sd AS VARCHAR) AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 > 0.64 END AS strongly_seasonal
FROM vs
"""


@register("ts_seasonality_strength", oracle=_SEAS_STRENGTH_ORACLE)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = ts_stl_decompose(spark, sf_dir).filter(F.col("trend").isNotNull())
    rq = F.floor(F.col("resid") * 1_000_000.0 + 0.5).cast("bigint")
    aq = F.floor(
        F.round(F.col("v") - F.col("seasonal"), 6) * 1_000_000.0 + 0.5
    ).cast("bigint")
    dq = F.floor(
        F.round(F.col("v") - F.col("trend"), 6) * 1_000_000.0 + 0.5
    ).cast("bigint")
    rows = dec.select(
        "event_type", rq.alias("rq"), aq.alias("aq"), dq.alias("dq")
    )
    dec38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    vs = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rq").cast("decimal(38,0)").alias("sr"),
        F.sum(F.col("rq").cast("decimal(38,0)") * F.col("rq").cast("decimal(38,0)")).alias("srr"),
        F.sum("aq").cast("decimal(38,0)").alias("sa"),
        F.sum(F.col("aq").cast("decimal(38,0)") * F.col("aq").cast("decimal(38,0)")).alias("saa"),
        F.sum("dq").cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("dq").cast("decimal(38,0)") * F.col("dq").cast("decimal(38,0)")).alias("sdd"),
    )
    n = F.col("n").cast("decimal(38,0)")
    vr = n * F.col("srr") - F.col("sr") * F.col("sr")
    va = n * F.col("saa") - F.col("sa") * F.col("sa")
    vd = n * F.col("sdd") - F.col("sd") * F.col("sd")
    ft = (
        F.floor(
            F.greatest(
                F.lit(0.0), 1.0 - vr.cast("double") / va.cast("double")
            )
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    fs = (
        F.floor(
            F.greatest(
                F.lit(0.0), 1.0 - vr.cast("double") / vd.cast("double")
            )
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    return vs.select(
        "event_type",
        F.col("n").alias("n_days_used"),
        F.when(va > 0, ft).alias("f_trend"),
        F.when(vd > 0, fs).alias("f_seasonal"),
        F.when(vd > 0, fs > 0.64).alias("strongly_seasonal"),
    )


# --------------------------------------------------------------------------
# ts_peak_prominence — peak detection with windowed topographic prominence
# (the scipy.signal find_peaks/peak_prominences contract, window-bounded):
# a day is a peak when it strictly exceeds both neighbors, and its
# prominence is its height above the HIGHER of the two bounding valleys
# (the min over the ±3-day flanks) — the filter that separates real
# spikes from ripple, which a bare local-max test cannot (every ripple
# crest is a local max; only genuine spikes have prominence).
#
# Scale shape: three series-partitioned windows over the calendar-bounded
# daily rollup (lag/lead + two 3-day flank minima); peaks rank per series.
#
# Parity: v is the q6 daily mean; prominence is max/min arithmetic on
# those exact values, q6; boundary days (missing a neighbor) cannot be
# peaks; flanks shorter than 3 days use the days available.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PEAK_ORACLE = f"""
WITH {_DAILY_CTE},
x AS (
  SELECT event_type, d, v,
         LAG(v) OVER w AS pv, LEAD(v) OVER w AS nv,
         MIN(v) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmin,
         MIN(v) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmin
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
pk AS (
  SELECT event_type, d, v,
         FLOOR((v - GREATEST(lmin, rmin)) * 1000000.0 + 0.5) / 1000000.0
           AS prominence
  FROM x
  WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
)
SELECT event_type, CAST(d AS VARCHAR) AS d, v, prominence,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY prominence DESC, d) AS INT) AS peak_rank
FROM pk
"""


@register("ts_peak_prominence", oracle=_PEAK_ORACLE)
def ts_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _daily(ev)
    w = Window.partitionBy("event_type").orderBy("d")
    x = daily.select(
        "event_type",
        "d",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lead("v").over(w).alias("nv"),
        F.min("v").over(w.rowsBetween(-3, -1)).alias("lmin"),
        F.min("v").over(w.rowsBetween(1, 3)).alias("rmin"),
    )
    pk = x.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") > F.col("nv"))
    ).select(
        "event_type",
        "d",
        "v",
        (
            F.floor(
                (F.col("v") - F.greatest(F.col("lmin"), F.col("rmin")))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("prominence"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("prominence").desc(), F.col("d")
    )
    return pk.select(
        "event_type",
        F.col("d").cast("string").alias("d"),
        "v",
        "prominence",
        F.row_number().over(wr).cast("int").alias("peak_rank"),
    )
