"""Product-analytics operators: retention cohorts, funnels, CUSUM change
detection, windowed distinct counts, exact percentiles.

The reference reaches analytics semantics only through dbt-generated SQL
(``/root/reference/dbtoperator.py:273-274``); these are the event-analytics
primitives (Amplitude/Mixpanel-style) an engine at this layer must provide.

Scale notes:
- ``ts_retention_cohort`` re-uses ONE shuffle key (``user_id``) for both the
  cohort assignment and the activity join, so Catalyst plans a single
  exchange feeding both aggregates; the final (cohort × offset) matrix is
  tiny at any corpus size.
- ``ts_funnel`` is the one-shuffle funnel: per-user events are sorted into an
  array and the step state machine runs as a JVM ``aggregate`` expression —
  no per-step self-joins (the naive SQL cascade is 4 shuffles; see the
  oracle, which is exactly that cascade). State per user is its own event
  list, bounded by per-user activity, not corpus size.
- ``ts_cusum`` aggregates first (days × types rows — already tiny), walks the
  recursive clamp per type over a sorted array. The walk input is the
  *aggregate*, never raw events, so the non-parallel recursion touches only
  O(days) rows per group.
- ``win_count_distinct`` shows the scalable rewrite of COUNT(DISTINCT) OVER:
  first-occurrence flags + running sum — two windows over one partitioning,
  no per-row distinct state (Spark has no native distinct window aggregate,
  and the naive correlated rewrite is O(n²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load, local_rows
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import (
    dsum,
    dsum_prod,
    global_running_sum,
    histogram_rank_walk,
    ohuge_dbl,
    oqprod,
    osum,
    osum_prod,
    qprod,
)

# --------------------------------------------------------------------------
# ts_retention_cohort — weekly cohort retention matrix: users are assigned to
# the week of their first event; each (cohort, week-offset) cell counts the
# distinct users active that many weeks later, plus retention vs the cohort's
# own week-0 size.
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
),
cell AS (
  SELECT f.cohort,
         CAST(date_diff('day', f.cohort, a.w) / 7 AS INT) AS offset_weeks,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM a JOIN f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       offset_weeks,
       n_active,
       ROUND(n_active * 1.0 /
             FIRST_VALUE(n_active) OVER (PARTITION BY cohort
                                         ORDER BY offset_weeks), 6)
         AS retention
FROM cell
"""


@register("ts_retention_cohort", oracle=_RETENTION_ORACLE)
def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    )
    # ONE user_id exchange: cohort week and the user's distinct active
    # weeks come from the same groupBy (collect_set is bounded by the
    # number of calendar weeks in the dataset, O(100s) at any corpus
    # size).  The previous distinct()+join shape shuffled on (user_id, w)
    # and then AGAIN on user_id for the join — two full-data exchanges.
    per_user = ev.groupBy("user_id").agg(
        F.min("w").alias("cohort"), F.collect_set("w").alias("weeks")
    )
    cell = (
        per_user.select("user_id", "cohort", F.explode("weeks").alias("w"))
        .groupBy(
            "cohort",
            (F.datediff("w", "cohort") / 7).cast("int").alias("offset_weeks"),
        )
        # (user_id, w) is unique after the per-user set explode, so a plain
        # count equals the old countDistinct without the distinct expansion
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w0 = Window.partitionBy("cohort").orderBy("offset_weeks")
    return cell.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "offset_weeks",
        "n_active",
        F.round(F.col("n_active") / F.first("n_active").over(w0), 6).alias("retention"),
    )


# --------------------------------------------------------------------------
# ts_funnel — ordered conversion funnel signup → view → click → purchase.
# Greedy earliest-completion semantics: step k+1 must occur strictly after
# the timestamp at which step k was satisfied.  Implemented as a sorted
# per-user event array walked by a JVM `aggregate` lambda (state = (step,
# last_ts)); greedy is optimal for this semantics, so it equals the oracle's
# 4-stage min-timestamp cascade.
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]

_FUNNEL_ORACLE = """
WITH t1 AS (SELECT user_id, MIN(ts) AS ts FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e JOIN t1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > t1.ts GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e JOIN t2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t2.ts GROUP BY e.user_id),
t4 AS (SELECT e.user_id, MIN(e.ts) AS ts FROM events e JOIN t3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t3.ts GROUP BY e.user_id),
counts AS (
  SELECT 1 AS step, 'signup' AS step_name, COUNT(*) AS n_users FROM t1
  UNION ALL SELECT 2, 'view', COUNT(*) FROM t2
  UNION ALL SELECT 3, 'click', COUNT(*) FROM t3
  UNION ALL SELECT 4, 'purchase', COUNT(*) FROM t4
)
SELECT step, step_name, n_users,
       ROUND(n_users * 1.0 / FIRST_VALUE(n_users) OVER (ORDER BY step), 6)
         AS conv_pct
FROM counts
"""


@register("ts_funnel", oracle=_FUNNEL_ORACLE)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # Windowed pre-filter (semantics-preserving, bounds the per-user array):
    # 1. only funnel-step events can advance the walk — the IN filter pushes
    #    to the parquet scan and drops every other event map-side;
    # 2. nothing before the user's FIRST signup can advance it either (the
    #    walk requires signup first), so restrict to each user's horizon via
    #    a user-keyed window.  The window hash-partitions by user_id, which
    #    the groupBy below reuses — still exactly one shuffle end-to-end,
    #    and the collected array is O(step events in horizon), not O(user
    #    lifetime events).
    ev = ev.filter(F.col("event_type").isin(_FUNNEL_STEPS))
    wu = Window.partitionBy("user_id")
    ev = (
        ev.withColumn(
            "first_signup",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(wu),
        )
        .filter(F.col("ts") >= F.col("first_signup"))
        .drop("first_signup")
    )
    steps = F.array(*[F.lit(s) for s in _FUNNEL_STEPS])
    walk = F.aggregate(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))),
        F.struct(
            F.lit(0).alias("step"), F.lit("1900-01-01").cast("timestamp").alias("last")
        ),
        lambda s, e: F.when(
            (s.step < len(_FUNNEL_STEPS))
            & (e.event_type == F.element_at(steps, s.step + 1))
            & (e.ts > s.last),
            F.struct((s.step + 1).alias("step"), e.ts.alias("last")),
        ).otherwise(s),
    )
    reached = ev.groupBy("user_id").agg(walk.step.alias("max_step"))
    # max_step >= k ⇒ user counted at every step ≤ k: explode to one row per
    # achieved step (≤4 rows/user), then a tiny groupBy.
    counts = (
        reached.filter(F.col("max_step") >= 1)
        .select(F.explode(F.sequence(F.lit(1), "max_step")).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # Left-join against the literal step spine: the oracle's UNION ALL of
    # scalar COUNTs emits EVERY step row even when zero users complete it,
    # so a step nobody reaches must surface as n_users = 0, not as a
    # missing row.  (conv_pct guards the all-zero funnel: Spark 4's ANSI
    # division would raise on 0/0 where DuckDB yields NULL.)
    spine = spark.range(1, len(_FUNNEL_STEPS) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    counts = spine.join(counts, "step", "left").select(
        "step", F.coalesce("n_users", F.lit(0)).alias("n_users")
    )
    w = Window.orderBy("step")
    first = F.first("n_users").over(w)
    return counts.select(
        "step",
        F.element_at(steps, F.col("step")).alias("step_name"),
        "n_users",
        F.when(first > 0, F.round(F.col("n_users") / first, 6)).alias("conv_pct"),
    )


# --------------------------------------------------------------------------
# ts_cusum — one-sided CUSUM change detection on daily event counts:
# S_t = max(0, S_{t-1} + x_t − μ − k), alarm when S_t > h (k = σ/2, h = 3σ).
# The clamp makes it inherently sequential, so Spark walks a sorted
# per-type array of daily aggregates; the oracle replays the identical
# recurrence as a recursive CTE.  Both engines run the same IEEE double ops
# in the same order ⇒ bit-identical, rounded at the output only.
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, ROUND(AVG(x), 6) AS mu, ROUND(STDDEV_SAMP(x), 6) AS sd
  FROM daily GROUP BY 1
),
seq AS (
  SELECT d.event_type, d.day, d.x, st.mu, st.sd,
         ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
  FROM daily d JOIN st USING (event_type)
),
rec AS (
  SELECT event_type, day, x, mu, sd, rn,
         GREATEST(0.0, x - mu - 0.5 * sd) AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT seq.event_type, seq.day, seq.x, seq.mu, seq.sd, seq.rn,
         GREATEST(0.0, rec.s + seq.x - seq.mu - 0.5 * seq.sd)
  FROM rec JOIN seq ON seq.event_type = rec.event_type AND seq.rn = rec.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(x AS BIGINT) AS n_events,
       ROUND(s, 6) AS cusum,
       s > 3 * sd AS alarm
FROM rec
"""


@register("ts_cusum", oracle=_CUSUM_ORACLE)
def ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    wt = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "x",
        F.round(F.avg("x").over(wt), 6).alias("mu"),
        F.round(F.stddev_samp("x").over(wt), 6).alias("sd"),
    )
    # sequential clamp over the per-type daily series (O(days) per group);
    # mu/sd are constant per type, so they join the grouping key and stay
    # referencable inside the walk lambda.
    walked = scored.groupBy("event_type", "mu", "sd").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            F.array().cast("array<struct<day:date,x:double,s:double>>"),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.struct(
                        e.day.alias("day"),
                        e.x.alias("x"),
                        F.greatest(
                            F.lit(0.0),
                            F.coalesce(F.try_element_at(acc, F.lit(-1)).s, F.lit(0.0))
                            + e.x
                            - F.col("mu")
                            - 0.5 * F.col("sd"),
                        ).alias("s"),
                    )
                ),
            ),
        ).alias("walk"),
    )
    row = walked.select("event_type", "sd", F.explode("walk").alias("r"))
    return row.select(
        "event_type",
        F.date_format("r.day", "yyyy-MM-dd").alias("day"),
        F.col("r.x").cast("bigint").alias("n_events"),
        F.round("r.s", 6).alias("cusum"),
        (F.col("r.s") > 3 * F.col("sd")).alias("alarm"),
    )


# --------------------------------------------------------------------------
# win_count_distinct — cumulative COUNT(DISTINCT user_id) per event_type over
# days.  Spark has no distinct window aggregate; the scalable rewrite marks
# each user's first day per type (min-aggregate), pre-counts new users per
# day, and takes a running sum — two narrow aggregates + one tiny window
# instead of per-row distinct state.  (DuckDB *does* support the distinct
# window aggregate, which is the oracle.)
# --------------------------------------------------------------------------

_WIN_CD_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cum_users FROM (
  SELECT DISTINCT e.event_type, CAST(date_trunc('day', e.ts) AS DATE) AS day,
         COUNT(DISTINCT e.user_id)
           OVER (PARTITION BY e.event_type
                 ORDER BY CAST(date_trunc('day', e.ts) AS DATE)) AS cum_users
  FROM events e
)
"""


@register("win_count_distinct", oracle=_WIN_CD_ORACLE)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    first_day = ev.groupBy("event_type", "user_id").agg(F.min("day").alias("fday"))
    new_per_day = first_day.groupBy("event_type", F.col("fday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    all_days = ev.select("event_type", "day").distinct()
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        all_days.join(new_per_day, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).alias("cum_users"),
        )
        .select(
            "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"), "cum_users"
        )
    )


# --------------------------------------------------------------------------
# agg_percentile_exact — exact PERCENTILE_CONT / PERCENTILE_DISC by group
# (Spark WITHIN GROUP syntax vs DuckDB quantile_cont/_disc; both use linear
# interpolation resp. lower-rank conventions — verified identical).  Exact
# percentiles buffer per-group values; the 100 TB path is
# ``agg_approx_percentile`` (KLL-style sketch, mergeable) — this operator is
# the small-group/medium-cardinality exact companion.
# --------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
  ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
  ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
  ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS p90,
  ROUND(quantile_disc(l_extendedprice, 0.50), 6) AS p50_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_percentile_exact", oracle=_PCT_ORACLE)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parameter-bound relation: a fixed temp-view name would be session-
    # global and race when two threads run this at different sf_dirs
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT
          l_returnflag,
          ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p25,
          ROUND(percentile_cont(0.50) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50,
          ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p75,
          ROUND(percentile_cont(0.90) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90,
          ROUND(percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p50_disc
        FROM {li}
        GROUP BY l_returnflag
        """,
        li=li,
    )


# --------------------------------------------------------------------------
# agg_ab_ztest — two-sample z-test per experiment metric (A/B testing at
# corpus scale).  Arm assignment is the deterministic hash idiom
# (user_id % 2 — in production a salted hash of the unit id).  One pass
# computes per-(event_type, arm) n / Σx / Σx² — count + two exact
# fixed-decimal sums, i.e. a single balanced shuffle of 10 tiny rows — and
# the z statistic is assembled from the sufficient statistics on the
# (already tiny) aggregate.  No per-row state, no second pass over events:
# the classic sufficient-statistics pattern that scales to any corpus size.
# Variance from Σx² uses the textbook (Σx² − (Σx)²/n)/(n−1); fine here
# because value magnitudes are O(100) — a deployment with extreme means
# would center first (Welford partials via an exact decimal accumulator).
# --------------------------------------------------------------------------

_AB_ZTEST_ORACLE = """
WITH s AS (
  SELECT event_type, user_id % 2 AS arm,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         -- squares as exact floor-micro HUGEINT products (scale 1e12),
         -- the oqprod idiom mirrored by dsum_prod on the Spark side
         CAST(CAST(SUM((CAST(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)))
           AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxx
  FROM events GROUP BY event_type, user_id % 2
),
p AS (
  SELECT event_type,
         MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
         MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
         MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM s GROUP BY event_type
)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treat,
       ROUND(sx0 / n0, 6) AS mean_control,
       ROUND(sx1 / n1, 6) AS mean_treat,
       ROUND((sx1 / n1 - sx0 / n0) /
             sqrt(((sxx0 - sx0 * sx0 / n0) / (n0 - 1)) / n0
                  + ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1), 6) AS z_score
FROM p
"""


@register("agg_ab_ztest", oracle=_AB_ZTEST_ORACLE)
def agg_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(25,6)")
    # squares via the z-test family's exact floor-micro idiom (qprod:
    # int64 micros → decimal(38,0) product, scale 1e12) — the former
    # decimal(18,6) route quantized HALF_UP (≠ the oracle's
    # floor(x·1e6+0.5)) and overflowed the ANSI cast for |x| > ~1e12,
    # both in-domain under VALUE_ABS_MAX
    from nedp_etl_spark.util import dsum_prod
    s = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).cast("double").alias("sx"),
        dsum_prod(F.col("value"), F.col("value")).alias("sxx"),
    )
    arm = lambda a, c: F.max(F.when(F.col("arm") == a, F.col(c)))  # noqa: E731
    p = s.groupBy("event_type").agg(
        arm(0, "n").alias("n0"), arm(1, "n").alias("n1"),
        arm(0, "sx").alias("sx0"), arm(1, "sx").alias("sx1"),
        arm(0, "sxx").alias("sxx0"), arm(1, "sxx").alias("sxx1"),
    )
    var0 = (F.col("sxx0") - F.col("sx0") * F.col("sx0") / F.col("n0")) / (
        F.col("n0") - 1
    )
    var1 = (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    return p.select(
        "event_type",
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        F.round(F.col("sx0") / F.col("n0"), 6).alias("mean_control"),
        F.round(F.col("sx1") / F.col("n1"), 6).alias("mean_treat"),
        F.round(
            (F.col("sx1") / F.col("n1") - F.col("sx0") / F.col("n0"))
            / F.sqrt(var0 / F.col("n0") + var1 / F.col("n1")),
            6,
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# ts_attribution — first-touch / last-touch conversion attribution.  Each
# converting user's first purchase is found with one (user_id)-keyed
# aggregation; the strictly-prior touch events re-use the SAME shuffle key
# for the join and the per-user first/last pick (row_number over ts,
# event_id — total order, deterministic under timestamp ties).  Channel
# counts are then a tiny aggregate.  One logical exchange on user_id does
# all the per-user work — the same reused-partitioning posture as
# ts_retention_cohort.
# --------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH conv AS (
  SELECT user_id, MIN(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
prior AS (
  SELECT e.user_id, e.event_type, e.ts, e.event_id
  FROM events e JOIN conv USING (user_id)
  WHERE e.ts < conv.conv_ts
),
ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM prior
),
ft AS (SELECT event_type, COUNT(*) AS n_first_touch
       FROM ranked WHERE rn_first = 1 GROUP BY event_type),
lt AS (SELECT event_type, COUNT(*) AS n_last_touch
       FROM ranked WHERE rn_last = 1 GROUP BY event_type)
SELECT COALESCE(ft.event_type, lt.event_type) AS channel,
       CAST(COALESCE(ft.n_first_touch, 0) AS BIGINT) AS n_first_touch,
       CAST(COALESCE(lt.n_last_touch, 0) AS BIGINT) AS n_last_touch
FROM ft FULL OUTER JOIN lt ON ft.event_type = lt.event_type
"""


@register("ts_attribution", oracle=_ATTRIBUTION_ORACLE)
def ts_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    prior = ev.join(conv, "user_id").filter(F.col("ts") < F.col("conv_ts"))
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = prior.select(
        "user_id",
        "event_type",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    # One pass over the ranked relation: separate first/last branches would
    # re-execute the join + both rank windows per branch before a full-outer
    # re-join.  Filtering to touch rows once and conditional-summing both
    # counts in a single groupBy gets the identical result (a channel with
    # only one touch kind shows 0 for the other; a channel with neither
    # never appears — exactly the old full_outer + coalesce semantics).
    return (
        ranked.filter((F.col("rn_first") == 1) | (F.col("rn_last") == 1))
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0)).alias(
                "n_first_touch"
            ),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0)).alias(
                "n_last_touch"
            ),
        )
    )


# --------------------------------------------------------------------------
# agg_percentile_histogram — EXACT per-group median via two-phase
# histogram refinement, the 100 TB path that agg_percentile_exact cannot
# take: Spark's percentile_cont/disc aggregates buffer every group value
# in executor memory (O(group size) state — fine for dimension-sized
# groups, fatal for fact-sized ones).  Phase 1 is a 2-double min/max
# pre-pass that fixes the bucket width (so the histogram is <=256 buckets
# per group for ANY value domain, by construction), then one bounded
# aggregate of (group, bucket) counts.  The driver walks the histogram to
# locate each group's median bucket and the residual rank inside it, then
# phase 2 sorts ONLY that bucket's occupants (≈ n/n_buckets rows per
# group; a deployment needing a harder bound recurses the histogram one
# more level) and picks the residual-rank row.  Total: two passes, both
# shuffles bounded or bucket-local, no full sort, no per-group value
# buffer.  The driver-side histogram walk is the bounded-collect pattern
# (llm_kmeans centroids): groups × buckets rows, data-size-independent.
# Exactness: the k-th-smallest VALUE is well-defined under ties, so the
# rank-residual pick is deterministic even though row_number ties are not.
# Reference parity: percentile reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PCT_HIST_B = 256  # bucket COUNT — fixed by construction, domain-independent

_PCT_HIST_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       l_extendedprice AS p50_disc
FROM ranked WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
"""


@register("agg_percentile_histogram", oracle=_PCT_HIST_ORACLE)
def agg_percentile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL measures are excluded up front — the standard percentile-
    # ignores-NULLs semantics, stated in the oracle's WHERE too.  Without
    # the filter a NULL price would put a None bucket into the driver-side
    # histogram walk (TypeError on sort) and the engines would disagree on
    # null rank order anyway (Spark sorts nulls first, DuckDB last).
    base = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    # Bucket width comes from a min/max pre-pass, so the histogram is
    # AT MOST _PCT_HIST_B buckets per group for ANY value domain — a fixed
    # width would make the driver-side collect data-dependent (a measure
    # spanning 1e12 would explode it).  The extra pass is one 2-double
    # aggregate; W's exact value never affects correctness (the refinement
    # picks the true rank inside whichever bucket the walk lands on), only
    # the phase-2 subset size.
    lo, hi = base.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    if lo is None:  # empty input: no groups, empty result with the contract schema
        return local_rows(spark, 
            [], "l_returnflag string, n bigint, p50_disc double"
        )
    width = (hi - lo) / _PCT_HIST_B if hi > lo else 1.0
    li = base.select(
        "l_returnflag", "l_extendedprice",
        F.least(
            F.floor((F.col("l_extendedprice") - lo) / width).cast("long"),
            F.lit(_PCT_HIST_B - 1),  # x == max lands exactly on B — clamp
        ).alias("b"),
    )
    hist = (
        li.groupBy("l_returnflag", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # bounded: groups x <=256 buckets BY CONSTRUCTION
    )
    by_group: dict[str, list] = {}
    for r in hist:
        by_group.setdefault(r["l_returnflag"], []).append((r["b"], r["c"]))
    targets = []
    for g, buckets in by_group.items():
        n = sum(c for _, c in buckets)
        rank = -(-n // 2)  # ceil(0.5 * n)
        b, k = histogram_rank_walk(sorted(buckets), rank)
        targets.append((g, b, k, n))
    tgt = local_rows(spark, 
        targets, "l_returnflag string, b long, k long, n long"
    )
    # eqNullSafe on the group key: GROUP BY keeps a NULL group (the oracle's
    # PARTITION BY emits its median row), and a plain equi-join would
    # silently drop it (NULL = NULL is not true) — the one NULL edge the
    # measure filter above does not cover.
    cond = li["l_returnflag"].eqNullSafe(tgt["l_returnflag"]) & (li["b"] == tgt["b"])
    sub = (
        li.join(F.broadcast(tgt), cond)
        .drop(tgt["l_returnflag"])
        .drop(tgt["b"])
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return (
        sub.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("k"))
        .select("l_returnflag", "n", F.col("l_extendedprice").alias("p50_disc"))
    )


# --------------------------------------------------------------------------
# agg_ks_test — exact two-sample Kolmogorov–Smirnov statistic between the
# value distributions of two event segments: D = max over observed values
# of |F1(v) − F2(v)|, with the α=0.05 large-sample rejection decision
# (c(α)=1.358).  Complements agg_ab_ztest (mean difference) with the
# whole-distribution test — the drift detector a data pipeline runs
# between ingestion batches.
#
# The scale hazard is the empirical CDF: a naked cumulative window over
# values is a corpus-wide SinglePartition sort.  Instead the segment
# counts collapse to ONE row per distinct value (bounded shuffle, map-
# side partials), and BOTH cumulative counts run through the two-phase
# prefix sum (util.global_running_sum: range partition → per-pid running
# sums → broadcast offsets) — the same machinery as llm_seq_packing, so
# no single task ever holds the distribution.  The order key (v) is
# unique after the group-by, so the prefix sums are exact everywhere.
#
# Determinism: values are 6-dp rounded before grouping (identical group
# keys cross-engine), cumulative counts are integers, and the final
# D/critical-value comparison is the same double arithmetic on both
# engines.
# Reference parity: distribution-test SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_KS_ORACLE = """
WITH vals AS (
  SELECT event_type, ROUND(value, 6) AS v FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
  FROM vals GROUP BY v
),
cum AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM per_v
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(MAX(ABS(cum1 * 1.0 / n1 - cum2 * 1.0 / n2)), 6) AS ks_d,
       (MAX(ABS(cum1 * 1.0 / n1 - cum2 * 1.0 / n2))
          > 1.358 * sqrt((n1 + n2) * 1.0 / (n1 * n2))) AS reject_05
FROM cum CROSS JOIN tot
GROUP BY n1, n2
HAVING n1 > 0 AND n2 > 0
"""


@register("agg_ks_test", oracle=_KS_ORACLE)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sums

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    per_v = ev.groupBy(F.round("value", 6).alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
    )
    # both CDFs cumulate along the same ordering: ONE range shuffle
    cum = global_running_sums(
        per_v, ["v"], [(F.col("c1"), "cum1"), (F.col("c2"), "cum2")]
    )
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    diff = F.abs(
        F.col("cum1") * 1.0 / F.col("n1") - F.col("cum2") * 1.0 / F.col("n2")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")) * 1.0 / (F.col("n1") * F.col("n2"))
    )
    # An empty segment (n1=0 or n2=0) makes the test undefined: emit NO row
    # rather than a NULL ks_d that downstream code could misread as "not
    # rejected" (mirrors the oracle's HAVING n1 > 0 AND n2 > 0).
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(diff).alias("_d"))
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.round(F.col("_d"), 6).alias("ks_d"),
            (F.col("_d") > crit).alias("reject_05"),
        )
    )


# --------------------------------------------------------------------------
# agg_heavy_hitters — EXACT frequent-item detection (support > n/k) via
# the candidate-then-verify two-phase: phase 1 takes each partition's
# LOCAL top-k keys by count, phase 2 exactly counts ONLY the candidate
# union.  Correctness is a theorem, not a heuristic: any key with global
# share > 1/k has local share > 1/k in at least one partition (averaging
# argument), and fewer than k keys can strictly exceed a 1/k local
# share, so every true hitter survives phase 1 for ANY partitioning —
# the candidate set is a superset, and phase 2's exact counts discard
# the false positives.  This is the Misra-Gries/SpaceSaving summary
# discipline made exact.
#
# Why it matters at 100 TB: the naive plan (groupBy(key) over all keys,
# then filter) shuffles EVERY distinct key; when the key domain is huge
# (URLs, user ids) that shuffle dwarfs the answer.  Here the phase-1
# aggregation is map-side-combining per partition, the candidate union
# is at most (partitions x k) rows — broadcast-sized BY CONSTRUCTION —
# and the phase-2 shuffle carries candidate keys only.
#
# The key is deliberately skewed (orderkey residues: half the mass
# collapses onto 10 hot keys, the rest spreads over ~5000 cold ones) so
# the gate exercises a real hot/cold split; the oracle computes the same
# answer by the naive full GROUP BY + HAVING.  The share threshold
# compares in INTEGER arithmetic (cnt * k > total) — no double division
# on the decision path.
# Reference parity: frequency SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HH_K = 50

_HH_ORACLE = f"""
WITH base AS (
  SELECT CASE WHEN o_orderkey % 10000 < 5000
              THEN (o_orderkey % 10000) % 10
              ELSE o_orderkey % 10000 END AS k
  FROM orders
),
cnt AS (SELECT k, COUNT(*) AS cnt FROM base GROUP BY k),
tot AS (SELECT SUM(cnt) AS total FROM cnt)
SELECT k, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cnt * 1.0 / total, 6) AS share
FROM cnt CROSS JOIN tot
WHERE cnt * {_HH_K} > total
"""


@register("agg_heavy_hitters", oracle=_HH_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    z = F.col("o_orderkey") % 10000
    base = o.select(
        F.when(z < 5000, z % 10).otherwise(z).alias("k")
    ).localCheckpoint(eager=True)  # phases 1 and 2 share one derivation
    # Phase 1: per-partition top-k candidates (map-side combine; the
    # window is keyed by partition id, never global).
    local = base.groupBy(F.spark_partition_id().alias("pid"), "k").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("pid").orderBy(F.col("c").desc(), "k")
    cand = (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HH_K)
        .select("k")
        .distinct()
    )
    # Phase 2: exact counts of candidates only (broadcast prune — the
    # candidate union is <= partitions * k rows BY CONSTRUCTION).
    exact = base.join(F.broadcast(cand), "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = base.agg(F.count(F.lit(1)).alias("total"))
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * _HH_K > F.col("total"))
        .select(
            "k",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt") * 1.0 / F.col("total"), 6).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# agg_entropy_gini — information-theoretic mix metrics per group: Shannon
# entropy and Gini impurity of the o_orderpriority distribution within each
# o_orderstatus.  Two keyed aggregates with map-side combine (corpus →
# (group, category) counts → per-group metrics); the totals side is
# group-cardinality-sized and broadcasts.  Per-category -p·ln p / p² terms
# are quantized to 6-dp fixed point BEFORE summing (the util.dsum
# discipline), so the sums are order-independent and cross-engine exact.
# Reference parity: aggregate SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ENTROPY_GINI_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT o_orderstatus, SUM(n) AS tot FROM c GROUP BY 1
),
terms AS (
  SELECT c.o_orderstatus, tot.tot, n * 1.0 / tot.tot AS p
  FROM c JOIN tot ON c.o_orderstatus = tot.o_orderstatus
)
SELECT o_orderstatus,
       CAST(MAX(tot) AS BIGINT) AS n_rows,
       COUNT(*) AS n_categories,
       CAST(SUM(CAST(FLOOR((-p * ln(p)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS entropy,
       ROUND(1.0 - CAST(SUM(CAST(FLOOR((p * p) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0, 6) AS gini
FROM terms GROUP BY o_orderstatus
"""


@register("agg_entropy_gini", oracle=_ENTROPY_GINI_ORACLE)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # checkpoint the tiny (group, category) histogram: totals AND terms
    # branch from it — without this the corpus is scanned twice
    c = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = c.groupBy("o_orderstatus").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    terms = c.join(F.broadcast(tot), "o_orderstatus").select(
        "o_orderstatus", "tot", p.alias("p")
    )
    fp = lambda e: F.sum(F.floor(e * 1_000_000.0 + 0.5).cast("long"))  # noqa: E731
    return terms.groupBy("o_orderstatus").agg(
        F.max("tot").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_categories"),
        (fp(-F.col("p") * F.log("p")) / 1_000_000.0).alias("entropy"),
        F.round(1.0 - fp(F.col("p") * F.col("p")) / 1_000_000.0, 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# agg_corr_matrix — pairwise Pearson correlation matrix over four lineitem
# measures (quantity, extendedprice, discount, tax) per returnflag, in ONE
# keyed aggregate pass: all 4 sums + 4 square-sums + 6 cross-sums combine
# map-side, and the result relation is (groups × 6 pairs) — tiny at any
# corpus size (the naive per-pair CORR would scan 6×).
#
# Exactness: each measure quantizes to 6-dp fixed point (exact int64),
# products accumulate as DECIMAL(38,0) in Spark / HUGEINT in DuckDB (the
# ts_forecast_linear discipline — Σ q_i·q_j ≈ 1e28 overflows int64 but
# fits both wide types exactly), and the final correlation arithmetic
# happens once per (group, pair) in doubles from identical exact integers.
# Pearson r is scale-invariant, so the 1e6 quantization factors cancel.
# Reference parity: aggregate SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CORR_VARS = [
    ("qty", "l_quantity"),
    ("price", "l_extendedprice"),
    ("disc", "l_discount"),
    ("tax", "l_tax"),
]
_CORR_PAIRS = [
    (a, b) for i, (a, _) in enumerate(_CORR_VARS) for (b, _) in _CORR_VARS[i + 1:]
]


def _corr_matrix_oracle() -> str:
    qs = ", ".join(
        f"CAST(FLOOR({col} * 1000000.0 + 0.5) AS BIGINT) AS q_{n}"
        for n, col in _CORR_VARS
    )
    sums = ", ".join(
        [f"COUNT(*) AS n"]
        + [f"SUM(CAST(q_{n} AS HUGEINT)) AS s_{n}" for n, _ in _CORR_VARS]
        + [
            f"SUM(CAST(q_{a} AS HUGEINT) * q_{b}) AS s_{a}_{b}"
            for a in [n for n, _ in _CORR_VARS]
            for b in [n for n, _ in _CORR_VARS]
            if (a, b) in _CORR_PAIRS or a == b
        ]
    )

    def corr(a: str, b: str) -> str:
        # zero-variance guard on EXACT integers (n·s_aa == s_a² ⇔ var 0):
        # Spark ANSI errors on x/0 and DuckDB yields inf/NaN — both wrong.
        dx = f"(n * s_{a}_{a} - s_{a} * s_{a})"
        dy = f"(n * s_{b}_{b} - s_{b} * s_{b})"
        return (
            f"CASE WHEN {dx} > 0 AND {dy} > 0 THEN "
            f"ROUND((CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / sqrt(CAST({dx} AS DOUBLE) * CAST({dy} AS DOUBLE)), 6) END"
        )

    branches = "\n  UNION ALL\n".join(
        f"  SELECT l_returnflag, '{a}' AS var_a, '{b}' AS var_b,"
        f" CAST(n AS BIGINT) AS n_rows, {corr(a, b)} AS corr FROM s"
        for a, b in _CORR_PAIRS
    )
    return f"""
WITH q AS (SELECT l_returnflag, {qs} FROM lineitem),
s AS (SELECT l_returnflag, {sums} FROM q GROUP BY l_returnflag)
{branches}
"""


_CORR_MATRIX_ORACLE = _corr_matrix_oracle()


@register("agg_corr_matrix", oracle=_CORR_MATRIX_ORACLE)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Exact accumulation WITHOUT per-row decimals (the decimal sum path is
    # interpreted/BigDecimal — ~5× slower than codegen int64 sums): each
    # quantized non-negative value splits into 2^20-radix limbs
    # (hi < 2^17, lo < 2^20), a product contributes three int64-safe
    # component sums (hi·hi ≤ 2^34, cross ≤ 2^38, lo·lo ≤ 2^40), and the
    # EXACT product sum is reconstructed in decimal:
    # s_ab = s_hh·2^40 + s_x·2^20 + s_ll.
    #
    # Round-9 (closing the round-8 "loud guard" watch item): the int64
    # component sums are TWO-PHASE — phase 1 aggregates per
    # (group, spark_partition_id), so each int64 sum is bounded by
    # rows-per-TASK-PARTITION × 2^40, a bound the operator controls via
    # spark.sql.files.maxPartitionBytes (128 MB default ⇒ ~1.3e6 lineitem
    # rows ≪ the 2^23 overflow bound) and that is INDEPENDENT of group
    # size; phase 2 sums the tiny (#groups × #partitions)-row partials in
    # decimal(38,0), where BigDecimal cost is irrelevant.  A 100 TB group
    # is now exact instead of aborting.  The loud guard survives at the
    # only place overflow remains possible — a single task partition
    # holding > 2^23 rows of one group (a pathological unsplittable file).
    # The oracle accumulates direct HUGEINT products — a different
    # algebra, so a shared limb-math bug cannot self-confirm.
    _RADIX = 1 << 20
    qd = li.select(
        "l_returnflag",
        *[
            F.floor(F.col(col) * 1_000_000.0 + 0.5).cast("long").alias(f"q_{n}")
            for n, col in _CORR_VARS
        ],
    ).select(
        "l_returnflag",
        *[F.col(f"q_{n}") for n, _ in _CORR_VARS],
        *[(F.col(f"q_{n}") / _RADIX).cast("long").alias(f"hi_{n}") for n, _ in _CORR_VARS],
        *[(F.col(f"q_{n}") % _RADIX).alias(f"lo_{n}") for n, _ in _CORR_VARS],
    )
    prods = [(a, b) for a, _ in _CORR_VARS for b, _ in _CORR_VARS
             if (a, b) in _CORR_PAIRS or a == b]
    # phase 1: int64 codegen sums per (group, task partition)
    part_aggs = (
        [F.count(F.lit(1)).alias("n_part")]
        + [F.sum(f"q_{n}").alias(f"s_{n}") for n, _ in _CORR_VARS]
        + [
            agg
            for a, b in prods
            for agg in (
                F.sum(F.col(f"hi_{a}") * F.col(f"hi_{b}")).alias(f"hh_{a}_{b}"),
                F.sum(
                    F.col(f"hi_{a}") * F.col(f"lo_{b}")
                    + F.col(f"lo_{a}") * F.col(f"hi_{b}")
                ).alias(f"x_{a}_{b}"),
                F.sum(F.col(f"lo_{a}") * F.col(f"lo_{b}")).alias(f"ll_{a}_{b}"),
            )
        ]
    )
    partials = qd.withColumn("pid", F.spark_partition_id()).groupBy(
        "l_returnflag", "pid"
    ).agg(*part_aggs)
    # loud guard at the only remaining overflow site: one task partition
    # holding > 2^23 rows of a single group (component sums are bounded by
    # n_part × 2^40; n_part is partition-size-, not group-size-, bounded)
    n_part_guarded = F.when(
        F.col("n_part") <= F.lit(1 << 23), F.col("n_part")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("agg_corr_matrix: a single task partition holds "),
                F.col("n_part").cast("string"),
                F.lit(" rows of one group — past the 2^23-row int64-safe"
                      " bound of the 2^20-radix limb accumulation; lower"
                      " spark.sql.files.maxPartitionBytes or repartition"
                      " the scan"),
            )
        ).cast("bigint")
    )
    partials = partials.withColumn("n_part", n_part_guarded)
    # phase 2: decimal(38,0) sums over (#groups × #partitions) partial rows
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).alias(c)  # noqa: E731
    s = (
        partials.groupBy("l_returnflag")
        .agg(
            F.sum("n_part").alias("n"),
            *[dec(f"s_{n}") for n, _ in _CORR_VARS],
            *[d for a, b in prods
              for d in (dec(f"hh_{a}_{b}"), dec(f"x_{a}_{b}"), dec(f"ll_{a}_{b}"))],
        )
        .select(
            "l_returnflag",
            "n",
            # decimal(19,0) keeps the corr() product algebra inside Spark's
            # 38-digit bound (19+19), the original contract
            *[
                F.col(f"s_{n}").cast("decimal(19,0)").alias(f"s_{n}")
                for n, _ in _CORR_VARS
            ],
            *[
                (
                    F.col(f"hh_{a}_{b}") * (_RADIX * _RADIX)
                    + F.col(f"x_{a}_{b}") * _RADIX
                    + F.col(f"ll_{a}_{b}")
                ).alias(f"s_{a}_{b}")
                for a, b in prods
            ],
        )
    )

    def corr(a: str, b: str) -> F.Column:
        # zero-variance guard on EXACT decimals (ANSI divide-by-zero guard)
        nd = F.col("n").cast("decimal(19,0)")
        dx = nd * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        dy = nd * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        return F.when(
            (dx > 0) & (dy > 0),
            F.round(
                (n * sab - sa * sb)
                / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        )

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    corr(a, b).alias("corr"),
                )
                for a, b in _CORR_PAIRS
            ]
        )
    ).alias("p")
    # (The round-8 group-size guard is gone: two-phase accumulation makes
    # group size irrelevant — the remaining per-partition bound is guarded
    # loudly at phase 1.)
    return s.select(
        "l_returnflag", F.col("n").cast("bigint").alias("n_rows"), pairs
    ).select(
        "l_returnflag", F.col("p.var_a").alias("var_a"), F.col("p.var_b").alias("var_b"),
        "n_rows", F.col("p.corr").alias("corr")
    )


# --------------------------------------------------------------------------
# agg_benford_test — Benford's-law conformance (the data-forensics /
# quality screen for fabricated or corrupted numeric columns): the
# leading-digit distribution of o_totalprice per customer segment versus
# the Benford expectation P(d) = log10(1 + 1/d), scored by the chi²
# statistic.  Two keyed aggregates with map-side combine — the digit
# histogram is (groups × 9) rows at any corpus size.
#
# Exactness: digit extraction is integer/string math; the chi² terms use
# the 9 Benford constants as shared decimal literals (both engines parse
# the same doubles) and per-digit terms quantize to 6-dp fixed point
# before the final sum (util.dsum discipline).
# Reference parity: forensics SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

import math as _math

_BENFORD_P = {d: round(_math.log10(1 + 1 / d), 9) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())
    + " END"
)

_BENFORD_ORACLE = f"""
WITH d AS (
  SELECT c.c_mktsegment AS segment,
         CAST(substr(CAST(CAST(FLOOR(o.o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_totalprice >= 1
),
h AS (
  SELECT segment, digit, COUNT(*) AS n FROM d GROUP BY segment, digit
),
t AS (
  SELECT segment, SUM(n) AS tot FROM h GROUP BY segment
),
terms AS (
  SELECT h.segment, h.digit, h.n, t.tot,
         ({_BENFORD_CASE}) AS p
  FROM h JOIN t ON h.segment = t.segment
)
SELECT segment,
       CAST(MAX(tot) AS BIGINT) AS n_values,
       CAST(SUM(CAST(FLOOR(
         ((n - tot * p) * (n - tot * p) / (tot * p)) * 1000000.0 + 0.5
       ) AS BIGINT)) AS DOUBLE) / 1000000.0 AS chi2
FROM terms GROUP BY segment
"""


@register("agg_benford_test", oracle=_BENFORD_ORACLE)
def agg_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = load(spark, sf_dir, "customer")
    d = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        # FLOOR before the int cast: DuckDB's double→BIGINT cast ROUNDS
        # while Spark's truncates — floor makes both engines agree.
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit"),
    )
    # checkpoint the groups×9 histogram (totals + terms both branch off it)
    h = (
        d.groupBy("segment", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    t = h.groupBy("segment").agg(F.sum("n").alias("tot"))
    p = F.lit(None).cast("double")
    for dig, prob in _BENFORD_P.items():
        p = F.when(F.col("digit") == dig, F.lit(prob)).otherwise(p)
    terms = h.join(F.broadcast(t), "segment").select(
        "segment", "digit", "n", "tot", p.alias("p")
    )
    dev = (F.col("n") - F.col("tot") * F.col("p"))
    chi_term = dev * dev / (F.col("tot") * F.col("p"))
    return terms.groupBy("segment").agg(
        F.max("tot").cast("bigint").alias("n_values"),
        (
            F.sum(F.floor(chi_term * 1_000_000.0 + 0.5).cast("long")) / 1_000_000.0
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# agg_chisq_independence — chi-square test of independence on the
# (o_orderstatus × o_orderpriority) contingency table: are the two
# categoricals associated?  Complements agg_benford_test (goodness-of-fit
# against fixed expected probabilities) with the two-way expected-under-
# independence form E_ij = row_i·col_j/N, plus degrees of freedom and
# Cramér's V effect size.
#
# Scale shape: ONE corpus pass to the contingency counts (map-side
# combine, groups×groups rows), margins via two tiny aggregates off the
# CHECKPOINTED table, both broadcast back.  Chi² terms quantize to 6-dp
# fixed point pre-sum; all expected-count arithmetic is
# exact-integer-derived doubles (identical both engines).
# Reference parity: statistics SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a),
rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b),
tot AS (SELECT SUM(n) AS nn, COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb FROM c),
terms AS (
  SELECT c.n, ra.na * 1.0 * rb.nb / tot.nn AS e, tot.nn, tot.ka, tot.kb
  FROM c JOIN ra ON c.a = ra.a JOIN rb ON c.b = rb.b CROSS JOIN tot
)
SELECT CAST(MAX(nn) AS BIGINT) AS n_rows,
       CAST(MAX((ka - 1) * (kb - 1)) AS BIGINT) AS dof,
       CAST(SUM(CAST(FLOOR(((n - e) * (n - e) / e) * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 AS chi2,
       ROUND(sqrt((CAST(SUM(CAST(FLOOR(((n - e) * (n - e) / e) * 1000000.0 + 0.5)
                          AS BIGINT)) AS DOUBLE) / 1000000.0)
                  / (MAX(nn) * LEAST(MAX(ka) - 1, MAX(kb) - 1))), 6) AS cramers_v
FROM terms
"""


@register("agg_chisq_independence", oracle=_CHISQ_ORACLE)
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = (
        o.groupBy(
            F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # margins + terms branch off it
    )
    ra = c.groupBy("a").agg(F.sum("n").alias("na"))
    rb = c.groupBy("b").agg(F.sum("n").alias("nb"))
    tot = c.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("a").alias("ka"),
        F.countDistinct("b").alias("kb"),
    )
    terms = (
        c.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            (F.col("na") * 1.0 * F.col("nb") / F.col("nn")).alias("e"),
            "nn",
            "ka",
            "kb",
        )
    )
    dev = F.col("n") - F.col("e")
    chi_fp = F.sum(
        F.floor((dev * dev / F.col("e")) * 1_000_000.0 + 0.5).cast("long")
    )
    chi2 = (chi_fp / 1_000_000.0).alias("chi2")
    return terms.agg(
        F.max("nn").cast("bigint").alias("n_rows"),
        F.max((F.col("ka") - 1) * (F.col("kb") - 1)).cast("bigint").alias("dof"),
        chi2,
        F.when(
            # a 1×k or k×1 contingency table has dof 0: V is undefined
            # (and the denominator would divide by zero under ANSI)
            F.least(F.max("ka") - 1, F.max("kb") - 1) > 0,
            F.round(
                F.sqrt(
                    (chi_fp / 1_000_000.0)
                    / (F.max("nn") * F.least(F.max("ka") - 1, F.max("kb") - 1))
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# agg_gini_coefficient — Lorenz-curve Gini of customer spend per market
# segment (revenue-concentration analytics: "how unequal is our customer
# base?").  Gini = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over spend sorted
# ascending, i = 1..n — exact, not a binned approximation.  Distinct from
# agg_entropy_gini's Gini IMPURITY (categorical mix); this is the
# inequality coefficient over a continuous measure.
#
# Scale shape: orders collapse to per-customer totals first (map-side
# combine), the segment dim broadcasts, ONE segment-keyed rank window
# orders the totals, and the weighted sum Σ i·xᵢ accumulates as
# DECIMAL(38,0)/HUGEINT (i·x reaches ~1e17 at modest scale; int64 would
# overflow) over the already-reduced customer-totals relation.
# Exactness: spend quantized to cents (exact int64 per customer), ranks
# tie-break on custkey, final arithmetic from exact integers.
# Reference parity: analytics SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_GINI_ORACLE = """
WITH t AS (
  SELECT o_custkey, SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
x AS (
  SELECT c.c_mktsegment AS segment, t.cents, t.o_custkey
  FROM t JOIN customer c ON t.o_custkey = c.c_custkey
),
r AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents, o_custkey) AS i
  FROM x
),
a AS (
  SELECT segment,
         COUNT(*) AS n,
         SUM(CAST(cents AS HUGEINT)) AS sx,
         SUM(CAST(i AS HUGEINT) * cents) AS swx
  FROM r GROUP BY segment
)
SELECT segment,
       CAST(n AS BIGINT) AS n_customers,
       CASE WHEN sx > 0 THEN
         ROUND(2.0 * CAST(swx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
               - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
       END AS gini
FROM a
"""


@register("agg_gini_coefficient", oracle=_GINI_ORACLE)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    t = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).alias("cents")
    )
    x = t.join(F.broadcast(cust), t.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "cents", "o_custkey"
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_custkey")
    r = x.withColumn("i", F.row_number().over(w))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    a = r.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("cents")).alias("sx"),
        F.sum(dec("i") * dec("cents")).alias("swx"),
    )
    nd = F.col("n").cast("double")
    gini = F.when(
        F.col("sx") > 0,
        F.round(
            2.0 * F.col("swx").cast("double") / (nd * F.col("sx").cast("double"))
            - (nd + 1.0) / nd,
            6,
        ),
    )
    return a.select(
        "segment", F.col("n").cast("bigint").alias("n_customers"), gini.alias("gini")
    )


# --------------------------------------------------------------------------
# agg_markov_transitions — first-order Markov transition matrix over user
# event sequences: P(next event_type | current event_type), with counts.
# The classic journey/sequence-analytics primitive (next-step prediction,
# funnel leak diagnosis) the reference reaches only through dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
#
# Scale shape: ONE shuffle keyed on user_id orders each user's events and
# builds (src, dst) pairs map-side via lead(); the pair aggregation
# map-side-combines to |types|² rows, and the row-normalization window
# runs over that tiny aggregate (partitioned by src_type — never a
# SinglePartition exchange, never the corpus).  Per-user state is one
# sorted partition slice, bounded by per-user activity.
# --------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
  FROM events
),
pair AS (
  SELECT src_type, dst_type, COUNT(*) AS n
  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2
)
SELECT src_type, dst_type, CAST(n AS BIGINT) AS n_trans,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src_type) AS DOUBLE), 6) AS p
FROM pair
"""


@register("agg_markov_transitions", oracle=_MARKOV_ORACLE)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(wu).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    ws = Window.partitionBy("src_type")
    return pairs.select(
        "src_type",
        "dst_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.sum("n_trans").over(ws).cast("double"),
            6,
        ).alias("p"),
    )


# --------------------------------------------------------------------------
# agg_zipf_fit — Zipf's-law fit over the corpus vocabulary: regress
# ln(term frequency) on ln(frequency rank) and report the log-log OLS
# slope (natural text ≈ −1; synthetic/templated corpora deviate — a
# corpus-level quality diagnostic for training data).
#
# Scale shape: the corpus collapses to the term-frequency table first
# (ONE map-side-combining aggregate, vocab-sized); the global frequency
# rank uses util.global_running_sums' two-phase prefix sum (value=1 ⇒ a
# scalable global ROW_NUMBER — never a SinglePartition window); the
# regression consumes 6-dp-quantized per-term log terms through dsum
# fixed-point sums, so the five sufficient statistics are order-
# independent and exact on both engines.  Output is one row.
# Reference parity: corpus statistics reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH uni AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r FROM uni
),
terms AS (
  SELECT ROUND(ln(r), 6) AS lx, ROUND(ln(c), 6) AS ly FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {osum('lx')} AS sx, {osum('ly')} AS sy,
         {osum('ROUND(lx * ly, 6)')} AS sxy,
         {osum('ROUND(lx * lx, 6)')} AS sxx
  FROM terms
)
SELECT n AS n_terms,
       CASE WHEN n < 2 THEN NULL
            ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       END AS slope,
       CASE WHEN n < 2 THEN NULL
            ELSE ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
       END AS intercept
FROM s
"""


@register("agg_zipf_fit", oracle=_ZIPF_ORACLE)
def agg_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import dsum, global_running_sum

    d = load(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("negc", -F.col("c"))
    )
    ranked = global_running_sum(uni, ["negc", "term"], F.lit(1), "r")
    terms = ranked.select(
        F.round(F.log("r"), 6).alias("lx"), F.round(F.log("c"), 6).alias("ly")
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("lx").alias("sx"),
        dsum("ly").alias("sy"),
        dsum(F.round(F.col("lx") * F.col("ly"), 6)).alias("sxy"),
        dsum(F.round(F.col("lx") * F.col("lx"), 6)).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_terms"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(F.round(slope, 6))
        .alias("slope"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(F.round((sy - slope * sx) / n, 6))
        .alias("intercept"),
    )


# --------------------------------------------------------------------------
# agg_welch_ttest — Welch's unequal-variance two-sample t-test per metric
# (the robust default over Student's pooled test; Welch 1947): same
# deterministic arm assignment as agg_ab_ztest (user_id % 2), t statistic
# and Welch–Satterthwaite degrees of freedom assembled from one pass of
# sufficient statistics (n, Σx, Σx² per (metric, arm) — one balanced
# shuffle of 10 tiny rows, no second corpus pass).
#
# Parity discipline: squares accumulate at DECIMAL(18,6) (the ab_ztest
# scale rule), means/variances ROUND to 6 dp FIRST, and every downstream
# expression is textually identical on both engines (same IEEE op
# sequence on identical rounded inputs).  Degenerate cells (an arm with
# n < 2, or both variances zero) yield NULL via guards on exact values.
# --------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH s AS (
  SELECT event_type, user_id % 2 AS arm,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(CAST(SUM((CAST(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)))
           AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxx
  FROM events GROUP BY event_type, user_id % 2
),
p AS (
  SELECT event_type,
         MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
         MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
         MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM s GROUP BY event_type
),
m AS (
  SELECT event_type, n0, n1,
         ROUND(sx0 / n0, 6) AS m0, ROUND(sx1 / n1, 6) AS m1,
         ROUND((sxx0 - sx0 * sx0 / n0) / (n0 - 1), 6) AS v0,
         ROUND((sxx1 - sx1 * sx1 / n1) / (n1 - 1), 6) AS v1
  FROM p WHERE n0 IS NOT NULL AND n1 IS NOT NULL AND n0 >= 2 AND n1 >= 2
)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
       m0 AS mean_control, m1 AS mean_treat,
       v0 AS var_control, v1 AS var_treat,
       CASE WHEN v0 / n0 + v1 / n1 = 0 THEN NULL
            ELSE ROUND((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 6)
       END AS t_stat,
       CASE WHEN v0 / n0 + v1 / n1 = 0 THEN NULL
            ELSE ROUND(((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1))
                       / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                          + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6)
       END AS welch_df
FROM m
"""


@register("agg_welch_ttest", oracle=_WELCH_ORACLE)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dec25 = F.col("value").cast("decimal(25,6)")
    dec18 = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type", (F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec25).cast("double").alias("sx"),
        # qprod long-micro squares (the round-12 second-moment idiom):
        # codegen floor+long per row instead of two BigDecimal parses,
        # then the oracle's two-step int -> double -> /1e12 conversion
        (F.sum(qprod(F.col("value"), F.col("value"))).cast("double")
         / 1_000_000_000_000.0).alias("sxx"),
    )
    p = s.groupBy("event_type").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("arm") == 0, F.col("sxx"))).alias("sxx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sxx"))).alias("sxx1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    m = p.filter(
        n0.isNotNull() & n1.isNotNull() & (n0 >= 2) & (n1 >= 2)
    ).select(
        "event_type",
        "n0",
        "n1",
        F.round(F.col("sx0") / n0, 6).alias("m0"),
        F.round(F.col("sx1") / n1, 6).alias("m1"),
        F.round((F.col("sxx0") - F.col("sx0") * F.col("sx0") / n0) / (n0 - 1), 6).alias("v0"),
        F.round((F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1) / (n1 - 1), 6).alias("v1"),
    )
    se2 = F.col("v0") / n0 + F.col("v1") / n1
    t = F.round((F.col("m1") - F.col("m0")) / F.sqrt(se2), 6)
    df = F.round(
        (se2 * se2)
        / (
            (F.col("v0") / n0) * (F.col("v0") / n0) / (n0 - 1)
            + (F.col("v1") / n1) * (F.col("v1") / n1) / (n1 - 1)
        ),
        6,
    )
    return m.select(
        "event_type",
        n0.cast("bigint").alias("n_control"),
        n1.cast("bigint").alias("n_treat"),
        F.col("m0").alias("mean_control"),
        F.col("m1").alias("mean_treat"),
        F.col("v0").alias("var_control"),
        F.col("v1").alias("var_treat"),
        F.when(se2 == 0, F.lit(None).cast("double")).otherwise(t).alias("t_stat"),
        F.when(se2 == 0, F.lit(None).cast("double")).otherwise(df).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# agg_bootstrap_ci — deterministic hash-bootstrap confidence interval for
# the per-metric mean (Politis-Romano subsample bootstrap, derandomized):
# resample b ∈ 0..31 contains a row iff the first 8 md5 hex digits of
# "event_id:b" land below 2^31 (an independent deterministic half-sample
# per b), so the WHOLE procedure replays bit-identically on any engine —
# no RNG, no seed plumbing.  CI = 2nd/31st order statistics of the 32
# subsample means around the full-sample point estimate.
#
# Scale shape: the 32× expansion is map-side (explode of a literal
# range); the only shuffles are the (metric, b) mean aggregate (32×
# |metrics| groups) and the |metrics|-keyed order-stat window over 32
# rows per key.  dsum fixed-point keeps every mean exact.
# --------------------------------------------------------------------------

_BOOT_B = 32

_BOOTSTRAP_ORACLE = f"""
WITH expanded AS (
  SELECT e.event_type, e.value, t.b
  FROM events e, range(0, {_BOOT_B}) t(b)
  WHERE CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':' ||
                             CAST(t.b AS VARCHAR)), 1, 8)) AS BIGINT)
        < 2147483648
),
means AS (
  SELECT event_type, b,
         FLOOR({osum('value')} / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS m
  FROM expanded GROUP BY event_type, b
),
ranked AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m, b) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM means
),
full_mean AS (
  SELECT event_type,
         FLOOR({osum('value')} / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS mean
  FROM events GROUP BY event_type
)
SELECT f.event_type, f.mean,
       MAX(CASE WHEN r.rn = 2 THEN r.m END) AS ci_lo,
       MAX(CASE WHEN r.rn = r.nb - 1 THEN r.m END) AS ci_hi,
       CAST(MAX(r.nb) AS INT) AS n_resamples
FROM full_mean f JOIN ranked r ON r.event_type = f.event_type
GROUP BY f.event_type, f.mean
"""


@register("agg_bootstrap_ci", oracle=_BOOTSTRAP_ORACLE)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import dsum

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    b = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    # Membership test: first 8 md5 hex digits < 2^31 = 0x80000000 ⇔ the
    # FIRST hex digit is 0-7 — one substring compare instead of an 8-char
    # hex parse per (row, b); md5 emits lowercase so '0'-'7' is a single
    # ASCII range (r13 optimization round, same predicate bit for bit).
    h1 = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.col("event_id").cast("string"), F.col("b").cast("string")
            )
        ),
        1,
        1,
    )
    expanded = ev.select("event_type", "value", b).filter(h1 < F.lit("8"))
    from nedp_etl_spark.util import q6

    means = expanded.groupBy("event_type", "b").agg(
        q6(dsum("value") / F.count(F.lit(1))).alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("m", "b")
    wc = Window.partitionBy("event_type")
    ranked = means.select(
        "event_type",
        "m",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("nb"),
    )
    full_mean = ev.groupBy("event_type").agg(
        q6(dsum("value") / F.count(F.lit(1))).alias("mean")
    )
    return (
        full_mean.join(ranked, "event_type")
        .groupBy("event_type", "mean")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == F.col("nb") - 1, F.col("m"))).alias("ci_hi"),
            F.max("nb").cast("int").alias("n_resamples"),
        )
    )


# --------------------------------------------------------------------------
# agg_survival_km — Kaplan-Meier survival estimate over user lifetimes
# (the product-limit estimator, Kaplan & Meier 1958 — the standard
# retention/churn curve): lifetime = days between a user's first and last
# event; users whose last event falls within 7 days of the corpus end are
# CENSORED (still alive — their lifetime only bounds survival from
# below).  For each distinct event time t: n_risk = users with lifetime
# ≥ t, d = uncensored deaths at t, and S(t) = Π_{t'≤t} (1 − d/n) — the
# product accumulated in LOG space via the two-phase prefix sum (no
# global window), with per-term ROUND(ln, 6) so the cumulative sum is
# dsum-exact and the final exp quantizes identically on both engines.
#
# Scale shape: one user-keyed aggregate (first/last), a lifetime-keyed
# count aggregate (≤ corpus-day-span rows), the shared prefix-sum
# machinery over that tiny relation, and a 1-row corpus-end broadcast.
# --------------------------------------------------------------------------

_SURVIVAL_KM_ORACLE = """
WITH life AS (
  SELECT user_id,
         date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t,
         CAST(MAX(ts) AS DATE) > (SELECT CAST(MAX(ts) AS DATE) FROM events)
                                  - INTERVAL 7 DAY AS censored
  FROM events GROUP BY user_id
),
at_t AS (
  SELECT t, COUNT(*) AS n_total,
         SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d
  FROM life GROUP BY t
),
risk AS (
  SELECT t, n_total, d,
         (SELECT COUNT(*) FROM life) + CAST(n_total AS BIGINT)
           - SUM(CAST(n_total AS BIGINT)) OVER (ORDER BY t ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM at_t
),
terms AS (
  SELECT t, n_risk, d,
         CASE WHEN d = 0 THEN 0.0
              ELSE FLOOR(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1000000.0 + 0.5)
                   / 1000000.0 END AS lnterm
  FROM risk WHERE n_risk > d
),
km AS (
  SELECT t, n_risk, d,
         SUM(lnterm) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_ln
  FROM terms
)
SELECT CAST(t AS INT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       ROUND(cum_ln, 6) AS log_survival,
       FLOOR(exp(ROUND(cum_ln, 6)) * 1000000.0 + 0.5) / 1000000.0 AS survival
FROM km
"""


@register("agg_survival_km", oracle=_SURVIVAL_KM_ORACLE)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    ev = load(spark, sf_dir, "events")
    end = ev.agg(F.max(F.col("ts").cast("date")).alias("end_d"))  # 1 row
    life = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff("d1", "d0").alias("t"),
            (F.col("d1") > F.date_sub("end_d", 7)).alias("censored"),
        )
    )
    at_t = life.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
    )
    total = life.count()  # bounded action: one scalar (the user count)
    cum = global_running_sum(at_t, ["t"], F.col("n_total").cast("bigint"), "cum_n")
    risk = cum.select(
        "t",
        "n_total",
        "d",
        (F.lit(total) + F.col("n_total").cast("bigint") - F.col("cum_n")).alias(
            "n_risk"
        ),
    )
    terms = risk.filter(F.col("n_risk") > F.col("d")).select(
        "t",
        "n_risk",
        "d",
        F.when(F.col("d") == 0, F.lit(0.0))
        .otherwise(
            # q6 FLOOR quantize, not ROUND, after the nonlinear ln (parity)
            F.floor(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        )
        .alias("lnterm"),
    )
    # lnterm is 6-dp-rounded → its 1e-6 integer form is EXACT int64, which
    # is also what global_running_sum requires (long-typed partial offsets)
    terms_q = terms.withColumn(
        "lnq", F.round(F.col("lnterm") * 1_000_000.0, 0).cast("long")
    )
    km = global_running_sum(terms_q, ["t"], F.col("lnq"), "cum_lnq")
    cum_ln = F.col("cum_lnq").cast("double") / 1_000_000.0
    return km.select(
        F.col("t").cast("int").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.round(cum_ln, 6).alias("log_survival"),
        (
            F.floor(F.exp(F.round(cum_ln, 6)) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("survival"),
    )


# --------------------------------------------------------------------------
# agg_market_basket — pairwise event-type co-occurrence (support /
# confidence / lift) over per-user distinct event-type sets: the
# association-rules staple for "users who do A also do B" product
# analytics.  The reference reaches basket analysis only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
#
# Scale shape: the corpus collapses FIRST to distinct (user_id,
# event_type) — one shuffle keyed by user — and the pair join is a
# self-equi-join on user_id whose fan-out per user is bounded by the
# event-type catalog (|T| choose 2 pairs per user, |T| small by
# construction), never all-pairs over users.  The pair aggregate is keyed
# by (type_a, type_b) <= |T|^2 groups; singleton counts join back
# broadcast-small; the only cross join is the 1-row user-total
# (allowlisted).  Every metric is a ratio of exact int64 counts,
# quantized with the q6 FLOOR discipline — hash-identical on both
# engines.
# --------------------------------------------------------------------------

from nedp_etl_spark.util import oq6 as _oq6
from nedp_etl_spark.util import q6 as _q6

_BASKET_ORACLE = f"""
WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
u AS (SELECT COUNT(DISTINCT user_id) AS nu FROM ue),
t AS (SELECT event_type, COUNT(*) AS n FROM ue GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ue a JOIN ue b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(u.nu AS BIGINT) AS n_users,
       CAST(ta.n AS BIGINT) AS n_a,
       CAST(tb.n AS BIGINT) AS n_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       {_oq6('p.n_both * 1.0 / u.nu')} AS support,
       {_oq6('p.n_both * 1.0 / ta.n')} AS conf_a_b,
       {_oq6('p.n_both * 1.0 / tb.n')} AS conf_b_a,
       {_oq6('(p.n_both * 1.0 * u.nu) / (ta.n * tb.n)')} AS lift
FROM p
JOIN t ta ON ta.event_type = p.type_a
JOIN t tb ON tb.event_type = p.type_b
CROSS JOIN u
"""


@register("agg_market_basket", oracle=_BASKET_ORACLE)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ue = ev.select("user_id", "event_type").distinct()
    u = ue.agg(F.countDistinct("user_id").alias("nu"))  # 1-row broadcast
    t = ue.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ue.alias("a"), ue.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = t.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = t.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    n_both, nu = F.col("n_both"), F.col("nu")
    n_a, n_b = F.col("n_a"), F.col("n_b")
    return (
        p.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(u))
        .select(
            "type_a",
            "type_b",
            nu.cast("bigint").alias("n_users"),
            n_a.cast("bigint").alias("n_a"),
            n_b.cast("bigint").alias("n_b"),
            n_both.cast("bigint").alias("n_both"),
            _q6(n_both * 1.0 / nu).alias("support"),
            _q6(n_both * 1.0 / n_a).alias("conf_a_b"),
            _q6(n_both * 1.0 / n_b).alias("conf_b_a"),
            _q6((n_both * 1.0 * nu) / (n_a * n_b)).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# agg_delta_method_ci — delta-method confidence interval for a RATIO
# metric (value per event): the correct A/B-test machinery when the
# metric is sum(value)/count(events) and the randomization unit is the
# USER, so per-user totals are the i.i.d. observations and naive row-level
# variance is wrong (Deng et al., KDD'11 ratio-metric CI).  The reference
# reaches experiment analysis only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
#
# Var(X̄/Ȳ) ≈ (var_x − 2·R·cov_xy + R²·var_y) / (n·Ȳ²) with R = Σx/Σy.
#
# Cross-engine determinism: level-1 per-user totals are exact DECIMAL
# sums (the agg_welch_ttest pattern); level-2 moment sums square the
# DECIMAL(15,6) user totals inside DECIMAL (exact, order-independent; the
# oracle lifts one operand to width 19 so DuckDB leaves its int64
# storage class — widths <= 18 multiply IN int64 there and a 19-digit
# product overflows) and
# only then cast to double, so every moment is bit-identical on both
# engines; the sqrt is followed by the q6 FLOOR quantize.
#
# Scale shape: two keyed aggregations (events → user totals → per-metric
# moments) — the map-side-combine shape that holds at any corpus size; no
# joins, no windows, no broadcast.
# --------------------------------------------------------------------------

_Z975 = "1.959964"

_DELTA_CI_ORACLE = f"""
WITH s1 AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(18,6)) AS xi,
         CAST(COUNT(value) AS BIGINT) AS yi
  FROM events GROUP BY event_type, user_id
),
s1m AS (
  -- exact HUGEINT micros of xi: DuckDB's narrow-decimal multiply runs in
  -- int64 and overflows at |xi| ~1e9 (round-12 magnitude sweep)
  SELECT event_type, xi, yi,
         CAST(CAST(xi AS DECIMAL(25,6)) * 1000000 AS HUGEINT) AS xm
  FROM s1
),
s2 AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(CAST(SUM(xi) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(xm * xm) AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxx,
         CAST(SUM(yi) AS DOUBLE) AS sy,
         CAST(SUM(yi * yi) AS DOUBLE) AS syy,
         CAST(CAST(SUM(xm * yi) AS VARCHAR) AS DOUBLE) / 1000000.0 AS sxy
  FROM s1m GROUP BY event_type
),
m AS (
  SELECT event_type, n, sx, sy,
         (sxx - sx * sx / n) / (n - 1) AS vx,
         (syy - sy * sy / n) / (n - 1) AS vy,
         (sxy - sx * sy / n) / (n - 1) AS cxy
  FROM s2 WHERE n >= 2
),
r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_users,
         FLOOR(sx / sy * 1000000.0 + 0.5) / 1000000.0 AS ratio,
         FLOOR(sqrt(
           CASE WHEN vx - 2.0 * (sx / sy) * cxy
                     + (sx / sy) * (sx / sy) * vy < 0.0 THEN 0.0
                ELSE vx - 2.0 * (sx / sy) * cxy + (sx / sy) * (sx / sy) * vy
           END / ((sy / n) * (sy / n)) / n
         ) * 1000000.0 + 0.5) / 1000000.0 AS se
  FROM m
)
SELECT event_type, n_users, ratio, se,
       FLOOR((ratio - {_Z975} * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
       FLOOR((ratio + {_Z975} * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
FROM r
"""


@register("agg_delta_method_ci", oracle=_DELTA_CI_ORACLE)
def agg_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import q6

    ev = load(spark, sf_dir, "events")
    dec25 = F.col("value").cast("decimal(25,6)")
    s1 = ev.groupBy("event_type", "user_id").agg(
        F.sum(dec25).cast("decimal(18,6)").alias("xi"),
        F.count("value").cast("bigint").alias("yi"),
    )
    xi = F.col("xi")
    # xm: exact integer micros of xi, mirroring the oracle's s1m CTE —
    # sxx/sxy then follow the oracle's EXACT op order (integer sum →
    # one double conversion → double divide by 1e12/1e6).  The former
    # F.sum(xi*xi).cast('double') was a single-rounding conversion of the
    # exact rational, which can differ by 1 ulp from the oracle's
    # two-step path once the sum exceeds 2^53, amplified by the
    # (sxx − sx²/n) cancellation below.
    xm = (xi.cast("decimal(25,6)") * 1000000).cast("decimal(38,0)")
    s2 = s1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).cast("double").alias("sx"),
        (F.sum(xm * xm).cast("double") / F.lit(1e12)).alias("sxx"),
        F.sum("yi").cast("double").alias("sy"),
        F.sum(F.col("yi") * F.col("yi")).cast("double").alias("syy"),
        (F.sum(xm * F.col("yi").cast("decimal(38,0)")).cast("double")
         / F.lit(1e6)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    m = s2.filter(n >= 2).select(
        "event_type",
        "n",
        "sx",
        "sy",
        ((F.col("sxx") - sx * sx / n) / (n - 1)).alias("vx"),
        ((F.col("syy") - sy * sy / n) / (n - 1)).alias("vy"),
        ((F.col("sxy") - sx * sy / n) / (n - 1)).alias("cxy"),
    )
    rr = sx / sy
    quad = F.col("vx") - 2.0 * rr * F.col("cxy") + rr * rr * F.col("vy")
    r = m.select(
        "event_type",
        n.cast("bigint").alias("n_users"),
        q6(rr).alias("ratio"),
        q6(
            F.sqrt(
                F.when(quad < 0.0, F.lit(0.0)).otherwise(quad)
                / ((sy / n) * (sy / n))
                / n
            )
        ).alias("se"),
    )
    ratio, se = F.col("ratio"), F.col("se")
    z = F.lit(float(_Z975))
    return r.select(
        "event_type",
        "n_users",
        "ratio",
        "se",
        q6(ratio - z * se).alias("ci_lo"),
        q6(ratio + z * se).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# agg_power_analysis — required per-arm sample size from OBSERVED variance:
# n = (z_{1-a/2} + z_{power})^2 * 2*s_pooled^2 / mde^2 for a two-sample
# test at alpha=.05 / power=.80 with a 5%-of-mean minimum detectable
# effect — the experimentation-platform pre-flight every A/B system runs
# before launch.  The reference reaches experiment sizing only as
# dbt-model SQL (dbtoperator.py:273-274).
#
# Cross-engine determinism: per-arm moments are the agg_welch_ttest exact
# DECIMAL sums; variances/means/mde pass through the q6 FLOOR quantize,
# and the final CEIL acts on an already-quantized double, so it is
# bit-identical.  Scale: one keyed aggregate, no joins.
# --------------------------------------------------------------------------

_PW_Z = "5.612119"  # (z_.975 + z_.80)^2 = (1.959964 + 0.841621)^2, 6-dp

_POWER_ORACLE = f"""
WITH s AS (
  SELECT event_type, user_id % 2 AS arm,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(CAST(SUM((CAST(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)))
           AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxx
  FROM events GROUP BY event_type, user_id % 2
),
p AS (
  SELECT event_type,
         MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
         MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
         MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM s GROUP BY event_type
),
m AS (
  SELECT event_type, n0, n1,
         FLOOR(((sxx0 - sx0 * sx0 / n0) * 1.0 + (sxx1 - sx1 * sx1 / n1))
               / (n0 + n1 - 2) * 1000000.0 + 0.5) / 1000000.0 AS pooled_var,
         FLOOR((sx0 + sx1) / (n0 + n1) * 0.05 * 1000000.0 + 0.5) / 1000000.0
           AS mde
  FROM p WHERE n0 >= 2 AND n1 >= 2
)
SELECT event_type, CAST(n0 AS BIGINT) AS n_arm0, CAST(n1 AS BIGINT) AS n_arm1,
       pooled_var, mde,
       CASE WHEN mde = 0 THEN NULL
            ELSE CAST(CEIL({_PW_Z} * 2.0 * pooled_var / (mde * mde)) AS BIGINT)
       END AS n_required
FROM m
"""


@register("agg_power_analysis", oracle=_POWER_ORACLE)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import q6

    ev = load(spark, sf_dir, "events")
    dec25 = F.col("value").cast("decimal(25,6)")
    dec18 = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type", (F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec25).cast("double").alias("sx"),
        # qprod long-micro squares (the round-12 second-moment idiom):
        # codegen floor+long per row instead of two BigDecimal parses,
        # then the oracle's two-step int -> double -> /1e12 conversion
        (F.sum(qprod(F.col("value"), F.col("value"))).cast("double")
         / 1_000_000_000_000.0).alias("sxx"),
    )
    p = s.groupBy("event_type").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("arm") == 0, F.col("sxx"))).alias("sxx0"),
        F.max(F.when(F.col("arm") == 1, F.col("sxx"))).alias("sxx1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    sx0, sx1 = F.col("sx0"), F.col("sx1")
    m = p.filter((n0 >= 2) & (n1 >= 2)).select(
        "event_type",
        "n0",
        "n1",
        q6(
            (
                (F.col("sxx0") - sx0 * sx0 / n0) * 1.0
                + (F.col("sxx1") - sx1 * sx1 / n1)
            )
            / (n0 + n1 - 2)
        ).alias("pooled_var"),
        q6((sx0 + sx1) / (n0 + n1) * 0.05).alias("mde"),
    )
    mde = F.col("mde")
    return m.select(
        "event_type",
        n0.cast("bigint").alias("n_arm0"),
        n1.cast("bigint").alias("n_arm1"),
        "pooled_var",
        "mde",
        F.when(mde == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.ceil(
                F.lit(float(_PW_Z)) * 2.0 * F.col("pooled_var") / (mde * mde)
            ).cast("bigint")
        )
        .alias("n_required"),
    )


# --------------------------------------------------------------------------
# agg_diff_in_diff — 2x2 difference-in-differences per metric: treatment
# assignment by user hash (user_id % 2), the pre/post boundary at the
# corpus midpoint timestamp, cell means from exact DECIMAL sums,
# DiD = (mT_post - mT_pre) - (mC_post - mC_pre), and the unpooled
# (Welch-style) standard error sqrt(sum v_cell / n_cell) — the canonical
# causal readout for a launch that wasn't a clean experiment.  The
# reference reaches causal analytics only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: the midpoint is integer epoch-microsecond arithmetic from
# a 1-row (min,max) aggregate (allowlisted broadcast); every mean /
# variance / difference passes the q6 FLOOR quantize; sqrt is quantized
# after.  Scale: one 1-row broadcast + one keyed 4-cell-per-metric
# aggregate — map-side combine, no quadratic surface.
# --------------------------------------------------------------------------

_DID_ORACLE = """
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
),
cells AS (
  SELECT event_type, user_id % 2 AS treat,
         CASE WHEN epoch_us(ts) >= b.cut THEN 1 ELSE 0 END AS post,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(CAST(SUM((CAST(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)))
           AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxx
  FROM events CROSS JOIN bounds b
  GROUP BY 1, 2, 3
),
p AS (
  SELECT event_type,
         MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
         MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
         MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
         MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
         MAX(CASE WHEN treat = 0 AND post = 0 THEN sx END) AS sx00,
         MAX(CASE WHEN treat = 0 AND post = 1 THEN sx END) AS sx01,
         MAX(CASE WHEN treat = 1 AND post = 0 THEN sx END) AS sx10,
         MAX(CASE WHEN treat = 1 AND post = 1 THEN sx END) AS sx11,
         MAX(CASE WHEN treat = 0 AND post = 0 THEN sxx END) AS sxx00,
         MAX(CASE WHEN treat = 0 AND post = 1 THEN sxx END) AS sxx01,
         MAX(CASE WHEN treat = 1 AND post = 0 THEN sxx END) AS sxx10,
         MAX(CASE WHEN treat = 1 AND post = 1 THEN sxx END) AS sxx11
  FROM cells GROUP BY event_type
),
m AS (
  SELECT event_type, n00, n01, n10, n11,
         FLOOR(sx00 / n00 * 1000000.0 + 0.5) / 1000000.0 AS m00,
         FLOOR(sx01 / n01 * 1000000.0 + 0.5) / 1000000.0 AS m01,
         FLOOR(sx10 / n10 * 1000000.0 + 0.5) / 1000000.0 AS m10,
         FLOOR(sx11 / n11 * 1000000.0 + 0.5) / 1000000.0 AS m11,
         FLOOR((sxx00 - sx00 * sx00 / n00) / (n00 - 1) * 1000000.0 + 0.5) / 1000000.0 AS v00,
         FLOOR((sxx01 - sx01 * sx01 / n01) / (n01 - 1) * 1000000.0 + 0.5) / 1000000.0 AS v01,
         FLOOR((sxx10 - sx10 * sx10 / n10) / (n10 - 1) * 1000000.0 + 0.5) / 1000000.0 AS v10,
         FLOOR((sxx11 - sx11 * sx11 / n11) / (n11 - 1) * 1000000.0 + 0.5) / 1000000.0 AS v11
  FROM p
  WHERE n00 >= 2 AND n01 >= 2 AND n10 >= 2 AND n11 >= 2
),
r AS (
  SELECT event_type, n00, n01, n10, n11,
         FLOOR(((m11 - m10) - (m01 - m00)) * 1000000.0 + 0.5) / 1000000.0 AS did,
         FLOOR(sqrt(v00 / n00 + v01 / n01 + v10 / n10 + v11 / n11)
               * 1000000.0 + 0.5) / 1000000.0 AS se
  FROM m
)
SELECT event_type,
       CAST(n00 AS BIGINT) AS n_ctl_pre, CAST(n01 AS BIGINT) AS n_ctl_post,
       CAST(n10 AS BIGINT) AS n_trt_pre, CAST(n11 AS BIGINT) AS n_trt_post,
       did, se,
       CASE WHEN se = 0 THEN NULL
            ELSE FLOOR(did / se * 1000000.0 + 0.5) / 1000000.0
       END AS t_stat
FROM r
"""


@register("agg_diff_in_diff", oracle=_DID_ORACLE)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import q6

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / F.lit(2))
        .cast("bigint")
        .alias("cut")
    )  # 1-row broadcast; // 2 on a non-negative sum == cast-truncate
    dec25 = F.col("value").cast("decimal(25,6)")
    dec18 = F.col("value").cast("decimal(18,6)")
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "event_type",
            (F.col("user_id") % 2).alias("treat"),
            F.when(F.unix_micros("ts") >= F.col("cut"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec25).cast("double").alias("sx"),
            # qprod long-micro squares (the round-12 second-moment idiom):
        # codegen floor+long per row instead of two BigDecimal parses,
        # then the oracle's two-step int -> double -> /1e12 conversion
        (F.sum(qprod(F.col("value"), F.col("value"))).cast("double")
         / 1_000_000_000_000.0).alias("sxx"),
        )
    )

    def _cell(col: str, t: int, q: int):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == q), F.col(col))
        ).alias(f"{col}{t}{q}")

    p = cells.groupBy("event_type").agg(
        *[_cell(c, t, q) for c in ("n", "sx", "sxx") for t in (0, 1) for q in (0, 1)]
    )
    names = [(t, q) for t in (0, 1) for q in (0, 1)]
    cond = None
    for t, q in names:
        c = F.col(f"n{t}{q}") >= 2
        cond = c if cond is None else (cond & c)
    sel = ["event_type"] + [F.col(f"n{t}{q}") for t, q in names]
    for t, q in names:
        n, sx, sxx = F.col(f"n{t}{q}"), F.col(f"sx{t}{q}"), F.col(f"sxx{t}{q}")
        sel.append(q6(sx / n).alias(f"m{t}{q}"))
        sel.append(q6((sxx - sx * sx / n) / (n - 1)).alias(f"v{t}{q}"))
    m = p.filter(cond).select(*sel)
    did = q6((F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00")))
    se = q6(
        F.sqrt(
            F.col("v00") / F.col("n00")
            + F.col("v01") / F.col("n01")
            + F.col("v10") / F.col("n10")
            + F.col("v11") / F.col("n11")
        )
    )
    r = m.select(
        "event_type",
        F.col("n00").cast("bigint").alias("n_ctl_pre"),
        F.col("n01").cast("bigint").alias("n_ctl_post"),
        F.col("n10").cast("bigint").alias("n_trt_pre"),
        F.col("n11").cast("bigint").alias("n_trt_post"),
        did.alias("did"),
        se.alias("se"),
    )
    return r.withColumn(
        "t_stat",
        F.when(F.col("se") == 0, F.lit(None).cast("double")).otherwise(
            q6(F.col("did") / F.col("se"))
        ),
    )


# --------------------------------------------------------------------------
# agg_time_decay_score — exponentially time-decayed engagement score per
# user: score = sum(value * 2^(-age_days / 7)) with a 7-day half-life,
# age measured against the corpus high-water mark — the recency-weighted
# ranking signal every feed/retention system computes.  The reference
# reaches scoring models only as dbt-model SQL (dbtoperator.py:273-274).
#
# Cross-engine determinism: "now" is a 1-row MAX(ts) broadcast in exact
# epoch microseconds (allowlisted); the per-row decay passes POWER then
# the contribution is quantized to int64 micro-units IMMEDIATELY
# (periodogram discipline), so the per-user sums are order-independent.
# Scale: one scan, one 1-row broadcast, one keyed aggregate.
# --------------------------------------------------------------------------

_DECAY_ORACLE = """
WITH hw AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
c AS (
  SELECT user_id,
         CAST(FLOOR(value * POWER(2.0, -((hw.now_us - epoch_us(ts))
                                         / 86400000000.0) / 7.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM events CROSS JOIN hw
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(cq) / 1000000.0 AS score
FROM c GROUP BY user_id
"""


@register("agg_time_decay_score", oracle=_DECAY_ORACLE)
def agg_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hw = ev.agg(F.max(F.unix_micros("ts")).alias("now_us"))  # 1-row broadcast
    age_days = (F.col("now_us") - F.unix_micros("ts")) / 86400000000.0
    cq = F.floor(
        F.col("value") * F.pow(F.lit(2.0), -age_days / 7.0) * 1_000_000.0
        + F.lit(0.5)
    ).cast("bigint")
    return (
        ev.crossJoin(F.broadcast(hw))
        .select("user_id", cq.alias("cq"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum("cq") / 1_000_000.0).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# agg_mannwhitney_u — Mann-Whitney U rank-sum test per metric (arms by
# user_id parity, the welch-ttest convention): the non-parametric
# companion to agg_welch_ttest for skewed engagement metrics where the
# t-test's normality assumption fails.  Average ranks with the standard
# tie correction; z via the normal approximation.  The reference reaches
# hypothesis testing only as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: ranks are NEVER assigned per row — values collapse to the
# (event_type, value) distribution first (the agg_ks_test discipline), so
# the only window runs over DISTINCT values per metric, and the rank sum
# uses the closed form 2·avgrank = 2·cum_before + nv + 1 kept in exact
# int64 end-to-end (doubled to avoid half-integer ranks).  Bound: the
# doubled rank-sum is ≤ 2N² and the tie term ≤ N³ for a fully-tied
# metric — int64-safe through ~2e6 rows per metric group; size groups or
# move the two sums to decimal beyond that.
# --------------------------------------------------------------------------

_MWU_ORACLE = """
WITH v AS (
  SELECT event_type, value AS val,
         COUNT(*) AS nv,
         SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1v
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value
),
c AS (
  SELECT event_type, val, nv, n1v,
         COALESCE(SUM(nv) OVER (PARTITION BY event_type ORDER BY val
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cb
  FROM v
),
s AS (
  SELECT event_type,
         CAST(SUM(nv) AS BIGINT) AS n,
         CAST(SUM(n1v) AS BIGINT) AS n1,
         CAST(SUM(n1v * (2 * cb + nv + 1)) AS BIGINT) AS r1_2,
         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS tie_t
  FROM c GROUP BY event_type
),
z AS (
  SELECT event_type, n, n1,
         r1_2 - n1 * (n1 + 1) AS u2,
         CASE WHEN n >= 2
              THEN CAST(n - n1 AS DOUBLE) * n1 / 12.0
                   * ((n + 1) - tie_t / (CAST(n AS DOUBLE) * (n - 1.0)))
              ELSE 0.0 END AS sigma2
  FROM s
)
SELECT event_type,
       CAST(n - n1 AS BIGINT) AS n_control, n1 AS n_treat,
       u2 / 2.0 AS u_stat,
       CASE WHEN sigma2 > 0.0
            THEN FLOOR((u2 - CAST(n - n1 AS DOUBLE) * n1)
                       / (2.0 * SQRT(sigma2)) * 1000000.0 + 0.5) / 1000000.0
            ELSE NULL END AS z_stat
FROM z
"""


@register("agg_mannwhitney_u", oracle=_MWU_ORACLE)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL observations carry no rank (the agg_ks_test discipline) — and
    # the engines ORDER NULL groups differently (Spark first, DuckDB
    # last), so an unfiltered NULL group would shift every cb.
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.groupBy("event_type", F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n1v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = v.withColumn("cb", F.coalesce(F.sum("nv").over(w), F.lit(0)))
    s = c.groupBy("event_type").agg(
        F.sum("nv").cast("bigint").alias("n"),
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum(F.col("n1v") * (2 * F.col("cb") + F.col("nv") + 1))
        .cast("bigint")
        .alias("r1_2"),
        F.sum(F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv"))
        .cast("bigint")
        .alias("tie_t"),
    )
    n, n1 = F.col("n"), F.col("n1")
    z = s.select(
        "event_type",
        n,
        n1,
        (F.col("r1_2") - n1 * (n1 + 1)).alias("u2"),
        F.when(
            n >= 2,
            (n - n1).cast("double") * n1 / 12.0
            * ((n + 1) - F.col("tie_t") / (n.cast("double") * (n - 1.0))),
        )
        .otherwise(F.lit(0.0))
        .alias("sigma2"),
    )
    return z.select(
        "event_type",
        (n - n1).cast("bigint").alias("n_control"),
        n1.alias("n_treat"),
        (F.col("u2") / 2.0).alias("u_stat"),
        F.when(
            F.col("sigma2") > 0.0,
            F.floor(
                (F.col("u2") - (n - n1).cast("double") * n1)
                / (2.0 * F.sqrt(F.col("sigma2")))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("z_stat"),
    )


# --------------------------------------------------------------------------
# agg_trimmed_winsorized — robust per-metric means: the 10%-trimmed mean
# (drop the bottom/top k = ⌊n/10⌋ observations) and the winsorized mean
# (clamp them to the k+1-th / n−k-th order statistics) — the outlier-proof
# aggregates a metrics layer publishes next to the raw mean when a few
# viral rows would otherwise dominate.  The reference reaches robust
# aggregation only as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: NO per-row sort — rows collapse to the (event_type, value)
# distribution and every order statistic is read off cumulative counts
# over DISTINCT values (the agg_mannwhitney_u / agg_ks_test discipline):
# a value spanning ranks (cb, cb+nv] contributes
# max(0, min(cb+nv, n−k) − max(cb, k)) copies to the trimmed interior,
# and the two clamp values are the rows whose rank span covers k+1 and
# n−k.  Contributions are quantized to int64 micro-units per VALUE (not
# per row), so all sums are order-independent and exact on both engines.
# --------------------------------------------------------------------------

_TRIMWIN_ORACLE = """
WITH v AS (
  SELECT event_type, value AS val, COUNT(*) AS nv,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL GROUP BY event_type, value
),
c AS (
  SELECT event_type, val, nv, vq,
         COALESCE(SUM(nv) OVER (PARTITION BY event_type ORDER BY val
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cb,
         SUM(nv) OVER (PARTITION BY event_type) AS n
  FROM v
),
k AS (
  SELECT event_type, val, nv, vq, cb, n,
         CAST(FLOOR(CAST(n AS DOUBLE) / 10.0) AS BIGINT) AS kk
  FROM c
),
s AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(kk) AS BIGINT) AS kk,
         CAST(SUM(GREATEST(0, LEAST(cb + nv, n - kk) - GREATEST(cb, kk)) * vq)
              AS BIGINT) AS mid_q,
         CAST(MAX(CASE WHEN cb < kk + 1 AND cb + nv >= kk + 1 THEN vq END)
              AS BIGINT) AS low_q,
         CAST(MAX(CASE WHEN cb < n - kk AND cb + nv >= n - kk THEN vq END)
              AS BIGINT) AS high_q
  FROM k GROUP BY event_type
)
SELECT event_type, n, kk AS k_trim,
       FLOOR((mid_q / 1000000.0) / (n - 2 * kk) * 1000000.0 + 0.5)
         / 1000000.0 AS trimmed_mean,
       FLOOR(((mid_q + kk * low_q + kk * high_q) / 1000000.0)
             / CAST(n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS winsorized_mean
FROM s
"""


@register("agg_trimmed_winsorized", oracle=_TRIMWIN_ORACLE)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLs hold no rank span (see agg_mannwhitney_u's guard note)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.groupBy("event_type", F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("nv"),
        F.floor(F.first("value") * 1_000_000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("vq"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    c = v.withColumn("cb", F.coalesce(F.sum("nv").over(wcum), F.lit(0))).withColumn(
        "n", F.sum("nv").over(wall)
    )
    kk = F.floor(F.col("n").cast("double") / 10.0).cast("bigint")
    k = c.withColumn("kk", kk)
    mid_cnt = F.greatest(
        F.lit(0),
        F.least(F.col("cb") + F.col("nv"), F.col("n") - F.col("kk"))
        - F.greatest(F.col("cb"), F.col("kk")),
    )
    s = k.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("kk").cast("bigint").alias("kk"),
        F.sum(mid_cnt * F.col("vq")).cast("bigint").alias("mid_q"),
        F.max(
            F.when(
                (F.col("cb") < F.col("kk") + 1)
                & (F.col("cb") + F.col("nv") >= F.col("kk") + 1),
                F.col("vq"),
            )
        )
        .cast("bigint")
        .alias("low_q"),
        F.max(
            F.when(
                (F.col("cb") < F.col("n") - F.col("kk"))
                & (F.col("cb") + F.col("nv") >= F.col("n") - F.col("kk")),
                F.col("vq"),
            )
        )
        .cast("bigint")
        .alias("high_q"),
    )
    return s.select(
        "event_type",
        "n",
        F.col("kk").alias("k_trim"),
        (
            F.floor(
                (F.col("mid_q") / 1_000_000.0)
                / (F.col("n") - 2 * F.col("kk"))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("trimmed_mean"),
        (
            F.floor(
                (
                    (F.col("mid_q") + F.col("kk") * F.col("low_q")
                     + F.col("kk") * F.col("high_q"))
                    / 1_000_000.0
                )
                / F.col("n").cast("double")
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("winsorized_mean"),
    )


# --------------------------------------------------------------------------
# agg_rfm_segments — RFM (recency / frequency / monetary) quintile
# segmentation of the customer base from order history, the canonical
# marketing-analytics rollup: per customer, days since last order (vs the
# corpus high-water date), order count, and quantized order-value total;
# each metric scored 1–5 by EXACT quintile cut values; output is the
# per-(r,f,m)-cell census.  The reference reaches segmentation models
# only as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: NO corpus-wide sort — the three quintile cut sets are
# exact k-th-smallest values found by the bounded two-phase histogram
# refinement shared with llm_perplexity_buckets
# (llm.ranking.exact_rank_values: 256-bucket histograms to the driver,
# never a data value; window only ever over one window-safe bucket).
# The cut values come back as a 1-row broadcast (allowlisted) and
# scoring is a pure map-side CASE.  Tie semantics are value-based
# (strict > against the rank-ceil(q·n/5) value), so both engines agree
# under ties.  Monetary totals pass the util.dsum int64 fixed-point so
# per-customer sums are order-independent.
# --------------------------------------------------------------------------

def _rfm_cut_sql(metric: str) -> str:
    ranked = (
        f"SELECT {metric} AS v, ROW_NUMBER() OVER (ORDER BY {metric}) AS rn,"
        f" COUNT(*) OVER () AS n FROM mm"
    )
    cuts = ", ".join(
        f"MAX(CASE WHEN rn = CAST(CEIL({q} * n / 5.0) AS BIGINT) THEN v END)"
        f" AS c{q}"
        for q in (1, 2, 3, 4)
    )
    return f"SELECT {cuts} FROM ({ranked})"


_RFM_ORACLE = f"""
WITH m AS (
  SELECT o_custkey AS custkey,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000.0 AS money,
         MAX(CAST(o_orderdate AS DATE)) AS last_d
  FROM orders GROUP BY o_custkey
),
hw AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
mm AS (
  SELECT custkey, freq, money,
         CAST(date_diff('day', last_d, hw.max_d) AS BIGINT) AS rec
  FROM m CROSS JOIN hw
),
rcut AS ({_rfm_cut_sql('rec')}),
fcut AS ({_rfm_cut_sql('freq')}),
mcut AS ({_rfm_cut_sql('money')}),
sc AS (
  SELECT custkey, rec, money,
         6 - (1 + CASE WHEN rec > rcut.c1 THEN 1 ELSE 0 END
                + CASE WHEN rec > rcut.c2 THEN 1 ELSE 0 END
                + CASE WHEN rec > rcut.c3 THEN 1 ELSE 0 END
                + CASE WHEN rec > rcut.c4 THEN 1 ELSE 0 END) AS r_score,
         1 + CASE WHEN freq > fcut.c1 THEN 1 ELSE 0 END
           + CASE WHEN freq > fcut.c2 THEN 1 ELSE 0 END
           + CASE WHEN freq > fcut.c3 THEN 1 ELSE 0 END
           + CASE WHEN freq > fcut.c4 THEN 1 ELSE 0 END AS f_score,
         1 + CASE WHEN money > mcut.c1 THEN 1 ELSE 0 END
           + CASE WHEN money > mcut.c2 THEN 1 ELSE 0 END
           + CASE WHEN money > mcut.c3 THEN 1 ELSE 0 END
           + CASE WHEN money > mcut.c4 THEN 1 ELSE 0 END AS m_score
  FROM mm CROSS JOIN rcut CROSS JOIN fcut CROSS JOIN mcut
)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       FLOOR((CAST(SUM(CAST(FLOOR(money * 1000000.0 + 0.5) AS BIGINT))
                   AS DOUBLE) / 1000000.0) / COUNT(*) * 1000000.0 + 0.5)
         / 1000000.0 AS avg_monetary,
       FLOOR(CAST(SUM(rec) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
         / 1000000.0 AS avg_recency_days
FROM sc GROUP BY r_score, f_score, m_score
"""


@register("agg_rfm_segments", oracle=_RFM_ORACLE)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.llm.ranking import exact_rank_values

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 1_000_000.0 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).cast("double")
            / 1_000_000.0
        ).alias("money"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
    )
    hw = o.agg(F.max(F.to_date("o_orderdate")).alias("max_d"))
    mm = (
        m.crossJoin(F.broadcast(hw))
        .select(
            "custkey",
            "freq",
            "money",
            F.datediff(F.col("max_d"), F.col("last_d")).cast("bigint").alias("rec"),
        )
        .localCheckpoint(eager=True)  # one derivation; 3 histogram consumers
    )
    quintile_fns = [
        (lambda q: lambda n: -(-(q * n) // 5))(q) for q in (1, 2, 3, 4)
    ]
    cuts = None
    for metric in ("rec", "freq", "money"):
        c = exact_rank_values(
            spark,
            mm.select(F.col(metric).cast("double").alias("v")),
            [f"{metric}_c{q}" for q in (1, 2, 3, 4)],
            quintile_fns,
        )
        cuts = c if cuts is None else cuts.crossJoin(c)
    tile = lambda col, pfx: (  # noqa: E731 — local scoring shorthand
        F.lit(1)
        + sum(
            F.when(F.col(col).cast("double") > F.col(f"{pfx}_c{q}"), 1).otherwise(0)
            for q in (1, 2, 3, 4)
        )
    )
    sc = mm.crossJoin(F.broadcast(cuts)).select(
        "custkey",
        "rec",
        "money",
        (F.lit(6) - tile("rec", "rec")).cast("int").alias("r_score"),
        tile("freq", "freq").cast("int").alias("f_score"),
        tile("money", "money").cast("int").alias("m_score"),
    )
    return sc.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (
            F.floor(
                (
                    F.sum(
                        F.floor(F.col("money") * 1_000_000.0 + F.lit(0.5)).cast(
                            "bigint"
                        )
                    ).cast("double")
                    / 1_000_000.0
                )
                / F.count(F.lit(1))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("avg_monetary"),
        (
            F.floor(
                F.sum("rec").cast("double") / F.count(F.lit(1)) * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("avg_recency_days"),
    )


# --------------------------------------------------------------------------
# agg_wilson_ci — Wilson score 95% confidence interval for a per-metric
# conversion rate (success = value ≥ 1.0): the interval that stays sane
# at extreme rates and small n where the normal ±z√(p(1−p)/n) interval
# breaks — the standard dashboard readout for funnel/conversion metrics.
# The reference reaches rate CIs only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: n and k are exact int64 counts; the closed form runs the
# same IEEE double expression on both engines with the shared z literal
# (1.959964) and passes the q6 FLOOR quantize.  Scale: one scan, one
# keyed aggregate — map-side combine everywhere.
# --------------------------------------------------------------------------

_WILSON_Z = "1.959964"

_WILSON_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM events GROUP BY event_type
),
e AS (
  SELECT event_type, n, k,
         CAST(k AS DOUBLE) / n AS p,
         {_WILSON_Z} * {_WILSON_Z} / n AS zz_n
  FROM s
)
SELECT event_type, n, k,
       FLOOR(p * 1000000.0 + 0.5) / 1000000.0 AS p_hat,
       FLOOR((p + zz_n / 2.0
              - {_WILSON_Z} * SQRT(p * (1.0 - p) / n + zz_n / (4.0 * n)))
             / (1.0 + zz_n) * 1000000.0 + 0.5) / 1000000.0 AS wilson_lo,
       FLOOR((p + zz_n / 2.0
              + {_WILSON_Z} * SQRT(p * (1.0 - p) / n + zz_n / (4.0 * n)))
             / (1.0 + zz_n) * 1000000.0 + 0.5) / 1000000.0 AS wilson_hi
FROM e
"""


@register("agg_wilson_ci", oracle=_WILSON_ORACLE)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    z = float(_WILSON_Z)
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") >= 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    zz_n = F.lit(z) * z / n
    half = F.lit(z) * F.sqrt(p * (1.0 - p) / n + zz_n / (4.0 * n))
    q = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    return s.select(
        "event_type",
        "n",
        "k",
        q(p).alias("p_hat"),
        q((p + zz_n / 2.0 - half) / (1.0 + zz_n)).alias("wilson_lo"),
        q((p + zz_n / 2.0 + half) / (1.0 + zz_n)).alias("wilson_hi"),
    )


# --------------------------------------------------------------------------
# agg_theil_index — Theil T inequality index per metric over positive
# values: T = (1/n)·Σ (x/μ)·ln(x/μ) — the decomposable inequality measure
# (0 = perfect equality, ln(n) = one row holds everything) published
# alongside agg_gini_coefficient; Theil adds the between/within
# decomposability Gini lacks.  The reference reaches inequality metrics
# only as dbt-model SQL (dbtoperator.py:273-274).
#
# Determinism: μ comes from the util.dsum int64 fixed-point (exact,
# order-free); each row's (x/μ)ln(x/μ) term quantizes to 1e-6 int64
# micro-units immediately, so the per-metric sum is order-independent.
# Scale: one stats aggregate equi-joined back (O(#metrics) side — AQE
# broadcasts it on stats), then one keyed aggregate of int64 terms.
# --------------------------------------------------------------------------

_THEIL_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         {osum('value')} / COUNT(*) AS mu
  FROM events WHERE value > 0 GROUP BY event_type
),
t AS (
  SELECT e.event_type, s.n, s.mu,
         -- ratio can UNDERFLOW to 0.0 for denormal values (LN(0) errors
         -- on DuckDB, NULLs on Spark): guard it — x·ln(x) -> 0 anyway
         CASE WHEN e.value / s.mu > 0 THEN
           CAST(FLOOR((e.value / s.mu) * LN(e.value / s.mu) * 1000000.0 + 0.5)
                AS BIGINT) END AS tq
  FROM events e JOIN s ON s.event_type = e.event_type
  WHERE e.value > 0
)
SELECT event_type, n,
       FLOOR(mu * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
       FLOOR(CAST(SUM(tq) AS DOUBLE) / 1000000.0 / n * 1000000.0 + 0.5)
         / 1000000.0 AS theil
FROM t GROUP BY event_type, n, mu
"""


@register("agg_theil_index", oracle=_THEIL_ORACLE)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (dsum("value") / F.count(F.lit(1))).alias("mu"),
    )
    t = ev.join(s, "event_type").select(
        "event_type",
        "n",
        "mu",
        F.floor(
            (F.col("value") / F.col("mu"))
            * F.log(F.col("value") / F.col("mu"))
            * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("tq"),
    )
    g = t.groupBy("event_type", "n", "mu").agg(F.sum("tq").alias("sq"))
    return g.select(
        "event_type",
        "n",
        (F.floor(F.col("mu") * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "mean_value"
        ),
        (
            F.floor(
                F.col("sq").cast("double") / 1_000_000.0 / F.col("n") * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("theil"),
    )


# --------------------------------------------------------------------------
# agg_cramers_v — Cramér's V association strength between the two
# categorical document facets (lang × source): the [0, 1]-normalized
# effect size the chi-square test (agg_chisq_independence) lacks — "is
# the dependence big, not just significant".  Uses the contingency
# identity χ² = N·(Σ o²/(rt·ct) − 1), which needs ONLY observed cells —
# no zero-cell enumeration, so the plan never crosses the marginal
# domains.  The reference reaches association metrics only as dbt-model
# SQL (dbtoperator.py:273-274).
#
# Determinism: per-cell terms o²/(rt·ct) quantize to 1e-9 int64 units
# before the global sum (order-free); N, r, c are exact int64; the two
# nonlinear outputs pass the q6 FLOOR quantize.  Scale: cell counts and
# both marginals are keyed aggregates; marginals join back keyed; the
# three 1-row totals broadcast (allowlisted).
# --------------------------------------------------------------------------

_CRAMERS_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY lang),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY source),
tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS c
  FROM cells
),
s AS (
  SELECT CAST(SUM(CAST(FLOOR(CAST(cells.o AS DOUBLE) * cells.o
                             / (CAST(rt.rt AS DOUBLE) * ct.ct)
                             * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq
  FROM cells JOIN rt ON rt.lang = cells.lang JOIN ct ON ct.source = cells.source
)
SELECT tot.n, tot.r AS n_rows, tot.c AS n_cols,
       FLOOR(tot.n * (s.sq / 1000000000.0 - 1.0) * 1000000.0 + 0.5)
         / 1000000.0 AS chi2,
       CASE WHEN LEAST(tot.r, tot.c) <= 1 THEN NULL
            ELSE FLOOR(SQRT(GREATEST(tot.n * (s.sq / 1000000000.0 - 1.0), 0.0)
                            / (tot.n * (LEAST(tot.r, tot.c) - 1.0)))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS cramers_v
FROM tot CROSS JOIN s
"""


@register("agg_cramers_v", oracle=_CRAMERS_ORACLE)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rt = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("rt"))
    ct = cells.groupBy("source").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("r"),
        F.countDistinct("source").cast("bigint").alias("c"),
    )
    s = (
        cells.join(rt, "lang")
        .join(ct, "source")
        .agg(
            F.sum(
                F.floor(
                    F.col("o").cast("double")
                    * F.col("o")
                    / (F.col("rt").cast("double") * F.col("ct"))
                    * 1_000_000_000.0
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("sq")
        )
    )
    chi2 = F.col("n") * (F.col("sq") / 1_000_000_000.0 - 1.0)
    km1 = F.least(F.col("r"), F.col("c")) - 1.0
    return tot.crossJoin(F.broadcast(s)).select(
        "n",
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        (F.floor(chi2 * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias("chi2"),
        F.when(F.least(F.col("r"), F.col("c")) <= 1, F.lit(None).cast("double"))
        .otherwise(
            F.floor(
                F.sqrt(F.greatest(chi2, F.lit(0.0)) / (F.col("n") * km1))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        )
        .alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# agg_mutual_information — mutual information (and the sqrt-normalized
# NMI) between the two categorical document facets (lang × source):
# MI = Σ (o/N)·ln(o·N/(rt·ct)) over OBSERVED cells (empty cells
# contribute exactly 0, so the marginal domains are never crossed — the
# agg_cramers_v discipline); NMI = MI/√(H_lang·H_source) normalizes to
# [0, 1] for cross-snapshot comparability.  The information-theoretic
# companion to Cramér's V.  The reference reaches association metrics
# only as dbt-model SQL (dbtoperator.py:273-274).
#
# Determinism: all masses exact int64; each cell/marginal term quantizes
# to 1e-9 int64 units before its sum (order-free); final ratios q6.
# --------------------------------------------------------------------------

_MI_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY lang),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY source),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
mi AS (
  SELECT CAST(SUM(CAST(FLOOR((CAST(cells.o AS DOUBLE) / tot.n)
                 * LN(CAST(cells.o AS DOUBLE) * tot.n
                      / (CAST(rt.rt AS DOUBLE) * ct.ct))
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS miq
  FROM cells
  JOIN rt ON rt.lang = cells.lang
  JOIN ct ON ct.source = cells.source
  CROSS JOIN tot
),
hl AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(rt AS DOUBLE) / tot.n)
                 * LN(CAST(rt AS DOUBLE) / tot.n)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM rt CROSS JOIN tot
),
hs AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(ct AS DOUBLE) / tot.n)
                 * LN(CAST(ct AS DOUBLE) / tot.n)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM ct CROSS JOIN tot
)
SELECT tot.n,
       FLOOR(mi.miq / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS mi,
       FLOOR(hl.hq / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS h_lang,
       FLOOR(hs.hq / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS h_source,
       CASE WHEN hl.hq <= 0 OR hs.hq <= 0 THEN NULL
            ELSE FLOOR((mi.miq / 1000000000.0)
                       / SQRT((hl.hq / 1000000000.0) * (hs.hq / 1000000000.0))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS nmi
FROM tot CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs
"""


@register("agg_mutual_information", oracle=_MI_ORACLE)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rt = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("rt"))
    ct = cells.groupBy("source").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    q9 = lambda c: F.floor(c * 1_000_000_000.0 + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    mi = (
        cells.join(rt, "lang")
        .join(ct, "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                q9(
                    (F.col("o").cast("double") / F.col("n"))
                    * F.log(
                        F.col("o").cast("double")
                        * F.col("n")
                        / (F.col("rt").cast("double") * F.col("ct"))
                    )
                )
            )
            .cast("bigint")
            .alias("miq")
        )
    )
    def _entropy(marg: DataFrame, col: str) -> DataFrame:
        share = F.col(col).cast("double") / F.col("n")
        return (
            marg.crossJoin(F.broadcast(tot))
            .agg(F.sum(q9(-share * F.log(share))).cast("bigint").alias("hq"))
        )

    hl = _entropy(rt, "rt").withColumnRenamed("hq", "hlq")
    hs = _entropy(ct, "ct").withColumnRenamed("hq", "hsq")
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    return (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "n",
            q6c(F.col("miq") / 1_000_000_000.0).alias("mi"),
            q6c(F.col("hlq") / 1_000_000_000.0).alias("h_lang"),
            q6c(F.col("hsq") / 1_000_000_000.0).alias("h_source"),
            F.when(
                (F.col("hlq") <= 0) | (F.col("hsq") <= 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                q6c(
                    (F.col("miq") / 1_000_000_000.0)
                    / F.sqrt(
                        (F.col("hlq") / 1_000_000_000.0)
                        * (F.col("hsq") / 1_000_000_000.0)
                    )
                )
            )
            .alias("nmi"),
        )
    )


# --------------------------------------------------------------------------
# agg_kurtosis_skewness — third/fourth standardized moments per metric
# (skewness g1 = m3/m2^1.5, excess kurtosis g2 = m4/m2² − 3): the tail
# diagnostics that decide whether the t-test family (agg_welch_ttest) is
# trustworthy or the rank tests (agg_mannwhitney_u) are required.  Built
# from raw data in TWO passes — exact mean first (util.dsum fixed-point),
# then central-moment sums — never engine skewness()/kurtosis()
# built-ins, whose sample-vs-population conventions differ.  The
# reference reaches distribution stats only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: μ is identical on both engines (exact int64 fixed-point);
# each row's centered powers d², d³, d⁴ quantize to int64 units (1e-6 /
# 1e-3 / 1e-2 scales — int64-safe for |value| ≤ ~1e3 over ≤ 1e7 rows per
# metric, documented bound; larger domains re-scale or take the decimal
# slow path) so the moment sums are order-free.
# --------------------------------------------------------------------------

_MOMENTS_ORACLE = f"""
WITH s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {osum('value')} / COUNT(*) AS mu
  FROM events GROUP BY event_type
),
d AS (
  -- m2 widens to the full value domain (integer HUGEINT product of the
  -- 6-dp quantized deviation); d3/d4 carry the MOMENT DOMAIN |d| <= 1e5:
  -- a fourth power at trillion-row scale exceeds 128-bit fixed point
  -- beyond that, so out-of-domain groups report NULL skew/kurtosis
  -- rather than a silently saturated estimate (round-12 magnitude sweep)
  SELECT e.event_type, s.n, s.mu,
         {oqprod('e.value - s.mu', 'e.value - s.mu')} AS d2q,
         CASE WHEN abs(e.value - s.mu) <= 100000.0 THEN
           CAST(FLOOR((e.value - s.mu) * (e.value - s.mu) * (e.value - s.mu)
                      * 1000.0 + 0.5) AS BIGINT) END AS d3q,
         CASE WHEN abs(e.value - s.mu) <= 100000.0 THEN
           CAST(FLOOR((e.value - s.mu) * (e.value - s.mu) * (e.value - s.mu)
                      * (e.value - s.mu) * 100.0 + 0.5) AS BIGINT) END AS d4q,
         abs(e.value - s.mu) > 100000.0 AS oob
  FROM events e JOIN s ON s.event_type = e.event_type
),
m AS (
  SELECT event_type, n, mu,
         {ohuge_dbl('SUM(d2q)')} / 1000000000000.0 / n AS m2,
         {ohuge_dbl('SUM(d3q)')} / 1000.0 / n AS m3,
         {ohuge_dbl('SUM(d4q)')} / 100.0 / n AS m4,
         BOOL_OR(oob) AS any_oob
  FROM d GROUP BY event_type, n, mu
)
SELECT event_type, n,
       FLOOR(mu * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
       FLOOR(m2 * 1000000.0 + 0.5) / 1000000.0 AS m2,
       CASE WHEN m2 <= 0 OR any_oob THEN NULL
            ELSE FLOOR(m3 / POWER(m2, 1.5) * 1000000.0 + 0.5) / 1000000.0
       END AS skewness,
       CASE WHEN m2 <= 0 OR any_oob THEN NULL
            ELSE FLOOR((m4 / (m2 * m2) - 3.0) * 1000000.0 + 0.5) / 1000000.0
       END AS excess_kurtosis
FROM m
"""


@register("agg_kurtosis_skewness", oracle=_MOMENTS_ORACLE)
def agg_kurtosis_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (dsum("value") / F.count(F.lit(1))).alias("mu"),
    )
    dd = F.col("value") - F.col("mu")
    in_dom = F.abs(dd) <= 100000.0  # the d3/d4 moment domain (see oracle)
    d = ev.join(s, "event_type").select(
        "event_type",
        "n",
        "mu",
        qprod(dd, dd).alias("d2q"),
        F.when(in_dom, F.floor(dd * dd * dd * 1_000.0 + F.lit(0.5)).cast("bigint"))
        .alias("d3q"),
        F.when(
            in_dom,
            F.floor(dd * dd * dd * dd * 100.0 + F.lit(0.5)).cast("bigint"),
        ).alias("d4q"),
        (~in_dom).alias("oob"),
    )
    m = d.groupBy("event_type", "n", "mu").agg(
        (F.sum("d2q").cast("double") / 1_000_000_000_000.0 / F.col("n")).alias("m2"),
        (F.sum(F.col("d3q").cast("decimal(38,0)")).cast("double") / 1_000.0
         / F.col("n")).alias("m3"),
        (F.sum(F.col("d4q").cast("decimal(38,0)")).cast("double") / 100.0
         / F.col("n")).alias("m4"),
        F.max("oob").alias("any_oob"),
    )
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize

    m2 = F.col("m2")
    return m.select(
        "event_type",
        "n",
        q6c(F.col("mu")).alias("mean_value"),
        q6c(m2).alias("m2"),
        F.when(m2 <= 0, F.lit(None).cast("double"))
        .when(F.col("any_oob"), F.lit(None).cast("double"))
        .otherwise(q6c(F.col("m3") / F.pow(m2, 1.5)))
        .alias("skewness"),
        F.when(m2 <= 0, F.lit(None).cast("double"))
        .when(F.col("any_oob"), F.lit(None).cast("double"))
        .otherwise(q6c(F.col("m4") / (m2 * m2) - 3.0))
        .alias("excess_kurtosis"),
    )


# --------------------------------------------------------------------------
# agg_benjamini_hochberg — FDR multiple-testing correction (q = 0.05)
# over the per-metric Mann-Whitney family: converts each metric's z-stat
# to a two-sided p-value via the Abramowitz-Stegun 26.2.17 normal-CDF
# polynomial (textually identical on both engines — neither has erf()
# parity), ranks the p-values, and applies the BH step-up rule
# k* = max{k : p(k) ≤ k·q/m}, rejecting every p ≤ the k*-th.  This is
# the guardrail that makes the repo's per-metric test family honest when
# many metrics are screened at once.  The reference reaches testing only
# as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: the family is the BOUNDED per-metric aggregate (≤ #metrics
# rows) produced by agg_mannwhitney_u's distinct-value rank machinery; the
# ranking window and the 1-row k* broadcast run over that bounded
# relation only (allowlisted / _GLOBAL_WINDOW_OK with justification).
# --------------------------------------------------------------------------

_BH_Q = "0.05"
# A&S 26.2.17 constants, shared literals
_AS_B = ("0.319381530", "-0.356563782", "1.781477937", "-1.821255978",
         "1.330274429")
_AS_P = "0.2316419"
_INV_SQRT_2PI = "0.3989422804014327"


def _phi_tail_sql(x: str) -> str:
    """Upper-tail 1−Φ(x) for x ≥ 0 — A&S 26.2.17, textual SQL."""
    t = f"(1.0 / (1.0 + {_AS_P} * ({x})))"
    poly = (f"({_AS_B[0]} * {t} + {_AS_B[1]} * {t} * {t}"
            f" + {_AS_B[2]} * {t} * {t} * {t}"
            f" + {_AS_B[3]} * {t} * {t} * {t} * {t}"
            f" + {_AS_B[4]} * {t} * {t} * {t} * {t} * {t})")
    return f"({_INV_SQRT_2PI} * EXP(-(({x}) * ({x})) / 2.0) * {poly})"


@register("agg_benjamini_hochberg",
          oracle=f"""
WITH fam AS ({_MWU_ORACLE}),
p AS (
  SELECT event_type, z_stat,
         CASE WHEN z_stat IS NULL THEN NULL
              ELSE FLOOR(LEAST(2.0 * {_phi_tail_sql('ABS(z_stat)')}, 1.0)
                         * 1000000.0 + 0.5) / 1000000.0
         END AS p_value
  FROM fam
),
r AS (
  SELECT event_type, z_stat, p_value,
         CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type) AS BIGINT)
           AS rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM p WHERE p_value IS NOT NULL
),
k AS (
  SELECT COALESCE(MAX(CASE WHEN p_value <= rank * {_BH_Q} / m
                           THEN rank END), 0) AS kstar
  FROM r
)
SELECT r.event_type, r.z_stat, r.p_value, r.rank,
       FLOOR(r.rank * {_BH_Q} / r.m * 1000000.0 + 0.5) / 1000000.0
         AS bh_threshold,
       r.rank <= k.kstar AS rejected
FROM r CROSS JOIN k
""")
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Checkpoint the bounded (≤ #metrics-row) MWU family: without the cut,
    # projection collapse inlines the giant distinct-rank z_stat expression
    # into every A&S polynomial term below, blowing the generated
    # hash-aggregate method past janino's 64 KB limit (interpreted
    # fallback, ~5× slower — round-12 verdict P1).
    fam = agg_mannwhitney_u(spark, sf_dir).localCheckpoint(eager=False)
    x = F.abs(F.col("z_stat"))
    t = 1.0 / (1.0 + float(_AS_P) * x)
    poly = (
        float(_AS_B[0]) * t
        + float(_AS_B[1]) * t * t
        + float(_AS_B[2]) * t * t * t
        + float(_AS_B[3]) * t * t * t * t
        + float(_AS_B[4]) * t * t * t * t * t
    )
    tail = F.lit(float(_INV_SQRT_2PI)) * F.exp(-(x * x) / 2.0) * poly
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    p = fam.select(
        "event_type",
        "z_stat",
        F.when(F.col("z_stat").isNull(), F.lit(None).cast("double"))
        .otherwise(q6c(F.least(2.0 * tail, F.lit(1.0))))
        .alias("p_value"),
    ).filter(F.col("p_value").isNotNull())
    # Bounded family: ≤ #metrics rows — the global window is justified
    # (same class as ts_funnel's step aggregate; see _GLOBAL_WINDOW_OK).
    w = Window.orderBy("p_value", "event_type")
    r = p.select(
        "event_type",
        "z_stat",
        "p_value",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("m"),
    )
    q = float(_BH_Q)
    # k* as a global-window max over the SAME bounded projection: the
    # Mann-Whitney distinct-rank lineage executes once (the old
    # agg + crossJoin(broadcast) consumed `r` in two uncached branches,
    # running the whole upstream twice — round-12 verdict P1).
    kstar = F.coalesce(
        F.max(
            F.when(
                F.col("p_value") <= F.col("rank") * q / F.col("m"),
                F.col("rank"),
            )
        ).over(Window.partitionBy()),
        F.lit(0),
    )
    return r.select(
        "event_type",
        "z_stat",
        "p_value",
        "rank",
        q6c(F.col("rank") * q / F.col("m")).alias("bh_threshold"),
        (F.col("rank") <= kstar).alias("rejected"),
    )


# --------------------------------------------------------------------------
# agg_lorenz_curve — decile Lorenz points per metric: for each decile d,
# the share of total value held by the bottom d/10 of observations — the
# curve behind agg_gini_coefficient (and the per-decile readout
# dashboards actually plot).  Tied runs interpolate value-proportionally
# inside the run, so the curve is well-defined without any per-row order.
#
# Scale shape (the agg_ks_test / mannwhitney discipline): observations
# collapse to the (metric, value) distribution; cumulative counts and
# 1e-6-quantized cumulative value sums run over DISTINCT values only;
# the 10 decile boundary ranks ⌈d·n/10⌉ resolve per value-run with pure
# arithmetic.  The reference reaches inequality analytics only as
# dbt-model SQL (dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH v AS (
  SELECT event_type, value AS val, COUNT(*) AS nv,
         CAST(COUNT(*) AS BIGINT)
           * CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vsumq
  FROM events WHERE value IS NOT NULL AND value >= 0
  GROUP BY event_type, value
),
c AS (
  SELECT event_type, val, nv, vsumq,
         COALESCE(SUM(nv) OVER w, 0) AS cb,
         COALESCE(SUM(vsumq) OVER w, 0) AS cvq,
         SUM(nv) OVER (PARTITION BY event_type) AS n,
         SUM(vsumq) OVER (PARTITION BY event_type) AS tvq
  FROM v
  WINDOW w AS (PARTITION BY event_type ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
d AS (
  SELECT c.event_type, t.d AS decile, c.n, c.tvq,
         c.cvq + (CAST(CEIL(t.d * c.n / 10.0) AS BIGINT) - c.cb)
           * CAST(FLOOR(c.val * 1000000.0 + 0.5) AS BIGINT) AS cumq
  FROM c, generate_series(1, 10) t(d)
  WHERE CAST(CEIL(t.d * c.n / 10.0) AS BIGINT) > c.cb
    AND CAST(CEIL(t.d * c.n / 10.0) AS BIGINT) <= c.cb + c.nv
)
SELECT event_type, CAST(decile AS INT) AS decile,
       FLOOR(CAST(cumq AS DOUBLE) / tvq * 1000000.0 + 0.5) / 1000000.0
         AS value_share
FROM d
"""


@register("agg_lorenz_curve", oracle=_LORENZ_ORACLE)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    vq = F.floor(F.col("val") * 1_000_000.0 + F.lit(0.5)).cast("bigint")
    v = ev.groupBy("event_type", F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("nv")
    ).withColumn("vsumq", F.col("nv").cast("bigint") * vq)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    c = (
        v.withColumn("cb", F.coalesce(F.sum("nv").over(wcum), F.lit(0)))
        .withColumn("cvq", F.coalesce(F.sum("vsumq").over(wcum), F.lit(0)))
        .withColumn("n", F.sum("nv").over(wall))
        .withColumn("tvq", F.sum("vsumq").over(wall))
    )
    deciles = F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile")
    e = c.select("event_type", "val", "nv", "cb", "cvq", "n", "tvq", deciles)
    rank = F.ceil(F.col("decile") * F.col("n") / 10.0).cast("bigint")
    d = e.filter((rank > F.col("cb")) & (rank <= F.col("cb") + F.col("nv")))
    cumq = F.col("cvq") + (rank - F.col("cb")) * vq
    return d.select(
        "event_type",
        F.col("decile").cast("int").alias("decile"),
        (
            F.floor(cumq.cast("double") / F.col("tvq") * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("value_share"),
    )


# --------------------------------------------------------------------------
# agg_weighted_median — weighted order statistics per metric: the median
# and p90 of `value` where each observation carries an engagement weight
# (derived deterministically as user_id % 5 + 1, so both engines weigh
# identical rows identically) — the aggregate a metrics layer needs when
# rows represent unequal populations (sessions, accounts, exposure).
# Weighted k-th statistic = smallest value whose cumulative weight
# reaches ⌈q·W⌉.  The reference reaches weighted stats only as dbt-model
# SQL (dbtoperator.py:273-274).
#
# Scale shape: the mannwhitney/lorenz distinct-value discipline — weights
# collapse to the (metric, value) distribution first; the window runs
# over DISTINCT values; boundary ranks resolve by pure arithmetic on
# exact int64 cumulative weights.
# --------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH v AS (
  SELECT event_type, value AS val,
         CAST(SUM(user_id % 5 + 1) AS BIGINT) AS w
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, value
),
c AS (
  SELECT event_type, val, w,
         COALESCE(SUM(w) OVER (PARTITION BY event_type ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cb,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM v
)
SELECT event_type, CAST(MAX(tw) AS BIGINT) AS total_weight,
       MAX(CASE WHEN cb < CAST(CEIL(0.5 * tw) AS BIGINT)
                 AND cb + w >= CAST(CEIL(0.5 * tw) AS BIGINT)
                THEN val END) AS wmedian,
       MAX(CASE WHEN cb < CAST(CEIL(0.9 * tw) AS BIGINT)
                 AND cb + w >= CAST(CEIL(0.9 * tw) AS BIGINT)
                THEN val END) AS wp90
FROM c GROUP BY event_type
"""


@register("agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.groupBy("event_type", F.col("value").alias("val")).agg(
        F.sum(F.col("user_id") % 5 + 1).cast("bigint").alias("w")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    c = v.withColumn("cb", F.coalesce(F.sum("w").over(wcum), F.lit(0))).withColumn(
        "tw", F.sum("w").over(wall)
    )

    def at_q(q: float):
        rank = F.ceil(F.lit(q) * F.col("tw")).cast("bigint")
        return F.max(
            F.when((F.col("cb") < rank) & (F.col("cb") + F.col("w") >= rank),
                   F.col("val"))
        )

    return c.groupBy("event_type").agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        at_q(0.5).alias("wmedian"),
        at_q(0.9).alias("wp90"),
    )


# --------------------------------------------------------------------------
# agg_pythagorean_means — the full mean family per metric over positive
# values: arithmetic (exact dsum), geometric (exp of the mean of
# 1e-9-quantized ln terms — order-free int64 sum), and harmonic (n over
# the 1e-9-quantized reciprocal sum), plus the AM ≥ GM ≥ HM sanity gap.
# Rate-style metrics average correctly only under the harmonic mean;
# publishing all three next to each other is the standard guard against
# the wrong-mean bug.  The reference reaches mean families only as
# dbt-model SQL (dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PYTH_ORACLE = f"""
WITH t AS (
  -- reciprocal domain: a value below 1e-9 has no representable reciprocal
  -- at the 1e-9 quantize (1/denormal overflows to inf and saturates the
  -- int64 path — round-12 magnitude sweep); such groups report NULL
  -- harmonic mean rather than a saturated one
  SELECT event_type,
         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
         CAST(FLOOR(LN(value) * 1000000000.0 + 0.5) AS BIGINT) AS lnq,
         CASE WHEN value >= 1e-9 THEN
           CAST(FLOOR(1.0 / value * 1000000000.0 + 0.5) AS BIGINT) END AS rq
  FROM events WHERE value > 0
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vq) AS BIGINT) AS sv,
         CAST(SUM(lnq) AS BIGINT) AS sl,
         CAST(SUM(rq) AS BIGINT) AS sr,
         COUNT(*) = COUNT(rq) AS harm_ok
  FROM t GROUP BY event_type
)
SELECT event_type, n,
       FLOOR(CAST(sv AS DOUBLE) / 1000000.0 / n * 1000000.0 + 0.5)
         / 1000000.0 AS mean_arith,
       FLOOR(EXP(CAST(sl AS DOUBLE) / 1000000000.0 / n) * 1000000.0 + 0.5)
         / 1000000.0 AS mean_geom,
       CASE WHEN harm_ok THEN
         FLOOR(n / (CAST(sr AS DOUBLE) / 1000000000.0) * 1000000.0 + 0.5)
           / 1000000.0 END AS mean_harm
FROM s
"""


@register("agg_pythagorean_means", oracle=_PYTH_ORACLE)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    t = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias("vq"),
        F.floor(F.log(F.col("value")) * 1_000_000_000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("lnq"),
        F.when(
            F.col("value") >= 1e-9,  # reciprocal domain (see oracle)
            F.floor(1.0 / F.col("value") * 1_000_000_000.0 + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("rq"),
    )
    s = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vq").cast("bigint").alias("sv"),
        F.sum("lnq").cast("bigint").alias("sl"),
        F.sum("rq").cast("bigint").alias("sr"),
        (F.count(F.lit(1)) == F.count("rq")).alias("harm_ok"),
    )
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    return s.select(
        "event_type",
        "n",
        q6c(F.col("sv").cast("double") / 1_000_000.0 / F.col("n")).alias(
            "mean_arith"
        ),
        q6c(F.exp(F.col("sl").cast("double") / 1_000_000_000.0 / F.col("n"))).alias(
            "mean_geom"
        ),
        F.when(
            F.col("harm_ok"),
            q6c(F.col("n") / (F.col("sr").cast("double") / 1_000_000_000.0)),
        ).alias("mean_harm"),
    )



# --------------------------------------------------------------------------
# profile_json_schema — semi-structured schema census over a JSON event-
# properties column against a CANDIDATE KEY LIST (the practical shape:
# Spark's JSON extractors need foldable paths/patterns, so production
# profilers sweep a declared key set — here k/ua/lat/tags): per key,
# presence count, coverage, raw value TYPE (classified from the
# serialized text with a literal regex per key, so both engines agree
# without a typed JSON extractor), and distinct-value cardinality — the
# drift detector a pipeline runs before trusting get_json_object paths.
# The payload enriches the fixture's uniform props with deterministically
# synthesized optional keys (by event_id residue) to exercise partial
# coverage.
#
# Scale shape: JSON built and the 4-key sweep exploded map-side; one
# keyed aggregate + a 1-row total broadcast (allowlisted).
# --------------------------------------------------------------------------

_JSONPROF_KEYS = ("k", "ua", "lat", "tags")


def _jsonprof_probe_sql(k: str) -> str:
    pat = '"' + k + '":\\s*(.)'
    return (
        f"SELECT '{k}' AS key, "
        f"CASE substr(regexp_extract(j, '{pat}', 1), 1, 1) "
        f"WHEN '\"' THEN 'string' WHEN '[' THEN 'array' "
        f"ELSE 'number' END AS vtype, "
        f"json_extract_string(j, '$.{k}') AS raw "
        f"FROM js WHERE json_extract_string(j, '$.{k}') IS NOT NULL"
    )


_JSONPROF_UNION = " UNION ALL ".join(_jsonprof_probe_sql(k) for k in _JSONPROF_KEYS)

_JSONPROF_ORACLE = f"""
WITH js AS (
  SELECT event_id,
         '{{"k": ' || CAST(event_id % 100 AS VARCHAR)
         || CASE WHEN event_id % 3 = 0
                 THEN ', "ua": "m-' || CAST(event_id % 7 AS VARCHAR) || '"'
                 ELSE '' END
         || CASE WHEN event_id % 5 = 0
                 THEN ', "lat": ' || CAST(event_id % 90 AS VARCHAR) || '.5'
                 ELSE '' END
         || CASE WHEN event_id % 7 = 0
                 THEN ', "tags": ["a", "b"]'
                 ELSE '' END
         || '}}' AS j
  FROM events
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM js),
kv AS ({_JSONPROF_UNION})
SELECT kv.key, kv.vtype,
       CAST(COUNT(*) AS BIGINT) AS n_present,
       FLOOR(COUNT(*) * 1.0 / tot.n * 1000000.0 + 0.5) / 1000000.0
         AS coverage,
       CAST(COUNT(DISTINCT kv.raw) AS BIGINT) AS n_distinct
FROM kv CROSS JOIN tot
GROUP BY kv.key, kv.vtype, tot.n
"""


@register("profile_json_schema", oracle=_JSONPROF_ORACLE)
def profile_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    j = F.concat(
        F.lit('{"k": '),
        (eid % 100).cast("string"),
        F.when(
            eid % 3 == 0,
            F.concat(F.lit(', "ua": "m-'), (eid % 7).cast("string"), F.lit('"')),
        ).otherwise(F.lit("")),
        F.when(
            eid % 5 == 0,
            F.concat(F.lit(', "lat": '), (eid % 90).cast("string"), F.lit(".5")),
        ).otherwise(F.lit("")),
        F.when(eid % 7 == 0, F.lit(', "tags": ["a", "b"]')).otherwise(F.lit("")),
        F.lit("}"),
    )
    js = ev.select(j.alias("j")).localCheckpoint(eager=False)

    tot = js.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def _probe(k: str):
        first_ch = F.substring(
            F.regexp_extract(F.col("j"), '"' + k + '":\\s*(.)', 1), 1, 1
        )
        vtype = (
            F.when(first_ch == '"', "string")
            .when(first_ch == "[", "array")
            .otherwise("number")
        )
        return F.struct(
            F.lit(k).alias("key"),
            vtype.alias("vtype"),
            F.get_json_object(F.col("j"), "$." + k).alias("raw"),
        )

    kv = (
        js.select(F.explode(F.array(*[_probe(k) for k in _JSONPROF_KEYS])).alias("p"))
        .select("p.key", "p.vtype", "p.raw")
        .filter(F.col("raw").isNotNull())
    )
    return (
        kv.crossJoin(F.broadcast(tot))
        .groupBy("key", "vtype", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_present"),
            F.countDistinct("raw").cast("bigint").alias("n_distinct"),
        )
        .select(
            "key",
            "vtype",
            "n_present",
            (
                F.floor(
                    F.col("n_present") * 1.0 / F.col("n") * 1_000_000.0 + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("coverage"),
            "n_distinct",
        )
    )


# --------------------------------------------------------------------------
# agg_price_index — Laspeyres price index by ship-month over lineitem:
# index_t = Σ p_t·q₀ / Σ p₀·q₀ across parts traded in BOTH the base
# month (the corpus' first) and month t, with p = the part's mean unit
# price that month and q₀ its base-month quantity — the inflation-style
# composite every pricing/marketplace team tracks.  The reference
# reaches index math only as dbt-model SQL (dbtoperator.py:273-274).
#
# Determinism: unit prices quantize to 1e-3 int64 units (so the p·q
# products stay int64 with ~5 orders of headroom at fixture scale —
# documented bound: Σ p·q per month must stay < 9e18 milli-units);
# quantities sum exactly (integral doubles); the final ratio passes q6.
# Scale: one (part, month) keyed aggregate; base-month rows join back
# keyed on part; one keyed month rollup; a 1-row base-month broadcast
# (allowlisted).
# --------------------------------------------------------------------------

_PRICE_INDEX_ORACLE = """
WITH pm AS (
  SELECT l_partkey AS part,
         CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS mon,
         CAST(FLOOR({p_expr} * 1000.0 + 0.5) AS BIGINT) AS pq,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  GROUP BY l_partkey, date_trunc('month', CAST(l_shipdate AS DATE))
),
base AS (SELECT MIN(mon) AS mon0 FROM pm),
b AS (
  SELECT pm.part, pm.pq AS p0, pm.qty AS q0
  FROM pm CROSS JOIN base WHERE pm.mon = base.mon0
),
j AS (
  SELECT pm.mon,
         CAST(SUM(pm.pq * b.q0) AS BIGINT) AS num,
         CAST(SUM(b.p0 * b.q0) AS BIGINT) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pm JOIN b ON b.part = pm.part
  GROUP BY pm.mon
)
SELECT CAST(mon AS VARCHAR) AS month, n_common,
       FLOOR(CAST(num AS DOUBLE) / den * 1000000.0 + 0.5) / 1000000.0
         AS laspeyres_index
FROM j
""".format(
    p_expr="(CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))"
    " AS DOUBLE) / 1000000.0 / SUM(l_quantity))"
)


@register("agg_price_index", oracle=_PRICE_INDEX_ORACLE)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    unit_p = (
        F.sum(
            F.floor(F.col("l_extendedprice") * 1_000_000.0 + F.lit(0.5)).cast(
                "bigint"
            )
        ).cast("double")
        / 1_000_000.0
        / F.sum("l_quantity")
    )
    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_trunc("month", F.to_date("l_shipdate")).cast("date").alias("mon"),
    ).agg(
        F.floor(unit_p * 1_000.0 + F.lit(0.5)).cast("bigint").alias("pq"),
        F.sum("l_quantity").cast("bigint").alias("qty"),
    ).localCheckpoint(eager=True)  # base + month branches share one pass
    base = pm.agg(F.min("mon").alias("mon0"))
    b = (
        pm.crossJoin(F.broadcast(base))
        .filter(F.col("mon") == F.col("mon0"))
        .select("part", F.col("pq").alias("p0"), F.col("qty").alias("q0"))
    )
    j = (
        pm.join(b, "part")
        .groupBy("mon")
        .agg(
            F.sum(F.col("pq") * F.col("q0")).cast("bigint").alias("num"),
            F.sum(F.col("p0") * F.col("q0")).cast("bigint").alias("den"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
    )
    return j.select(
        F.col("mon").cast("string").alias("month"),
        "n_common",
        (
            F.floor(F.col("num").cast("double") / F.col("den") * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("laspeyres_index"),
    )


# --------------------------------------------------------------------------
# agg_theil_decomposition — the property that justified choosing Theil
# over Gini (agg_theil_index's docstring): total inequality over ALL
# positive values splits EXACTLY into within-group and between-group
# components across event types — T_total = Σ s_g·T_g + Σ s_g·ln(μ_g/μ),
# s_g = group value share.  The decomposition answers "is the inequality
# inside metrics or between them?", which the per-metric index cannot.
#
# Determinism: all means derive from util.dsum-style exact int64 value
# sums; every ln term quantizes to 1e-9 int64 before its (bounded or
# keyed) sum; the identity check (total − within − between) is itself an
# output column, so the oracle hash PINS the decomposition property.
# Scale: one stats pass per group + one global row; per-row term pass
# joins the O(#groups) stats back keyed.
# --------------------------------------------------------------------------

_THEIL_DECOMP_ORACLE = """
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS svq
  FROM events WHERE value > 0 GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(svq) AS BIGINT) AS tvq FROM g
),
terms AS (
  SELECT e.event_type,
         -- underflow-to-zero ratios guard LN (x·ln x -> 0; DuckDB LN(0)
         -- errors where Spark NULLs — round-12 magnitude sweep)
         CASE WHEN e.value / (g.svq / 1000000.0 / g.n) > 0 THEN
           CAST(FLOOR((e.value / (g.svq / 1000000.0 / g.n))
                * LN(e.value / (g.svq / 1000000.0 / g.n))
                * 1000000000.0 + 0.5) AS BIGINT) END AS wq,
         CASE WHEN e.value / (tot.tvq / 1000000.0 / tot.nn) > 0 THEN
           CAST(FLOOR((e.value / (tot.tvq / 1000000.0 / tot.nn))
                * LN(e.value / (tot.tvq / 1000000.0 / tot.nn))
                * 1000000000.0 + 0.5) AS BIGINT) END AS tq
  FROM events e
  JOIN g ON g.event_type = e.event_type
  CROSS JOIN tot
  WHERE e.value > 0
),
gt AS (
  SELECT t.event_type,
         CAST(SUM(t.wq) AS BIGINT) AS swq,
         CAST(SUM(t.tq) AS BIGINT) AS stq
  FROM terms t GROUP BY t.event_type
),
parts AS (
  SELECT gt.event_type,
         (CAST(g.svq AS DOUBLE) / tot.tvq)
           * (gt.swq / 1000000000.0 / g.n) AS within_part,
         (CAST(g.svq AS DOUBLE) / tot.tvq)
           * LN((g.svq / 1000000.0 / g.n) / (tot.tvq / 1000000.0 / tot.nn))
           AS between_part,
         gt.stq / 1000000000.0 / tot.nn AS total_part
  FROM gt JOIN g ON g.event_type = gt.event_type CROSS JOIN tot
)
SELECT FLOOR(SUM(total_part) * 1000000.0 + 0.5) / 1000000.0 AS theil_total,
       FLOOR(SUM(within_part) * 1000000.0 + 0.5) / 1000000.0 AS theil_within,
       FLOOR(SUM(between_part) * 1000000.0 + 0.5) / 1000000.0 AS theil_between,
       FLOOR((SUM(total_part) - SUM(within_part) - SUM(between_part))
             * 1000000.0 + 0.5) / 1000000.0 AS identity_gap
FROM parts
"""


@register("agg_theil_decomposition", oracle=_THEIL_DECOMP_ORACLE)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("svq"),
    ).localCheckpoint(eager=True)  # stats reused by terms + parts
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("svq").cast("bigint").alias("tvq"),
    )
    q9 = lambda c: F.floor(c * 1_000_000_000.0 + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    mu_g = F.col("svq") / 1_000_000.0 / F.col("n")
    mu = F.col("tvq") / 1_000_000.0 / F.col("nn")
    terms = (
        ev.join(g, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            q9((F.col("value") / mu_g) * F.log(F.col("value") / mu_g)).alias("wq"),
            q9((F.col("value") / mu) * F.log(F.col("value") / mu)).alias("tq"),
        )
    )
    gt = terms.groupBy("event_type").agg(
        F.sum("wq").cast("bigint").alias("swq"),
        F.sum("tq").cast("bigint").alias("stq"),
    )
    parts = (
        gt.join(g, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("svq").cast("double") / F.col("tvq"))
                * (F.col("swq") / 1_000_000_000.0 / F.col("n"))
            ).alias("within_part"),
            (
                (F.col("svq").cast("double") / F.col("tvq")) * F.log(mu_g / mu)
            ).alias("between_part"),
            (F.col("stq") / 1_000_000_000.0 / F.col("nn")).alias("total_part"),
        )
    )
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    return parts.agg(
        q6c(F.sum("total_part")).alias("theil_total"),
        q6c(F.sum("within_part")).alias("theil_within"),
        q6c(F.sum("between_part")).alias("theil_between"),
        q6c(
            F.sum("total_part") - F.sum("within_part") - F.sum("between_part")
        ).alias("identity_gap"),
    )


# --------------------------------------------------------------------------
# agg_simpson_diversity — Simpson concentration/diversity per facet pair:
# λ = Σ p_i² over the (lang, source) cell distribution, diversity
# 1 − λ, and the effective category count 1/λ — the "how many sources do
# we REALLY have" readout published next to the entropy-based mix
# metrics (entropy weighs rare tails; Simpson weighs dominance).
#
# Determinism: cell counts exact int64; λ = Σ c² / N² computed from
# exact integer squares (c² ≤ N² fits int64 through N ~ 3e9 cells-worth
# of rows; documented bound), q6 outputs.  Scale: one keyed cell
# aggregate + one 1-row rollup.
# --------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
),
s AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS ss,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cells
)
SELECT n, n_cells,
       FLOOR(CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * n) * 1000000.0 + 0.5)
         / 1000000.0 AS simpson_lambda,
       FLOOR((1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * n))
             * 1000000.0 + 0.5) / 1000000.0 AS simpson_diversity,
       FLOOR((CAST(n AS DOUBLE) * n) / ss * 1000000.0 + 0.5) / 1000000.0
         AS effective_categories
FROM s
"""


@register("agg_simpson_diversity", oracle=_SIMPSON_ORACLE)
def agg_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    nn = F.col("n").cast("double") * F.col("n")
    from nedp_etl_spark.util import q6 as q6c  # saturation-guarded quantize
    return s.select(
        "n",
        "n_cells",
        q6c(F.col("ss").cast("double") / nn).alias("simpson_lambda"),
        q6c(1.0 - F.col("ss").cast("double") / nn).alias("simpson_diversity"),
        q6c(nn / F.col("ss")).alias("effective_categories"),
    )


# --------------------------------------------------------------------------
# agg_cuped — CUPED variance reduction for A/B readouts (Deng et al. 2013,
# "Improving the Sensitivity of Online Controlled Experiments"): the
# industry-standard pre-period adjustment.  Each user's post-period metric
# is shifted by theta * (pre - mean(pre)) with theta = cov(pre, post) /
# var(pre) POOLED across arms; the adjusted means compare arms with
# var_reduction = rho^2 of (pre, post) less noise.  Completes the
# experiment-tooling family (agg_ab_ztest, agg_power_analysis,
# agg_diff_in_diff, agg_delta_method_ci, agg_bootstrap_ci).
#
# Exactness: per-user pre/post sums quantize to int64 micros; the pooled
# moment sums accumulate as decimal(38,0)/HUGEINT (per-row products sit
# near 2^61 — int64 sums would overflow; #users rows make decimal cost
# irrelevant, and a 100 TB user count would switch to the corr_matrix
# two-phase limb pattern, noted here deliberately); theta quantizes to
# 1e-6 before the per-user adjustment; each user's adjusted metric
# re-quantizes to int64 micros before the per-arm mean (no double
# summation-order noise).  rho^2 squares exact integers in DOUBLE (the
# corr() pattern — squaring first would overflow even HUGEINT).
# Reference parity: experiment SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16 00:00:00"

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                  THEN CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS pre_q,
         SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                  THEN CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS post_q
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(pre_q AS HUGEINT)) AS s_pre,
         SUM(CAST(post_q AS HUGEINT)) AS s_post,
         SUM(CAST(pre_q AS HUGEINT) * pre_q) AS s_pp,
         SUM(CAST(pre_q AS HUGEINT) * post_q) AS s_pq,
         SUM(CAST(post_q AS HUGEINT) * post_q) AS s_qq
  FROM per_user
),
th AS (
  SELECT n, s_pre,
         CASE WHEN n * s_pp - s_pre * s_pre > 0 THEN
           FLOOR((CAST(n AS DOUBLE) * CAST(s_pq AS DOUBLE)
                  - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE)
                    - CAST(s_pre AS DOUBLE) * CAST(s_pre AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0
         ELSE 0.0 END AS theta,
         CASE WHEN n * s_pp - s_pre * s_pre > 0
               AND n * s_qq - s_post * s_post > 0 THEN
           FLOOR((CAST(n AS DOUBLE) * CAST(s_pq AS DOUBLE)
                  - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(s_pq AS DOUBLE)
                    - CAST(s_pre AS DOUBLE) * CAST(s_post AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE)
                     - CAST(s_pre AS DOUBLE) * CAST(s_pre AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE)
                       - CAST(s_post AS DOUBLE) * CAST(s_post AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0
         ELSE 0.0 END AS rho2
  FROM tot
),
adj AS (
  SELECT u.arm, u.post_q,
         CAST(FLOOR(CAST(u.post_q AS DOUBLE)
                    - t.theta * (CAST(u.pre_q AS DOUBLE)
                                 - CAST(t.s_pre AS DOUBLE)
                                   / CAST(t.n AS DOUBLE))
                    + 0.5) AS BIGINT) AS adj_q,
         t.theta, t.rho2
  FROM per_user u CROSS JOIN th t
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       FLOOR(CAST(SUM(post_q) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0
         AS mean_post,
       FLOOR(CAST(SUM(adj_q) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0
         AS mean_adj,
       theta, rho2
FROM adj GROUP BY arm, theta, rho2
"""


@register("agg_cuped", oracle=_CUPED_ORACLE)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    q = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, q).otherwise(0)).alias("pre_q"),
        F.sum(F.when(F.col("ts") >= cut, q).otherwise(0)).alias("post_q"),
    ).select(
        (F.col("user_id") % 2).alias("arm"), "pre_q", "post_q"
    ).localCheckpoint(eager=False)  # feeds the totals AND the per-user adj
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("pre_q")).alias("s_pre"),
        F.sum(dec("post_q")).alias("s_post"),
        F.sum(dec("pre_q") * F.col("pre_q")).alias("s_pp"),
        F.sum(dec("pre_q") * F.col("post_q")).alias("s_pq"),
        F.sum(dec("post_q") * F.col("post_q")).alias("s_qq"),
    )
    nd = F.col("n").cast("double")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    num = nd * dbl("s_pq") - dbl("s_pre") * dbl("s_post")
    dx = F.col("n") * F.col("s_pp") - F.col("s_pre") * F.col("s_pre")
    dy = F.col("n") * F.col("s_qq") - F.col("s_post") * F.col("s_post")
    q6 = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    th = tot.select(
        "n",
        "s_pre",
        F.when(dx > 0, q6(num / (nd * dbl("s_pp") - dbl("s_pre") * dbl("s_pre"))))
        .otherwise(0.0)
        .alias("theta"),
        F.when(
            (dx > 0) & (dy > 0),
            q6(
                num * num
                / (
                    (nd * dbl("s_pp") - dbl("s_pre") * dbl("s_pre"))
                    * (nd * dbl("s_qq") - dbl("s_post") * dbl("s_post"))
                )
            ),
        )
        .otherwise(0.0)
        .alias("rho2"),
    )
    adj = per_user.crossJoin(F.broadcast(th)).select(
        "arm",
        "post_q",
        F.floor(
            F.col("post_q").cast("double")
            - F.col("theta")
            * (
                F.col("pre_q").cast("double")
                - F.col("s_pre").cast("double") / F.col("n").cast("double")
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("adj_q"),
        "theta",
        "rho2",
    )
    return adj.groupBy("arm", "theta", "rho2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.floor(F.sum("post_q").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
         / 1_000_000.0).alias("mean_post"),
        (F.floor(F.sum("adj_q").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
         / 1_000_000.0).alias("mean_adj"),
    ).select("arm", "n_users", "mean_post", "mean_adj", "theta", "rho2")


# --------------------------------------------------------------------------
# agg_msprt — always-valid sequential A/B monitoring (the mixture
# sequential probability ratio test of Johari, Koomen, Pekelis & Walsh
# 2017, "Peeking at A/B Tests": the always-valid p-value lets an
# experiment dashboard be read EVERY day without inflating false
# positives — the peeking-safe companion to agg_ab_ztest's fixed-horizon
# readout).  Per calendar day d, the cumulative per-arm moments give the
# mean difference and its variance; the normal-mixture likelihood ratio
#     Λ_d = sqrt(se² / (se² + τ)) · exp(δ̂² τ / (2 se² (se² + τ)))
# yields p_d = min over days ≤ d of 1/Λ (monotone by construction).
#
# Scale shape: one keyed (day, arm) aggregate over the corpus; everything
# after runs on the ≤ #days-row daily relation — the cumulative frames
# are calendar-bounded global windows (allowlisted, the
# ts_new_vs_returning precedent).  Exactness: int64 micro sums; Λ and p
# in double from exact integers, q6 via the shared FLOOR idiom; the
# running min is exact on q6 values.
# Reference parity: experiment SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_MSPRT_TAU = "10000.0"  # effect-size prior variance, metric-scale (values ~10^1)

_MSPRT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS s,
         SUM(CAST(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS ss
  FROM events GROUP BY 1, 2
),
byday AS (
  SELECT day,
         SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n_t,
         SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS n_c,
         SUM(CASE WHEN arm = 1 THEN s ELSE 0 END) AS s_t,
         SUM(CASE WHEN arm = 0 THEN s ELSE 0 END) AS s_c,
         SUM(CASE WHEN arm = 1 THEN ss ELSE 0 END) AS ss_t,
         SUM(CASE WHEN arm = 0 THEN ss ELSE 0 END) AS ss_c
  FROM daily GROUP BY day
),
cum AS (
  SELECT day,
         SUM(n_t) OVER w AS n_t, SUM(n_c) OVER w AS n_c,
         SUM(s_t) OVER w AS s_t, SUM(s_c) OVER w AS s_c,
         SUM(ss_t) OVER w AS ss_t, SUM(ss_c) OVER w AS ss_c
  FROM byday
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stats AS (
  SELECT day, n_t, n_c,
         CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) / 1000000.0
           - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) / 1000000.0 AS delta,
         ((CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)
             / CAST(n_t AS DOUBLE))
          + (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)
             / CAST(n_c AS DOUBLE)))
         / CAST(n_t + n_c - 2 AS DOUBLE) / 1e12 AS s2
  FROM cum WHERE n_t >= 2 AND n_c >= 2
),
lr AS (
  SELECT day, n_t, n_c,
         FLOOR(delta * 1000000.0 + 0.5) / 1000000.0 AS delta,
         s2 * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)) AS se2
  FROM stats
),
av AS (
  SELECT day, n_t, n_c, delta,
         LEAST(sqrt(se2 / (se2 + {_MSPRT_TAU}))
           * exp(LEAST(delta * delta * {_MSPRT_TAU}
                 / (2.0 * se2 * (se2 + {_MSPRT_TAU})), 700.0)), 1e12) AS lam
  FROM lr
)
SELECT day, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c, delta,
       FLOOR(lam * 1000000.0 + 0.5) / 1000000.0 AS mixture_lr,
       MIN(FLOOR(LEAST(1.0, 1.0 / lam) * 1000000.0 + 0.5) / 1000000.0)
         OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS always_valid_p
FROM av
"""


@register("agg_msprt", oracle=_MSPRT_ORACLE)
def agg_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.col("user_id") % 2).alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).alias("s"),
        # per-row q² sits near 1e18 (int64-safe); the SUM does not — day
        # aggregates and the cumulative frame accumulate in decimal(38,0)
        # (#days rows, BigDecimal cost irrelevant)
        F.sum(q.cast("decimal(38,0)") * q.cast("decimal(38,0)")).alias("ss"),
    )
    arm = lambda c, a: F.sum(F.when(F.col("arm") == a, F.col(c)).otherwise(0))  # noqa: E731
    byday = daily.groupBy("day").agg(
        arm("n", 1).alias("n_t"), arm("n", 0).alias("n_c"),
        arm("s", 1).alias("s_t"), arm("s", 0).alias("s_c"),
        arm("ss", 1).alias("ss_t"), arm("ss", 0).alias("ss_c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = byday.select(
        "day",
        *[F.sum(c).over(w).alias(c) for c in ("n_t", "n_c", "s_t", "s_c", "ss_t", "ss_c")],
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    stats = cum.filter((F.col("n_t") >= 2) & (F.col("n_c") >= 2)).select(
        "day", "n_t", "n_c",
        (d("s_t") / d("n_t") / 1e6 - d("s_c") / d("n_c") / 1e6).alias("delta_raw"),
        (
            ((d("ss_t") - d("s_t") * d("s_t") / d("n_t"))
             + (d("ss_c") - d("s_c") * d("s_c") / d("n_c")))
            / (F.col("n_t") + F.col("n_c") - 2).cast("double") / 1e12
        ).alias("s2"),
    )
    tau = F.lit(float(_MSPRT_TAU))
    q6 = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    lr = stats.select(
        "day", "n_t", "n_c",
        q6(F.col("delta_raw")).alias("delta"),
        (F.col("s2") * (1.0 / d("n_t") + 1.0 / d("n_c"))).alias("se2"),
    ).filter(
        # a day with zero pooled variance (e.g. all-NULL or constant values
        # after dirty-data drops) carries no evidence and would divide by
        # zero in the mixture LR — the monitor simply has nothing to update
        F.col("se2") > 0
    )
    # exponent capped at 700 (exp overflow) and lam at 1e12 — identical
    # caps in the oracle; past either cap the always-valid p is 0 anyway
    lam = F.least(
        F.sqrt(F.col("se2") / (F.col("se2") + tau))
        * F.exp(
            F.least(
                F.col("delta") * F.col("delta") * tau
                / (2.0 * F.col("se2") * (F.col("se2") + tau)),
                F.lit(700.0),
            )
        ),
        F.lit(1e12),
    )
    av = lr.select(
        "day",
        F.col("n_t").cast("bigint").alias("n_t"),
        F.col("n_c").cast("bigint").alias("n_c"),
        "delta",
        lam.alias("lam"),
    )
    pmin = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return av.select(
        "day", "n_t", "n_c", "delta",
        q6(F.col("lam")).alias("mixture_lr"),
        F.min(q6(F.least(F.lit(1.0), 1.0 / F.col("lam")))).over(pmin)
        .alias("always_valid_p"),
    )


# --------------------------------------------------------------------------
# agg_shapley_attribution — data-driven multi-touch attribution by exact
# Shapley values (Shapley 1953 applied to conversion paths — the "data-
# driven attribution" model of ad platforms, vs ts_attribution's
# first/last-touch rules): channels are the non-purchase event types, a
# user's path is the SET of channels touched (a bitmask), v(S) = the
# conversion rate of users whose path ⊆ S, and each channel's credit is
#   φ_b = Σ_{S ∌ b} |S|!(k-1-|S|)!/k! · (v(S∪{b}) − v(S)).
#
# Scale shape: corpus-sized work is ONE user aggregate (path bitmask +
# converted flag); everything after runs on model-sized relations — the
# ≤2^k path-mask table, the 2^k subset spine, and k channels (k = distinct
# channels, bounded by the event vocabulary, NOT the corpus).  The
# subset-containment and channel-subset joins are bitmask theta joins on
# those tiny relations (allowlisted).
#
# Exactness: v quantizes to 1e-9 ints; Shapley sums run entirely in
# integer arithmetic — Σ (vq(S∪b) − vq(S))·|S|!·(k-1-|S|)! — and divide
# by k! only at the final q6 readout.  Efficiency property
# Σφ = v(full) − v(∅) holds exactly on the quantized values (planted
# test pins hand-computed φ including a negative credit).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SHAPLEY_ORACLE = """
WITH rk AS (
  SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INT) AS b
  FROM (SELECT DISTINCT event_type FROM events WHERE event_type <> 'purchase')
),
kk AS (SELECT CAST(COUNT(*) AS INT) AS k FROM rk),
firstp AS (
  SELECT user_id, MIN(ts) AS fp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
paths AS (
  SELECT e.user_id,
         bit_or(CASE WHEN r.b IS NOT NULL
                      AND (f.fp IS NULL OR e.ts < f.fp)
                     THEN (CAST(1 AS BIGINT) << r.b) ELSE 0 END) AS mask,
         MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events e
  LEFT JOIN rk r ON r.event_type = e.event_type
  LEFT JOIN firstp f ON f.user_id = e.user_id
  GROUP BY e.user_id
),
pm AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c
  FROM paths WHERE mask > 0 GROUP BY mask
),
subsets AS (
  -- fixed 0..255 spine filtered to 2^k: generate_series cannot reference
  -- a lateral column, and k <= 8 is bounded by the channel vocabulary
  SELECT CAST(m.m AS BIGINT) AS m
  FROM generate_series(0, 255) m(m), kk
  WHERE m.m < CAST(pow(2, kk.k) AS BIGINT)
),
v AS (
  SELECT s.m,
         CAST(FLOOR(COALESCE(SUM(p.c) * 1.0 / NULLIF(SUM(p.n), 0), 0.0)
                    * 1000000000.0 + 0.5) AS BIGINT) AS vq
  FROM subsets s LEFT JOIN pm p ON (p.mask & s.m) = p.mask
  GROUP BY s.m
),
terms AS (
  SELECT r.event_type,
         (v1.vq - v0.vq)
           * factorial(bit_count(v0.m)) * factorial(k.k - 1 - bit_count(v0.m))
           AS t
  FROM rk r CROSS JOIN kk k
  JOIN v v0 ON (v0.m & (CAST(1 AS BIGINT) << r.b)) = 0
  JOIN v v1 ON v1.m = v0.m | (CAST(1 AS BIGINT) << r.b)
),
expo AS (
  SELECT r.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_exposed,
         FLOOR(SUM(p.conv) * 1.0 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
           AS conv_rate_exposed
  FROM rk r JOIN paths p ON (p.mask & (CAST(1 AS BIGINT) << r.b)) <> 0
  GROUP BY r.event_type
)
SELECT t.event_type AS channel,
       FLOOR(SUM(t.t) * 1.0 / factorial(k.k) / 1000000000.0 * 1000000.0 + 0.5)
         / 1000000.0 AS shapley,
       e.n_exposed, e.conv_rate_exposed
FROM terms t CROSS JOIN kk k
JOIN expo e ON e.event_type = t.event_type
GROUP BY t.event_type, k.k, e.n_exposed, e.conv_rate_exposed
"""


@register("agg_shapley_attribution", oracle=_SHAPLEY_ORACLE)
def agg_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    rk = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .withColumn(
            "b",
            (F.row_number().over(Window.orderBy("event_type")) - 1).cast("int"),
        )
        # k-row channel dictionary feeding four downstream branches
        .localCheckpoint(eager=False)
    )
    kk = rk.agg(F.count(F.lit(1)).cast("int").alias("k"))
    # shiftleft takes a literal count in the Python API — column-valued
    # shifts via expr() (the llm_bloom_dedup precedent)
    bit = F.expr("shiftleft(1L, b)")
    firstp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    # attribution window: only channels touched BEFORE the user's first
    # purchase count toward the path (never-purchasers keep the full path)
    paths = (
        ev.join(rk, "event_type", "left")
        .join(firstp, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.bit_or(
                F.when(
                    F.col("b").isNotNull()
                    & (F.col("fp").isNull() | (F.col("ts") < F.col("fp"))),
                    bit,
                ).otherwise(0)
            ).alias("mask"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            ),
        )
        .localCheckpoint(eager=False)  # feeds pm and the exposure readout
    )
    pm = (
        paths.filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("conv").cast("bigint").alias("c"),
        )
    )
    subsets = kk.select(
        F.explode(F.sequence(F.lit(0), F.expr("shiftleft(1, k) - 1"))).alias("m0x")
    ).select(F.col("m0x").cast("bigint").alias("m"))
    v = (
        subsets.join(pm, pm["mask"].bitwiseAND(subsets["m"]) == pm["mask"], "left")
        .groupBy("m")
        .agg(
            F.floor(
                F.coalesce(
                    F.sum("c") * 1.0 / F.nullif(F.sum("n"), F.lit(0)), F.lit(0.0)
                )
                * 1_000_000_000.0
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("vq")
        )
        .localCheckpoint(eager=False)  # both sides of the term join
    )
    v0 = v.select(F.col("m").alias("m0"), F.col("vq").alias("vq0"))
    v1 = v.select(F.col("m").alias("m1"), F.col("vq").alias("vq1"))
    rbit = F.expr("shiftleft(1L, b)")
    terms = (
        rk.crossJoin(F.broadcast(kk))
        .join(v0, F.col("m0").bitwiseAND(rbit) == 0)
        .join(v1, F.col("m1") == F.col("m0").bitwiseOR(rbit))
        .select(
            "event_type",
            "k",
            (
                (F.col("vq1") - F.col("vq0"))
                * F.factorial(F.bit_count("m0"))
                * F.factorial(F.col("k") - 1 - F.bit_count("m0"))
            ).alias("t"),
        )
    )
    expo = (
        rk.join(paths, paths["mask"].bitwiseAND(rbit) != 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exposed"),
            (
                F.floor(
                    F.sum("conv") * 1.0 / F.count(F.lit(1)) * 1_000_000.0 + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("conv_rate_exposed"),
        )
    )
    return (
        terms.groupBy("event_type", "k")
        .agg(F.sum("t").alias("st"))
        .select(
            F.col("event_type").alias("channel"),
            (
                F.floor(
                    F.col("st") * 1.0 / F.factorial("k") / 1_000_000_000.0
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("shapley"),
        )
        .join(expo.withColumnRenamed("event_type", "channel"), "channel")
    )


# --------------------------------------------------------------------------
# agg_anova_f — one-way ANOVA omnibus F-test across event-type groups
# (Fisher 1925): does mean(value) differ across ANY of the k event types?
# Generalizes agg_welch_ttest's two-arm comparison to the k-group omnibus
# question, with eta² effect size (the "is the difference practically
# meaningful" companion every A/B readout needs before pairwise drilldown).
#
# Scale shape: ONE balanced keyed aggregate over the corpus (k sufficient-
# stat rows: n, Σx at decimal(25,6), Σx² at decimal(36,12)); the global
# combine runs on those k rows.  No windows, no second corpus pass.
#
# Parity discipline: per-group ratio terms (Σx²/n forms) quantize to 1e-6
# fixed-point BEFORE the cross-group sum (k doubles summed in engine order
# would differ in the low bits); every downstream expression is textually
# identical IEEE arithmetic on both engines.  Degenerate inputs (k < 2,
# N ≤ k, zero within-group variance) yield NULL via guards on exact values.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS sx,
         -- qprod floor-micro product (round-12 idiom): exact int128
         -- squares; DuckDB's DECIMAL(18) multiply overflows at ~1e9
         SUM((CAST(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT))) AS sxx
  FROM events GROUP BY event_type
),
t AS (
  -- varchar-route conversions (internal int128 beyond 2^63 double-rounds)
  SELECT n, sx, CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS sxxd FROM g
),
c AS (
  -- group squared-sum terms are int64-quantize-exact only below 9.2e12;
  -- out-of-range groups (one extreme value suffices) flip exact_ok and
  -- the statistics report NULL instead of a saturated estimate
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(sx) AS DOUBLE) AS sxt,
         BOOL_AND(abs(sxd * sxd / n) < 9.2e12
                  AND abs(sxxd - sxd * sxd / n) < 9.2e12) AS exact_ok,
         CAST(SUM(CASE WHEN abs(sxd * sxd / n) < 9.2e12 THEN
              CAST(FLOOR((sxd * sxd / n) * 1000000.0 + 0.5) AS BIGINT) END)
              AS DOUBLE) / 1000000.0 AS b_sum,
         CAST(SUM(CASE WHEN abs(sxxd - sxd * sxd / n) < 9.2e12 THEN
              CAST(FLOOR((sxxd - sxd * sxd / n) * 1000000.0 + 0.5)
                       AS BIGINT) END) AS DOUBLE) / 1000000.0 AS ssw
  FROM t
),
f AS (
  SELECT k, nt, exact_ok,
         CASE WHEN exact_ok THEN ssw END AS ssw,
         CASE WHEN exact_ok
              AND abs(b_sum - sxt * sxt / nt) < 9.2e12 THEN
           FLOOR((b_sum - sxt * sxt / nt) * 1000000.0 + 0.5)
             / 1000000.0 END AS ssb
  FROM c
)
SELECT k AS k_groups, nt AS n_total,
       ssb AS ss_between, ssw AS ss_within,
       CASE WHEN k > 1 AND nt > k AND ssw > 0
            THEN FLOOR((ssb / (k - 1)) / (ssw / (nt - k)) * 1000000.0 + 0.5)
                 / 1000000.0 END AS f_stat,
       CASE WHEN ssb + ssw > 0
            THEN FLOOR(ssb / (ssb + ssw) * 1000000.0 + 0.5) / 1000000.0
       END AS eta_sq
FROM f
"""


@register("agg_anova_f", oracle=_ANOVA_ORACLE)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dec25 = F.col("value").cast("decimal(25,6)")
    dec18 = F.col("value").cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec25).alias("sx"),
        F.sum(qprod(F.col("value"), F.col("value"))).alias("sxx"),
    )
    t = g.select(
        "n",
        "sx",
        F.col("sx").cast("double").alias("sxd"),
        (F.col("sxx").cast("double") / 1_000_000_000_000.0).alias("sxxd"),
    )
    b_term = F.col("sxd") * F.col("sxd") / F.col("n")
    w_term = F.col("sxxd") - b_term
    _BND = 9.2e12  # int64 quantize bound — see the oracle's exact_ok note
    c = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("sx").cast("double").alias("sxt"),
        F.min((F.abs(b_term) < _BND) & (F.abs(w_term) < _BND)).alias("exact_ok"),
        (
            F.sum(
                F.when(
                    F.abs(b_term) < _BND,
                    F.floor(b_term * 1_000_000.0 + F.lit(0.5)).cast("bigint"),
                )
            )
            .cast("double")
            / 1_000_000.0
        ).alias("b_sum"),
        (
            F.sum(
                F.when(
                    F.abs(w_term) < _BND,
                    F.floor(w_term * 1_000_000.0 + F.lit(0.5)).cast("bigint"),
                )
            ).cast("double")
            / 1_000_000.0
        ).alias("ssw"),
    )
    k, nt = F.col("k"), F.col("nt")
    ssb_raw = F.col("b_sum") - F.col("sxt") * F.col("sxt") / nt
    f = c.select(
        k,
        nt,
        F.when(F.col("exact_ok"), F.col("ssw")).alias("ssw"),
        F.when(
            F.col("exact_ok") & (F.abs(ssb_raw) < _BND),
            F.floor(ssb_raw * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("ssb"),
    )
    ssw = F.col("ssw")
    ssb = F.col("ssb")
    return f.select(
        k.alias("k_groups"),
        nt.alias("n_total"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(
            (k > 1) & (nt > k) & (ssw > 0),
            F.floor((ssb / (k - 1)) / (ssw / (nt - k)) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("f_stat"),
        F.when(
            ssb + ssw > 0,
            F.floor(ssb / (ssb + ssw) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("eta_sq"),
    )


# --------------------------------------------------------------------------
# agg_spearman_rho — tie-corrected Spearman rank correlation for the same
# variable pairs as agg_corr_matrix (Spearman 1904): Pearson correlation
# computed on average ranks, the monotone-association companion to the
# linear Pearson matrix (outlier-robust; detects any monotone relation).
#
# Scale shape (the part Spark lacks a primitive for): average ranks of a
# possibly-billion-row column CANNOT use a global window (single
# partition).  Each variable ranks via its DISTINCT-VALUE relation — one
# keyed aggregate (value → count), then util.global_running_sum's
# balanced two-phase prefix sum over the sorted distinct values, giving
# rank2(v) = 2·cum(v) − cnt(v) + 1 (twice the tie-averaged rank, an exact
# INTEGER, so tie averaging costs no float).  Ranks join back on the
# value key (4 balanced shuffles), and moments accumulate with the
# agg_corr_matrix discipline: 2^20-radix limb decomposition, int64
# component sums per task partition (codegen, guarded at the 2^23-row
# partition bound), decimal(38,0) phase-2 combine.  rank2 ≤ 2n keeps the
# limb algebra exact to n ≈ 2^38 rows.  The ×2 rank scale cancels in the
# correlation ratio.
#
# The oracle ranks via window functions and sums direct HUGEINT products —
# a different algebra, so a shared limb-math bug cannot self-confirm.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SPEAR_VARS = _CORR_VARS  # the Pearson matrix's variables — deliberate contrast
_SPEAR_PAIRS = _CORR_PAIRS

# Variables whose value vocabulary is bounded by the SCHEMA, not the data:
# TPC-H pins l_quantity to 1..50, l_discount to {0.00..0.10}, l_tax to
# {0.00..0.08}.  Their rank maps are tiny at ANY corpus size, so they build
# on a bounded driver page and broadcast back — the corpus rows shuffle
# only for the one unbounded variable (price) instead of 4×.  The cap
# guards the declaration: if a "bounded" vocabulary ever exceeds it, the
# variable silently takes the distributed prefix-sum path instead.
_SPEAR_BOUNDED = {"qty", "disc", "tax"}
_SPEAR_PAGE_CAP = 1 << 16
# Cap on the JOINT bounded vocabulary page (product of per-var
# vocabularies; TPC-H pins it at 51·11·9 ≈ 5k cells × 2 nullness splits).
# A blown joint page falls back to the fully-distributed path even when
# the marginals are individually bounded.
_SPEAR_CELL_CAP = 1 << 18


def _spearman_oracle() -> str:
    qs = ", ".join(
        f"CAST(FLOOR({col} * 1000000.0 + 0.5) AS BIGINT) AS q_{n}"
        for n, col in _SPEAR_VARS
    )
    rks = ", ".join(
        f"2 * RANK() OVER (ORDER BY q_{n}) + COUNT(*) OVER (PARTITION BY q_{n})"
        f" - 1 AS r_{n}"
        for n, _ in _SPEAR_VARS
    )
    names = [n for n, _ in _SPEAR_VARS]
    sums = ", ".join(
        ["COUNT(*) AS n"]
        + [f"SUM(CAST(r_{n} AS HUGEINT)) AS s_{n}" for n in names]
        + [
            f"SUM(CAST(r_{a} AS HUGEINT) * r_{b}) AS s_{a}_{b}"
            for a in names
            for b in names
            if (a, b) in _SPEAR_PAIRS or a == b
        ]
    )

    def rho(a: str, b: str) -> str:
        dx = f"(n * s_{a}_{a} - s_{a} * s_{a})"
        dy = f"(n * s_{b}_{b} - s_{b} * s_{b})"
        return (
            f"CASE WHEN {dx} > 0 AND {dy} > 0 THEN "
            f"ROUND((CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / sqrt(CAST({dx} AS DOUBLE) * CAST({dy} AS DOUBLE)), 6) END"
        )

    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{a}' AS var_a, '{b}' AS var_b,"
        f" CAST(n AS BIGINT) AS n_rows, {rho(a, b)} AS rho FROM s"
        for a, b in _SPEAR_PAIRS
    )
    return f"""
WITH q AS (SELECT {qs} FROM lineitem),
r AS (SELECT {rks} FROM q),
s AS (SELECT {sums} FROM r)
{branches}
"""


_SPEARMAN_ORACLE = _spearman_oracle()


def _spear_rank_entries(page: list) -> list:
    """(q, cnt) marginal page → (q, rank2) entries, replicating the
    distributed path exactly: ascending NULLS FIRST cumulation (a NULL
    group shifts later ranks, as repartitionByRange/orderBy would), ranks
    emitted only for non-NULL values (the equi-join drops NULLs anyway)."""
    page.sort(key=lambda qc: (qc[0] is not None, qc[0]))
    cum, entries = 0, []
    for q_val, cnt in page:
        cum += cnt
        if q_val is not None:
            entries.append((q_val, 2 * cum - cnt + 1))
    return entries


def _spearman_rho_cols(names: list, prods: list) -> list:
    """The rho assembly over a 1-row moment relation with columns
    n (bigint-ish), s_<n> decimal(19,0), s_<a>_<b> decimal(38,0)-ish.
    Shared by both execution paths so the IEEE op sequence — and therefore
    the emitted doubles — is identical whenever the integer moments are."""

    def rho(a: str, b: str) -> F.Column:
        nd = F.col("n").cast("decimal(19,0)")
        dx = nd * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        dy = nd * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        return F.when(
            (dx > 0) & (dy > 0),
            F.round(
                (n * sab - sa * sb) / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        )

    return [
        F.struct(
            F.lit(a).alias("var_a"),
            F.lit(b).alias("var_b"),
            rho(a, b).alias("rho"),
        )
        for a, b in _SPEAR_PAIRS
    ]


def _spearman_aggregate_first(
    spark: SparkSession,
    rows: DataFrame,
    names: list,
    bounded: list,
    pages: dict,
    cells: list,
) -> DataFrame:
    """Aggregate-first Spearman (r13 "not yet optimized" item 1 / guide
    §2.3-§2.4): the corpus collapses to DISTINCT-VALUE granularity of the
    one unbounded variable in a single map-side-combining aggregate, so NO
    corpus-sized exchange remains (the old plan shuffled all rows through
    the rank join-back and ran the 30-column limb aggregate per row), and
    the bounded×bounded moments assemble on the driver from the JOINT
    vocabulary cells — exact integer arithmetic, no third corpus pass.

    Exactness: rank2 values are exact integers (bounded-variable ranks from
    the marginal driver pages, the unbounded rank from the same prefix-sum
    machinery now run at distinct granularity); every moment is an exact
    integer sum — Σ r_a·r_b over valid rows equals Σ_v r_ub(v)·Σ_{rows=v}
    r_b (distributed, decimal) and Σ_cells r_a·r_b·cnt (driver, arbitrary-
    precision ints) by associativity — so the final 1-row moment relation
    is bit-identical to the old per-row accumulation, and the shared rho
    assembly emits identical doubles.  Envelope: terms are ≤ 4n³ like the
    old decimal(38,0) limb assembly (exact to n ≈ 2.9e12 rows; the
    decimal(19,0) s_<n> cast keeps the old n ≈ 7e9 first-moment envelope)."""
    import decimal

    ub = [n for n in names if n not in _SPEAR_BOUNDED][0]
    d18 = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    entries = {n_: dict(_spear_rank_entries(pages[n_])) for n_ in bounded}
    rmaps = {
        n_: F.broadcast(
            local_rows(
                spark,
                list(entries[n_].items()),
                f"q_{n_} bigint, r_{n_} bigint",
            )
        )
        for n_ in bounded
    }
    withr = rows
    for n_ in bounded:
        # LEFT join: a NULL q keeps its row (it still counts toward the
        # unbounded variable's rank cumulation) with a NULL rank; every
        # non-NULL q is present in the marginal map by construction.
        withr = withr.join(rmaps[n_], f"q_{n_}", "left")
    valid = F.lit(True)
    for n_ in bounded:
        valid = valid & F.col(f"r_{n_}").isNotNull()
    d = withr.groupBy(f"q_{ub}").agg(
        F.count(F.lit(1)).alias("__cnt_all"),
        F.count(F.when(valid, 1)).alias("__cnt"),
        *[
            F.sum(F.when(valid, F.col(f"r_{n_}")).cast("decimal(38,0)")).alias(
                f"__sb_{n_}"
            )
            for n_ in bounded
        ],
    )
    cum = global_running_sum(d, [f"q_{ub}"], F.col("__cnt_all"), "__cum")
    dd = cum.select(
        f"q_{ub}",
        "__cnt",
        *[f"__sb_{n_}" for n_ in bounded],
        (2 * F.col("__cum") - F.col("__cnt_all") + 1).alias(f"r_{ub}"),
    ).filter(F.col(f"q_{ub}").isNotNull())
    prods = [
        (a, b) for a in names for b in names if (a, b) in _SPEAR_PAIRS or a == b
    ]
    ub_prods = [(a, b) for a, b in prods if a == ub or b == ub]
    bb_prods = [(a, b) for a, b in prods if a != ub and b != ub]
    tot = dd.agg(
        F.sum("__cnt").cast("bigint").alias("n"),
        F.sum(d18(F.col(f"r_{ub}")) * d18(F.col("__cnt")))
        .cast("decimal(19,0)")
        .alias(f"s_{ub}"),
        *[
            F.sum(F.col(f"__sb_{n_}")).cast("decimal(19,0)").alias(f"s_{n_}")
            for n_ in bounded
        ],
        *[
            (
                F.sum(
                    d18(F.col(f"r_{ub}")) * d18(F.col(f"r_{ub}")) * d18(F.col("__cnt"))
                ).alias(f"s_{a}_{b}")
                if a == b
                else F.sum(
                    d18(F.col(f"r_{ub}"))
                    * F.col(f"__sb_{a if a != ub else b}")
                ).alias(f"s_{a}_{b}")
            )
            for a, b in ub_prods
        ],
    )
    # Bounded×bounded moments on the DRIVER from the joint-vocabulary cells
    # (valid rows only: every bounded value non-NULL and the unbounded
    # variable non-NULL — exactly the rows the old inner rank joins kept).
    # Arbitrary-precision Python ints, injected as one decimal(38,0) row.
    bb = {(a, b): 0 for a, b in bb_prods}
    for r in cells:
        if r["__ubnull"] or any(r[f"q_{n_}"] is None for n_ in bounded):
            continue
        rks = {n_: entries[n_][r[f"q_{n_}"]] for n_ in bounded}
        cnt = r["__cnt"]
        for a, b in bb_prods:
            bb[(a, b)] += rks[a] * rks[b] * cnt
    tot2 = local_rows(
        spark,
        [tuple(decimal.Decimal(bb[p]) for p in bb_prods)],
        ", ".join(f"s_{a}_{b} decimal(38,0)" for a, b in bb_prods),
    )
    # 1-row + 1-row combine as union + re-aggregate (sum over one non-NULL
    # value per column): joins of two 1-row aggregates fold to
    # BroadcastNestedLoopJoin and would trip the cartesian-hazard plan pin
    # this query rightly carries.  Casts re-pin the old path's exact moment
    # types so the shared rho assembly sees identical inputs.
    s = tot.unionByName(tot2, allowMissingColumns=True).agg(
        F.sum("n").cast("bigint").alias("n"),
        *[F.sum(f"s_{n_}").cast("decimal(19,0)").alias(f"s_{n_}") for n_ in names],
        *[
            F.sum(f"s_{a}_{b}").cast("decimal(38,0)").alias(f"s_{a}_{b}")
            for a, b in prods
        ],
    )
    pairs = F.explode(F.array(*_spearman_rho_cols(names, prods))).alias("p")
    return s.select(F.col("n").cast("bigint").alias("n_rows"), pairs).select(
        F.col("p.var_a").alias("var_a"),
        F.col("p.var_b").alias("var_b"),
        "n_rows",
        F.col("p.rho").alias("rho"),
    )


@register("agg_spearman_rho", oracle=_SPEARMAN_ORACLE)
def agg_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    names = [n for n, _ in _SPEAR_VARS]
    rows = li.select(
        *[
            F.floor(F.col(col) * 1_000_000.0 + 0.5).cast("long").alias(f"q_{n}")
            for n, col in _SPEAR_VARS
        ]
    )
    bounded = [n for n in names if n in _SPEAR_BOUNDED]
    unbounded = [n for n in names if n not in _SPEAR_BOUNDED]
    pages: dict[str, list] = {n: None for n in bounded}
    cells = None
    if bounded:
        # ONE corpus pass serves every bounded need (r14: the old explode
        # pass tripled the rows before its aggregate, and a THIRD corpus
        # pass later re-counted the joint cells for the bounded×bounded
        # moments): aggregate the JOINT bounded vocabulary once, split by
        # unbounded-var nullness.  Marginal rank pages are row sums of the
        # cells; the joint cells themselves carry the bounded×bounded
        # moments.  The cell count is bounded by the product of the
        # declared vocabularies — the cap guards that declaration, falling
        # back to the distributed path if it ever blows.
        keys = [f"q_{n}" for n in bounded]
        flags = (
            [F.col(f"q_{unbounded[0]}").isNull().alias("__ubnull")]
            if len(unbounded) == 1
            else []
        )
        cells = (
            rows.groupBy(*keys, *flags)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .limit(_SPEAR_CELL_CAP + 1)
            .collect()
        )
        if len(cells) <= _SPEAR_CELL_CAP:
            for n_ in bounded:
                marg: dict = {}
                for r in cells:
                    q = r[f"q_{n_}"]
                    marg[q] = marg.get(q, 0) + r["__cnt"]
                pages[n_] = (
                    list(marg.items()) if len(marg) <= _SPEAR_PAGE_CAP else None
                )
        else:  # joint vocabulary blew the bound — distributed path for all
            cells = None
    if (
        len(unbounded) == 1
        and cells is not None
        and all(pages.get(n) is not None for n in bounded)
    ):
        return _spearman_aggregate_first(spark, rows, names, bounded, pages, cells)
    ranked = rows
    for n_ in names:
        page = pages.get(n_)
        if page is not None and len(page) <= _SPEAR_PAGE_CAP:
            # Driver-page rank map (see _spear_rank_entries for the
            # NULLS FIRST parity rules).
            rmap = local_rows(spark,
                _spear_rank_entries(page), schema=f"q_{n_} bigint, r_{n_} bigint"
            )
            ranked = ranked.join(F.broadcast(rmap), f"q_{n_}")
        else:
            dv = rows.groupBy(f"q_{n_}").agg(F.count(F.lit(1)).alias("__cnt"))
            cum = global_running_sum(dv, [f"q_{n_}"], F.col("__cnt"), "__cum")
            rmap = cum.select(
                f"q_{n_}",
                (2 * F.col("__cum") - F.col("__cnt") + 1).alias(f"r_{n_}"),
            )
            ranked = ranked.join(rmap, f"q_{n_}")
    _RADIX = 1 << 20
    limbs = ranked.select(
        *[F.col(f"r_{n}") for n in names],
        *[(F.col(f"r_{n}") / _RADIX).cast("long").alias(f"hi_{n}") for n in names],
        *[(F.col(f"r_{n}") % _RADIX).alias(f"lo_{n}") for n in names],
    )
    prods = [
        (a, b) for a in names for b in names if (a, b) in _SPEAR_PAIRS or a == b
    ]
    part_aggs = (
        [F.count(F.lit(1)).alias("n_part")]
        + [F.sum(f"r_{n}").alias(f"s_{n}") for n in names]
        + [
            agg
            for a, b in prods
            for agg in (
                F.sum(F.col(f"hi_{a}") * F.col(f"hi_{b}")).alias(f"hh_{a}_{b}"),
                F.sum(
                    F.col(f"hi_{a}") * F.col(f"lo_{b}")
                    + F.col(f"lo_{a}") * F.col(f"hi_{b}")
                ).alias(f"x_{a}_{b}"),
                F.sum(F.col(f"lo_{a}") * F.col(f"lo_{b}")).alias(f"ll_{a}_{b}"),
            )
        ]
    )
    partials = (
        limbs.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(*part_aggs)
    )
    partials = partials.withColumn(
        "n_part",
        F.when(F.col("n_part") <= F.lit(1 << 23), F.col("n_part")).otherwise(
            F.raise_error(
                F.lit(
                    "agg_spearman_rho: a task partition exceeds the 2^23-row"
                    " int64-safe bound of the limb accumulation; lower"
                    " spark.sql.files.maxPartitionBytes"
                )
            ).cast("bigint")
        ),
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).alias(c)  # noqa: E731
    s = (
        partials.agg(
            F.sum("n_part").alias("n"),
            *[dec(f"s_{n}") for n in names],
            *[
                d
                for a, b in prods
                for d in (dec(f"hh_{a}_{b}"), dec(f"x_{a}_{b}"), dec(f"ll_{a}_{b}"))
            ],
        )
    ).select(
        "n",
        *[F.col(f"s_{n}").cast("decimal(19,0)").alias(f"s_{n}") for n in names],
        *[
            (
                F.col(f"hh_{a}_{b}") * (_RADIX * _RADIX)
                + F.col(f"x_{a}_{b}") * _RADIX
                + F.col(f"ll_{a}_{b}")
            ).alias(f"s_{a}_{b}")
            for a, b in prods
        ],
    )

    pairs = F.explode(F.array(*_spearman_rho_cols(names, prods))).alias("p")
    return s.select(F.col("n").cast("bigint").alias("n_rows"), pairs).select(
        F.col("p.var_a").alias("var_a"),
        F.col("p.var_b").alias("var_b"),
        "n_rows",
        F.col("p.rho").alias("rho"),
    )


# --------------------------------------------------------------------------
# agg_jackknife_ci — delete-one-day (block) jackknife confidence interval
# for a RATIO estimator (Quenouille 1956 / Tukey 1958; the delete-a-group
# jackknife is the survey-statistics standard for metrics whose
# denominator is itself random): per metric, R̂ = Σ value / #user-days,
# and each day's leave-one-out replicate R₍ᵢ₎ = (S−sᵢ)/(N−nᵢ) comes from
# per-day partials — no resampling, no second corpus pass.  Complements
# agg_bootstrap_ci (derandomized row resampling of a MEAN): the jackknife
# handles the ratio's denominator randomness and needs only d replicates.
#
# Scale shape: ONE keyed aggregate over events (per (metric, day) partial
# sums — calendar-bounded), a per-metric total, and the replicate algebra
# on ≤ #days rows per metric joined via broadcast.  No windows.
#
# Parity discipline: day partials are dsum-exact fixed-point bigints and
# exact distinct counts; replicates quantize q6; squared deviations
# quantize 1e-12 BEFORE the cross-day sum; se/CI are identical IEEE
# expressions.  Degenerate series (d < 2 or a replicate denominator ≤ 0)
# yield NULL stats rather than a wrong interval.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_JK_Z = 1.959964

_JACKKNIFE_ORACLE = f"""
WITH day_part AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS svq,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ud
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
tot AS (
  SELECT event_type, CAST(SUM(svq) AS BIGINT) AS s,
         CAST(SUM(ud) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS d_days
  FROM day_part GROUP BY event_type
),
rep AS (
  SELECT p.event_type, t.s, t.n, t.d_days,
         CASE WHEN t.n - p.ud > 0 THEN
           FLOOR((t.s - p.svq) / 1000000.0 / (t.n - p.ud) * 1000000.0 + 0.5)
           / 1000000.0 END AS r_i
  FROM day_part p JOIN tot t ON t.event_type = p.event_type
),
agg AS (
  SELECT event_type, s, n, d_days,
         COUNT(*) = COUNT(r_i) AS ok,
         CAST(SUM(CAST(FLOOR(r_i * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / d_days / 1000000.0 AS rbar
  FROM rep GROUP BY event_type, s, n, d_days
),
vr AS (
  SELECT r.event_type, a.s, a.n, a.d_days, a.ok,
         SUM({oqprod('r.r_i - a.rbar', 'r.r_i - a.rbar')}) AS tq
  FROM rep r JOIN agg a ON a.event_type = r.event_type
  GROUP BY r.event_type, a.s, a.n, a.d_days, a.ok
),
fin AS (
  SELECT event_type, d_days,
         FLOOR(s / 1000000.0 / n * 1000000.0 + 0.5) / 1000000.0 AS r_hat,
         CASE WHEN ok AND d_days >= 2 THEN
           FLOOR(sqrt((d_days - 1.0) / d_days
                      * (CAST(CAST(tq AS VARCHAR) AS DOUBLE)
                 / 1000000000000.0)) * 1000000.0 + 0.5) / 1000000.0
         END AS jk_se
  FROM vr
)
SELECT event_type, d_days AS n_days, r_hat, jk_se,
       CASE WHEN jk_se IS NOT NULL THEN
         FLOOR((r_hat - {_JK_Z} * jk_se) * 1000000.0 + 0.5) / 1000000.0
       END AS ci_lo,
       CASE WHEN jk_se IS NOT NULL THEN
         FLOOR((r_hat + {_JK_Z} * jk_se) * 1000000.0 + 0.5) / 1000000.0
       END AS ci_hi
FROM fin
"""


@register("agg_jackknife_ci", oracle=_JACKKNIFE_ORACLE)
def agg_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # eager checkpoint: tot/rep/vr all branch off the calendar-bounded
    # partial relation — without it each branch re-scans events (the
    # ts_acf shared-branch fix; 4 corpus scans observed in the plan).
    day_part = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("svq"),
            F.countDistinct("user_id").cast("bigint").alias("ud"),
        )
        .localCheckpoint(eager=True)
    )
    tot = day_part.groupBy("event_type").agg(
        F.sum("svq").cast("bigint").alias("s"),
        F.sum("ud").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("d_days"),
    )
    rep = day_part.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "s",
        "n",
        "d_days",
        F.when(
            F.col("n") - F.col("ud") > 0,
            F.floor(
                (F.col("s") - F.col("svq"))
                / 1_000_000.0
                / (F.col("n") - F.col("ud"))
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("r_i"),
    )
    agg = rep.groupBy("event_type", "s", "n", "d_days").agg(
        (F.count(F.lit(1)) == F.count("r_i")).alias("ok"),
        (
            F.sum(F.floor(F.col("r_i") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / F.col("d_days")
            / 1_000_000.0
        ).alias("rbar"),
    )
    dev = F.col("r_i") - F.col("rbar")
    vr = (
        rep.join(
            F.broadcast(agg.select("event_type", "ok", "rbar")), "event_type"
        )
        .groupBy("event_type", "s", "n", "d_days", "ok")
        .agg(
            F.sum(qprod(dev, dev)).alias("tq")
        )
    )
    dd = F.col("d_days")
    fin = vr.select(
        "event_type",
        "d_days",
        (
            F.floor(F.col("s") / 1_000_000.0 / F.col("n") * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("r_hat"),
        F.when(
            F.col("ok") & (dd >= 2),
            F.floor(
                F.sqrt(
                    (dd - 1.0)
                    / dd
                    * (F.col("tq").cast("double") / 1_000_000_000_000.0)
                )
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("jk_se"),
    )
    se = F.col("jk_se")
    return fin.select(
        "event_type",
        dd.alias("n_days"),
        "r_hat",
        "jk_se",
        F.when(
            se.isNotNull(),
            F.floor((F.col("r_hat") - _JK_Z * se) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("ci_lo"),
        F.when(
            se.isNotNull(),
            F.floor((F.col("r_hat") + _JK_Z * se) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# agg_raking_ipf — survey-weight raking by iterative proportional fitting
# (Deming & Stephan 1940): a biased subsample (customers with positive
# account balance) gets per-cell weights scaled in T=5 alternating passes
# so its (nation, segment) margins match the FULL population's margins —
# the post-stratification standard for reweighting any skewed sample
# (panels, A/B holdouts, response bias).
#
# Scale shape: ONE corpus aggregate produces the cell table with BOTH the
# subsample count and the population count (margins derive from the cells
# — no second scan); the cell relation is bounded by the QI VOCABULARY
# (nations × segments), so the 2T scaling passes run driver-side on the
# collected page (bounded by construction — the llm_mmr_diversify
# precedent; a 2T-stage executor loop spent 10 checkpoint barriers on
# 125 rows).
#
# Parity discipline: weights are q9 fixed-point after EVERY scaling step;
# margin sums accumulate as exact scaled bigints; the scale factor
# N/(S_q9/1e9) is an identical IEEE expression both engines; a dimension
# slice with zero subsample mass keeps its weights (CASE S>0) instead of
# dividing by zero.  The oracle is 2T generated MATERIALIZED CTE stages
# (the llm_mmr_diversify lesson: unhinted chained CTEs re-expand
# exponentially in DuckDB).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_IPF_T = 5


def _ipf_oracle() -> str:
    step = (
        "CASE WHEN s.sq > 0 THEN FLOOR(w.w * m.{tgt} /"
        " (CAST(s.sq AS DOUBLE) / 1000000000.0) * 1000000000.0 + 0.5)"
        " / 1000000000.0 ELSE w.w END AS w"
    )
    parts = [
        """
WITH cells AS MATERIALIZED (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(COUNT(*) FILTER (WHERE c_acctbal > 0) AS BIGINT) AS n_s,
         CAST(COUNT(*) AS BIGINT) AS n_pop
  FROM customer GROUP BY 1, 2
),
mn AS MATERIALIZED (SELECT nk, CAST(SUM(n_pop) AS BIGINT) AS tn
                    FROM cells GROUP BY nk),
ms AS MATERIALIZED (SELECT seg, CAST(SUM(n_pop) AS BIGINT) AS ts
                    FROM cells GROUP BY seg),
w0 AS MATERIALIZED (SELECT nk, seg, n_s, CAST(n_s AS DOUBLE) AS w FROM cells)"""
    ]
    prev = "w0"
    for t in range(1, _IPF_T + 1):
        parts.append(
            f""",
a{t} AS MATERIALIZED (
  SELECT w.nk, w.seg, w.n_s, {step.format(tgt='tn')}
  FROM {prev} w
  JOIN (SELECT nk, SUM(CAST(FLOOR(w * 1000000000.0 + 0.5) AS BIGINT)) AS sq
        FROM {prev} GROUP BY nk) s ON s.nk = w.nk
  JOIN mn m ON m.nk = w.nk
),
b{t} AS MATERIALIZED (
  SELECT w.nk, w.seg, w.n_s, {step.format(tgt='ts')}
  FROM a{t} w
  JOIN (SELECT seg, SUM(CAST(FLOOR(w * 1000000000.0 + 0.5) AS BIGINT)) AS sq
        FROM a{t} GROUP BY seg) s ON s.seg = w.seg
  JOIN ms m ON m.seg = w.seg
)"""
        )
        prev = f"b{t}"
    parts.append(
        f"""
SELECT nk AS c_nationkey, seg AS c_mktsegment, n_s AS n_sample,
       n_pop AS n_population,
       FLOOR({prev}.w * 1000000.0 + 0.5) / 1000000.0 AS raked_weight
FROM {prev} JOIN cells USING (nk, seg, n_s)"""
    )
    return "".join(parts)


_IPF_ORACLE = _ipf_oracle()


@register("agg_raking_ipf", oracle=_IPF_ORACLE)
def agg_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    c = load(spark, sf_dir, "customer")
    # bounded collect: the cell table is sized by the QI VOCABULARY
    # (nations × segments), never the corpus — the llm_mmr_diversify
    # bounded-page precedent.  Driver-side scaling replaces the previous
    # 2T per-pass checkpoint barriers (10 executor round-trips for 125
    # rows; 13.9 s at sf0.1, ~2 s after this rewrite) with the identical
    # quantized arithmetic — the q9 recurrence below is the oracle's,
    # op for op.
    rows = (
        # survey-raking convention: respondents with incomplete QI (a NULL
        # nation or segment) cannot be assigned a margin cell and are
        # excluded from the calibration — standard IPF practice
        c.filter(F.col("c_nationkey").isNotNull() & F.col("c_mktsegment").isNotNull())
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
        )
        .agg(
            F.count(F.when(F.col("c_acctbal") > 0, 1)).cast("bigint").alias("n_s"),
            F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        )
        .collect()
    )
    cells = {(r["nk"], r["seg"]): (r["n_s"], r["n_pop"]) for r in rows}
    tn: dict = {}
    ts: dict = {}
    for (nk, seg), (_, npop) in cells.items():
        tn[nk] = tn.get(nk, 0) + npop
        ts[seg] = ts.get(seg, 0) + npop
    w = {k: float(v[0]) for k, v in cells.items()}

    def _scale(axis: int, margins: dict) -> None:
        sq: dict = {}
        for k, wv in w.items():
            sq[k[axis]] = sq.get(k[axis], 0) + math.floor(wv * 1e9 + 0.5)
        for k, wv in w.items():
            s_ = sq[k[axis]]
            if s_ > 0:
                w[k] = (
                    math.floor(wv * margins[k[axis]] / (s_ / 1e9) * 1e9 + 0.5)
                    / 1e9
                )

    for _ in range(_IPF_T):
        _scale(0, tn)
        _scale(1, ts)
    out = [
        (nk, seg, cells[(nk, seg)][0], cells[(nk, seg)][1],
         math.floor(w[(nk, seg)] * 1e6 + 0.5) / 1e6)
        for (nk, seg) in sorted(cells)
    ]
    return local_rows(spark, 
        out,
        "c_nationkey bigint, c_mktsegment string, n_sample bigint,"
        " n_population bigint, raked_weight double",
    )


# --------------------------------------------------------------------------
# agg_logistic_irls — logistic regression trained INSIDE the engine by
# iteratively reweighted least squares (Nelder & Wedderburn 1972; the
# textbook GLM fit): P(converted) ~ intercept + log(1+#events) +
# log(1+avg value), T=6 IRLS passes, each pass ONE keyed aggregate of the
# 9 sufficient statistics (X'WX upper triangle + X'Wz) and a closed-form
# 3×3 cofactor solve on the 1-row result.  The "train the propensity /
# quality classifier where the data lives" pattern — no corpus export, no
# ML runtime; llm_quality_classifier SCORES a fixed model, this one FITS.
#
# Scale shape: features come from ONE user aggregate (eagerly
# checkpointed; T passes re-read local blocks); each pass is a single
# balanced aggregate (9 sums) with the current β broadcast as a 1-row
# relation (allowlisted nested-loop, the llm_kmeans shape); the solve is
# driver-free (1-row select, eagerly checkpointed so plan size stays
# linear in T).
#
# Parity discipline: features quantize q6; per-row contributions quantize
# 1e-9 fixed-point (bigint floor) BEFORE decimal/HUGEINT sums — exp is
# per-row nonlinear, so engine sum order must not see raw doubles; μ
# clamps to [1e-9, 1−1e-9] with shared literals (w = 0 would poison z);
# β quantizes q9 after every solve; a singular normal matrix keeps the
# previous β (det ≠ 0 guard) instead of dividing by zero.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_IRLS_T = 6
_IRLS_FEATURES = ["intercept", "log_events", "log_avg_value"]


def _irls_oracle() -> str:
    np_cnt = "COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END)"
    np_sum = osum("CASE WHEN event_type <> 'purchase' THEN value END")
    parts = [
        f"""
WITH u AS MATERIALIZED (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
         FLOOR(ln(1 + {np_cnt}) * 1000000.0 + 0.5) / 1000000.0 AS x1,
         CASE WHEN {np_cnt} > 0 THEN
           FLOOR(ln(1 + GREATEST({np_sum} / {np_cnt}, 0.0)) * 1000000.0 + 0.5)
           / 1000000.0
         ELSE 0.0 END AS x2
  FROM events GROUP BY user_id
),
bt0 AS MATERIALIZED (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"""
    ]
    q9 = lambda e: f"FLOOR(({e}) * 1000000000.0 + 0.5) / 1000000000.0"  # noqa: E731
    sq = lambda e, n: (  # noqa: E731
        f"CAST(SUM(CAST(FLOOR(({e}) * 1000000000.0 + 0.5) AS BIGINT))"
        f" AS DOUBLE) / 1000000000.0 AS {n}"
    )
    for t in range(1, _IRLS_T + 1):
        parts.append(
            f""",
s{t} AS MATERIALIZED (
  SELECT {sq('w', 's00')}, {sq('w * x1', 's01')}, {sq('w * x2', 's02')},
         {sq('w * x1 * x1', 's11')}, {sq('w * x1 * x2', 's12')},
         {sq('w * x2 * x2', 's22')},
         {sq('w * z', 'r0')}, {sq('w * z * x1', 'r1')}, {sq('w * z * x2', 'r2')}
  FROM (
    SELECT y, x1, x2, eta, muc, muc * (1.0 - muc) AS w,
           eta + (y - muc) / (muc * (1.0 - muc)) AS z
    FROM (
      SELECT u.y, u.x1, u.x2,
             b.b0 + b.b1 * u.x1 + b.b2 * u.x2 AS eta,
             LEAST(GREATEST(
               1.0 / (1.0 + exp(-(b.b0 + b.b1 * u.x1 + b.b2 * u.x2))),
               0.000000001), 0.999999999) AS muc
      FROM u, bt{t - 1} b))
),
bt{t} AS MATERIALIZED (
  SELECT CASE WHEN det <> 0 THEN {q9('(c00 * r0 + c01 * r1 + c02 * r2) / det')}
         ELSE pb0 END AS b0,
         CASE WHEN det <> 0 THEN {q9('(c01 * r0 + c11 * r1 + c12 * r2) / det')}
         ELSE pb1 END AS b1,
         CASE WHEN det <> 0 THEN {q9('(c02 * r0 + c12 * r1 + c22 * r2) / det')}
         ELSE pb2 END AS b2
  FROM (
    SELECT s{t}.*, pb.b0 AS pb0, pb.b1 AS pb1, pb.b2 AS pb2,
           s11 * s22 - s12 * s12 AS c00,
           s02 * s12 - s01 * s22 AS c01,
           s01 * s12 - s02 * s11 AS c02,
           s00 * s22 - s02 * s02 AS c11,
           s01 * s02 - s00 * s12 AS c12,
           s00 * s11 - s01 * s01 AS c22,
           s00 * (s11 * s22 - s12 * s12)
             - s01 * (s01 * s22 - s12 * s02)
             + s02 * (s01 * s12 - s11 * s02) AS det
    FROM s{t}, bt{t - 1} pb))"""
        )
    parts.append(
        f""",
nstat AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(y) AS BIGINT) AS n_converted
  FROM u
)
SELECT f.feature, FLOOR(f.b * 1000000.0 + 0.5) / 1000000.0 AS beta,
       n.n_users, n.n_converted
FROM (
  SELECT 'intercept' AS feature, b0 AS b FROM bt{_IRLS_T}
  UNION ALL SELECT 'log_events', b1 FROM bt{_IRLS_T}
  UNION ALL SELECT 'log_avg_value', b2 FROM bt{_IRLS_T}
) f, nstat n"""
    )
    return "".join(parts)


_IRLS_ORACLE = _irls_oracle()


@register("agg_logistic_irls", oracle=_IRLS_ORACLE)
def agg_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    npv = F.when(F.col("event_type") != "purchase", F.col("value"))
    np_cnt = F.count(F.when(F.col("event_type") != "purchase", 1))
    np_sum = F.sum(F.floor(npv * 1_000_000.0 + 0.5).cast("long")) / 1_000_000.0
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "y"
            ),
            np_cnt.alias("c_np"),
            np_sum.alias("s_np"),
        )
        .select(
            "y",
            (
                F.floor(F.log(1 + F.col("c_np")) * 1_000_000.0 + F.lit(0.5))
                / 1_000_000.0
            ).alias("x1"),
            F.when(
                F.col("c_np") > 0,
                F.floor(
                    F.log(
                        1 + F.greatest(F.col("s_np") / F.col("c_np"), F.lit(0.0))
                    )
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0,
            )
            .otherwise(0.0)
            .alias("x2"),
        )
        .localCheckpoint(eager=True)  # T IRLS passes re-read local blocks
    )
    # Driver-resident β (r13 optimization round — the MLlib/llm_kmeans
    # shape): each IRLS pass is ONE aggregate-collect job with the current
    # β baked in as three double literals; the 3×3 cofactor solve runs on
    # the driver in Python floats, which ARE IEEE doubles, replicating the
    # oracle's op sequence term for term — bit-identical to the old 1-row
    # Spark select.  Removes two broadcast exchanges and one eager
    # checkpoint job per pass (13 jobs → 7).
    import math

    b0, b1, b2 = 0.0, 0.0, 0.0

    def _sq(e: F.Column, n: str) -> F.Column:
        return (
            F.sum(F.floor(e * 1_000_000_000.0 + F.lit(0.5)).cast("decimal(38,0)"))
            .cast("double")
            / 1_000_000_000.0
        ).alias(n)

    q9 = lambda v: math.floor(v * 1_000_000_000.0 + 0.5) / 1_000_000_000.0  # noqa: E731
    for _ in range(_IRLS_T):
        eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
        rows = u.select(
            "y",
            "x1",
            "x2",
            eta.alias("eta"),
            F.least(
                F.greatest(
                    1.0 / (1.0 + F.exp(-eta)), F.lit(0.000000001)
                ),
                F.lit(0.999999999),
            ).alias("muc"),
        )
        w = F.col("muc") * (1.0 - F.col("muc"))
        rows = rows.select(
            "y",
            "x1",
            "x2",
            w.alias("w"),
            (F.col("eta") + (F.col("y") - F.col("muc")) / w).alias("z"),
        )
        x1, x2, wv, z = F.col("x1"), F.col("x2"), F.col("w"), F.col("z")
        s = rows.agg(
            _sq(wv, "s00"), _sq(wv * x1, "s01"), _sq(wv * x2, "s02"),
            _sq(wv * x1 * x1, "s11"), _sq(wv * x1 * x2, "s12"),
            _sq(wv * x2 * x2, "s22"),
            _sq(wv * z, "r0"), _sq(wv * z * x1, "r1"), _sq(wv * z * x2, "r2"),
        ).collect()[0]
        s00, s01, s02 = s["s00"], s["s01"], s["s02"]
        s11, s12, s22 = s["s11"], s["s12"], s["s22"]
        r0, r1, r2 = s["r0"], s["r1"], s["r2"]
        if None in (s00, s01, s02, s11, s12, s22, r0, r1, r2):
            # empty input: NULL sums → NULL det → the old 1-row select fell
            # through to the previous β; keep the same semantics here.
            continue
        c00 = s11 * s22 - s12 * s12
        c01 = s02 * s12 - s01 * s22
        c02 = s01 * s12 - s02 * s11
        c11 = s00 * s22 - s02 * s02
        c12 = s01 * s02 - s00 * s12
        c22 = s00 * s11 - s01 * s01
        det = (
            s00 * (s11 * s22 - s12 * s12)
            - s01 * (s01 * s22 - s12 * s02)
            + s02 * (s01 * s12 - s11 * s02)
        )
        if det != 0:
            b0, b1, b2 = (
                q9((c00 * r0 + c01 * r1 + c02 * r2) / det),
                q9((c01 * r0 + c11 * r1 + c12 * r2) / det),
                q9((c02 * r0 + c12 * r1 + c22 * r2) / det),
            )
    beta = local_rows(spark, 
        [(b0, b1, b2)], "b0 double, b1 double, b2 double"
    )
    nstat = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").cast("bigint").alias("n_converted"),
    )
    feats = beta.select(
        F.explode(
            F.array(
                F.struct(F.lit("intercept").alias("feature"), F.col("b0").alias("b")),
                F.struct(F.lit("log_events").alias("feature"), F.col("b1").alias("b")),
                F.struct(
                    F.lit("log_avg_value").alias("feature"), F.col("b2").alias("b")
                ),
            )
        ).alias("f")
    ).select(
        F.col("f.feature").alias("feature"),
        (F.floor(F.col("f.b") * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "beta"
        ),
    )
    return feats.crossJoin(F.broadcast(nstat))


# --------------------------------------------------------------------------
# agg_roc_auc — exact ROC-AUC of a score column against binary labels
# (Hanley & McNeil 1982; AUC = U/(n₊·n₋), the ML-evaluation view of the
# Mann-Whitney statistic agg_mannwhitney_u uses for A/B inference): here
# the score is the first embedding component and the label parity splits
# the classes — the shape of every "does this quality/propensity score
# actually rank positives above negatives" check run before deploying a
# filter model.
#
# Scale shape: tie-corrected average ranks WITHOUT a global window — the
# agg_spearman_rho machinery (distinct-value aggregate →
# util.global_running_sum two-phase prefix → rank2 = 2·cum − cnt + 1
# joined back on the value key); the positive-rank sum accumulates in
# decimal(38,0) (rank2·n can pass int64 near 10⁹ rows).
#
# Parity: scores quantize q6 before ranking; rank2 is an exact integer
# (tie averaging costs no float); AUC assembles from exact sums with the
# q6 floor; degenerate inputs (a class empty) yield NULL.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ROC_AUC_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS q,
         CAST(label % 2 AS INT) AS y
  -- corrupt (NULL) vectors carry no score: route out BEFORE ranking on
  -- BOTH engines (Spark's rank join drops NULL q; DuckDB would rank
  -- NULLs last and skew np/nn — round-12 magnitude sweep)
  FROM embeddings WHERE embedding IS NOT NULL
),
r AS (
  SELECT y,
         2 * RANK() OVER (ORDER BY q) + COUNT(*) OVER (PARTITION BY q) - 1
           AS r2
  FROM s
),
agg AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         SUM(CASE WHEN y = 1 THEN CAST(r2 AS HUGEINT) ELSE 0 END) AS rp2
  FROM r
)
SELECT np AS n_pos, nn AS n_neg,
       CASE WHEN np > 0 AND nn > 0 THEN
         FLOOR((CAST(rp2 AS DOUBLE) / 2.0 - CAST(np AS DOUBLE) * (np + 1) / 2.0)
               / (CAST(np AS DOUBLE) * nn) * 1000000.0 + 0.5) / 1000000.0
       END AS auc,
       CASE WHEN np > 0 AND nn > 0 THEN
         FLOOR((2.0 * ((CAST(rp2 AS DOUBLE) / 2.0
                        - CAST(np AS DOUBLE) * (np + 1) / 2.0)
                       / (CAST(np AS DOUBLE) * nn)) - 1.0)
               * 1000000.0 + 0.5) / 1000000.0
       END AS gini
FROM agg
"""


@register("agg_roc_auc", oracle=_ROC_AUC_ORACLE)
def agg_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    s = e.select(
        F.floor(
            F.element_at(F.col("embedding"), 1).cast("double") * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("q"),
        (F.col("label") % 2).cast("int").alias("y"),
    )
    # Aggregate-first (r13 "not yet optimized" item 1 / guide §2.3-§2.4):
    # ONE map-side-combining corpus aggregate collapses scores to distinct-
    # value granularity carrying per-value class tallies, the prefix-sum
    # rank map derives on that distinct relation, and the positive-rank sum
    # assembles as Σ_v r2(v)·np(v) = Σ_{y=1} r2 — exact integers, so the
    # old corpus-sized rank join-back (and its exchange) is gone with
    # bit-identical moments.  NULL q keeps counting toward the cumulation
    # (rank shift) but is excluded from the moments, exactly as the old
    # inner equi-join dropped it.
    dv = s.groupBy("q").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("__np"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("__nn"),
    )
    cum = global_running_sum(dv, ["q"], F.col("__cnt"), "__cum")
    dd = cum.select(
        "q",
        "__np",
        "__nn",
        (2 * F.col("__cum") - F.col("__cnt") + 1).alias("r2"),
    ).filter(F.col("q").isNotNull())
    agg = dd.agg(
        F.sum("__np").cast("bigint").alias("np"),
        F.sum("__nn").cast("bigint").alias("nn"),
        F.sum(F.col("r2").cast("decimal(18,0)") * F.col("__np").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("rp2"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    auc = (
        F.floor(
            (
                F.col("rp2").cast("double") / 2.0
                - np_.cast("double") * (np_ + 1) / 2.0
            )
            / (np_.cast("double") * nn_)
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    ok = (np_ > 0) & (nn_ > 0)
    return agg.select(
        np_.alias("n_pos"),
        nn_.alias("n_neg"),
        F.when(ok, auc).alias("auc"),
        F.when(
            ok,
            # from the RAW ratio, as the oracle does — the quantized auc
            # loses the sub-micro bits that decide gini's own floor
            F.floor(
                (
                    2.0
                    * (
                        (
                            F.col("rp2").cast("double") / 2.0
                            - np_.cast("double") * (np_ + 1) / 2.0
                        )
                        / (np_.cast("double") * nn_)
                    )
                    - 1.0
                )
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# agg_empirical_bayes — beta-binomial shrinkage of per-entity rates
# (Robbins 1956; the James-Stein lesson applied to proportions; Efron &
# Morris 1975): small-sample conversion rates are noise — shrink each
# nation's rate toward the pooled prior, weighting by evidence.  The
# prior Beta(α, β) is fit by METHOD OF MOMENTS from the observed rate
# distribution itself (that's the "empirical" part): with m̄ the pooled
# mean rate and v the between-entity variance of rates,
# α+β = m̄(1−m̄)/v − 1.  Shrunk rate = (x + α)/(n + α + β).  The ranking
# fix for every "best/worst region" leaderboard dominated by tiny cells.
#
# Scale shape: one corpus aggregate per entity (x successes of n), one
# bounded combine over the ≤ #entities rows for the moments, a broadcast
# of the 1-row prior back.  No windows.
#
# Parity: rates q6 before the moment sums (1e-12 fixed-point terms);
# α, β q6 from identical IEEE expressions; v ≤ 0 (under-dispersed —
# nothing to shrink) degrades to prior-free raw rates with a flag, and
# the shrunk rate is exactly the raw rate in that case.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_EB_ORACLE = """
WITH ent AS (
  SELECT c.c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
),
rt AS (
  SELECT nk, n, x,
         FLOOR(x * 1.0 / n * 1000000.0 + 0.5) / 1000000.0 AS r
  FROM ent
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(FLOOR(r * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000.0 AS mbar
  FROM rt
),
vv AS (
  SELECT m.k, m.mbar,
         CASE WHEN m.k >= 2 THEN
           CAST(SUM(CAST(FLOOR((rt.r - m.mbar) * (rt.r - m.mbar)
                               * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000000000.0 / (m.k - 1)
         END AS v
  FROM rt, mom m GROUP BY m.k, m.mbar
),
prior AS (
  SELECT k, mbar, v,
         CASE WHEN v > 0 AND mbar * (1.0 - mbar) / v - 1.0 > 0 THEN
           FLOOR(mbar * (mbar * (1.0 - mbar) / v - 1.0) * 1000000.0 + 0.5)
             / 1000000.0 END AS alpha,
         CASE WHEN v > 0 AND mbar * (1.0 - mbar) / v - 1.0 > 0 THEN
           FLOOR((1.0 - mbar) * (mbar * (1.0 - mbar) / v - 1.0) * 1000000.0
                 + 0.5) / 1000000.0 END AS beta
  FROM vv
)
SELECT rt.nk AS c_nationkey, rt.n AS n_orders, rt.x AS n_flagged,
       rt.r AS raw_rate,
       p.alpha, p.beta,
       CASE WHEN p.alpha IS NOT NULL THEN
         FLOOR((rt.x + p.alpha) / (rt.n + p.alpha + p.beta) * 1000000.0 + 0.5)
           / 1000000.0
       ELSE rt.r END AS shrunk_rate,
       p.alpha IS NULL AS no_shrinkage
FROM rt, prior p
"""


@register("agg_empirical_bayes", oracle=_EB_ORACLE)
def agg_empirical_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    ent = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1))
            .cast("bigint")
            .alias("x"),
        )
    )
    rt = ent.select(
        "nk",
        "n",
        "x",
        (
            F.floor(F.col("x") * 1.0 / F.col("n") * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("r"),
    ).localCheckpoint(eager=True)  # moments + final join
    mom = rt.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            F.sum(F.floor(F.col("r") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1))
            / 1_000_000.0
        ).alias("mbar"),
    )
    dev = F.col("r") - F.col("mbar")
    vv = rt.crossJoin(F.broadcast(mom)).groupBy("k", "mbar").agg(
        F.when(
            F.col("k") >= 2,
            F.sum(
                F.floor(dev * dev * 1_000_000_000_000.0 + F.lit(0.5)).cast("bigint")
            ).cast("double")
            / 1_000_000_000_000.0
            / (F.col("k") - 1),
        ).alias("v")
    )
    mbar, v = F.col("mbar"), F.col("v")
    strength = mbar * (1.0 - mbar) / v - 1.0
    prior = vv.select(
        F.when(
            (v > 0) & (strength > 0),
            F.floor(mbar * strength * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("alpha"),
        F.when(
            (v > 0) & (strength > 0),
            F.floor((1.0 - mbar) * strength * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("beta"),
    )
    a, b = F.col("alpha"), F.col("beta")
    return rt.crossJoin(F.broadcast(prior)).select(
        F.col("nk").alias("c_nationkey"),
        F.col("n").alias("n_orders"),
        F.col("x").alias("n_flagged"),
        F.col("r").alias("raw_rate"),
        "alpha",
        "beta",
        F.when(
            a.isNotNull(),
            F.floor(
                (F.col("x") + a) / (F.col("n") + a + b) * 1_000_000.0 + F.lit(0.5)
            )
            / 1_000_000.0,
        )
        .otherwise(F.col("r"))
        .alias("shrunk_rate"),
        a.isNull().alias("no_shrinkage"),
    )


# --------------------------------------------------------------------------
# agg_levene_test — Levene's test for variance homogeneity across the k
# event-type groups (Levene 1960, the mean-centered original): ANOVA's F
# assumes equal group variances — this IS that assumption's test, the
# one-way ANOVA machinery applied to the absolute deviations
# z_ij = |x_ij − x̄_j|.  Reject ⇒ agg_anova_f's p-values are unreliable
# and agg_welch_ttest's unequal-variance form is the right pairwise tool.
#
# Scale shape: TWO corpus passes by necessity (group means, then
# deviations — Levene is defined on them), each a balanced keyed
# aggregate with the k-row means broadcast back.  The combine reuses the
# agg_anova_f fixed-point discipline on the k-row relation.
#
# Parity: means ROUND 6 from exact decimal sums; z quantizes q6;
# per-group ratio terms quantize 1e-6 before the cross-group sum; W and
# the dfs are identical IEEE expressions; degenerate inputs NULL out.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_LEVENE_ORACLE = """
WITH gm AS (
  SELECT event_type,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
           AS m
  FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_type,
         FLOOR(abs(e.value - gm.m) * 1000000.0 + 0.5) / 1000000.0 AS z
  FROM events e JOIN gm ON gm.event_type = e.event_type
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(z AS DECIMAL(25,6))) AS sz,
         -- qprod floor-micro product (round-12 idiom): exact int128
         -- squares; DuckDB's DECIMAL(18) multiply overflows at ~1e9
         SUM((CAST(CAST(FLOOR((z) * 1000000.0 + 0.5) AS BIGINT) AS HUGEINT) * CAST(FLOOR((z) * 1000000.0 + 0.5) AS BIGINT))) AS szz
  FROM z GROUP BY event_type
),
t AS (
  -- varchar-route conversions (internal int128 beyond 2^63 double-rounds)
  SELECT n, sz, CAST(CAST(sz AS VARCHAR) AS DOUBLE) AS szd,
         CAST(CAST(szz AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS szzd FROM g
),
c AS (
  -- group squared-sum terms are int64-quantize-exact only below 9.2e12;
  -- out-of-range groups (one extreme value suffices) flip exact_ok and
  -- the statistics report NULL instead of a saturated estimate
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(sz) AS DOUBLE) AS szt,
         BOOL_AND(abs(szd * szd / n) < 9.2e12
                  AND abs(szzd - szd * szd / n) < 9.2e12) AS exact_ok,
         CAST(SUM(CASE WHEN abs(szd * szd / n) < 9.2e12 THEN
              CAST(FLOOR((szd * szd / n) * 1000000.0 + 0.5) AS BIGINT) END)
              AS DOUBLE) / 1000000.0 AS b_sum,
         CAST(SUM(CASE WHEN abs(szzd - szd * szd / n) < 9.2e12 THEN
              CAST(FLOOR((szzd - szd * szd / n) * 1000000.0 + 0.5)
                       AS BIGINT) END) AS DOUBLE) / 1000000.0 AS ssw
  FROM t
),
f AS (
  SELECT k, nt, exact_ok,
         CASE WHEN exact_ok THEN ssw END AS ssw,
         CASE WHEN exact_ok
              AND abs(b_sum - szt * szt / nt) < 9.2e12 THEN
           FLOOR((b_sum - szt * szt / nt) * 1000000.0 + 0.5)
             / 1000000.0 END AS ssb
  FROM c
)
SELECT k AS k_groups, nt AS n_total,
       CASE WHEN k > 1 AND nt > k AND ssw > 0 THEN
         FLOOR((ssb / (k - 1)) / (ssw / (nt - k)) * 1000000.0 + 0.5)
           / 1000000.0 END AS levene_w,
       CASE WHEN k > 1 AND nt > k AND ssw > 0 THEN
         FLOOR((ssb / (k - 1)) / (ssw / (nt - k)) * 1000000.0 + 0.5)
           / 1000000.0 >
           CASE CAST(k - 1 AS INT) WHEN 1 THEN 3.841459 WHEN 2 THEN 2.995732
                WHEN 3 THEN 2.604898 WHEN 4 THEN 2.371611
                ELSE 2.214069 END
       END AS variances_differ
FROM f
"""


@register("agg_levene_test", oracle=_LEVENE_ORACLE)
def agg_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    gm = ev.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m")
    )
    z = ev.join(F.broadcast(gm), "event_type").select(
        "event_type",
        (
            F.floor(F.abs(F.col("value") - F.col("m")) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("z"),
    )
    dec25 = F.col("z").cast("decimal(25,6)")
    dec18 = F.col("z").cast("decimal(18,6)")
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec25).alias("sz"),
        F.sum(qprod(F.col("z"), F.col("z"))).alias("szz"),
    )
    t = g.select(
        "n",
        "sz",
        F.col("sz").cast("double").alias("szd"),
        (F.col("szz").cast("double") / 1_000_000_000_000.0).alias("szzd"),
    )
    b_term = F.col("szd") * F.col("szd") / F.col("n")
    w_term = F.col("szzd") - b_term
    _BND = 9.2e12  # int64 quantize bound — see the oracle's exact_ok note
    c = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("sz").cast("double").alias("szt"),
        F.min((F.abs(b_term) < _BND) & (F.abs(w_term) < _BND)).alias("exact_ok"),
        (
            F.sum(
                F.when(
                    F.abs(b_term) < _BND,
                    F.floor(b_term * 1_000_000.0 + F.lit(0.5)).cast("bigint"),
                )
            )
            .cast("double")
            / 1_000_000.0
        ).alias("b_sum"),
        (
            F.sum(
                F.when(
                    F.abs(w_term) < _BND,
                    F.floor(w_term * 1_000_000.0 + F.lit(0.5)).cast("bigint"),
                )
            ).cast("double")
            / 1_000_000.0
        ).alias("ssw"),
    )
    k, nt = F.col("k"), F.col("nt")
    ssb_raw = F.col("b_sum") - F.col("szt") * F.col("szt") / nt
    f = c.select(
        k,
        nt,
        F.when(F.col("exact_ok"), F.col("ssw")).alias("ssw"),
        F.when(
            F.col("exact_ok") & (F.abs(ssb_raw) < _BND),
            F.floor(ssb_raw * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("ssb"),
    )
    ssw = F.col("ssw")
    ssb = F.col("ssb")
    ok = (k > 1) & (nt > k) & (ssw > 0)
    w = F.floor((ssb / (k - 1)) / (ssw / (nt - k)) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
    crit = (
        F.when(k - 1 == 1, 3.841459)
        .when(k - 1 == 2, 2.995732)
        .when(k - 1 == 3, 2.604898)
        .when(k - 1 == 4, 2.371611)
        .otherwise(2.214069)
    )
    return f.select(
        k.alias("k_groups"),
        nt.alias("n_total"),
        F.when(ok, w).alias("levene_w"),
        F.when(ok, w > crit).alias("variances_differ"),
    )


# --------------------------------------------------------------------------
# agg_iv_2sls — instrumental-variables estimate of a causal slope (Wright
# 1928; the Wald estimator for a binary instrument ≡ 2SLS): OLS of
# purchase value on engagement is confounded (motivated users do both);
# the A/B arm (user_id % 2 — ts the agg_ab_ztest assignment) moves
# engagement but touches outcomes only THROUGH it, so
# β_IV = cov(z, y)/cov(z, x) isolates the causal path.  Reported next to
# the confounded OLS slope and the FIRST-STAGE F (Staiger & Stock 1997's
# weak-instrument rule: F < 10 ⇒ the IV answer is untrustworthy and the
# flag says so).
#
# Scale shape: ONE user-level aggregate (x = q6 avg non-purchase value,
# y = q6 purchase total, z = arm), then ONE moments aggregate (decimal
# sums of 1e6-scaled integer products — exact at any n).  No windows, no
# joins.
#
# Parity: all slopes/F from identical IEEE expressions on exact sums,
# q6; zero denominators (no arm variation, constant x) yield NULLs.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_IV_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS z,
         CAST(FLOOR(COALESCE(
           SUM(CASE WHEN event_type <> 'purchase' THEN value END)
             -- COUNT of VALUES, not rows: the SUM skips NULL values, so
             -- the denominator must too (Spark F.count(expr) semantics;
             -- a THEN-1 count silently shrank the mean on NULL-bearing
             -- days — round-12 tail)
             / NULLIF(COUNT(CASE WHEN event_type <> 'purchase' THEN value END), 0),
           0.0) * 1000000.0 + 0.5) AS BIGINT) AS xq,
         CAST(FLOOR(COALESCE(
           SUM(CASE WHEN event_type = 'purchase' THEN value END), 0.0)
           * 1000000.0 + 0.5) AS BIGINT) AS yq
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS HUGEINT) AS sz,
         CAST(SUM(xq) AS HUGEINT) AS sx, CAST(SUM(yq) AS HUGEINT) AS sy,
         CAST(SUM(z * xq) AS HUGEINT) AS szx,
         CAST(SUM(z * yq) AS HUGEINT) AS szy,
         CAST(SUM(CAST(xq AS HUGEINT) * yq) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS sxx
  FROM u
),
f AS (
  SELECT n, sz,
         CAST(n * szy - sz * sy AS DOUBLE) AS czy,
         CAST(n * szx - sz * sx AS DOUBLE) AS czx,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
         CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
         CAST(n * sz - sz * sz AS DOUBLE) AS czz
  FROM m
)
SELECT n AS n_users,
       CASE WHEN cxx > 0 THEN
         FLOOR(cxy / cxx * 1000000.0 + 0.5) / 1000000.0 END AS beta_ols,
       CASE WHEN czx <> 0 AND czz > 0 THEN
         FLOOR(czy / czx * 1000000.0 + 0.5) / 1000000.0 END AS beta_iv,
       CASE WHEN czz > 0 AND n > 2
                 AND cxx / n / 1000000.0 / 1000000.0 * n
                     - (czx / n / 1000000.0) * (czx / n / 1000000.0) / (czz / n / n) > 0
            THEN
         FLOOR(((czx / n / 1000000.0) * (czx / n / 1000000.0) / (czz / n / n))
               / ((cxx / n / 1000000.0 / 1000000.0 * n
                   - (czx / n / 1000000.0) * (czx / n / 1000000.0)
                     / (czz / n / n)) / (n - 2))
               * 1000000.0 + 0.5) / 1000000.0 END AS first_stage_f,
       CASE WHEN czz > 0 AND n > 2
                 AND cxx / n / 1000000.0 / 1000000.0 * n
                     - (czx / n / 1000000.0) * (czx / n / 1000000.0) / (czz / n / n) > 0
            THEN
         FLOOR(((czx / n / 1000000.0) * (czx / n / 1000000.0) / (czz / n / n))
               / ((cxx / n / 1000000.0 / 1000000.0 * n
                   - (czx / n / 1000000.0) * (czx / n / 1000000.0)
                     / (czz / n / n)) / (n - 2))
               * 1000000.0 + 0.5) / 1000000.0 < 10.0 END AS weak_instrument
FROM f
"""


@register("agg_iv_2sls", oracle=_IV_ORACLE)
def agg_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    npv = F.when(F.col("event_type") != "purchase", F.col("value"))
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("bigint").alias("z"),
        F.floor(
            F.coalesce(F.sum(npv) / F.count(npv), F.lit(0.0)) * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("xq"),
        F.floor(F.coalesce(F.sum(pv), F.lit(0.0)) * 1_000_000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("yq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("decimal(38,0)").alias("sz"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum("yq").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("z") * F.col("xq")).cast("decimal(38,0)").alias("szx"),
        F.sum(F.col("z") * F.col("yq")).cast("decimal(38,0)").alias("szy"),
        F.sum(dec(F.col("xq")) * F.col("yq")).alias("sxy"),
        F.sum(dec(F.col("xq")) * F.col("xq")).alias("sxx"),
    )
    n = F.col("n").cast("decimal(38,0)")
    f = m.select(
        F.col("n"),
        (n * F.col("szy") - F.col("sz") * F.col("sy")).cast("double").alias("czy"),
        (n * F.col("szx") - F.col("sz") * F.col("sx")).cast("double").alias("czx"),
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("cxy"),
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("cxx"),
        (n * F.col("sz") - F.col("sz") * F.col("sz")).cast("double").alias("czz"),
    )
    nn = F.col("n")
    czy, czx, cxy, cxx, czz = (
        F.col("czy"), F.col("czx"), F.col("cxy"), F.col("cxx"), F.col("czz"),
    )
    # first-stage F on the q6 x-scale: slope/variance terms de-scaled by 1e6
    b1 = czx / nn / 1_000_000.0
    ess = b1 * b1 / (czz / nn / nn)
    rss = cxx / nn / 1_000_000.0 / 1_000_000.0 * nn - ess
    fstat = F.floor(ess / (rss / (nn - 2)) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
    return f.select(
        nn.alias("n_users"),
        F.when(
            cxx > 0, F.floor(cxy / cxx * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).alias("beta_ols"),
        F.when(
            (czx != 0) & (czz > 0),
            F.floor(czy / czx * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("beta_iv"),
        F.when((czz > 0) & (nn > 2) & (rss > 0), fstat).alias("first_stage_f"),
        F.when((czz > 0) & (nn > 2) & (rss > 0), fstat < 10.0).alias(
            "weak_instrument"
        ),
    )


# --------------------------------------------------------------------------
# agg_gpd_tail — peaks-over-threshold tail modeling with the Generalized
# Pareto Distribution (Pickands 1975; moment estimators of Hosking &
# Wallis 1987): exceedances of value over a per-metric threshold
# (mean + 2σ, from exact moments — one pass) follow a GPD whose shape ξ
# and scale β come from the exceedances' mean and variance:
# ξ = (1 − m²/v)/2, β = m(m²/v + 1)/2.  Reports the 1-in-10,000-events
# return level — the "how bad can a single event plausibly get" number
# agg_gumbel_extremes answers for BLOCK maxima; POT uses every tail
# observation instead and is the standard when exceedances are plentiful.
#
# Scale shape: TWO corpus aggregates (global moments for the threshold,
# then exceedance moments above it) with the 1-row thresholds broadcast
# between — no sorting, no windows, no order statistics.
#
# Parity: thresholds and moments from exact fixed-point/decimal sums;
# ξ, β, and the return level are identical IEEE expressions (q6);
# metrics with < 30 exceedances or zero exceedance variance yield NULLs
# (a tail fit on nothing is noise).  ξ ≥ 1 (infinite-mean regime) NULLs
# the return level but reports the shape.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_GPD_RETURN_N = 10000.0  # 1-in-N-events return level
_GPD_MIN_EXC = 30

_GPD_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sq,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 1000000.0 + 0.5) AS HUGEINT)) AS ssq
  FROM events GROUP BY event_type
),
thr AS (
  SELECT event_type, n,
         FLOOR((CAST(sq AS DOUBLE) / 1000000.0 / n
                + 2.0 * sqrt(GREATEST(
                    (CAST(ssq AS DOUBLE) / 1000000.0 / 1000000.0
                     - CAST(sq AS DOUBLE) / 1000000.0
                       * (CAST(sq AS DOUBLE) / 1000000.0) / n) / n, 0.0)))
               * 1000000.0 + 0.5) / 1000000.0 AS u
  FROM g
),
exc AS (
  SELECT e.event_type, t.n AS n_total, t.u,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(FLOOR((e.value - t.u) * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sq,
         SUM(CAST(FLOOR((e.value - t.u) * 1000000.0 + 0.5) AS BIGINT)
             * CAST(FLOOR((e.value - t.u) * 1000000.0 + 0.5) AS HUGEINT))
           AS ssq
  FROM events e JOIN thr t ON t.event_type = e.event_type
  WHERE e.value > t.u
  GROUP BY e.event_type, t.n, t.u
),
fit AS (
  SELECT event_type, n_total, u, k,
         CAST(sq AS DOUBLE) / 1000000.0 / k AS m,
         (CAST(ssq AS DOUBLE) / 1000000.0 / 1000000.0
          - CAST(sq AS DOUBLE) / 1000000.0
            * (CAST(sq AS DOUBLE) / 1000000.0) / k) / NULLIF(k - 1, 0) AS v
  FROM exc
)
SELECT event_type, u AS threshold, k AS n_exceed,
       CASE WHEN k >= {_GPD_MIN_EXC} AND v > 0 THEN
         FLOOR((1.0 - m * m / v) / 2.0 * 1000000.0 + 0.5) / 1000000.0
       END AS xi,
       CASE WHEN k >= {_GPD_MIN_EXC} AND v > 0 THEN
         FLOOR(m * (m * m / v + 1.0) / 2.0 * 1000000.0 + 0.5) / 1000000.0
       END AS beta,
       CASE WHEN k >= {_GPD_MIN_EXC} AND v > 0
                 AND (1.0 - m * m / v) / 2.0 < 1.0
                 AND abs((1.0 - m * m / v) / 2.0) > 0.000001 THEN
         FLOOR((u + m * (m * m / v + 1.0) / 2.0
                    / ((1.0 - m * m / v) / 2.0)
                    * (pow({_GPD_RETURN_N} * k / n_total,
                           (1.0 - m * m / v) / 2.0) - 1.0))
               * 1000000.0 + 0.5) / 1000000.0
       END AS return_level_10k
FROM fit
"""


@register("agg_gpd_tail", oracle=_GPD_ORACLE)
def agg_gpd_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vq).cast("bigint").alias("sq"),
        F.sum(vq.cast("decimal(38,0)") * vq.cast("decimal(38,0)")).alias("ssq"),
    )
    n = F.col("n")
    mean = F.col("sq").cast("double") / 1_000_000.0 / n
    var = (
        F.col("ssq").cast("double") / 1_000_000.0 / 1_000_000.0
        - F.col("sq").cast("double")
        / 1_000_000.0
        * (F.col("sq").cast("double") / 1_000_000.0)
        / n
    ) / n
    thr = g.select(
        "event_type",
        "n",
        (
            F.floor(
                (mean + 2.0 * F.sqrt(F.greatest(var, F.lit(0.0)))) * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("u"),
    )
    eq = F.floor((F.col("value") - F.col("u")) * 1_000_000.0 + 0.5).cast("bigint")
    exc = (
        ev.join(F.broadcast(thr), "event_type")
        .filter(F.col("value") > F.col("u"))
        .groupBy("event_type", F.col("n").alias("n_total"), "u")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(eq).cast("bigint").alias("sq"),
            F.sum((eq * eq).cast("decimal(38,0)")).alias("ssq"),
        )
    )
    k = F.col("k")
    m = F.col("sq").cast("double") / 1_000_000.0 / k
    v = (
        F.col("ssq").cast("double") / 1_000_000.0 / 1_000_000.0
        - F.col("sq").cast("double")
        / 1_000_000.0
        * (F.col("sq").cast("double") / 1_000_000.0)
        / k
    ) / F.nullif(k - 1, F.lit(0))
    fit = exc.select("event_type", "n_total", "u", "k", m.alias("m"), v.alias("v"))
    mm, vv = F.col("m"), F.col("v")
    xi = (1.0 - mm * mm / vv) / 2.0
    beta = mm * (mm * mm / vv + 1.0) / 2.0
    ok = (k >= _GPD_MIN_EXC) & (vv > 0)
    rl = (
        F.col("u")
        + beta / xi * (F.pow(_GPD_RETURN_N * k / F.col("n_total"), xi) - 1.0)
    )
    return fit.select(
        "event_type",
        F.col("u").alias("threshold"),
        k.alias("n_exceed"),
        F.when(ok, F.floor(xi * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "xi"
        ),
        F.when(ok, F.floor(beta * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "beta"
        ),
        F.when(
            ok & (xi < 1.0) & (F.abs(xi) > 0.000001),
            F.floor(rl * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0,
        ).alias("return_level_10k"),
    )


# --------------------------------------------------------------------------
# agg_huber_mean — robust location per metric by Huber's M-estimator
# (Huber 1964), fit with T=5 IRLS passes: weights w = min(1, c·s/|x−μ|)
# downweight observations beyond c = 1.345 scale units (the 95%-efficiency
# tuning constant), so a fat-tailed value column gets a location estimate
# a handful of outliers cannot drag — the robust companion to the plain
# mean next to agg_trimmed_winsorized's fixed-fraction cuts (Huber adapts
# the cut to the data's own scale).
#
# Scale shape: the agg_logistic_irls pattern — one moments pass for the
# initial mean/scale, then T corpus aggregates with the current k-row μ
# relation broadcast; weighted sums accumulate 1e-9-floored bigints into
# decimal(38,0) (the weight is per-row nonlinear).
#
# Parity: s and μ₀ q6 from exact sums; w, Σwx, Σw identical IEEE with
# fixed-point floors; μ q9 per pass; zero scale (constant column)
# short-circuits to the plain mean.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HUBER_T = 5
_HUBER_C = 1.345


def _huber_oracle() -> str:
    parts = [
        """
WITH g AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sq,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 1000000.0 + 0.5) AS HUGEINT)) AS ssq
  FROM events GROUP BY event_type
),
init AS MATERIALIZED (
  SELECT event_type, n,
         FLOOR(CAST(sq AS DOUBLE) / 1000000.0 / n * 1000000.0 + 0.5)
           / 1000000.0 AS m0,
         FLOOR(sqrt(GREATEST((CAST(ssq AS DOUBLE) / 1000000.0 / 1000000.0
                    - CAST(sq AS DOUBLE) / 1000000.0
                      * (CAST(sq AS DOUBLE) / 1000000.0) / n) / n, 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS s
  FROM g
),
mu0 AS MATERIALIZED (SELECT event_type, m0 AS mu FROM init)"""
    ]
    for t in range(1, _HUBER_T + 1):
        parts.append(
            f""",
mu{t} AS MATERIALIZED (
  SELECT i.event_type,
         CASE WHEN i.s > 0 THEN
           FLOOR(
             (CAST(SUM(CAST(FLOOR(
                LEAST(1.0, {_HUBER_C} * i.s / NULLIF(abs(e.value - p.mu), 0.0))
                * e.value * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
              / 1000000000.0)
             / (CAST(SUM(CAST(FLOOR(
                LEAST(1.0, {_HUBER_C} * i.s / NULLIF(abs(e.value - p.mu), 0.0))
                * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                / 1000000000.0)
             * 1000000000.0 + 0.5) / 1000000000.0
         ELSE i.m0 END AS mu
  FROM events e
  JOIN init i ON i.event_type = e.event_type
  JOIN mu{t - 1} p ON p.event_type = e.event_type
  GROUP BY i.event_type, i.s, i.m0
)"""
        )
    parts.append(
        f"""
SELECT i.event_type, i.n, i.m0 AS mean_plain, i.s AS scale_s,
       FLOOR(m.mu * 1000000.0 + 0.5) / 1000000.0 AS huber_mean
FROM init i JOIN mu{_HUBER_T} m ON m.event_type = i.event_type"""
    )
    return "".join(parts)


_HUBER_ORACLE = _huber_oracle()


@register("agg_huber_mean", oracle=_HUBER_ORACLE)
def agg_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vq).cast("bigint").alias("sq"),
        F.sum(vq.cast("decimal(38,0)") * vq.cast("decimal(38,0)")).alias("ssq"),
    )
    n = F.col("n")
    init = g.select(
        "event_type",
        "n",
        (
            F.floor(
                F.col("sq").cast("double") / 1_000_000.0 / n * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("m0"),
        (
            F.floor(
                F.sqrt(
                    F.greatest(
                        (
                            F.col("ssq").cast("double") / 1_000_000.0 / 1_000_000.0
                            - F.col("sq").cast("double")
                            / 1_000_000.0
                            * (F.col("sq").cast("double") / 1_000_000.0)
                            / n
                        )
                        / n,
                        F.lit(0.0),
                    )
                )
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("s"),
    ).localCheckpoint(eager=True)  # T passes + final join
    mu = init.select("event_type", F.col("m0").alias("mu"))
    for _ in range(_HUBER_T):
        w = F.least(
            F.lit(1.0),
            _HUBER_C
            * F.col("s")
            / F.nullif(F.abs(F.col("value") - F.col("mu")), F.lit(0.0)),
        )
        mu = (
            ev.join(F.broadcast(init.select("event_type", "s", "m0")), "event_type")
            .join(F.broadcast(mu), "event_type")
            .groupBy("event_type", "s", "m0")
            .agg(
                (
                    F.sum(
                        F.floor(w * F.col("value") * 1_000_000_000.0 + F.lit(0.5))
                        .cast("decimal(38,0)")
                    ).cast("double")
                    / 1_000_000_000.0
                ).alias("swx"),
                (
                    F.sum(
                        F.floor(w * 1_000_000_000.0 + F.lit(0.5)).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    / 1_000_000_000.0
                ).alias("sw"),
            )
            .select(
                "event_type",
                F.when(
                    F.col("s") > 0,
                    F.floor(
                        F.col("swx") / F.col("sw") * 1_000_000_000.0 + F.lit(0.5)
                    )
                    / 1_000_000_000.0,
                )
                .otherwise(F.col("m0"))
                .alias("mu"),
            )
            # NO per-pass materialization (r13 optimization round): each
            # pass references the previous μ exactly ONCE (the singular
            # fallback is init.m0, not prev μ), so the unrolled plan is
            # LINEAR in T and the whole fit runs as one job — the old
            # eager localCheckpoint here paid T full job launches to
            # materialize a k-row relation each pass (guide §1.2: remove
            # passes before tuning inside them).  init stays checkpointed:
            # it fans into every pass and the final join.
        )
    return init.join(mu, "event_type").select(
        "event_type",
        "n",
        F.col("m0").alias("mean_plain"),
        F.col("s").alias("scale_s"),
        (F.floor(F.col("mu") * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0).alias(
            "huber_mean"
        ),
    )


# --------------------------------------------------------------------------
# agg_parallel_trends — the pre-trend diagnostic agg_diff_in_diff ASSUMES
# (the event-study pre-test of Angrist & Pischke's DiD chapter): in the
# PRE-period (before the same midpoint cutoff DiD uses), regress the
# daily treatment−control gap on the day index; a slope t-statistic
# beyond ±1.96 means the arms were already diverging and the DiD estimate
# is confounded.  Completes the assumption-check pattern (ANOVA ↔ Levene,
# IV ↔ first-stage F): every estimator in the repo ships with the test of
# the thing it takes on faith.
#
# Scale shape: ONE corpus aggregate into (arm, day) cells (calendar-
# bounded), the per-day gap pivot, and an exact-integer OLS on ≤ #days
# rows.  The midpoint cutoff is a 1-row broadcast (the DiD convention).
#
# Parity: daily means ROUND 6 from exact decimal sums; gaps q6 and
# scaled to integers for the regression sums (HUGEINT/decimal);
# slope/se/t identical IEEE expressions (q6); < 3 pre-days or zero
# x-variance or zero residual variance → NULL t (flag NULL, never a
# fake verdict).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PTREND_ORACLE = """
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cut FROM events
),
cells AS (
  SELECT user_id % 2 AS treat, CAST(ts AS DATE) AS d,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS sx
  FROM events CROSS JOIN bounds b
  WHERE epoch_us(ts) < b.cut
  GROUP BY 1, 2, 3
),
gap AS (
  SELECT x,
         CAST(FLOOR((ROUND(CAST(MAX(CASE WHEN treat = 1 THEN sx END) AS DOUBLE)
                           / MAX(CASE WHEN treat = 1 THEN n END), 6)
                     - ROUND(CAST(MAX(CASE WHEN treat = 0 THEN sx END) AS DOUBLE)
                             / MAX(CASE WHEN treat = 0 THEN n END), 6))
                    * 1000000.0 + 0.5) AS BIGINT) AS gq
  FROM cells GROUP BY d, x
  HAVING MAX(CASE WHEN treat = 1 THEN n END) IS NOT NULL
     AND MAX(CASE WHEN treat = 0 THEN n END) IS NOT NULL
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(gq) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * gq) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(gq AS HUGEINT) * gq) AS HUGEINT) AS syy
  FROM gap
),
f AS (
  SELECT k,
         CAST(k * sxy - sx * sy AS DOUBLE) AS cxy,
         CAST(k * sxx - sx * sx AS DOUBLE) AS cxx,
         CAST(k * syy - sy * sy AS DOUBLE) AS cyy
  FROM m
)
SELECT k AS n_pre_days,
       CASE WHEN k >= 3 AND cxx > 0 THEN
         FLOOR(cxy / cxx / 1000000.0 * 1000000.0 + 0.5) / 1000000.0
       END AS gap_slope_per_day,
       CASE WHEN k >= 3 AND cxx > 0 AND cyy - cxy * cxy / cxx > 0 THEN
         FLOOR((cxy / cxx)
               / sqrt((cyy - cxy * cxy / cxx) / (k - 2) / cxx)
               * 1000000.0 + 0.5) / 1000000.0
            WHEN k >= 3 AND cxx > 0 AND cxy = 0 THEN 0.0
       END AS trend_t_stat,
       CASE WHEN k >= 3 AND cxx > 0 AND cyy - cxy * cxy / cxx > 0 THEN
         abs(FLOOR((cxy / cxx)
                   / sqrt((cyy - cxy * cxy / cxx) / (k - 2) / cxx)
                   * 1000000.0 + 0.5) / 1000000.0) <= 1.959964
            WHEN k >= 3 AND cxx > 0 THEN cxy = 0
       END AS parallel_ok
FROM f
"""


@register("agg_parallel_trends", oracle=_PTREND_ORACLE)
def agg_parallel_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("bigint")
        .alias("cut")
    )
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .filter(F.unix_micros("ts") < F.col("cut"))
        .groupBy(
            (F.col("user_id") % 2).alias("treat"),
            F.col("ts").cast("date").alias("d"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("bigint").alias("x"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("sx"),
        )
    )
    pick = lambda t, c: F.max(F.when(F.col("treat") == t, F.col(c)))  # noqa: E731
    gap = (
        cells.groupBy("d", "x")
        .agg(
            pick(1, "sx").alias("sx1"), pick(1, "n").alias("n1"),
            pick(0, "sx").alias("sx0"), pick(0, "n").alias("n0"),
        )
        .filter(F.col("n1").isNotNull() & F.col("n0").isNotNull())
        .select(
            "x",
            F.floor(
                (
                    F.round(F.col("sx1").cast("double") / F.col("n1"), 6)
                    - F.round(F.col("sx0").cast("double") / F.col("n0"), 6)
                )
                * 1_000_000.0
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("gq"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = gap.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("gq").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * F.col("gq")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("gq") * F.col("gq")).alias("syy"),
    )
    kd = F.col("k").cast("decimal(38,0)")
    f = m.select(
        F.col("k"),
        (kd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("cxy"),
        (kd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("cxx"),
        (kd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
    )
    k, cxy, cxx, cyy = F.col("k"), F.col("cxy"), F.col("cxx"), F.col("cyy")
    rssx = cyy - cxy * cxy / cxx
    t = (
        F.floor(
            (cxy / cxx) / F.sqrt(rssx / (k - 2) / cxx) * 1_000_000.0 + F.lit(0.5)
        )
        / 1_000_000.0
    )
    ok = (k >= 3) & (cxx > 0)
    # perfect-fit branches: a constant gap (cxy = 0, rssx = 0) is the
    # textbook parallel case (t = 0, ok); a perfectly LINEAR divergence
    # (rssx = 0, cxy != 0) is infinitely significant (t NULL, not ok).
    return f.select(
        k.alias("n_pre_days"),
        F.when(
            ok,
            F.floor(cxy / cxx / 1_000_000.0 * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0,
        ).alias("gap_slope_per_day"),
        F.when(ok & (rssx > 0), t)
        .when(ok & (cxy == 0), F.lit(0.0))
        .alias("trend_t_stat"),
        F.when(ok & (rssx > 0), F.abs(t) <= 1.959964)
        .when(ok, cxy == 0)
        .alias("parallel_ok"),
    )
