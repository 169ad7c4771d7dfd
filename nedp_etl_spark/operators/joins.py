"""Join operators (SURVEY.md §2 'Joins').

Strategy notes (the 100 TB posture — each query's plan is asserted in
``tests/test_plans.py``):

- Dimension tables (region/nation/supplier, and customer against the fact
  side) are explicitly ``F.broadcast``-hinted: a BroadcastHashJoin ships the
  small side to every executor and avoids shuffling the fact table at all.
- Fact⋈fact (lineitem⋈orders) is left to Catalyst: with AQE on it picks
  sort-merge or shuffled-hash on the join key and splits skewed partitions
  at runtime.
- The non-equi shapes (cross/theta, range, as-of) keep the *small* side on
  the nested-loop/broadcast axis; the as-of join is the window-rank idiom
  because Spark SQL has no native ASOF JOIN (DuckDB does — SURVEY §4).

Reference parity: joins exist in the reference only as dbt-model SQL on
Spark (``/root/reference/dbtoperator.py:273-274``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

# --------------------------------------------------------------------------
# join_inner_equi — fact ⋈ fact equi join.
# --------------------------------------------------------------------------

_JOIN_INNER_ORACLE = f"""
SELECT
  o.o_orderstatus,
  COUNT(*) AS n_lines,
  {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  {osum('o.o_totalprice')} AS order_price_sum
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o.o_orderstatus
"""


@register("join_inner_equi", oracle=_JOIN_INNER_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            dsum("o_totalprice").alias("order_price_sum"),
        )
    )


# --------------------------------------------------------------------------
# join_left_right_full — outer joins (full outer exercises both null sides;
# left/right are projections of the same shape, asserted via tag columns).
# --------------------------------------------------------------------------

_JOIN_OUTER_ORACLE = """
SELECT
  c.c_custkey,
  c.c_name,
  o.o_orderkey,
  ROUND(o.o_totalprice, 6) AS o_totalprice,
  (c.c_custkey IS NOT NULL AND o.o_orderkey IS NOT NULL) AS both_sides,
  (o.o_orderkey IS NULL) AS cust_only
FROM customer c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o
  ON c.c_custkey = o.o_custkey
"""


@register("join_left_right_full", oracle=_JOIN_OUTER_ORACLE)
def join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.col("c_custkey"),
        F.col("c_name"),
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice"), 6).alias("o_totalprice"),
        (F.col("c_custkey").isNotNull() & F.col("o_orderkey").isNotNull()).alias("both_sides"),
        F.col("o_orderkey").isNull().alias("cust_only"),
    )


# --------------------------------------------------------------------------
# join_semi_anti — existence / anti-existence as left_semi / left_anti.
# --------------------------------------------------------------------------

_JOIN_SEMI_ANTI_ORACLE = """
SELECT c_custkey, c_mktsegment, 'has_big_order' AS tag
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
UNION ALL
SELECT c_custkey, c_mktsegment, 'no_order' AS tag
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("join_semi_anti", oracle=_JOIN_SEMI_ANTI_ORACLE)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .withColumn("tag", F.lit("has_big_order"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .withColumn("tag", F.lit("no_order"))
    )
    return semi.unionAll(anti)


# --------------------------------------------------------------------------
# join_broadcast — star-dimension join with explicit broadcast hints.
# --------------------------------------------------------------------------

_JOIN_BROADCAST_ORACLE = f"""
SELECT
  r.r_name,
  n.n_name,
  COUNT(*) AS n_customers,
  {osum('c.c_acctbal')} AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("join_broadcast", oracle=_JOIN_BROADCAST_ORACLE)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    # nation (25 rows) and region (5 rows) broadcast to every executor —
    # the customer table never shuffles for the join, only for the agg.
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
    )


# --------------------------------------------------------------------------
# join_cross_theta — cross product + non-equi predicate
# (BroadcastNestedLoopJoin; both sides tiny by construction).
# --------------------------------------------------------------------------

_JOIN_CROSS_THETA_ORACLE = """
SELECT a.r_name AS r1, b.r_name AS r2, a.r_regionkey + b.r_regionkey AS key_sum
FROM region a CROSS JOIN region b
WHERE a.r_regionkey < b.r_regionkey
"""


@register("join_cross_theta", oracle=_JOIN_CROSS_THETA_ORACLE)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "region").alias("a")
    b = load(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(
            F.col("a.r_name").alias("r1"),
            F.col("b.r_name").alias("r2"),
            (F.col("a.r_regionkey") + F.col("b.r_regionkey")).alias("key_sum"),
        )
    )


# --------------------------------------------------------------------------
# join_range — interval containment with NO equi key.  The interval side is
# kept small and broadcast, which is the scale path: a nested-loop against a
# broadcast list of ranges is O(rows × ranges) map-side work, no shuffle.
# --------------------------------------------------------------------------

_JOIN_RANGE_ORACLE = """
SELECT
  w.o_orderkey AS window_id,
  COUNT(*) AS n_shipped
FROM (SELECT o_orderkey, o_orderdate AS start_ts,
             o_orderdate + INTERVAL 60 DAY AS end_ts
      FROM orders WHERE o_orderkey < 320) w
JOIN lineitem l
  ON l.l_shipdate >= w.start_ts AND l.l_shipdate < w.end_ts
GROUP BY w.o_orderkey
"""


@register("join_range", oracle=_JOIN_RANGE_ORACLE)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    w = o.filter(F.col("o_orderkey") < 320).select(
        F.col("o_orderkey").alias("window_id"),
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("end_ts"),
    )
    return (
        li.join(
            F.broadcast(w),
            (li.l_shipdate >= w.start_ts) & (li.l_shipdate < w.end_ts),
        )
        .groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )


# --------------------------------------------------------------------------
# join_asof — for each purchase event, the latest click by the same user at
# or before the purchase.  Spark has no ASOF JOIN; the idiom is
# join + row_number()=1 over (purchase) ordered by click time desc.
# At scale the equi key (user_id) makes this a plain shuffled join and the
# per-key rank is bounded by that user's click count.
# --------------------------------------------------------------------------

_JOIN_ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     ranked AS (
       SELECT p.event_id AS purchase_id,
              p.user_id,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
              c.event_id AS click_id,
              ROW_NUMBER() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
       FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
     )
SELECT purchase_id, user_id, purchase_ts, click_id
FROM ranked WHERE rn = 1
"""


@register("join_asof", oracle=_JOIN_ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(c, (p.user_id == c.c_user) & (c.c_ts <= p.p_ts), "inner")
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "click_id",
        )
    )


# --------------------------------------------------------------------------
# join_multiway — TPC-H Q5-shaped 6-way star join.
# --------------------------------------------------------------------------

_JOIN_MULTIWAY_ORACLE = f"""
SELECT
  n.n_name,
  COUNT(*) AS n_lines,
  {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("join_multiway", oracle=_JOIN_MULTIWAY_ORACLE)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey))
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# join_hint_shuffle_hash — explicit physical-strategy control: the
# SHUFFLE_HASH hint builds a hash map on the (smaller) orders side instead
# of sort-merging both sides — skips both sorts when one side comfortably
# fits a per-partition hash map.  Same rows as the unhinted join (hints
# change the physical plan only); tests/test_plans.py asserts the strategy.
# --------------------------------------------------------------------------

_JOIN_HINT_ORACLE = f"""
SELECT o.o_orderpriority, COUNT(*) AS n, {osum('l.l_extendedprice')} AS total
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 150000
GROUP BY o.o_orderpriority
"""


@register("join_hint_shuffle_hash", oracle=_JOIN_HINT_ORACLE)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total"))
    )


# --------------------------------------------------------------------------
# join_range_binned — the 100 TB-safe range join.  ``join_range`` above is
# the broadcast nested-loop shape (right when the window side is tiny);
# when BOTH sides are fact-scale, the scalable idiom is bin bucketing:
# quantize the range dimension into fixed-width bins, explode each window
# to the bins it covers (<= 2 bins for window width <= bin width), then
# equi-join on the bin key with the range predicate as a residual filter.
# The join becomes a plain shuffled hash/sort-merge join on ``bin`` —
# partitionable, AQE-skew-splittable, no nested loop anywhere.  Each
# lineitem row lands in exactly one bin, so no dedup pass is needed.
# Reference parity: range-predicate joins reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BIN_DAYS = 60
_BIN_EPOCH = "1992-01-01"

_JOIN_RANGE_BINNED_ORACLE = """
SELECT
  w.o_orderkey AS window_id,
  COUNT(*) AS n_shipped
FROM (SELECT o_orderkey, o_orderdate AS start_ts,
             o_orderdate + INTERVAL 60 DAY AS end_ts
      FROM orders WHERE o_orderkey < 2000) w
JOIN lineitem l
  ON l.l_shipdate >= w.start_ts AND l.l_shipdate < w.end_ts
GROUP BY w.o_orderkey
"""


@register("join_range_binned", oracle=_JOIN_RANGE_BINNED_ORACLE)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    epoch = F.lit(_BIN_EPOCH).cast("date")
    w = o.filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").alias("window_id"),
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {_BIN_DAYS} DAYS")).alias("end_ts"),
    )
    # A [start, end) window of width <= _BIN_DAYS covers at most 2 bins.
    wb = w.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("start_ts").cast("date"), epoch) / _BIN_DAYS),
                F.floor(
                    (F.datediff(F.col("end_ts").cast("date"), epoch) - 1) / _BIN_DAYS
                ),
            )
        ),
    )
    lb = li.withColumn(
        "bin", F.floor(F.datediff(F.col("l_shipdate").cast("date"), epoch) / _BIN_DAYS)
    )
    return (
        lb.join(
            wb,
            (lb.bin == wb.bin)
            & (lb.l_shipdate >= wb.start_ts)
            & (lb.l_shipdate < wb.end_ts),
        )
        .groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )


# --------------------------------------------------------------------------
# join_bloom_prefilter — runtime Bloom-filter join pruning: when one join
# side is made selective by a local predicate, Catalyst builds a Bloom
# filter over its join keys at runtime (bloom_filter_agg, partial/final —
# itself a mergeable-sketch aggregate) and injects a ``might_contain``
# filter on the OTHER side's scan, so non-matching fact rows are dropped
# BEFORE the shuffle.  At 100 TB this is the single biggest shuffle
# reducer for selective fact⋈fact joins — the filter travels to the probe
# side's map tasks instead of 99% of the probe rows travelling to the
# join.  Runs on an isolated session: the thresholds are tuned so the
# demo triggers at fixture scale without touching shared session conf.
# Reference parity: runtime join pruning has no reference counterpart
# (the reference delegates planning entirely, dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_JOIN_BLOOM_ORACLE = f"""
SELECT o.o_orderpriority, COUNT(*) AS n_lines, {osum('l.l_extendedprice')} AS total
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 400000
GROUP BY o.o_orderpriority
"""


# One bloom-conf sibling session per root session, reused across calls:
# a fresh newSession() per invocation leaks — the loader's plan cache pins
# each sibling's JVM session state for the process lifetime, growing by
# one session + two cached plans per call.  Keyed by the root session
# OBJECT (strong reference — no id-recycling hazard).
_BLOOM_SESSIONS: dict[SparkSession, SparkSession] = {}


@register("join_bloom_prefilter", oracle=_JOIN_BLOOM_ORACLE)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _BLOOM_SESSIONS.get(spark)
    if s is None:
        s = spark.newSession()
        s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        s.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # Broadcast off: at real scale the selective side exceeds the
        # broadcast threshold, and InjectRuntimeFilter only fires on
        # non-broadcast joins (a broadcast join never shuffles the probe
        # side to begin with).
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        _BLOOM_SESSIONS[spark] = s
    li = load(s, sf_dir, "lineitem")
    o = load(s, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# join_asof_fwd_tol — FORWARD as-of join with a bounded tolerance: each
# purchase matches the EARLIEST click by the same user within the next hour,
# or nothing.  ``join_asof`` above is the backward-unbounded shape; bounding
# the search makes the fact⋈fact case scalable the same way as
# join_range_binned — quantize ts into 1-hour bins, a (p_ts, p_ts+1h]
# search window covers <= 2 bins, explode the probe side to both, equi-join
# on (user_id, bin) with the time predicate as residual, then keep the
# earliest candidate per purchase (WindowGroupLimit).  No nested loop; the
# shuffle key (user_id, hour-bin) is wide and unskewed at 100 TB.
# --------------------------------------------------------------------------

_JOIN_ASOF_FWD_TOL_ORACLE = """
SELECT purchase_id, user_id, click_id,
       CAST(gap_s AS BIGINT) AS gap_s
FROM (
  SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
         date_diff('second', p.ts, c.ts) AS gap_s,
         ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts, c.event_id) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON c.user_id = p.user_id AND c.ts > p.ts
   AND c.ts <= p.ts + INTERVAL 1 HOUR
) WHERE rn = 1
"""


@register("join_asof_fwd_tol", oracle=_JOIN_ASOF_FWD_TOL_ORACLE)
def join_asof_fwd_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour_bin = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        hour_bin(F.col("ts")).alias("bin"),
    )
    # (p_ts, p_ts+1h] spans at most the purchase's own hour-bin and the next.
    pb = p.withColumn(
        "bin", F.explode(F.array(hour_bin(F.col("p_ts")), hour_bin(F.col("p_ts")) + 1))
    )
    cand = pb.join(
        c,
        (pb.bin == c.bin)
        & (pb.user_id == c.c_user)
        & (c.c_ts > pb.p_ts)
        & (c.c_ts <= pb.p_ts + F.expr("INTERVAL 1 HOUR")),
    )
    w = Window.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.unix_timestamp("c_ts") - F.unix_timestamp("p_ts")).alias("gap_s"),
        )
    )


# --------------------------------------------------------------------------
# join_spatial_grid — proximity (within-radius) join via grid bucketing:
# the 2-D analogue of join_range_binned.  Coordinates are quantized to a
# grid of cell size = radius r, the SMALL side (centers) explodes to its
# 3x3 cell neighbourhood, and the join is a plain equi-join on the cell id
# with the exact distance predicate as a residual filter — complete by
# construction (any point within r of a center lies in the center's 3x3
# neighbourhood when cell >= r), and never a nested loop.  At 100 TB both
# sides shuffle by cell id (AQE-skew-splittable); the 9x explode happens on
# the small side only.  Coordinates here are synthesized deterministically
# from the keys (no geo columns in the fixtures); distances are integer
# arithmetic, so the all-pairs DuckDB oracle is bit-exact.
# --------------------------------------------------------------------------

_SPATIAL_R = 5

_JOIN_SPATIAL_ORACLE = f"""
SELECT c.c_custkey, s.s_suppkey,
       CAST(((c.c_custkey * 13) % 100 - (s.s_suppkey * 37) % 100)
            * ((c.c_custkey * 13) % 100 - (s.s_suppkey * 37) % 100)
            + ((c.c_custkey * 29) % 100 - (s.s_suppkey * 73) % 100)
            * ((c.c_custkey * 29) % 100 - (s.s_suppkey * 73) % 100)
            AS BIGINT) AS d2
FROM customer c, supplier s
WHERE ((c.c_custkey * 13) % 100 - (s.s_suppkey * 37) % 100)
      * ((c.c_custkey * 13) % 100 - (s.s_suppkey * 37) % 100)
      + ((c.c_custkey * 29) % 100 - (s.s_suppkey * 73) % 100)
      * ((c.c_custkey * 29) % 100 - (s.s_suppkey * 73) % 100)
      <= {_SPATIAL_R * _SPATIAL_R}
"""


@register("join_spatial_grid", oracle=_JOIN_SPATIAL_ORACLE)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _SPATIAL_R
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 13) % 100).alias("px"),
        ((F.col("c_custkey") * 29) % 100).alias("py"),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 37) % 100).alias("sx"),
        ((F.col("s_suppkey") * 73) % 100).alias("sy"),
    )
    pts = c.select(
        "c_custkey", "px", "py",
        F.concat_ws(":", (F.col("px") / r).cast("int"), (F.col("py") / r).cast("int")).alias("cell"),
    )
    # centers explode to the 3x3 neighbourhood (small side only)
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cells = F.array(
        *[
            F.concat_ws(
                ":",
                ((F.col("sx") / r).cast("int") + dx),
                ((F.col("sy") / r).cast("int") + dy),
            )
            for dx, dy in offsets
        ]
    )
    ctr = s.select("s_suppkey", "sx", "sy", F.explode(cells).alias("cell"))
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    return (
        pts.join(ctr, "cell")
        .filter(d2 <= r * r)
        .select("c_custkey", "s_suppkey", d2.cast("bigint").alias("d2"))
    )


# --------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time match in EITHER direction within a
# tolerance (completes the as-of family: join_asof = backward,
# join_asof_fwd_tol = forward+tolerance).  Equi key (user) keeps it a plain
# shuffled join; the rank-1 selection is a hash aggregate
# min(struct(|Δt|, ts, id)) — partial map-side, no per-key sort (same
# pattern as llm_contrastive_pairs).  Time deltas are integer epoch-micros,
# so ordering and tie-breaks (earlier click, lower id) are engine-exact.
# --------------------------------------------------------------------------

_JOIN_ASOF_NEAREST_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     cand AS (
       SELECT p.event_id AS purchase_id, p.user_id,
              strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
              c.event_id AS click_id,
              ABS(epoch_us(p.ts) - epoch_us(c.ts)) AS adiff,
              epoch_us(c.ts) AS c_us
       FROM p JOIN c ON p.user_id = c.user_id
       WHERE ABS(epoch_us(p.ts) - epoch_us(c.ts)) <= 3600000000
     )
SELECT purchase_id, user_id, purchase_ts,
       CAST((MIN(struct_pack(adiff := adiff, c_us := c_us, click_id := click_id))).click_id AS BIGINT) AS click_id,
       CAST((MIN(struct_pack(adiff := adiff, c_us := c_us, click_id := click_id))).adiff AS BIGINT) AS abs_us
FROM cand GROUP BY purchase_id, user_id, purchase_ts
"""


@register("join_asof_nearest", oracle=_JOIN_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    adiff = F.abs(F.unix_micros("p_ts") - F.unix_micros("c_ts"))
    cand = (
        p.join(c, p.user_id == c.c_user)
        .filter(adiff <= 3600 * 1_000_000)
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "click_id",
            adiff.alias("adiff"),
            F.unix_micros("c_ts").alias("c_us"),
        )
    )
    best = F.min(F.struct("adiff", "c_us", "click_id")).alias("best")
    return (
        cand.groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(best)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.col("best.click_id").alias("click_id"),
            F.col("best.adiff").alias("abs_us"),
        )
    )


# --------------------------------------------------------------------------
# join_temporal_scd2 — the warehouse temporal join: facts match the
# dimension version VALID AT the fact's timestamp (orders × an SCD2
# customer snapshot on custkey + validity interval).  The dimension is
# derived deterministically from customer — odd custkeys migrate segment
# on 1997-07-01 (two versions), even custkeys keep one eternal version —
# so both engines build the identical snapshot and the join is
# fixture-reproducible.
#
# Scale shape: the join is an EQUI-join on custkey with the interval
# predicate as a residual filter — the hash/sort-merge strategy keys on
# custkey alone, so there is no range-bin explosion and no nested loop;
# versions-per-key is SCD2-bounded (change count), keeping the residual
# scan per key trivial.  At 100 TB the dim side broadcasts if it fits,
# else co-shuffles on the key like any fact⋈dim join.
# Reference parity: dbt snapshots (reference reach: dbtoperator.py:273-274)
# produce exactly these valid_from/valid_to tables; this is the read path.
# --------------------------------------------------------------------------

_SCD2_CUT = "1997-07-01 00:00:00"
_SCD2_END = "9999-12-31 00:00:00"
_SCD2_T0 = "1990-01-01 00:00:00"

_JOIN_SCD2_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment, 1 AS version,
         TIMESTAMP '{_SCD2_T0}' AS valid_from,
         CASE WHEN c_custkey % 2 = 1 THEN TIMESTAMP '{_SCD2_CUT}'
              ELSE TIMESTAMP '{_SCD2_END}' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MIGRATED-' || c_mktsegment, 2,
         TIMESTAMP '{_SCD2_CUT}', TIMESTAMP '{_SCD2_END}'
  FROM customer WHERE c_custkey % 2 = 1
)
SELECT o.o_orderkey, o.o_custkey,
       strftime(CAST(o.o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_day,
       d.segment, CAST(d.version AS INT) AS version
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
 AND CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to
"""


@register("join_temporal_scd2", oracle=_JOIN_SCD2_ORACLE)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).alias("version"),
        F.lit(_SCD2_T0).cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 2 == 1, F.lit(_SCD2_CUT).cast("timestamp")
        )
        .otherwise(F.lit(_SCD2_END).cast("timestamp"))
        .alias("valid_to"),
    )
    v2 = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        F.concat(F.lit("MIGRATED-"), F.col("c_mktsegment")).alias("segment"),
        F.lit(2).alias("version"),
        F.lit(_SCD2_CUT).cast("timestamp").alias("valid_from"),
        F.lit(_SCD2_END).cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionAll(v2)
    od = F.col("o_orderdate").cast("timestamp")
    return (
        o.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (od >= F.col("valid_from"))
            & (od < F.col("valid_to")),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format(od, "yyyy-MM-dd").alias("order_day"),
            "segment",
            F.col("version").cast("int").alias("version"),
        )
    )


# --------------------------------------------------------------------------
# join_fuzzy_blocked — ATTRIBUTE-blocked fuzzy matching: candidate pairs
# come from an EQUI-join on a semantic blocking key (p_brand — classic
# record-linkage blocking: lossy across blocks by design, tiny candidate
# sets within).  Sibling of join_fuzzy_levenshtein (operators/misc.py),
# which blocks LOSSLESSLY on length bands instead — the two standard
# blocking trade-offs; a production linker composes both.  Verify is true
# Levenshtein distance;
# matches are pairs within edit distance 10 with a normalized similarity
# score.  The probe bound (p_partkey < 200 both sides) keeps the
# fixture-scale pair count stable; at 100 TB the blocking key is what
# bounds the quadratic term (pairs are per-block, never corpus-wide), the
# standard Fellegi-Sunter pipeline shape.
# Exactness: levenshtein is the unit-cost edit distance in both engines;
# the similarity quantizes via FLOOR(x·1e6+0.5)/1e6.
# Reference parity: matching SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_FUZZY_BLOCKED_ORACLE = """
WITH probe AS (
  SELECT p_partkey, p_brand, p_name FROM part WHERE p_partkey < 200
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, a.p_brand AS brand,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       FLOOR((1.0 - levenshtein(a.p_name, b.p_name) * 1.0 /
              GREATEST(len(a.p_name), len(b.p_name))) * 1000000.0 + 0.5)
         / 1000000.0 AS similarity
FROM probe a
JOIN probe b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 10
"""


@register("join_fuzzy_blocked", oracle=_FUZZY_BLOCKED_ORACLE)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 200)
        .select("p_partkey", "p_brand", "p_name")
    )
    a, b = p.alias("a"), p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    sim = (
        F.floor(
            (
                1.0
                - lev * 1.0
                / F.greatest(F.length("a.p_name"), F.length("b.p_name"))
            )
            * 1_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000.0
    )
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(lev <= 10)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_brand").alias("brand"),
            lev.cast("int").alias("edit_dist"),
            sim.alias("similarity"),
        )
    )


# --------------------------------------------------------------------------
# join_pit_features — point-in-time feature assembly (the feature-store
# shape): a purchase-event spine enriched with (a) the latest order AS OF
# the event timestamp per customer — training-serving-skew-free by
# construction, no feature may peek past its label's timestamp — and
# (b) a static customer dimension.  The reference materializes feature
# tables as incremental dbt models (dbtoperator.py:273-274); PIT
# correctness is the property those models must hand-roll.
#
# Scale shape: the as-of step is the join+two-phase-max(struct) idiom —
# candidates equi-join on the customer key, the rank-1 pick is a
# map-side partial_max over (o_orderdate, o_orderkey, o_totalprice), so
# no per-key window sort ever materializes the full candidate set; the
# customer dim joins broadcast.  Ties are impossible (o_orderkey is
# unique and last in no tuple position that matters: the tuple ordering
# is date, then key).
# --------------------------------------------------------------------------

_PIT_FEATURES_ORACLE = """
WITH spine AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
best AS (
  SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
    SELECT s.event_id, s.user_id, o.o_orderkey, o.o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY s.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
             AS rn
    FROM spine s JOIN orders o
      ON o.o_custkey = s.user_id AND o.o_orderdate <= s.ts
  ) WHERE rn = 1
)
SELECT b.event_id, b.user_id,
       CAST(b.o_orderkey AS BIGINT) AS last_order_key,
       b.o_totalprice AS last_order_price,
       c.c_acctbal, c.c_mktsegment
FROM best b JOIN customer c ON c.c_custkey = b.user_id
"""


@register("join_pit_features", oracle=_PIT_FEATURES_ORACLE)
def join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cand = spine.join(
        orders,
        (F.col("o_custkey") == F.col("user_id"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )
    # rank-1 as a two-phase aggregate, not a window: partial_max runs
    # map-side, so the shuffle carries one struct per (event, partition)
    best = cand.groupBy("event_id", "user_id").agg(
        F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("b")
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    return (
        best.join(F.broadcast(cust), best["user_id"] == cust["c_custkey"])
        .select(
            "event_id",
            "user_id",
            F.col("b.o_orderkey").cast("bigint").alias("last_order_key"),
            F.col("b.o_totalprice").alias("last_order_price"),
            "c_acctbal",
            "c_mktsegment",
        )
    )


# --------------------------------------------------------------------------
# join_nearest_1d — nearest-NUMERIC-neighbor enrichment (the price-matching
# twin of join_asof_nearest's time semantics): every open ('P') order
# matches the filled ('F') order of the same priority whose total price is
# closest; equidistant candidates resolve to the lower price, then the
# lower orderkey.  The benchmark-matching shape ("match each trade to the
# closest reference fill") that a naive implementation writes as a
# quadratic |a.price − b.price| cross join.
#
# Scale shape — the sorted-union trick: tag both sides, sort per
# priority by (price, side, key) ascending AND descending, and read the
# nearest-below / nearest-above fill off two IGNORE-NULLS RUNNING windows
# (both [unbounded preceding, current] — Spark's only O(1)-per-row frame) — cost is
# one partitioned sort, zero joins, instead of O(probe × build).  Build
# rows order before probes at equal price, so an exact price tie matches
# as "below" (distance 0) deterministically on both engines.
# --------------------------------------------------------------------------

_NEAREST1D_ORACLE = """
WITH u AS (
  SELECT o_orderpriority AS prio, o_totalprice AS price, o_orderkey AS okey,
         CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS side
  FROM orders WHERE o_orderstatus IN ('P', 'F')
),
e AS (
  SELECT prio, price, okey, side,
         LAST_VALUE(CASE WHEN side = 0 THEN price END IGNORE NULLS)
           OVER (PARTITION BY prio ORDER BY price, side, okey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below_p,
         LAST_VALUE(CASE WHEN side = 0 THEN okey END IGNORE NULLS)
           OVER (PARTITION BY prio ORDER BY price, side, okey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below_k,
         LAST_VALUE(CASE WHEN side = 0 THEN price END IGNORE NULLS)
           OVER (PARTITION BY prio ORDER BY price DESC, side, okey DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS above_p,
         LAST_VALUE(CASE WHEN side = 0 THEN okey END IGNORE NULLS)
           OVER (PARTITION BY prio ORDER BY price DESC, side, okey DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS above_k
  FROM u
)
SELECT prio, okey AS probe_key,
       FLOOR(price * 1000000.0 + 0.5) / 1000000.0 AS probe_price,
       CASE WHEN below_p IS NULL THEN above_k
            WHEN above_p IS NULL THEN below_k
            WHEN price - below_p <= above_p - price THEN below_k
            ELSE above_k END AS match_key,
       CASE WHEN below_p IS NULL THEN FLOOR((above_p - price) * 1000000.0 + 0.5) / 1000000.0
            WHEN above_p IS NULL THEN FLOOR((price - below_p) * 1000000.0 + 0.5) / 1000000.0
            ELSE FLOOR(LEAST(price - below_p, above_p - price)
                       * 1000000.0 + 0.5) / 1000000.0 END AS price_gap
FROM e
WHERE side = 1 AND (below_p IS NOT NULL OR above_p IS NOT NULL)
"""


@register("join_nearest_1d", oracle=_NEAREST1D_ORACLE)
def join_nearest_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("P", "F")
    )
    u = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderkey").alias("okey"),
        F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias("side"),
    )
    fwd = (
        Window.partitionBy("prio")
        .orderBy("price", "side", "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Nearest-above runs as a DESCENDING running frame: Spark's window
    # engine has an O(1)-per-row fast path only for [unboundedPreceding,
    # current]; a [current, unboundedFollowing] ignore-nulls frame falls
    # into the general O(partition)-per-row processor (measured 28 s vs
    # 1.6 s on 100k rows at sf0.1).
    bwd = (
        Window.partitionBy("prio")
        .orderBy(F.col("price").desc(), F.col("side").asc(), F.col("okey").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bprice = F.when(F.col("side") == 0, F.col("price"))
    bkey = F.when(F.col("side") == 0, F.col("okey"))
    e = u.select(
        "prio",
        "price",
        "okey",
        "side",
        F.last(bprice, ignorenulls=True).over(fwd).alias("below_p"),
        F.last(bkey, ignorenulls=True).over(fwd).alias("below_k"),
        F.last(bprice, ignorenulls=True).over(bwd).alias("above_p"),
        F.last(bkey, ignorenulls=True).over(bwd).alias("above_k"),
    )
    q6c = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    below, above = F.col("below_p"), F.col("above_p")
    return e.filter(
        (F.col("side") == 1) & (below.isNotNull() | above.isNotNull())
    ).select(
        "prio",
        F.col("okey").alias("probe_key"),
        q6c(F.col("price")).alias("probe_price"),
        F.when(below.isNull(), F.col("above_k"))
        .when(above.isNull(), F.col("below_k"))
        .when(F.col("price") - below <= above - F.col("price"), F.col("below_k"))
        .otherwise(F.col("above_k"))
        .alias("match_key"),
        F.when(below.isNull(), q6c(above - F.col("price")))
        .when(above.isNull(), q6c(F.col("price") - below))
        .otherwise(q6c(F.least(F.col("price") - below, above - F.col("price"))))
        .alias("price_gap"),
    )
