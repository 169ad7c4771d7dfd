"""Streaming operators (SURVEY.md §2 'Streaming') over the ``events`` table.

Per SURVEY §7 step 8, each windowed aggregation is registered in its
*batch form* (same ``F.window``/``F.session_window`` expressions, oracle-
checked against DuckDB), and the watermark/foreachBatch operators run a REAL
Structured Streaming query — ``readStream`` over the fixture parquet with an
availableNow trigger into a memory sink — because state/watermark semantics
only exist in streaming mode.  ``tests/test_streaming.py`` additionally
proves batch≡streaming parity for the tumbling window by replaying the same
data through ``readStream``.

Scale: windowed aggregations key state by (window, key) and drop it at the
watermark — state is bounded by (windows in flight × keys), independent of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum, ots_str, ts_str

# --------------------------------------------------------------------------
# stream_tumbling — 1-hour tumbling counts per event_type.
# --------------------------------------------------------------------------

_STREAM_TUMBLING_ORACLE = f"""
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n,
  {osum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


@register("stream_tumbling", oracle=_STREAM_TUMBLING_ORACLE)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# stream_sliding — 1-hour windows sliding every 15 minutes (each event lands
# in 4 windows; windows are epoch-aligned in both engines).
# --------------------------------------------------------------------------

_STREAM_SLIDING_ORACLE = """
SELECT window_start, event_type, COUNT(*) AS n
FROM (
  SELECT
    strftime(time_bucket(INTERVAL '15 minutes', ts) - (t.i * INTERVAL '15 minutes'),
             '%Y-%m-%d %H:%M:%S') AS window_start,
    time_bucket(INTERVAL '15 minutes', ts) - (t.i * INTERVAL '15 minutes') AS ws,
    ts, event_type
  FROM events, range(0, 4) t(i)
)
WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
GROUP BY window_start, event_type
"""


@register("stream_sliding", oracle=_STREAM_SLIDING_ORACLE)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


# --------------------------------------------------------------------------
# stream_session — session windows with a 30-minute gap, per user.
# Oracle: gaps-and-islands (lag + cumulative new-session flag) — a new
# session starts when the gap to the previous event is >= the gap duration,
# matching Spark's "extend while ts < last_ts + gap" semantics.
# --------------------------------------------------------------------------

_STREAM_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       {osum('value')} AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("stream_session", oracle=_STREAM_SESSION_ORACLE)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# --------------------------------------------------------------------------
# Real Structured Streaming helpers (availableNow → memory sink).
# --------------------------------------------------------------------------


_MAX_DRAIN_BATCHES = 16  # availableNow micro-batch cap under "auto" (below)


def _stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None | str = "auto",
) -> DataFrame:
    """readStream over the events fixture (schema from the batch loader).

    FileStreamSource requires a *directory* — the fixture file is staged
    (hard-link/copy) into a repo-local scratch dir once per sf.

    ``max_files_per_trigger="auto"`` (default) keys the trigger size to the
    FILE COUNT so an availableNow drain runs at most ``_MAX_DRAIN_BATCHES``
    micro-batches: ``ceil(n_files / 16)`` files per trigger.  On the
    single-file fixture that is the old one-batch behavior, and planted
    multi-part directories up to 16 files keep their one-file-per-batch
    replay — but a many-small-files layout (the round-12 shape regime:
    events delivered as 200 tiny parts) no longer runs one STATE-STORE
    COMMIT per file.  At 100 TB that coupling is the killer: a million-file
    drop would schedule a million micro-batches, each paying a full
    state-store commit + offset-log write, and the drain never finishes
    (locally: the three stateful keys stalled past their 120 s budget at
    just 200 files).  Batch count must track data volume, not file count.

    ``max_files_per_trigger=None`` reads every staged file in ONE
    availableNow micro-batch.  Order-sensitive stateful consumers
    (``stream_asof_enrich``) need this on directory-layout fixtures:
    part files are not time-ordered, so file-per-trigger batches can
    deliver a user's signup AFTER a fact with a later timestamp was
    already emitted un-enriched (round-8 advice) — single-batch input
    restores per-key total order via the in-function sort.
    """
    import os
    import shutil

    from nedp_etl_spark.operators.scans import _scratch

    stage = _scratch("stream_events_src", sf_dir)
    os.makedirs(stage, exist_ok=True)
    src = f"{sf_dir}/events.parquet"
    dst = os.path.join(stage, "events.parquet")
    # Re-stage unconditionally unless dst IS src (same inode): size/mtime
    # staleness heuristics miss a regenerated fixture with identical byte
    # size and a preserved (older) mtime — e.g. an rsync -a restore — which
    # would silently diverge the streamed events from the batch reads.
    # The refresh is ATOMIC: stage to a tmp name, then os.replace — a
    # remove+copy would open a window where a concurrently running
    # streaming query at the same sf lists a missing or half-written file
    # (copyfile is not atomic; the shared stage dir is this module's
    # documented concurrent-runs posture).  Hard-link path is O(1).
    same = False
    if os.path.exists(dst):
        try:
            same = os.path.samefile(src, dst)
        except OSError:
            same = False
    def _stage_one(s: str, d: str) -> None:
        tmp = d + f".staging.{os.getpid()}"
        try:
            try:
                os.link(s, tmp)
            except OSError:
                shutil.copyfile(s, tmp)
            os.replace(tmp, d)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    if os.path.isdir(src):
        # planted-test layout: events.parquet is a DIRECTORY of part files
        # (DataFrameWriter output); stage each data file under a flattened
        # name and REMOVE stale staged parts from earlier runs — part names
        # embed a per-write UUID, so without the sweep a re-run's stage dir
        # would hold old + new files and the stream would double-read
        # (review catch, round 8).  Fixture layout (single file) takes the
        # one-file path below.
        import glob as _glob

        targets = {
            "events_" + os.path.basename(f): f
            for f in sorted(_glob.glob(os.path.join(src, "*.parquet")))
        }
        for staged in _glob.glob(os.path.join(stage, "events_*")):
            if os.path.basename(staged) not in targets:
                os.remove(staged)
        for name, f in targets.items():
            _stage_one(f, os.path.join(stage, name))
        # a single-file fixture staged earlier under the fixed name must
        # also go, or the stream reads it alongside the directory parts
        if os.path.exists(dst):
            os.remove(dst)
        dst = stage
    else:
        # symmetric sweep: directory parts staged by an earlier run must
        # not ride alongside the single fixture file
        import glob as _glob

        for staged in _glob.glob(os.path.join(stage, "events_*")):
            os.remove(staged)
        if not same:
            _stage_one(src, dst)

    load(spark, sf_dir, "events")  # applies session conf (nanosAsLong, UTC)
    if max_files_per_trigger == "auto":
        import glob as _glob
        import math

        n_files = len(_glob.glob(os.path.join(stage, "events*")))
        max_files_per_trigger = max(1, math.ceil(n_files / _MAX_DRAIN_BATCHES))
    raw_schema = spark.read.parquet(dst).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(stage)
    # Same ingestion normalization as data.load: non-finite doubles carry
    # no usable magnitude → NULL (the hardened path); see finite_or_null.
    from nedp_etl_spark.data import finite_or_null

    raw = raw.withColumn("value", finite_or_null(F.col("value")))
    # Same fixture-generation branch as data.load: int64-nanos builds need
    # integer `div` (epoch-nanos exceed 2^53, float `/` can floor 1µs low);
    # timestamp[us] builds read as NTZ and just need the session-tz cast.
    ts_type = raw_schema["ts"].dataType.typeName()
    if ts_type in ("long", "integer"):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _isolated(spark: SparkSession) -> SparkSession:
    """A sibling session (shared SparkContext, private SQLConf) for streaming
    runs.  State-store partition count is frozen at query start from
    shuffle.partitions; the real streaming queries pin it to 8 — plenty for
    the fixture replay, an order of magnitude less store-init overhead than
    the batch setting — WITHOUT mutating the driver's shared session conf
    (the driver may plan other queries concurrently)."""
    return spark.newSession()


def _run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append", partitions: int = 8
) -> DataFrame:
    # State-store partition count is frozen at first query start.  8 suits
    # every fixture-scale query: store + state-worker init dominates a single
    # availableNow micro-batch (measured: custom-state 8.8 s at 8 partitions
    # vs 10.5 s at 32, both ~2 s warm), so fewer stores win.  On a real
    # cluster this is shuffle.partitions sizing — one state partition per
    # core across executors.
    spark = stream_df.sparkSession  # the isolated session
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout WITHOUT raising: an
    # environment stall would otherwise hand back a partial (still-growing)
    # memory table that reads as a silent correctness mismatch.  Surface it
    # as an explicit failure instead (the stream_rate_source hardening,
    # applied to every availableNow run).
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError(
            f"streaming query {name!r} did not drain within 120s — "
            "environment stall, not a correctness result"
        )
    return spark.table(name)


# --------------------------------------------------------------------------
# stream_watermark_late — watermarked tumbling aggregate run as a REAL
# streaming query.  Exact oracle (round-3 verdict item 5): the single-file
# in-order replay drops no late rows, and append mode emits exactly the
# windows FINALIZED below the final watermark — i.e. windows whose end
# <= max(ts) - 10min — which is the plain-SQL batch analogue below.  The
# trailing (non-finalized) windows are deterministically withheld.
# --------------------------------------------------------------------------

_STREAM_WATERMARK_ORACLE = """
-- max(ts) is millisecond-truncated to mirror Spark's watermark arithmetic
-- (event-time watermarks are tracked in epoch millis): if a fixture's
-- max(ts) carries sub-ms digits just above an hour+10min boundary, the
-- micro-precision watermark would finalize a window Spark withholds.
WITH wm AS (SELECT date_trunc('ms', max(ts)) - INTERVAL 10 MINUTE AS w FROM events)
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n
FROM events, wm
GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type, wm.w
HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR <= wm.w
"""


@register("stream_watermark_late", oracle=_STREAM_WATERMARK_ORACLE)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute watermark + 1-hour tumbling count per event_type.

    With the fixture replayed via availableNow the watermark only advances
    between micro-batches, so all (in-order) fixture data is aggregated and
    append mode emits exactly the windows whose end precedes the final
    watermark (max(event_ts) - 10min); in continuous operation the same
    plan drops late events and finalizes windows past the watermark (that
    REAL drop path is pinned by test_watermark_drops_late_rows).

    ``max_files_per_trigger=None`` (one availableNow batch) because part
    files are not time-ordered: replaying a multi-file events layout
    file-per-trigger advances the watermark between files and drops rows
    that are only "late" by accident of layout — the round-10 partition-
    invariance sweep caught the 7-file relayout emitting 266 windows vs
    the single-file 867.  Single-batch replay makes the result a pure
    function of the DATA (the exact oracle) at any layout, which is also
    the stream_asof_enrich convention (round-8 advice).
    """
    ev = _stream_events(_isolated(spark), sf_dir, max_files_per_trigger=None)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return _run_to_memory(agg, f"wm_late_{abs(hash(sf_dir)) % 10_000}", "append")


# --------------------------------------------------------------------------
# stream_dedup — stateful dropDuplicates within the watermark, exact-checked
# in batch form (union-with-self makes the dedup observable).
# --------------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
SELECT event_id, event_type, ROUND(value, 6) AS value
FROM (SELECT DISTINCT event_id, event_type, value FROM events)
"""


@register("stream_dedup", oracle=_STREAM_DEDUP_ORACLE)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch form of withWatermark(...).dropDuplicates(['event_id']): the
    # doubled input collapses to one row per event_id.  Streaming keeps seen
    # ids in state and expires them at the watermark — bounded memory.
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )
    return ev.unionAll(ev).dropDuplicates(["event_id"])


# --------------------------------------------------------------------------
# stream_foreachbatch — incremental sink: each micro-batch merges into a
# materialized aggregate table (dbt `incremental` streaming analogue).
# --------------------------------------------------------------------------


_STREAM_FOREACHBATCH_ORACLE = f"""
SELECT event_type, COUNT(*) AS n, {osum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register("stream_foreachbatch", oracle=_STREAM_FOREACHBATCH_ORACLE)
def stream_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """writeStream.foreachBatch incremental sink: each micro-batch is
    aggregated and MERGEd into a materialized per-event_type totals table —
    the dbt `incremental` streaming analogue (same left_anti+union merge as
    ``sink_incremental_merge``), entirely executor-side.  No per-batch
    ``collect()``: state lives in the warehouse table, so the pattern is
    driver-light and survives arbitrarily many keys at 100 TB.

    The running total accumulates as fixed-point micros (long) — exact and
    order-independent across batches, so the final table equals the batch
    aggregate regardless of micro-batch count, making the key
    hash-checkable against the plain-SQL oracle."""
    import shutil

    from nedp_etl_spark.operators.scans import _scratch

    base = _scratch("stream_foreachbatch_tgt", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    latest: list[str] = []  # path of the current table version (a name, not data)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        agg = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
            ).alias("value_micros"),
        )
        if latest:
            existing = s.read.parquet(latest[-1])
            # keyed running-total MERGE: matched keys accumulate, unmatched
            # insert (sum over the union ≡ WHEN MATCHED UPDATE SET n=n+...).
            agg = existing.unionByName(agg).groupBy("event_type").agg(
                F.sum("n").alias("n"),
                F.sum("value_micros").alias("value_micros"),
            )
        version = f"{base}/v{batch_id}"
        agg.write.mode("overwrite").parquet(version)
        latest.append(version)

    ev = _stream_events(_isolated(spark), sf_dir)
    ev.sparkSession.conf.set("spark.sql.shuffle.partitions", "8")
    q = ev.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    # same stall guard as _run_to_memory: a timed-out run would leave
    # `latest` empty (opaque IndexError) or pointing at an intermediate
    # version (silently under-accumulated totals)
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError(
            "stream_foreachbatch did not drain within 120s — "
            "environment stall, not a correctness result"
        )
    return spark.read.parquet(latest[-1]).select(
        "event_type",
        "n",
        (F.col("value_micros").cast("double") / 1000000.0).alias("total_value"),
    )


# --------------------------------------------------------------------------
# stream_static_join — enrich the event stream with a static dimension
# (broadcast at micro-batch planning time; the standard stream-enrichment
# shape).  Batch form is exact-checked; the same plan runs under
# readStream unchanged.
# --------------------------------------------------------------------------

_STREAM_STATIC_JOIN_ORACLE = f"""
SELECT n.n_name, e.event_type, COUNT(*) AS n, {osum('e.value')} AS total_value
FROM events e
JOIN nation n ON CAST(e.user_id % 25 AS INT) = n.n_nationkey
GROUP BY n.n_name, e.event_type
"""


@register("stream_static_join", oracle=_STREAM_STATIC_JOIN_ORACLE)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    n = load(spark, sf_dir, "nation")
    enriched = ev.join(
        F.broadcast(n), (F.col("user_id") % 25).cast("int") == F.col("n_nationkey")
    )
    return enriched.groupBy("n_name", "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")
    )


# --------------------------------------------------------------------------
# stream_stream_join — watermarked stream-stream join (click -> purchase
# attribution by user within 1 hour).  Registered in its batch form (exact
# oracle); tests/test_streaming.py replays the same join as a genuine
# stream-stream self-join with watermarks on both sides and proves parity.
# Scale: state is bounded by the watermark + time-range condition — each
# side retains at most 1h (+ watermark slack) of events per user key.
# --------------------------------------------------------------------------

_STREAM_STREAM_JOIN_ORACLE = f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       {ots_str('c.ts')} AS click_ts,
       {ots_str('p.ts')} AS purchase_ts,
       p.value AS purchase_value
FROM events c
JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
"""


def _stream_stream_join_sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def _stream_stream_join_plan(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("interval 1 hour")),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        ts_str("click_ts").alias("click_ts"),
        ts_str("purchase_ts").alias("purchase_ts"),
        "purchase_value",
    )


@register("stream_stream_join", oracle=_STREAM_STREAM_JOIN_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks, purchases = _stream_stream_join_sides(ev)
    return _stream_stream_join_plan(clicks, purchases)


# --------------------------------------------------------------------------
# stream_rate_source — non-file streaming source (the built-in `rate`
# source): N rows/sec of (timestamp, value).  The rate source emits the
# integers 0..N-1 exactly once each, so capturing the first 1000 values and
# bucket-aggregating them is EXACT-checkable: the oracle is the same
# aggregate over range(0, 1000) (round-3 verdict item 7 — "assert row
# cadence exactly").  Demonstrates that every windowed operator above runs
# identically on a socket/Kafka-shaped source — only the readStream line
# changes.
# --------------------------------------------------------------------------

_RATE_ORACLE = """
SELECT CAST(i // 100 AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(i) AS BIGINT) AS total,
       CAST(MIN(i) AS BIGINT) AS min_value,
       CAST(MAX(i) AS BIGINT) AS max_value
FROM range(0, 1000) t(i)
GROUP BY 1
"""


@register("stream_rate_source", oracle=_RATE_ORACLE)
def stream_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time

    s = _isolated(spark)
    s.conf.set("spark.sql.shuffle.partitions", "8")
    rate = (
        s.readStream.format("rate")
        .option("rowsPerSecond", 1000)
        .option("numPartitions", 2)
        .load()
    )
    name = f"rate_demo_{abs(hash(sf_dir)) % 10_000}"
    q = (
        rate.filter(F.col("value") < 1000)
        .select("value")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    # run until the full deterministic prefix 0..999 has landed, then stop
    deadline = time.time() + 60
    while time.time() < deadline and s.table(name).count() < 1000:
        time.sleep(0.25)
    q.stop()
    q.awaitTermination(30)
    n = s.table(name).count()
    if n < 1000:
        # Surface an environment stall as an explicit failure, not a silent
        # partial table that reads as a correctness miss downstream.
        raise RuntimeError(
            f"rate source produced {n}/1000 rows within the 60s deadline"
        )
    return (
        s.table(name)
        .groupBy(F.expr("value div 100").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# --------------------------------------------------------------------------
# stream_state_reader — the Spark 4 State Data Source (state introspection
# / debugging, the capability behind offline state repair and migration):
# run a stateful per-user streaming aggregation to a checkpoint, then read
# the RESULTING STATE STORE back with ``spark.read.format("statestore")``
# and return the per-key state.  The oracle is the batch GROUP BY over the
# same events — streaming state at drain time MUST equal the batch
# aggregate, making the state file itself the thing under test.
#
# Exactness: values quantize to 6-dp micros BEFORE the streaming sum, so
# per-key state accumulates int64 (order-independent across micro-batch
# arrival order — the util.dsum discipline applied to streaming state).
# Scale shape: keyed state (one row per user), one shuffle on user_id;
# the state read is a metadata-sized scan of the checkpoint, not the data.
# --------------------------------------------------------------------------


@register(
    "stream_state_reader",
    oracle=f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {osum('value')} AS sum_value
FROM events GROUP BY user_id
""",
)
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from nedp_etl_spark.operators.scans import _scratch

    s = _isolated(spark)
    ckpt = _scratch("stream_state_reader_ckpt", sf_dir)
    shutil.rmtree(ckpt, ignore_errors=True)  # fresh state per run
    os.makedirs(ckpt, exist_ok=True)
    ev = _stream_events(s, sf_dir).select(
        "user_id",
        F.floor(F.col("value") * 1_000_000.0 + 0.5).cast("long").alias("vq"),
    )
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vq").alias("sq")
    )
    s.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        agg.writeStream.format("memory")
        .queryName("state_reader_drain")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("stream_state_reader: drain stalled (environment)")
    st = s.read.format("statestore").load(ckpt)
    # The state value struct carries the INTERNAL aggregation buffer field
    # names (count, sum) — undocumented Spark internals a minor version
    # could rename.  The pinned semantic test is the tripwire; this check
    # turns the eventual breakage into a named error instead of an opaque
    # resolution failure deep in the plan.
    value_fields = {f.name for f in st.schema["value"].dataType.fields}
    if not {"count", "sum"} <= value_fields:
        raise RuntimeError(
            "stream_state_reader: the statestore aggregation buffer no "
            f"longer exposes fields ('count', 'sum') — found {sorted(value_fields)}. "
            "Spark renamed its internal aggregation buffer; update the "
            "value.* projections here to the new names."
        )
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").cast("bigint").alias("n_events"),
        (F.col("value.sum").cast("double") / 1_000_000.0).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# stream_windowed_distinct — distinct users per tumbling hour per
# event_type.  COUNT(DISTINCT ...) is unsupported inside streaming
# aggregations, so this is the streaming-safe TWO-LEVEL idiom: first a
# keyed dedup on (window, event_type, user_id) — itself a watermarkable
# streaming aggregate whose state is one row per distinct key — then a
# count per (window, event_type).  Batch form here states the identical
# semantics (registry contract); the replay harness exercises the same
# two-level plan under readStream.
#
# Scale shape: both levels are keyed shuffles with map-side partial
# dedup/combine; state per window is bounded by distinct users, and the
# watermark retires whole windows.  The reference reaches distinct-count
# rollups only as dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_WINDOWED_DISTINCT_ORACLE = """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (
  SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS ws,
                  event_type, user_id
  FROM events
)
GROUP BY ws, event_type
"""


@register("stream_windowed_distinct", oracle=_WINDOWED_DISTINCT_ORACLE)
def stream_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    level1 = ev.select(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).distinct()
    return (
        level1.groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_users",
        )
    )


# --------------------------------------------------------------------------
# stream_topk_per_window — top-3 users by summed value per tumbling hour
# per event_type: the standard streaming leaderboard recipe.  Ranking is
# NOT incrementally maintainable inside a streaming aggregation, so the
# streaming decomposition is: (1) a watermarkable windowed SUM aggregate
# keyed on (window, event_type, user_id) — bounded state, one row per
# active key — then (2) rank-at-the-sink (foreachBatch / on the complete-
# mode table), which is exactly what this batch form states and what the
# replay-parity test exercises under readStream.  Per-user sums quantize
# to int64 micro-units (order-free, and ties rank deterministically by
# user_id).  The reference reaches leaderboards only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
#
# Scale shape: one keyed windowed aggregate (map-side combine; watermark
# retires whole windows); the rank window partitions by (window,
# event_type) — bounded by active users per window, never global.
# --------------------------------------------------------------------------

_STREAM_TOPK_K = 3

_STREAM_TOPK_ORACLE = f"""
WITH s AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, user_id,
         CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS vq
  FROM events GROUP BY 1, 2, 3
),
r AS (
  SELECT ws, event_type, user_id, vq,
         ROW_NUMBER() OVER (PARTITION BY ws, event_type
                            ORDER BY vq DESC, user_id) AS rnk
  FROM s
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, user_id,
       vq / 1000000.0 AS total_value,
       CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= {_STREAM_TOPK_K}
"""


def _topk_rank(sums: DataFrame) -> DataFrame:
    """Rank-at-the-sink stage shared by the batch form and the replay
    test: top-K per (window, event_type) from the per-user sum table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("w", "event_type").orderBy(
        F.col("vq").desc(), "user_id"
    )
    return (
        sums.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _STREAM_TOPK_K)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "user_id",
            (F.col("vq") / 1_000_000.0).alias("total_value"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register("stream_topk_per_window", oracle=_STREAM_TOPK_ORACLE)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sums = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).agg(
        F.sum(F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("vq")
    )
    return _topk_rank(sums)


# --------------------------------------------------------------------------
# stream_join_left_outer — watermarked LEFT OUTER stream-stream join: every
# click appears, purchase columns null-padded when no purchase follows
# within the hour.  The semantically hard streaming case: an outer
# stream-stream join may emit a null-padded row ONLY once the watermark
# proves no match can still arrive, so Spark REQUIRES watermarks on both
# sides plus the time-range condition (the inner variant merely bounds
# state).  Registered in its batch form (exact oracle);
# tests/test_streaming.py replays it as a genuine outer stream-stream
# join and proves parity INCLUDING the null-padded rows.  Scale: per-side
# state is bounded by watermark + range exactly as the inner join.
# --------------------------------------------------------------------------

_STREAM_LOJ_ORACLE = f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       {ots_str('c.ts')} AS click_ts,
       {ots_str('p.ts')} AS purchase_ts,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
"""


def _stream_loj_plan(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("interval 1 hour")),
        "left_outer",
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        ts_str("click_ts").alias("click_ts"),
        ts_str("purchase_ts").alias("purchase_ts"),
        "purchase_value",
    )


@register("stream_join_left_outer", oracle=_STREAM_LOJ_ORACLE)
def stream_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks, purchases = _stream_stream_join_sides(ev)
    return _stream_loj_plan(clicks, purchases)


# --------------------------------------------------------------------------
# stream_exactly_once_sink — exactly-once delivery over an at-least-once
# engine (the Structured Streaming contract: foreachBatch MAY redeliver a
# batch after a failure, with the SAME batch_id; an idempotent sink must
# turn that into exactly-once).  The sink keeps a batch-id transaction
# log: data writes land first (append mode — a naive retry would
# duplicate), the commit marker lands LAST (the atomic commit point), and
# a redelivered batch_id short-circuits on the marker.  After the stream
# drains, the writer is re-invoked with an already-committed batch_id and
# the full input — the worst-case duplicate delivery — and must skip it:
# the final table equals the plain batch aggregate, not double it.
#
# Scale: per-batch work is an ordinary partitioned append; the txn log is
# one empty marker file per batch (what Delta's txn table / Kafka's
# committed offsets do).  Exactness: totals accumulate as fixed-point
# micros, order- and batch-count-independent.
# --------------------------------------------------------------------------

_EOS_ORACLE = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, {osum('value')} AS total_value,
       CAST(1 AS INT) AS n_redeliveries_skipped
FROM events GROUP BY event_type
"""


@register("stream_exactly_once_sink", oracle=_EOS_ORACLE)
def stream_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from nedp_etl_spark.data import load as _load
    from nedp_etl_spark.operators.scans import _scratch

    base = _scratch("stream_exactly_once", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    calls = {"delivered": 0, "committed": 0}

    def write_once(batch_df: DataFrame, batch_id: int) -> None:
        calls["delivered"] += 1
        marker = os.path.join(base, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return  # already-committed batch redelivered: exactly-once no-op
        (
            batch_df.select(
                "event_type",
                F.floor(F.col("value") * 1_000_000.0 + 0.5)
                .cast("long")
                .alias("value_micros"),
            )
            .write.mode("append")  # append: a naive retry WOULD duplicate
            .parquet(os.path.join(base, "data"))
        )
        open(marker, "w").close()  # commit point strictly after the data
        calls["committed"] += 1

    ev = _stream_events(_isolated(spark), sf_dir)
    s = ev.sparkSession
    s.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        ev.writeStream.foreachBatch(write_once)
        .option("checkpointLocation", os.path.join(base, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # simulate the engine's at-least-once retry: redeliver batch 0 whole
    write_once(_load(s, sf_dir, "events"), 0)
    skipped = calls["delivered"] - calls["committed"]
    return (
        s.read.parquet(os.path.join(base, "data"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("value_micros").cast("double") / 1_000_000.0).alias(
                "total_value"
            ),
        )
        .withColumn("n_redeliveries_skipped", F.lit(skipped).cast("int"))
    )
