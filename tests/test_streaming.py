"""Batch ≡ streaming parity: the same windowed aggregation replayed through
Structured Streaming (availableNow → memory sink) must produce exactly the
rows the batch form produces (SURVEY §7 step 8 self-check)."""

from __future__ import annotations

from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.streaming.windows import _run_to_memory, _stream_events


def test_tumbling_batch_equals_streaming(spark, sf_dir):
    batch = {
        tuple(r)
        for r in eng.queries()["stream_tumbling"](spark, sf_dir)
        .select("window_start", "event_type", "n")
        .collect()
    }

    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
    streamed = {tuple(r) for r in _run_to_memory(agg, "parity_tumbling", "complete").collect()}
    assert streamed == batch


def test_streaming_dedup_matches_batch(spark, sf_dir):
    batch_n = eng.queries()["stream_dedup"](spark, sf_dir).count()
    ev = _stream_events(spark, sf_dir)
    dedup = ev.withWatermark("ts", "1 hour").dropDuplicates(["event_id"]).select(
        "event_id", "event_type"
    )
    streamed = _run_to_memory(dedup, "parity_dedup", "append")
    assert streamed.count() == batch_n


def test_session_window_batch_equals_streaming(spark, sf_dir):
    """Session windows are the trickiest stateful op (variable-length state,
    merge-on-overlap): the streaming replay must produce exactly the batch
    sessions."""
    from nedp_etl_spark.streaming.windows import _isolated

    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in eng.queries()["stream_session"](spark, sf_dir).collect()
    }
    ev = _stream_events(_isolated(spark), sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    streamed = {
        tuple(r) for r in _run_to_memory(agg, "parity_session", "complete").collect()
    }
    assert streamed == batch


def test_checkpoint_restart_no_reprocessing(spark, sf_dir):
    """Exactly-once file ingestion: restarting a checkpointed stream over
    unchanged input must emit nothing new (offsets are durable)."""
    import os
    from nedp_etl_spark.operators.scans import _scratch

    import shutil

    ckpt = _scratch("ckpt_restart/ckpt", sf_dir)
    out = _scratch("ckpt_restart/out", sf_dir)
    shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)
    ev = _stream_events(spark, sf_dir).select("event_id", "event_type")

    def run():
        # memory sink can't recover from checkpoints — use the parquet file
        # sink, which commits offsets durably.
        q = (
            ev.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    first = run()
    second = run()
    assert first > 0
    assert second == first, "restart reprocessed already-committed input"


def test_watermark_drops_late_rows(spark, tmp_path):
    """REAL late-data semantics (what the stream_watermark_late batch oracle
    cannot show): an event arriving in a later micro-batch, older than the
    already-advanced watermark, must be dropped — its (finalized) window is
    emitted once with the on-time count and never updated."""
    import os
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nedp_etl_spark.streaming.windows import _isolated

    stage = str(tmp_path / "late_src")
    os.makedirs(stage)

    def write(name: str, hours_minutes: list, mtime: int) -> None:
        ts = [
            datetime(2024, 1, 1, h, m, tzinfo=timezone.utc) for h, m in hours_minutes
        ]
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us", tz="UTC"))})
        p = os.path.join(stage, name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    s = _isolated(spark)
    s.conf.set("spark.sql.shuffle.partitions", "8")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run_available() -> None:
        raw = s.readStream.schema("ts timestamp").parquet(stage)
        agg = (
            raw.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two 10:xx events + a 12:00 event -> the committed watermark is
    # 11:50 and the [10:00, 11:00) window finalizes with n=2.
    write("a.parquet", [(10, 0), (10, 30), (12, 0)], 1_700_000_000)
    run_available()
    # run 2 (same checkpoint — the watermark is RESTORED from it): a 10:15
    # straggler, older than the restored watermark -> must be dropped.
    write("b.parquet", [(10, 15)], 1_700_000_100)
    run_available()

    got = {(r.ws, r.n) for r in spark.read.parquet(out).collect()}
    # the straggler did NOT bump the count to 3; the in-flight 12:00 window
    # is withheld (not finalized at stream end)
    assert got == {("2024-01-01 10:00:00", 2)}


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream self-join (click -> purchase within 1h)
    must emit exactly the pairs the batch join emits."""
    from nedp_etl_spark.streaming.windows import (
        _stream_stream_join_plan,
        _stream_stream_join_sides,
    )

    batch = {
        tuple(r) for r in eng.queries()["stream_stream_join"](spark, sf_dir).collect()
    }

    ev = _stream_events(spark, sf_dir)
    clicks, purchases = _stream_stream_join_sides(ev)
    joined = _stream_stream_join_plan(
        clicks.withWatermark("click_ts", "2 hours"),
        purchases.withWatermark("purchase_ts", "2 hours"),
    )
    streamed = {
        tuple(r)
        for r in _run_to_memory(joined, "parity_ss_join", "append").collect()
    }
    assert len(streamed) > 0
    assert streamed == batch


def test_transform_state_timers_across_two_microbatches(spark, tmp_path):
    # transformWithState WITH TIMERS, replayed across two real micro-batches
    # (the one stateful surface the parity harness didn't cover).  Each
    # input batch folds counts into ValueState and registers an already-due
    # processing-time timer; Spark fires timers in a SUBSEQUENT batch, where
    # handleExpiredTimer emits the state as of firing.  Expected ledger:
    #   batch 0 (file1): input rows (1,n=2),(2,n=1); timers registered
    #   batch 1+       : timer rows (1,2),(2,1)
    #   batch k (file2): input rows (1,3),(2,3); timers re-registered
    #   batch k+1+     : timer rows (1,3),(2,3)
    # Final input rows must equal the batch aggregate over BOTH files
    # (replay parity); timer rows must equal the state snapshots.
    # NB: availableNow does NOT terminate under timeMode=ProcessingTime
    # (observed: endless empty batches while timers exist), so the test
    # polls the parquet sink and stops the query deterministically.
    import time

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    from nedp_etl_spark.streaming import transformstate as tws

    if not tws._PROTOBUF_OK:
        import pytest as _pytest

        _pytest.skip("no protobuf runtime for the state server")

    class TimerProbe(StatefulProcessor):
        def init(self, handle):
            self._h = handle
            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._n.get()
            n = got[0] if got is not None else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            self._h.registerTimer(timerValues.getCurrentProcessingTimeInMs() - 1)
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "kind": ["input"]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            got = self._n.get()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [got[0] if got else -1], "kind": ["timer"]}
            )

        def close(self):
            pass

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 5.0)], "user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    tws._propagate_bootstrap(spark)
    s = tws._rocksdb_session(spark)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    ev = s.readStream.schema("user_id long, value double").parquet(src)
    res = ev.groupBy("user_id").transformWithStateInPandas(
        TimerProbe(),
        outputStructType="user_id bigint, n bigint, kind string",
        outputMode="Update",
        timeMode="ProcessingTime",
    )
    q = (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )

    def _rows():
        try:
            return {tuple(r) for r in spark.read.parquet(out).collect()}
        except Exception:
            return set()

    def _wait_for(expected, deadline_s):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if expected <= _rows():
                return
            time.sleep(1.0)
        raise AssertionError(
            f"timed out waiting for {expected - _rows()}; have {_rows()}"
        )

    try:
        epoch1 = {(1, 2, "input"), (2, 1, "input"), (1, 2, "timer"), (2, 1, "timer")}
        _wait_for(epoch1, 150)
        # second micro-batch: new data for both keys
        spark.createDataFrame(
            [(1, 3.0), (2, 7.0), (2, 8.0)], "user_id long, value double"
        ).coalesce(1).write.mode("append").parquet(src)
        epoch2 = {(1, 3, "input"), (2, 3, "input"), (1, 3, "timer"), (2, 3, "timer")}
        _wait_for(epoch2, 150)
    finally:
        q.stop()

    got = _rows()
    assert got == epoch1 | epoch2  # nothing else emitted
    # replay parity: the final input-kind state equals the batch aggregate
    batch = {
        (r["user_id"], r["n"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    final_inputs = {
        (u, max(n for (uu, n, k) in got if uu == u and k == "input")) for u in (1, 2)
    }
    assert final_inputs == batch


def test_windowed_distinct_batch_equals_streaming(spark, sf_dir):
    # The two-level distinct idiom must replay through readStream: a keyed
    # dedup aggregate feeding a per-window count.  Chained streaming
    # aggregations require the first level to emit finalized rows, so the
    # replay runs the SAME two-level plan in complete mode and must equal
    # the batch form row-for-row.
    batch = {
        tuple(r)
        for r in eng.queries()["stream_windowed_distinct"](spark, sf_dir).collect()
    }
    ev = _stream_events(spark, sf_dir)
    level1 = ev.select(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).dropDuplicates(["w", "event_type", "user_id"])
    agg = (
        level1.groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_users",
        )
    )
    streamed = {
        tuple(r)
        for r in _run_to_memory(agg, "parity_windowed_distinct", "complete").collect()
    }
    assert streamed == batch


def test_topk_per_window_batch_equals_streaming(spark, sf_dir):
    # The streaming leaderboard decomposition: the per-(window, type,
    # user) SUM is the streaming aggregate (bounded keyed state); ranking
    # happens at the sink.  Replay the sum through readStream (complete
    # mode), apply the SHARED rank stage to the sink table, and the rows
    # must equal the batch form exactly.
    from nedp_etl_spark.streaming.windows import _topk_rank

    batch = {
        tuple(r)
        for r in eng.queries()["stream_topk_per_window"](spark, sf_dir).collect()
    }
    ev = _stream_events(spark, sf_dir)
    sums = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
    ).agg(
        F.sum(F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("vq")
    )
    sink = _run_to_memory(sums, "parity_stream_topk", "complete")
    streamed = {tuple(r) for r in _topk_rank(sink).collect()}
    assert streamed == batch


def test_asof_enrich_state_across_two_microbatches(spark, tmp_path):
    """Cross-BATCH replay of the as-of enrich state path (round-8 advice):
    the registry operator reads its fixture in ONE availableNow batch (part
    files are not time-ordered), so this planted test is where multi-batch
    state recovery is exercised — two availableNow runs over the SAME
    checkpoint, with file arrival deliberately time-ordered per user (the
    documented supported posture for incremental feeds).  The restored
    state must enrich a run-2 fact with a run-1 signup."""
    import os

    from pyspark.sql.streaming.state import GroupStateTimeout

    from nedp_etl_spark.streaming.stateful import (
        _ASOF_OUT_SCHEMA,
        _ASOF_STATE_SCHEMA,
        _asof_enrich_fn,
    )
    from nedp_etl_spark.streaming.windows import _isolated

    stage = str(tmp_path / "asof_src")
    os.makedirs(stage)
    s = _isolated(spark)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    out = str(tmp_path / "asof_out")
    ckpt = str(tmp_path / "asof_ckpt")

    def write(name: str, rows: list) -> None:
        (
            spark.createDataFrame(
                rows,
                "event_id long, user_id long, ts timestamp, "
                "event_type string, value double",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / ("tmp_" + name)))
        )
        import glob as _glob
        import shutil

        part = _glob.glob(str(tmp_path / ("tmp_" + name) / "*.parquet"))[0]
        shutil.copyfile(part, os.path.join(stage, name))

    def run_available() -> None:
        raw = s.readStream.schema(
            "event_id long, user_id long, ts timestamp,"
            " event_type string, value double"
        ).parquet(stage)
        enriched = raw.groupBy("user_id").applyInPandasWithState(
            _asof_enrich_fn,
            outputStructType=_ASOF_OUT_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    from datetime import datetime, timezone

    def ts(sec: int):
        return datetime.fromtimestamp(sec, tz=timezone.utc)

    # run 1: user 1 signs up at t=10 (value 100) then clicks at t=20;
    #        user 2 clicks at t=5 with NO signup yet -> null enrichment.
    write(
        "a.parquet",
        [
            (1, 1, ts(10), "signup", 100.0),
            (2, 1, ts(20), "click", 1.0),
            (3, 2, ts(5), "click", 2.0),
        ],
    )
    run_available()
    # run 2 (state restored from the checkpoint): user 2 signs up at t=30
    # and clicks at t=40; user 1 clicks at t=50 — must be enriched with the
    # RUN-1 signup carried in recovered state.
    write(
        "b.parquet",
        [
            (4, 2, ts(30), "signup", 200.0),
            (5, 2, ts(40), "click", 3.0),
            (6, 1, ts(50), "click", 4.0),
        ],
    )
    run_available()

    got = {
        (r.event_id, r.user_id, r.ts_us, r.event_type, r.signup_ts_us, r.signup_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (2, 1, 20_000_000, "click", 10_000_000, 100.0),
        (3, 2, 5_000_000, "click", None, None),
        (5, 2, 40_000_000, "click", 30_000_000, 200.0),
        (6, 1, 50_000_000, "click", 10_000_000, 100.0),
    }


def test_stream_left_outer_join_matches_batch_with_null_padding(spark, sf_dir):
    """Outer stream-stream join: null-padded rows may only be emitted once
    the watermark proves no match can arrive — end-of-stream under
    availableNow finalizes them, so the streamed result must equal the
    batch left join INCLUDING clicks with no purchase."""
    from nedp_etl_spark.streaming.windows import (
        _stream_loj_plan,
        _stream_stream_join_sides,
    )

    batch = {
        tuple(r)
        for r in eng.queries()["stream_join_left_outer"](spark, sf_dir).collect()
    }
    assert any(r[2] is None for r in batch)  # fixture has unmatched clicks

    ev = _stream_events(spark, sf_dir)
    clicks, purchases = _stream_stream_join_sides(ev)
    joined = _stream_loj_plan(
        clicks.withWatermark("click_ts", "2 hours"),
        purchases.withWatermark("purchase_ts", "2 hours"),
    )
    streamed = {
        tuple(r)
        for r in _run_to_memory(joined, "parity_loj", "append").collect()
    }
    # Matched rows emit immediately -> exact parity.  Null-padded rows emit
    # only once the watermark PROVES no match can arrive; at end of stream
    # the final watermark (max event time - 2h) leaves clicks inside the
    # last watermark+range hours unproven, so those rows are withheld --
    # the documented outer-join end-of-stream semantics, same as the
    # withheld in-flight window in the late-data test.
    inner = lambda rows: {r for r in rows if r[2] is not None}  # noqa: E731
    nulls = lambda rows: {r for r in rows if r[2] is None}  # noqa: E731
    assert inner(streamed) == inner(batch)
    assert nulls(streamed) <= nulls(batch)
    assert len(nulls(streamed)) > 0  # null padding did stream
    import datetime as _dt
    all_ts = [r[3] for r in batch] + [r[4] for r in batch if r[4]]
    maxts = max(_dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S") for t in all_ts)
    cutoff = maxts - _dt.timedelta(hours=4)  # watermark 2h + range 1h + slack
    withheld = nulls(batch) - nulls(streamed)
    assert all(
        _dt.datetime.strptime(r[3], "%Y-%m-%d %H:%M:%S") >= cutoff
        for r in withheld
    ), "a null row outside the watermark tail was withheld"


def test_exactly_once_sink_skips_redelivery_and_naive_would_double(spark, sf_dir):
    """The registered query already replays a worst-case duplicate
    delivery; prove the marker is LOAD-BEARING: totals equal the batch
    aggregate exactly (a naive append sink would double them), and
    exactly one redelivery was skipped."""
    out = eng.queries()["stream_exactly_once_sink"](spark, sf_dir).collect()
    from nedp_etl_spark.data import load as _load
    batch = {
        (r["event_type"], r["n"]) for r in
        _load(spark, sf_dir, "events").groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n")).collect()
    }
    assert {(r["event_type"], r["n"]) for r in out} == batch
    assert all(r["n_redeliveries_skipped"] == 1 for r in out)


def test_sliding_window_batch_equals_streaming(spark, sf_dir):
    """Sliding windows multiply state (each event lands in window/slide = 4
    buckets): the streaming replay must reproduce the batch rows exactly —
    same bucket starts, same counts, no double-assignment at bucket seams."""
    batch = {
        tuple(r)
        for r in eng.queries()["stream_sliding"](spark, sf_dir)
        .select("window_start", "event_type", "n")
        .collect()
    }
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
    streamed = {
        tuple(r) for r in _run_to_memory(agg, "parity_sliding", "complete").collect()
    }
    assert streamed == batch


def test_static_join_batch_equals_streaming(spark, sf_dir):
    """Stream-static join parity: the static (broadcast) side is re-joined
    per micro-batch by the streaming engine; the replay must reproduce the
    batch enrichment + aggregate exactly, dsum quantization included."""
    from nedp_etl_spark.data import load
    from nedp_etl_spark.streaming.windows import _isolated
    from nedp_etl_spark.util import dsum

    batch = {
        tuple(r) for r in eng.queries()["stream_static_join"](spark, sf_dir).collect()
    }
    s = _isolated(spark)
    ev = _stream_events(s, sf_dir)
    nation = load(s, sf_dir, "nation")
    agg = (
        ev.join(
            F.broadcast(nation),
            (F.col("user_id") % 25).cast("int") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )
    streamed = {
        tuple(r)
        for r in _run_to_memory(agg, "parity_static_join", "complete").collect()
    }
    assert streamed == batch
