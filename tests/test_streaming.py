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
