"""Custom stateful streaming operator (SURVEY §2 streaming block +
BASELINE.json:6 'custom stateful operators'): arbitrary per-key state via
``applyInPandasWithState`` in a real Structured Streaming query.

The operator maintains a per-user running profile (event count, value sum,
last-seen timestamp) across micro-batches — the state shape that backs
feature stores and online aggregations.  State lives in the state store
(bounded per key, watermark-expirable), NOT in driver memory; the Python
function sees one Arrow-batched group per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nedp_etl_spark.registry import register
from nedp_etl_spark.streaming.windows import _run_to_memory, _stream_events
from nedp_etl_spark.util import osum

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen_us bigint"
_STATE_SCHEMA = "n bigint, total_q bigint, last_us bigint"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total_q, last_us = state.get
    else:
        n, total_q, last_us = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # fixed-point accumulate (util.dsum discipline): exact and
        # order-independent across rows AND micro-batch boundaries, so the
        # final profile is hash-comparable to the batch-SQL oracle.
        total_q += int((pdf["value"] * 1_000_000.0 + 0.5).floordiv(1).sum())
        last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total_q, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_q / 1_000_000.0],
            "last_seen_us": [last_us],
        }
    )


# Exact oracle: with the single-file availableNow replay every key's final
# update-mode row is the full profile, and fixed-point accumulation makes
# the sum independent of row order inside the Arrow batches — the streaming
# result is bit-identical to this batch aggregate.
_CUSTOM_STATE_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {osum('value')} AS total_value,
       MAX(epoch_us(ts)) AS last_seen_us
FROM events
GROUP BY user_id
"""


@register("stream_custom_state", oracle=_CUSTOM_STATE_ORACLE)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful profile over the replayed events stream.

    The per-key state machine is the non-SQL part (arbitrary state +
    update-mode emission); the FINAL profiles it converges to are exactly
    the batch aggregate, which is the registered oracle.  The in-repo test
    additionally asserts the same equality through the DataFrame API.
    """
    from nedp_etl_spark.data import plausible_event_time

    # ts crosses into Python here: out-of-ns-window sentinels cannot pass
    # the Arrow bridge (see data.plausible_event_time) — route them out.
    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts", "value")
        .filter(plausible_event_time("ts"))
    )
    profiles = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(profiles, f"custom_state_{abs(hash(sf_dir)) % 10_000}", "update")
    # update mode may emit a row per key per batch — keep the final state
    # per user (max n_events is monotone in batches).
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


# --------------------------------------------------------------------------
# stream_asof_enrich — streaming as-of dimension enrichment: every
# non-signup event is enriched with the LATEST signup (the "dimension
# version") of the same user with signup.ts <= event.ts, via per-key state.
# This is the streaming analogue of join_asof and the incremental-model
# use case the reference ships through dbt-spark (event stream enriched
# with the current dimension row): state holds ONE row per user (latest
# signup ts/id/value — bounded, corpus-size independent); each Arrow batch
# is processed in (ts, signup-first, event_id) order so a signup at the
# event's exact timestamp is visible to it, and the last same-ts signup
# wins (event_id order).
#
# Exactness: nothing accumulates — state carries the signup's raw values —
# so the single-file availableNow replay is row-identical to the batch
# as-of join the oracle states.
# Reference parity: streaming enrichment reaches the reference only as an
# incremental dbt model (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ASOF_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts_us bigint, event_type string,"
    " signup_ts_us bigint, signup_value double"
)
_ASOF_STATE_SCHEMA = "s_us bigint, s_eid bigint, s_value double"

_ASOF_ENRICH_ORACLE = """
WITH facts AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type <> 'signup'
),
sg AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'signup'
),
best AS (
  SELECT f.event_id,
         s.ts AS s_ts, s.value AS s_value,
         ROW_NUMBER() OVER (PARTITION BY f.event_id
                            ORDER BY s.ts DESC, s.event_id DESC) AS rn
  FROM facts f
  JOIN sg s ON s.user_id = f.user_id AND s.ts <= f.ts
)
SELECT f.event_id, f.user_id,
       epoch_us(f.ts) AS ts_us, f.event_type,
       epoch_us(b.s_ts) AS signup_ts_us, b.s_value AS signup_value
FROM facts f
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.event_id = f.event_id
"""


def _asof_enrich_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        s_us, s_eid, s_value = state.get
    else:
        s_us, s_eid, s_value = -1, -1, None
    out: dict[str, list] = {
        "event_id": [], "user_id": [], "ts_us": [],
        "event_type": [], "signup_ts_us": [], "signup_value": [],
    }
    # CONCAT the Arrow chunks before the single sort: a key with more rows
    # than arrow.maxRecordsPerBatch arrives as multiple chunks, and sorting
    # each independently would let a chunk-1 fact precede a chunk-2 signup
    # with an earlier timestamp (review catch, round 8).
    chunks = list(pdfs)
    whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else (
        chunks[0] if chunks else pd.DataFrame(
            columns=["event_id", "user_id", "ts", "event_type", "value"]
        )
    )
    if len(whole):
        import numpy as np

        # Vectorized replay of the per-row state machine (r13 optimization
        # round, guide §4.2 — the itertuples loop was ~5 s/run at sf0.1):
        # after the (us, signup-first, event_id) sort, the state visible to
        # a fact row is the LAST signup row above it (signups arrive in
        # ascending (us, event_id), so last-seen ≡ max — exactly the loop's
        # "newer wins" update), unless the carried-in state is newer still.
        whole = whole.assign(
            us=whole["ts"].astype("int64") // 1000,
            fact=(whole["event_type"] != "signup").astype("int8"),
        ).sort_values(["us", "fact", "event_id"])
        us = whole["us"].to_numpy(np.int64)
        eid = whole["event_id"].to_numpy(np.int64)
        val = whole["value"].to_numpy(np.float64)  # None → NaN, as itertuples saw
        isf = whole["fact"].to_numpy() == 1
        n = len(us)
        sg_idx = np.where(~isf, np.arange(n), -1)
        last_sg = np.maximum.accumulate(sg_idx)  # last signup index ≤ i, -1 none
        safe = np.clip(last_sg, 0, None)
        c_us, c_eid, c_val = us[safe], eid[safe], val[safe]
        s_val_f = np.nan if s_value is None else float(s_value)
        better = (last_sg >= 0) & (
            (c_us > s_us) | ((c_us == s_us) & (c_eid > s_eid))
        )
        e_us = np.where(better, c_us, s_us)
        e_val = np.where(better, c_val, s_val_f)
        fm = isf
        has = e_us[fm] >= 0
        out = {
            "event_id": eid[fm],
            "user_id": np.full(int(fm.sum()), int(key[0]), dtype=np.int64),
            "ts_us": us[fm],
            "event_type": whole["event_type"].to_numpy()[fm],
            # object arrays: None where no signup yet — the exact cells the
            # row loop emitted
            "signup_ts_us": np.where(has, e_us[fm].astype(object), None),
            "signup_value": np.where(
                has, e_val[fm].astype(object), None
            ),
        }
        # final state: the last batch signup (max (us, eid) by sort order)
        # vs the carried-in state — the same "newer wins" rule
        if (~isf).any():
            j = int(np.where(~isf)[0].max())
            if (int(us[j]), int(eid[j])) > (s_us, s_eid):
                s_us, s_eid, s_value = int(us[j]), int(eid[j]), float(val[j])
    state.update((s_us, s_eid, s_value))
    yield pd.DataFrame(out)


@register("stream_asof_enrich", oracle=_ASOF_ENRICH_ORACLE)
def stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One availableNow batch (no maxFilesPerTrigger): directory-layout
    # fixtures' part files are not time-ordered, and an out-of-order
    # cross-file batch split would apply a later-batch signup after an
    # earlier-batch fact with a later timestamp was already emitted
    # un-enriched.  Within the single batch, per-key order is restored by
    # the sort inside _asof_enrich_fn.  Cross-BATCH replay of the state
    # path stays covered by tests/test_streaming.py with deliberately
    # time-ordered staged parts.
    from nedp_etl_spark.data import plausible_event_time

    # ts crosses into Python here: out-of-ns-window sentinels cannot pass
    # the Arrow bridge (see data.plausible_event_time) — route them out.
    ev = (
        _stream_events(spark, sf_dir, max_files_per_trigger=None)
        .select("event_id", "user_id", "ts", "event_type", "value")
        .filter(plausible_event_time("ts"))
    )
    enriched = ev.groupBy("user_id").applyInPandasWithState(
        _asof_enrich_fn,
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(
        enriched, f"asof_enrich_{abs(hash(sf_dir)) % 10_000}", "append"
    )
