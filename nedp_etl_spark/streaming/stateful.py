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

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen string"
_STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "last_seen": [str(pd.Timestamp(last_us * 1000))],
        }
    )


@register("stream_custom_state")
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful profile over the replayed events stream.

    Rows-only check (arbitrary-state semantics have no SQL oracle); the
    in-repo test asserts the final profiles equal the batch groupBy.
    """
    ev = _stream_events(spark, sf_dir).select("user_id", "ts", "value")
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
