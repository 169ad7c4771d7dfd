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
