"""Spark 4 ``transformWithStateInPandas`` stateful processor (the successor
API to ``applyInPandasWithState`` — typed state variables managed by the
state store instead of one opaque tuple).

Same per-user profile semantics as ``stateful.stream_custom_state`` so the
two APIs are directly comparable: a ValueState holds (n_events,
total_value); each micro-batch folds its Arrow-batched rows into the state
and emits the updated profile.  State lives in the (RocksDB-capable) state
store, partitioned by the grouping key — per-key bounded, corpus-size
independent — and the processor sees only one key's rows per call, so the
operator scales with the number of executors exactly like any keyed
aggregation.  Exact-checked where registered: fixed-point state converges
to the batch aggregate, which is the registered oracle;
``tests/test_stateful.py`` asserts the same equality through the DataFrame
API when the environment supports the API (see gate below).

Environment gate: the transformWithState state-server protocol needs a
working ``google.protobuf`` (the processor talks to the JVM state store
over a protobuf socket).  This container ships a broken protobuf
(``ImportError: cannot import name 'descriptor'``), so registration is
gated on the import — on a normal cluster the key registers and runs; here
the module stays importable and documents the API surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

from nedp_etl_spark.registry import register
from nedp_etl_spark.streaming.windows import _run_to_memory, _stream_events
from nedp_etl_spark.util import osum

try:  # the state-server protocol requires a working protobuf runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _PROTOBUF_OK = True
except ImportError:  # pragma: no cover - environment-dependent
    _PROTOBUF_OK = False

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class _ProfileProcessor(StatefulProcessor):
    """ValueState-backed running (count, fixed-point sum) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = StructType(
            [StructField("n", LongType()), StructField("total_q", LongType())]
        )
        self._state = handle.getValueState("profile", schema)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues  # noqa: ANN001
    ) -> Iterator[pd.DataFrame]:
        got = self._state.get() if self._state.exists() else None
        n, total_q = got if got is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # fixed-point accumulate (util.dsum discipline): micro-batch
            # boundaries must not change the float result
            total_q += int((pdf["value"] * 1_000_000.0 + 0.5).floordiv(1).sum())
        self._state.update((n, total_q))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_q / 1_000_000.0],
            }
        )

    def close(self) -> None:
        pass


# Exact oracle (same reasoning as stream_custom_state: fixed-point state +
# single-file availableNow replay converge to the batch aggregate).  Only
# used where the protobuf gate lets the key register.
_TRANSFORM_STATE_ORACLE = f"""
SELECT user_id, COUNT(*) AS n_events, {osum('value')} AS total_value
FROM events GROUP BY user_id
"""


def _register_if_supported(fn):
    if _PROTOBUF_OK:
        return register("stream_transform_state", oracle=_TRANSFORM_STATE_ORACLE)(fn)
    return fn


@_register_if_supported
def stream_transform_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        _ProfileProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    res = _run_to_memory(
        out, f"transform_state_{abs(hash(sf_dir)) % 10_000}", "update"
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # update mode emits one row per key per batch; keep the final profile
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
