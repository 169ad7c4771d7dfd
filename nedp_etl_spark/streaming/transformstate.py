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

Environment gate + bootstrap: the transformWithState state-server protocol
needs a working ``google.protobuf`` (the processor talks to the JVM state
store over a protobuf socket).  When the interpreter has no protobuf
package, :func:`_ensure_protobuf` probes known locations of a pure-python
protobuf runtime (e.g. the one bundled with a locally-installed
google-cloud-sdk) and appends it to ``sys.path`` — never shadowing a real
install — using protobuf's own documented
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for a
one-minor-version-older runtime.  The bootstrap runs at module import, so
it also runs inside Python workers when the stateful processor
deserializes there (workers import this module before pyspark's
state-server client imports the generated proto).  If no runtime can be
found, the key stays unregistered and the module documents the surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

from nedp_etl_spark.registry import register
from nedp_etl_spark.streaming.windows import _run_to_memory, _stream_events
from nedp_etl_spark.util import osum

# Directories that may carry a complete pure-python google.protobuf tree.
_PB_CANDIDATES = ("/usr/lib/google-cloud-sdk/platform/google_appengine",)


def _ensure_protobuf() -> bool:
    """True if a usable google.protobuf runtime is importable (bootstrapping
    one from a known local copy if the environment lacks the package)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for cand in _PB_CANDIDATES:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        # protobuf's own documented override for gencode-newer-than-runtime
        # (pyspark 4.1 gencode is 6.33; the bundled runtime is 6.32).  Track
        # which env vars WE set so a failed bootstrap leaves no process-wide
        # residue (they would silently force the pure-python implementation
        # on any protobuf installed later in this interpreter).
        ours = [
            k
            for k in (
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
                "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
            )
            if k not in os.environ
        ]
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        if cand not in sys.path:
            sys.path.append(cand)
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            if cand in sys.path:
                sys.path.remove(cand)
            for k in ours:
                os.environ.pop(k, None)
    return False


_PROTOBUF_OK = _ensure_protobuf()

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
        # get() returns None when the key has no state yet — one state-server
        # round trip per key instead of the exists()+get() pair (the RPC
        # chatter is the dominant per-key cost under pure-python protobuf)
        got = self._state.get()
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


def _propagate_bootstrap(spark: SparkSession) -> None:
    # The state-server client runs in separate Python worker processes that
    # import the generated proto before any user code — propagate the
    # bootstrap there via the PythonFunction env (sc.environment feeds the
    # worker's environment, including its PYTHONPATH merge).  The mutation
    # is APPLY-ONCE AND PERMANENT, not save/restored: a restore races with
    # any concurrently launching query on the shared SparkContext (its
    # workers could start between our pop and its own read, or our restore
    # could resurrect a snapshot of someone else's transient state — the
    # same hazard class the sink_partition_overwrite conf save/restore fix
    # removed).  Leaving it resident is safe BY CONSTRUCTION: bootstrap_dir
    # is non-None only when this interpreter had no google.protobuf at all
    # (the _PROTOBUF_OK probe inserted the candidate into sys.path), so
    # there is no real worker-side install for the PYTHONPATH entry to
    # shadow.
    bootstrap_dir = next(
        (c for c in _PB_CANDIDATES if c in sys.path), None
    )
    env = spark.sparkContext.environment
    if bootstrap_dir is not None:
        env.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        env.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        existing = env.get("PYTHONPATH", "")
        if bootstrap_dir not in existing:
            env["PYTHONPATH"] = (
                f"{existing}{os.pathsep}{bootstrap_dir}" if existing else bootstrap_dir
            )


def _rocksdb_session(spark: SparkSession) -> SparkSession:
    from nedp_etl_spark.streaming.windows import _isolated

    s = _isolated(spark)
    # transformWithState keeps its typed state variables in separate column
    # families — only the RocksDB provider supports those (the default
    # HDFS-backed store refuses); set it on the isolated session only.
    s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return s


def warm_state_server(spark: SparkSession) -> None:
    """Prime the transformWithState machinery on TWO LITERAL ROWS.

    The first transformWithStateInPandas query in a session pays the
    state-server bootstrap: protobuf import inside the state workers, the
    Python<->JVM state-server handshake, and the first RocksDB store open
    (profiled in SCALE.md: 12.8 s first-in-session vs 3.9 s warm, ~10x
    taxed by the container's pure-python protobuf).  That cost is session
    startup, not per-query work — benchmarks call this once at startup
    (the fn_collate warming precedent) so the measured key reflects its
    own plan.  Never touches fixture data; no-op when the protobuf gate
    kept the key unregistered."""
    if not _PROTOBUF_OK:
        return
    import shutil
    import tempfile

    _propagate_bootstrap(spark)
    src = tempfile.mkdtemp(prefix="tws_warm_src_")
    try:
        (
            spark.createDataFrame([(1, 1.0), (2, 2.0)], "user_id long, value double")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(src)
        )
        s = _rocksdb_session(spark)
        ev = s.readStream.schema("user_id long, value double").parquet(src)
        out = ev.groupBy("user_id").transformWithStateInPandas(
            _ProfileProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        _run_to_memory(out, "tws_warm", "update", partitions=2)
    finally:
        shutil.rmtree(src, ignore_errors=True)


@_register_if_supported
def stream_transform_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    _propagate_bootstrap(spark)
    s = _rocksdb_session(spark)
    ev = _stream_events(s, sf_dir).select("user_id", "value")
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
