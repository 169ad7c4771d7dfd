"""Fixture loading + per-query session preparation.

The driver owns the SparkSession, so any config our results depend on must be
runtime-settable and applied on every query call:

- ``spark.sql.session.timeZone=UTC`` — fixtures store timestamp[ms]/[ns];
  hashing must not depend on the driver host's zone.
- AQE on — runtime shuffle-partition coalescing + skew-join splitting; this is
  the 100 TB posture (partition counts chosen at runtime, not hardcoded).
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — kept as a no-op guard:
  older fixture builds stored ``events.ts`` as parquet TIMESTAMP(NANOS)
  (unreadable natively; read as int64 nanos and floor-converted to µs);
  current builds store timestamp[us] which loads directly.  ``load`` branches
  on the actual loaded dtype so both fixture generations work — see the
  fixture-drift canary in ``tests/test_data.py``.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under ``sf_dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # Streaming state-store partitioning follows shuffle.partitions and AQE
    # cannot coalesce it — sized to the session's core count in prepare()
    # (defaultParallelism) instead of a constant: a literal was tuned to one
    # core count and wrong at every other (r13 optimization round, guide
    # §2.2 — on a real cluster defaultParallelism is total executor cores,
    # which is exactly the sizing the old comment described).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE rewrite sort-merge → shuffled-hash when EVERY post-shuffle
    # build partition is under 64 MB (guide §3.1): skips both sort passes on
    # equi-joins of quantized key maps (spearman/roc ranks, dedup band
    # joins).  Runtime-measured sizes, not estimates, so it is scale-safe:
    # an oversized build side keeps sort-merge and its graceful spill; 64 MB
    # × one build map per task core bounds worst-case memory at the same
    # order as a coalesced shuffle partition.  Default is 0 (off).
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Local-fixture split sizing: the default 4 MB file-open cost caps a
    # 10 MB parquet at ~3 input splits, serializing scan-heavy aggregates
    # (decimal accumulators) onto 3 of 32 cores.  256 KB lets maxSplitBytes
    # fall to totalBytes/defaultParallelism so scans use every core.  On a
    # real cluster files outnumber cores and this knob is irrelevant —
    # maxPartitionBytes (default 128 MB) governs there.
    "spark.sql.files.openCostInBytes": "262144",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session conf every query depends on.

    Deliberately NOT memoized: the driver owns the session and may mutate
    conf between queries, so the module contract (docstring above) is that
    every query call re-pins what results depend on.  The cost is a few
    py4j round trips per ``load`` — ~2 s across a 230-query suite run,
    cheap insurance against a silently drifted timezone or shuffle conf
    (and a per-session-id memo would carry an id-recycling hazard: ids of
    collected py4j proxies can be reused by new sessions).
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build — defaults are fine
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 1)),
        )
    except Exception:
        pass
    return spark


# DataFrame plans are immutable and reusable — cache per (session, sf,
# table) so a 100-query suite doesn't re-list files and re-read footers on
# every load.  Keyed on sessionUUID — unique per live session and never
# reused — NOT id(jobj): CPython recycles addresses after GC, and the
# isolated streaming sessions churn py4j proxies, so an id key could
# alias a fresh session onto a dead session's cached DataFrames (the
# same hazard ``derived_table`` documents and avoids).  Cleared wholesale
# at the size cap: entries are tiny, but unbounded many-short-session
# runs shouldn't pin dead JVM plans forever.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_DF_CACHE_CAP = 4096


# The engine's fixed-point numeric domain: values quantize via
# ``floor(x*1e6+0.5)``, so any |x| >= 2^63/1e6 ≈ 9.223e12 cannot be
# represented.  9.2e12 is the documented bound (same literal on the
# DuckDB oracle side — tests/oracle.py mirrors it in the table views).
VALUE_ABS_MAX = 9.2e12


def finite_or_null(c):
    """Values with no usable magnitude — NULL at ingestion.

    Two junk classes meet the same policy here:

    - NaN/±Inf (upstream divide-by-zero, overflowed transforms, degenerate
      encoders): parquet stores them happily, but under ANSI mode the
      engine's fixed-point quantize (``floor(x*1e6+0.5).cast('long')``)
      raises on them — the round-10 non-finite sweep crashed 65 keys.
    - finite but beyond :data:`VALUE_ABS_MAX` (sensor glitches, unit-mixup
      corruptions like epoch-nanos landing in a measurement column): here
      the failure is WORSE than a crash — Spark's ``floor(double)``
      saturates to ``Long.MaxValue`` silently, so one poison event would
      silently corrupt every downstream aggregate, while the DuckDB
      oracle's ``CAST`` throws (round-12 magnitude probe).

    Normalizing ONCE at the ingestion seam maps both classes onto the
    already-hardened NULL path (SQL aggregates skip NULL; the NULL-riddled
    sweep holds registry-wide) instead of guarding 378 quantize sites.
    NULL stays NULL (``isnan(NULL)`` is NULL → WHEN falls through to
    NULL); ±Inf fails the magnitude test, so one predicate covers all.
    """
    return F.when(~F.isnan(c) & (F.abs(c) < VALUE_ABS_MAX), c)


# Event-time plausibility window.  Two independent hazards meet at the same
# bound: (1) Arrow's pandas bridge is nanosecond-based, so a timestamp
# outside [1677-09-21, 2262-04-11] cannot cross into a Pandas UDF /
# applyInPandasWithState (pyarrow ArrowInvalid, probed); (2) data-derived
# calendars (``sequence(min_day, max_day)``) silently explode when one
# parser sentinel ('9999-12-31') stretches the span to ~3M days per group
# (the round-10 timestamp-extremes sweep clocked ts_gapfill 1 s → 122 s at
# sf0.001).  In event logs such values are sentinels or junk, never
# measurements — operators route them out AT THE CROSSING or at the
# grid-derivation site via :func:`plausible_event_time`.  Deliberately NOT
# applied at the scan: event-time predicates must keep parquet pushdown.
EVENT_TIME_MIN = "1677-09-22"
EVENT_TIME_MAX = "2262-04-10"


def plausible_event_time(c):
    """True for NULL or in-window event time (NULL stays on the hardened
    NULL path; out-of-window values are sentinels → caller filters)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.isNull() | c.between(EVENT_TIME_MIN, EVENT_TIME_MAX)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    Plain ``spark.read.parquet`` so Catalyst's scan keeps predicate pushdown
    + column pruning; at cluster scale the same call reads a partitioned
    directory tree and prunes partitions for free.  The two computed-float
    columns (``events.value``, ``embeddings.embedding``) are normalized via
    :func:`finite_or_null` — key/date/identity columns stay raw expressions,
    so their predicate pushdown (pinned in tests/test_plans.py) is intact.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    prepare(spark)
    key = (spark._jsparkSession.sessionUUID(), sf_dir, name)
    df = _DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # Fixture generations differ: older builds wrote parquet
            # TIMESTAMP(NANOS), which (under nanosAsLong) reads as int64
            # epoch-nanos; current builds write timestamp[us], which reads as
            # a native timestamp.  Branch on the loaded dtype so both work.
            ts_type = df.schema["ts"].dataType.typeName()
            if ts_type in ("long", "integer"):
                # int64 nanos → µs timestamp via integer division: epoch-nanos
                # (~1.7e18) exceed 2^53, so a float `/ 1000` round-trip can
                # floor 1µs low; `div` stays exact like DuckDB's truncation.
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type == "timestamp_ntz":
                # NTZ → session-zone timestamp; session tz is pinned UTC so
                # wall-clock values (and oracle hashes) are unchanged.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            # plain "timestamp" passes through untouched
            df = df.withColumn("value", finite_or_null(F.col("value")))
        elif name == "embeddings":
            # A vector with ANY non-finite OR NULL element is corrupt
            # wholesale — NULL the vector (the NULL-vector route-out every
            # consumer already handles), never propagate NaN into dot
            # products.  NULL elements are routed out wholesale BY DESIGN:
            # under three-valued logic exists() returns NULL (not false)
            # for a vector whose only oddity is a NULL element, and the
            # coalesce makes that policy explicit instead of an accident
            # of WHEN's NULL fall-through (ADVICE r11).
            corrupt = F.coalesce(
                F.exists(
                    "embedding",
                    lambda x: F.isnan(x) | (F.abs(x) >= VALUE_ABS_MAX),
                ),
                F.lit(True),
            )
            df = df.withColumn(
                "embedding", F.when(~corrupt, F.col("embedding"))
            )
        if len(_DF_CACHE) >= _DF_CACHE_CAP:
            _DF_CACHE.clear()
        _DF_CACHE[key] = df
    return df


# Row-group counts per (sf_dir, table): a parquet ROW GROUP is Spark's
# atomic split unit, so it is the hard ceiling on scan-task parallelism —
# maxPartitionBytes/openCostInBytes can schedule more tasks, but every row
# of a 1-row-group file lands in ONE of them.  Probed once per table from
# the local footer (pure metadata, no data read); layouts that cannot be
# probed report "many" so fan_out stays a no-op.
_RG_CACHE: dict[tuple[str, str], int] = {}


def _scan_row_groups(sf_dir: str, name: str) -> int:
    key = (sf_dir, name)
    n = _RG_CACHE.get(key)
    if n is None:
        import glob as _glob
        import os as _os

        try:
            import pyarrow.parquet as _pq

            path = f"{sf_dir}/{name}.parquet"
            if _os.path.isdir(path):
                n = sum(
                    _pq.ParquetFile(f).metadata.num_row_groups
                    for f in _glob.glob(_os.path.join(path, "*.parquet"))
                ) or 1
            else:
                n = _pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            n = 1 << 30  # not locally probe-able: assume well-split
        _RG_CACHE[key] = n
    return n


def fan_out(df: DataFrame, sf_dir: str, *names: str) -> DataFrame:
    """Input-skew guard for heavy per-row compute (optimization guide §2.5,
    "one huge unsplittable file → repartition immediately after the read").

    When the named source tables' combined row-group count is below the
    session's ``defaultParallelism``, their scans CANNOT parallelize (row
    groups are parquet's atomic splits), so every narrow transform above —
    per-row md5/shingling, quantize+limb products, vector folds — runs on a
    handful of cores while the rest idle.  Round-robin repartition spreads
    the rows first; call it on the NARROW projection so the exchange moves
    only needed columns (guide §2.3).  The decision derives from the input
    layout, not from a tuned constant: at production scale (row groups ≫
    cores) this returns ``df`` unchanged and the plan is identical.

    Safe by construction: every registry result is partition-invariant
    (pinned by tests/test_partition_invariance.py), and round-robin
    repartition is deterministic under retry (sortBeforeRepartition, on by
    default — guide §2.5).
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if sum(_scan_row_groups(sf_dir, n) for n in names) < par:
        return df.repartition(par)
    return df


def local_rows(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Single-slice ``createDataFrame`` for BOUNDED driver pages (literal
    grids, prefix-sum offsets, centroid/probe pages).

    The default ``createDataFrame(list, …)`` parallelizes the list across
    ``defaultParallelism`` slices, so every aggregate/shuffle over an 8-row
    helper relation schedules cores-many (mostly empty) tasks — measured
    0.38 s vs 0.25 s for one 8-row collect_list at local[32], multiplied by
    every such relation in every query (r13 optimization round).  These
    relations are bounded by construction at ANY corpus size, so one slice
    is the honest layout everywhere, not a local-mode tune."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for ``spark.sql`` queries.

    Temp views are SESSION-scoped, so this is only safe where the caller
    owns the session's name space for the duration — the engine's
    warehouse bootstrap (one ``EngineSession`` per session+sf, mirroring
    the reference's one-warehouse-per-operator contract) and
    single-threaded tests.  Registry queries must NOT use it on the shared
    session: use :func:`run_sql`, which binds tables with no shared name.
    """
    for n in names or TABLES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


def run_sql(spark: SparkSession, sf_dir: str, sql: str, tables) -> DataFrame:
    """Run SQL text that references fixture tables by bare name, binding
    each name to THIS ``sf_dir``'s DataFrame via parameterized
    ``spark.sql`` (each ``\\btable\\b`` becomes a ``{table}`` placeholder).

    The temp-view alternative (``views()`` + ``spark.sql``) is a
    multi-tenant hazard: temp views are session-global, so two threads
    running queries at DIFFERENT fixture dirs race on one name, and the
    loser's eager analysis silently binds the winner's data.  Parameter
    binding introduces no shared name, so concurrent runs at any mix of
    sf_dirs stay independent by construction — and the SQL text remains
    byte-shareable with the DuckDB oracle, which reads bare table names.

    Word-boundary substitution is safe for the fixture vocabulary: no
    table name contains another as a ``\\b``-delimited word, and derived
    identifiers (``stg_orders``, ``n_orders``) sit behind ``_`` which is a
    word character.  Substitution is LITERAL-AWARE: table words inside
    single-quoted strings, ``--`` line comments, and ``/* */`` block
    comments are left untouched (``WHERE src = 'orders'`` stays a string),
    and SQL text containing a raw ``{``/``}`` is rejected loudly rather
    than silently mis-bound by the format-style parameter pass.
    """
    import re

    if "{" in sql or "}" in sql:
        raise ValueError(
            "run_sql: SQL text contains a literal '{' or '}' — incompatible "
            "with format-style parameter binding; rewrite the query or use "
            "views() on a session you own"
        )
    names = list(dict.fromkeys(tables))
    out = sql
    if names:
        seg = re.compile(r"'(?:[^']|'')*'|--[^\n]*|/\*.*?\*/", re.S)
        word = re.compile(r"\b(" + "|".join(map(re.escape, names)) + r")\b")
        parts, pos = [], 0
        for m in seg.finditer(sql):
            parts.append(word.sub(lambda mm: "{" + mm.group(1) + "}", sql[pos:m.start()]))
            parts.append(m.group(0))
            pos = m.end()
        parts.append(word.sub(lambda mm: "{" + mm.group(1) + "}", sql[pos:]))
        out = "".join(parts)
    bound = {n: load(spark, sf_dir, n) for n in names}
    return spark.sql(out, **bound)
