"""Cross-engine determinism helpers.

The t2 gate hash-compares Spark output against DuckDB (driver contract,
``__spark_entry__.py``).  Doubles summed in different orders differ in the
low bits, so any SUM over a double column goes through an exact decimal
accumulator and comes back as double — order-independent and identical in
both engines.  AVG / stddev-style results are rounded instead (their error
is O(eps·sqrt(n)) — far below 1e-6 at bench scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from nedp_etl_spark.data import local_rows

# Wide enough for sf0.1 money sums (~1e10) at 6 decimal digits; Spark widens
# sum(decimal(25,6)) to decimal(35,6), DuckDB to decimal(38,6) — both exact.
_DEC = "decimal(25,6)"


def q6(col):
    """FLOOR(x·1e6 + 0.5)/1e6 — the cross-engine quantize for any value
    produced by a DIVISION or NONLINEAR step (exp/ln/sqrt/ratio).  Spark's
    ``F.round`` goes through BigDecimal HALF_UP on the shortest-decimal
    repr while DuckDB rounds the binary double — they disagree on half-ulp
    boundaries (bit win_rolling_regression at sf0.01).  This explicit op
    sequence is identical IEEE arithmetic on both engines; :func:`oq6` is
    the SQL twin.

    Magnitude guard (round-12 magnitude sweep): Spark's ``floor(double)``
    returns a LONG and silently SATURATES at ±2^63 — a squared output
    (variance, spectral power) of in-domain values pins to
    9223372036854.775 while DuckDB's double FLOOR keeps the true value.
    Doubles at |y| ≥ 2^52 are already integral, so floor is the identity
    there — branch to the same ``y/1e6`` DuckDB computes, staying
    bit-identical on BOTH sides of the threshold."""
    from pyspark.sql import functions as F

    y = col * 1_000_000.0 + F.lit(0.5)
    return F.when(F.abs(y) < F.lit(float(1 << 52)), F.floor(y) / 1_000_000.0).otherwise(
        y / 1_000_000.0
    )


def oq6(expr: str) -> str:
    """DuckDB oracle twin of :func:`q6` (identical op sequence)."""
    return f"FLOOR(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column (exact fixed-point accumulate).

    Each value is quantized to 6 dp as ``floor(x*1e6 + 0.5)`` — pure IEEE
    primitives, bit-identical in Spark and DuckDB — and summed as a long.
    ~1000× cheaper per row than the decimal accumulator it replaces (the
    double→decimal cast goes through BigDecimal string parsing; profiled at
    ~2 s for 2.4 M casts single-core on the sf0.1 fixture, which has one
    parquet row group and therefore one scan task).

    Bound: the scaled sum must fit a signed 64-bit long, i.e. |Σx| < 9.2e12.
    Money-sum magnitudes here are ≤ ~1e11 at sf0.1 (~100× headroom); a
    deployment summing beyond that per group sizes the scale per column or
    uses :func:`dsum_dec`, the exact-decimal slow path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.floor(c * 1_000_000.0 + 0.5).cast("long")) / 1_000_000.0).alias(
        "dsum"
    )


def osum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum` (identical fixed-point formula)."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 1000000.0)"
    )


def dsum_dec(col: Column | str) -> Column:
    """Exact-decimal order-independent SUM — unbounded-magnitude slow path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


# Second-moment algebra: ``dsum(x*x)`` overflows PER VALUE once
# |x²·1e6| ≥ 2^63, i.e. |x| ≥ ~3e6 — far inside the declared value domain
# (data.VALUE_ABS_MAX = 9.2e12; the round-12 magnitude sweep crashed 20
# keys with one in-domain 1e9 event).  Exact cross-engine products need
# INTEGER algebra end-to-end: quantize to int64 micros FIRST (floor in
# IEEE doubles + double→long, identical on both engines for the whole
# domain), then multiply as exact integers — Spark long→decimal(38,0)
# (exact, unlike double→decimal whose shortest-repr vs binary-expansion
# disagreement poisons big values), DuckDB HUGEINT.  q² ≤ 8.5e37 fits
# both.  Bound: the SUM of products must stay under ~1e38 — at the domain
# edge that is single-digit rows per group, at |x| ≤ 1e9 it is ~1e14
# rows; size the scale per column beyond that.
_DECQ = "decimal(38,0)"


def q6l(col: Column | str) -> Column:
    """``floor(x·1e6 + 0.5)`` as an exact int64 — the quantize underneath
    :func:`dsum`, exposed for product/square algebra."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 1_000_000.0 + F.lit(0.5)).cast("long")


def oq6l(expr: str) -> str:
    """DuckDB oracle twin of :func:`q6l`."""
    return f"CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


def qprod(a: Column | str, b: Column | str) -> Column:
    """Exact decimal(38,0) product of two 6-dp-quantized values (scale
    1e12); window- or group-summable.  See the second-moment note above."""
    return q6l(a).cast(_DECQ) * q6l(b).cast(_DECQ)


def oqprod(ea: str, eb: str) -> str:
    """DuckDB oracle twin of :func:`qprod` (HUGEINT product, scale 1e12)."""
    return f"(CAST({oq6l(ea)} AS HUGEINT) * {oq6l(eb)})"


def dsum_prod(a: Column | str, b: Column | str) -> Column:
    """Order-independent exact SUM(a·b) over 6-dp-quantized values, valid
    for the FULL value domain (second-moment safe)."""
    return F.sum(qprod(a, b)).cast("double") / F.lit(1e12)


def ohuge_dbl(expr: str) -> str:
    """HUGEINT/DECIMAL → DOUBLE via VARCHAR: DuckDB's direct cast is
    DOUBLE-ROUNDED for |x| ≥ 2^63 (two-limb conversion; probed 1–2 ulp off
    at ~2e19 in round 12) while Spark's decimal→double is correctly
    rounded — the string round-trip is correctly rounded on both.  Use for
    ANY oracle integer that can exceed int64; plain ``CAST(… AS DOUBLE)``
    is fine below 2^63 (sign-extended hi limb, single rounding)."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def osum_prod(ea: str, eb: str) -> str:
    """DuckDB oracle twin of :func:`dsum_prod`."""
    return f"({ohuge_dbl(f'SUM({oqprod(ea, eb)})')} / 1000000000000.0)"


def osum_dec(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum_dec`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def r6(col: Column) -> Column:
    """Round a double output column to 6 dp (kills float noise in avgs)."""
    return F.round(col, 6)


def ts_str(col: Column | str) -> Column:
    """Deterministic second-precision timestamp rendering (both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def ots_str(expr: str) -> str:
    """DuckDB oracle twin of :func:`ts_str`."""
    return f"strftime(CAST(({expr}) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"


def global_running_sum(df, order_cols, value, out_col, num_partitions=None):
    """Distributed ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING AND CURRENT ROW)`` — the two-phase prefix-sum idiom.

    A naked ``Window.orderBy(...)`` makes Spark move the whole input to ONE
    partition; this helper gets the identical answer with balanced work:

    1. range-partition on the order keys (contiguous key ranges per
       partition, ascending pid for ascending ranges), freeze the layout
       with an eager ``localCheckpoint`` so every downstream job sees the
       same pids;
    2. per-partition running sum via a window keyed by the physical
       partition id — balanced, never a global exchange;
    3. collect the ≤ num_partitions per-partition totals (bounded driver
       traffic), turn their exclusive prefix into per-pid offsets, and
       broadcast-join the offsets back for a map-side add.

    Why the eager checkpoint is load-bearing (a fully-lazy formulation is
    UNSOUND, verified empirically): deriving both the running sums and the
    per-pid totals from the un-materialized range layout makes two plan
    branches over one ``repartitionByRange``, and Spark does NOT evaluate
    that exchange once — ``spark_partition_id()`` is a nondeterministic
    expression, which blocks AQE stage canonicalization, so each branch
    re-executes the range shuffle with an independent bounds SAMPLING (two
    distinct ShuffleQueryStages observed on the final adaptive plan).  Two
    samplings can draw different bounds, silently mis-assigning boundary
    rows' offsets.  Materializing the layout once is the correctness fix,
    and ``RDD.zipWithIndex`` (an eager count job before the map) is the
    same shape for the same reason.  The checkpoint costs one transient
    copy of the input in executor-local storage at construction time —
    the price of an exact, balanced global prefix sum.

    Row order among duplicate order keys is unspecified (as in any engine),
    but range partitioning keeps equal keys in one partition, so the
    cumulative value after each full key group is deterministic; with a
    unique order key the result is exact everywhere.

    ``value`` is a Column (e.g. ``F.lit(1)`` turns this into a scalable
    global ``row_number``).  Returns ``df`` plus ``out_col`` (bigint-ish).

    For SEVERAL running sums over the same ordering, use
    :func:`global_running_sums` — n columns share the one range shuffle +
    checkpoint instead of paying it n times.
    """
    return global_running_sums(df, order_cols, [(value, out_col)], num_partitions)


def global_running_sums(df, order_cols, values, num_partitions=None):
    """Multi-column form of :func:`global_running_sum` (see its docstring
    for the algorithm and why the eager checkpoint is load-bearing).

    ``values`` is a list of ``(value_column, out_col)`` pairs that all
    cumulate along the SAME ``order_cols`` ordering: one range shuffle,
    one checkpoint, one per-pid window pass, and one bounded partials
    collect serve every column (``agg_ks_test``'s two empirical CDFs cost
    one shuffle, not two).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n_part = num_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    staged = df
    for i, (value, _) in enumerate(values):
        staged = staged.withColumn(f"__grs_v{i}", value)
    ranged = (
        staged.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .withColumn("__grs_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_local = (
        Window.partitionBy("__grs_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for i, (_, out_col) in enumerate(values):
        local = local.withColumn(out_col, F.sum(f"__grs_v{i}").over(w_local))
    partials = (
        ranged.groupBy("__grs_pid")
        .agg(*[F.sum(f"__grs_v{i}").alias(f"__grs_s{i}") for i in range(len(values))])
        .collect()
    )
    running = [0] * len(values)
    offsets = []
    for row in sorted(partials, key=lambda r: r["__grs_pid"]):
        offsets.append((row["__grs_pid"], *running))
        for i in range(len(values)):
            running[i] += row[f"__grs_s{i}"] or 0
    off_schema = "__grs_pid int, " + ", ".join(
        f"__grs_off{i} bigint" for i in range(len(values))
    )
    off = local_rows(spark, offsets, off_schema)
    out = local.join(F.broadcast(off), "__grs_pid")
    for i, (_, out_col) in enumerate(values):
        out = out.withColumn(out_col, F.col(out_col) + F.col(f"__grs_off{i}"))
    return out.drop(
        "__grs_pid",
        *[f"__grs_v{i}" for i in range(len(values))],
        *[f"__grs_off{i}" for i in range(len(values))],
    )


def histogram_rank_walk(buckets: list, rank: int):
    """Locate 1-based ``rank`` in a SORTED (bucket, count) histogram:
    returns (bucket, residual_rank_within_bucket).

    The shared driver-side core of the two-phase exact-percentile
    refinement — ``operators.analytics.agg_percentile_histogram`` (per
    group) and ``llm.ranking._tercile_cuts`` (global, two ranks) both
    walk their bounded histograms through this function, so the
    cumulative-count arithmetic cannot drift between them.  The phases
    around it intentionally differ (grouped vs global pre-pass; width
    fallback vs all-equal short-circuit) and are documented at each
    call site.
    """
    below = 0
    for b, c in buckets:
        if below + c >= rank:
            return b, rank - below
        below += c
    raise ValueError(f"rank {rank} exceeds histogram total {below}")
