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

# Wide enough for sf0.1 money sums (~1e10) at 6 decimal digits; Spark widens
# sum(decimal(25,6)) to decimal(35,6), DuckDB to decimal(38,6) — both exact.
_DEC = "decimal(25,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column (exact decimal accumulate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def osum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
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
