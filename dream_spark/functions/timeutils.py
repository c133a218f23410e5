"""Timestamp-dtype-robust epoch arithmetic.

The engine must run under ANY caller-supplied session (reference O1 contract,
Proxy.c:40) against parquet it does not control.  The same testdata column can
surface as TIMESTAMP (legacy int96 / micros-adjusted-to-UTC, or our own
nanos→long→timestamp_micros repair) or as TIMESTAMP_NTZ (Spark 4 default for
micro-precision parquet timestamps without isAdjustedToUTC) depending purely
on session confs.  ``unix_micros`` accepts only TIMESTAMP, so every temporal
operator that does integer-microsecond math routes through :func:`epoch_micros`
instead, which picks the dtype-correct expression:

- TIMESTAMP      → ``unix_micros`` (exact integer micros since the epoch)
- TIMESTAMP_NTZ  → ``timestamp_diff(MICROSECOND, NTZ epoch, col)`` — the
  timezone-free equivalent; no session-timezone cast that could shift values
  across DST folds.

Both are JVM-side built-ins (whole-stage codegen, no UDF), and both agree
exactly with DuckDB's ``epoch_us``, which is what the correctness oracle uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_micros_expr(col: str | Column, dtype: str) -> Column:
    """Integer microseconds since 1970-01-01 for a timestamp column whose
    Spark dtype string is ``dtype`` (as reported by ``df.dtypes``)."""
    c = F.col(col) if isinstance(col, str) else col
    if dtype == "timestamp_ntz":
        ntz_epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", ntz_epoch, c)
    if dtype == "timestamp":
        return F.unix_micros(c)
    if dtype == "date":
        # DATE → NTZ midnight: timezone-free like the NTZ branch (a cast to
        # plain TIMESTAMP would shift by the session timezone, breaking the
        # any-session contract and DuckDB's epoch_us agreement)
        ntz_epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", ntz_epoch, c.cast("timestamp_ntz"))
    raise ValueError(f"epoch_micros: unsupported dtype {dtype!r} for column {col!r}")


def epoch_micros(df: DataFrame, col: str) -> Column:
    """:func:`epoch_micros_expr` with the dtype looked up from ``df``."""
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"epoch_micros: column {col!r} not in {df.columns}")
    return epoch_micros_expr(col, dtype)
