"""Timestamp-encoding normalization.

Parquet event tables arrive in three encodings depending on the writer:

- ``bigint`` nanoseconds — TIMESTAMP(NANOS) files read under
  ``spark.sql.legacy.parquet.nanosAsLong``;
- ``timestamp_ntz`` — plain ``timestamp[us]`` with no UTC flag, the
  default for pandas/pyarrow-written parquet;
- ``timestamp`` (LTZ) — UTC-flagged micros.

Every windowing / sessionization / watermark operator downstream wants a
single instant type (LTZ), and ``cast("double")`` is illegal on NTZ, so
normalization must happen before any arithmetic.  ``to_instant`` folds
all three encodings to LTZ with pure expressions (no UDFs, codegen-safe,
pushdown-preserving — the cast sits above the scan and does not block
column pruning).

NTZ→LTZ attaches the session time zone; callers that cross-check against
engines reading the same file naively (DuckDB) should pin
``spark.sql.session.timeZone=UTC`` so both see identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_instant(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize ``ts_col`` to a proper LTZ timestamp, whatever the
    parquet writer produced.  No-op (same plan) when already LTZ."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype is None:
        raise ValueError(f"to_instant: no column {ts_col!r} in {df.columns}")
    if dtype in ("bigint", "long"):
        # TIMESTAMP(NANOS) read as raw nanos; truncate to micros exactly
        # like DuckDB reading the same file.
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if dtype in ("timestamp_ntz", "date"):
        # attach the session zone (pin UTC for cross-engine parity)
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if dtype == "string":
        # parse like the implicit cast F.window used to apply — but
        # FAIL LOUDLY on unparseable values instead of silently turning
        # them into nulls (a format mismatch would otherwise corrupt
        # every downstream window/aggregate without a trace)
        casted = F.col(ts_col).cast("timestamp")
        return df.withColumn(
            ts_col,
            F.when(
                F.col(ts_col).isNotNull() & casted.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("to_instant: unparseable timestamp string: "),
                        F.col(ts_col),
                    )
                ).cast("timestamp"),
            ).otherwise(casted),
        )
    if dtype == "timestamp":
        return df
    raise ValueError(
        f"to_instant: cannot normalize {ts_col!r} of type {dtype!r}; "
        "expected bigint nanos, timestamp_ntz, timestamp, date, or string"
    )
