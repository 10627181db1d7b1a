"""Event-stream analytics as library operators.

The reference has no event/analytics surface; these are the
beyond-reference operators a 100 TB training-data pipeline runs over
its telemetry/ingest-event tables (TESTDATA ``events``: event_id, ts,
user_id, event_type, value, props).  They were previously inlined in
the driver entry script; the library is their real home so user code
(and the streaming layer) can share them.

All are single-shuffle shapes: groupBy aggregations with map-side
partials, window-function ranking on top of an aggregated (already
small) frame, or TakeOrderedAndProject for top-k.  Timestamp encodings
are normalized via :func:`~chromem_go_spark.functions.time.to_instant`
so callers can hand in raw parquet whatever the writer produced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import to_instant


def sessionize_by_gap(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session COUNT via the lag-window formulation: a session
    starts at the first event or after a gap > ``gap_seconds``.  One
    shuffle on user_id; the window and the groupBy share it."""
    ev = to_instant(events, ts_col).select(
        user_col, F.col(ts_col).cast("double").alias("__s")
    )
    w = Window.partitionBy(user_col).orderBy("__s")
    gapped = ev.withColumn("__gap", F.col("__s") - F.lag("__s").over(w))
    flagged = gapped.withColumn(
        "is_new",
        F.when(
            F.col("__gap").isNull() | (F.col("__gap") > gap_seconds), 1
        ).otherwise(0),
    )
    return flagged.groupBy(user_col).agg(
        F.sum("is_new").cast("bigint").alias("n_sessions")
    )


def hourly_type_counts(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window count/sum per event type (batch twin of
    ``streaming.ingest.windowed_event_counts``); hour as epoch seconds
    so results are engine-portable."""
    ev = to_instant(events, ts_col)
    return ev.groupBy(
        "event_type",
        F.window(ts_col, window)
        .start.cast("double")
        .cast("bigint")
        .alias("hour_start"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


def topk_users(events: DataFrame, k: int = 10, ts_col: str = "ts") -> DataFrame:
    """Top-k users by total event value: partial-agg groupBy +
    TakeOrderedAndProject (no global sort materialized)."""
    ev = to_instant(events, ts_col)
    return (
        ev.groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .orderBy(F.desc("total"), F.col("user_id"))
        .limit(int(k))
    )


def trending_types(
    events: DataFrame, per_hour: int = 3, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Top-N trending event types per hour: windowed count + row_number
    rank.  The rank window runs over the already-aggregated (tiny)
    counts frame, not the raw events."""
    counts = hourly_type_counts(events, window, ts_col).select(
        "event_type", "hour_start", "n"
    )
    w = Window.partitionBy("hour_start").orderBy(F.desc("n"), F.col("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(per_hour))
        .select(
            "hour_start",
            "event_type",
            "n",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def event_percentiles(
    events: DataFrame,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    mode: str = "exact",
    accuracy: int = 10_000,
    value_col: str = "value",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-key value percentiles with a scale knob.

    ``mode="exact"`` uses ``percentile`` (linear interpolation, equals
    DuckDB ``quantile_cont`` — the oracle-checkable path): the group's
    values are collected into aggregation state, fine up to ~millions of
    rows per key.  ``mode="approx"`` uses ``percentile_approx``
    (Greenwald-Khanna sketch, state bounded by ``accuracy`` regardless
    of group size) — the 100 TB path; identical plan shape, rank error
    ≤ 1/accuracy.  Columns are named p50/p90/p99-style either way so
    the two modes are drop-in swaps.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    aggs = []
    for q in quantiles:
        name = f"p{str(q).split('.', 1)[1].ljust(2, '0')}" if q < 1 else "p100"
        if mode == "exact":
            expr = F.expr(f"percentile({value_col}, {q})")
        else:
            expr = F.expr(f"percentile_approx({value_col}, {q}, {int(accuracy)})")
        aggs.append(F.round(expr, 4).alias(name))
    return events.groupBy(key_col).agg(*aggs)
