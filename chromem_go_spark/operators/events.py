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


def funnel_counts(
    events: DataFrame,
    steps: "list[str]",
    within_seconds: float | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed ``steps[0]``,
    then ``steps[1]`` strictly after it, then ``steps[2]`` after that —
    optionally all within ``within_seconds`` of the first step (the
    conversion-window variant).

    Classic SQL funnel formulation: per user, the first occurrence of
    step i strictly after their first qualifying occurrence of step
    i-1 (earliest-completion semantics, deterministic).  One shuffle on
    user_id for step 0; every later step joins on user_id against an
    already user-partitioned frame, and the step-filtered event frame
    is materialized ONCE and reused by all steps (events are never
    rescanned per step).  Returns (step_idx, step, n_users).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    from ..materialize import materialize

    ev = to_instant(events, ts_col).select(
        user_col,
        F.col(type_col).alias("__t"),
        F.col(ts_col).cast("double").alias("__s"),
    )
    ev = ev.filter(F.col("__t").isin(list(steps))).transform(materialize)

    reached = (
        ev.filter(F.col("__t") == steps[0])
        .groupBy(user_col)
        .agg(F.min("__s").alias("__prev"))
        .withColumn("__first", F.col("__prev"))
    )
    tiers = [reached]
    for stp in steps[1:]:
        nxt = ev.filter(F.col("__t") == stp).join(tiers[-1], user_col)
        nxt = nxt.filter(F.col("__s") > F.col("__prev"))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("__s") - F.col("__first") <= float(within_seconds)
            )
        tiers.append(
            nxt.groupBy(user_col).agg(
                F.min("__s").alias("__prev"), F.first("__first").alias("__first")
            )
        )
    counts = [
        t.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("bigint").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.col("n_users").cast("bigint").alias("n_users"),
        )
        for i, t in enumerate(tiers)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Hypertable-style hierarchical time rollup: one pass produces the
    hour-level, day-level, and grand-total aggregates per key via
    ``ROLLUP(day, hour)`` grouping sets — Spark expands the sets inside
    a single shuffle (partial aggregation still applies), instead of
    three scans or a self-union.

    Returns (key, day_epoch, hour_epoch, grain, n, total) where grain
    is the grouping id: 0 = hour row, 1 = day row, 3 = total row;
    coarser rows carry nulls in the finer epoch columns (standard
    grouping-sets shape, identical in ANSI SQL).
    """
    ev = to_instant(events, ts_col)
    day = F.date_trunc("day", F.col(ts_col)).cast("double").cast("bigint")
    hour = F.date_trunc("hour", F.col(ts_col)).cast("double").cast("bigint")
    return (
        ev.select(
            F.col(key_col),
            day.alias("day_epoch"),
            hour.alias("hour_epoch"),
            "value",
        )
        .rollup(key_col, "day_epoch", "hour_epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .filter(F.col(key_col).isNotNull())  # keep the per-key hierarchy
        .select(
            key_col,
            "day_epoch",
            "hour_epoch",
            # grain from the null pattern (engine-portable; ts is
            # non-null so nulls only come from the grouping sets)
            F.when(F.col("hour_epoch").isNotNull(), F.lit(0))
            .when(F.col("day_epoch").isNotNull(), F.lit(1))
            .otherwise(F.lit(3))
            .cast("bigint")
            .alias("grain"),
            F.col("n").cast("bigint").alias("n"),
            "total",
        )
    )


def asof_prior(
    events: DataFrame,
    anchor_type: str,
    lookup_type: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """As-of join, Spark-first: for every ``anchor_type`` event, attach
    the most recent STRICTLY PRIOR ``lookup_type`` event of the same
    user (classic "price as of trade time" semantics).

    Spark has no native ASOF JOIN; the usual emulation is a range join
    that explodes quadratically on busy keys.  This implementation is a
    single carry-forward window over the union of both event sets:
    sort each user's anchor+lookup events by (time, id), carry the last
    lookup row forward with ``last(..., ignorenulls=true)`` over
    ``ROWS UNBOUNDED PRECEDING TO 1 PRECEDING``, keep anchor rows.  One
    shuffle on user_id, zero joins, linear in events — survives any
    per-user event density.  The (ts, id) tiebreak makes simultaneous
    events deterministic.  Returns (event_id, user_id, ts_epoch,
    prior_ts_epoch, prior_value, gap_seconds); anchors with no prior
    lookup keep nulls.
    """
    ev = to_instant(events, ts_col).filter(
        F.col(type_col).isin([anchor_type, lookup_type])
    )
    ev = ev.select(
        id_col,
        user_col,
        type_col,
        F.col(ts_col).cast("double").alias("__s"),
        F.col(value_col).alias("__v"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("__s", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(
            F.col(type_col) == lookup_type,
            F.struct(F.col("__s").alias("s"), F.col("__v").alias("v")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("__prior", prior)
        .filter(F.col(type_col) == anchor_type)
        .select(
            id_col,
            user_col,
            F.col("__s").alias("ts_epoch"),
            F.col("__prior.s").alias("prior_ts_epoch"),
            F.col("__prior.v").alias("prior_value"),
            (F.col("__s") - F.col("__prior.s")).alias("gap_seconds"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    period_seconds: int = 86400,
    max_offset: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: bucket users by FIRST-activity period, then
    count distinct users of each cohort active at each later period
    offset — the (cohort, day-N) retention triangle.

    Two shuffles total: first-activity per user (groupBy user), then a
    user-co-partitioned join back to activity periods and one distinct
    count on (cohort, offset) — events are scanned once.  Offsets are
    relative (period_offset = activity_period - cohort_period), so the
    output is small regardless of corpus size; ``max_offset`` trims the
    triangle's tail.  Returns (cohort_period, period_offset, n_users)
    with periods as epoch-second period starts.
    """
    from ..materialize import materialize

    # distinct (user, period) pairs materialized ONCE: both the
    # first-activity aggregate and the offset join read it, and min over
    # distinct periods equals min over raw events — without the cut the
    # event scan + user shuffle would run twice.
    ev = materialize(
        to_instant(events, ts_col)
        .select(
            user_col,
            (
                F.floor(F.col(ts_col).cast("double") / period_seconds).cast(
                    "bigint"
                )
            ).alias("__p"),
        )
        .distinct()
    )
    first = ev.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    act = ev.join(first, user_col).withColumn(
        "__off", F.col("__p") - F.col("__cohort")
    )
    if max_offset is not None:
        act = act.filter(F.col("__off") <= int(max_offset))
    return (
        # plain count is exact here: rows are distinct (user, period)
        # pairs and a user has one cohort, so each user contributes at
        # most one row per (cohort, offset) — no countDistinct expand
        act.groupBy("__cohort", "__off")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            (F.col("__cohort") * period_seconds).cast("bigint").alias("cohort_period"),
            F.col("__off").cast("bigint").alias("period_offset"),
            F.col("n_users").cast("bigint").alias("n_users"),
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
    aggs, seen = [], set()
    for q in quantiles:
        q = float(q)
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0, 1]: {q}")
        pct = q * 100.0
        # p50/p99-style for whole percents; p99_9-style otherwise
        # (repr keeps full precision — %g would collapse 99.99999 to
        # '100' and mislabel the column)
        name = (
            f"p{int(round(pct))}"
            if abs(pct - round(pct)) < 1e-9
            else "p" + repr(pct).replace(".", "_").replace("-", "m")
        )
        if name in seen:
            raise ValueError(f"duplicate quantile column {name!r}")
        seen.add(name)
        if mode == "exact":
            expr = F.expr(f"percentile({value_col}, {q})")
        else:
            expr = F.expr(f"percentile_approx({value_col}, {q}, {int(accuracy)})")
        aggs.append(F.round(expr, 4).alias(name))
    return events.groupBy(key_col).agg(*aggs)


def interval_join_binned(
    events: DataFrame,
    windows: DataFrame,
    bin_seconds: float,
    ts_col: str = "ts",
    wid_col: str = "window_id",
    lo_col: str = "lo_epoch",
    hi_col: str = "hi_epoch",
) -> DataFrame:
    """Scale-safe interval (range) join: match every event to every
    window whose half-open span ``[lo, hi)`` contains it.

    Spark plans a plain ``e.ts BETWEEN w.lo AND w.hi`` join as a
    broadcast-nested-loop / cartesian — O(events x windows) and dead at
    scale.  The standard fix (Flink/KDB "bin join") is to discretize
    time: events get one bin (``floor(s / B)``), windows are exploded
    into every bin their span touches (``ceil(len/B) + 1`` bins — one
    row each when window length <= B), the join becomes an EQUI-join on
    the bin key, and the exact range predicate filters the bin-collision
    candidates.  Each (event, window) match survives exactly once
    because an event lives in exactly one bin — no dedup pass needed.

    Pick ``bin_seconds`` >= the typical window length: cost is
    O(events + windows x spanbins) shuffle rows, never a cross
    product.  Hot bins (load spikes) shuffle-skew like any hot key —
    AQE skew handling or the salted-join pattern (operators/skew.py)
    applies unchanged, because it IS a plain equi-join.

    ``windows`` columns: (wid, lo_epoch, hi_epoch) with epochs in
    seconds (double).  Returns the event columns (ts as ``ts_epoch``
    seconds) plus (wid, lo, hi).
    """
    b = float(bin_seconds)
    ev = to_instant(events, ts_col).withColumn(
        "__s", F.col(ts_col).cast("double")
    )
    ev = ev.withColumn("__bin", F.floor(F.col("__s") / b)).drop(ts_col)
    # greatest() guards malformed hi < lo windows: without it
    # F.sequence generates a DESCENDING range (implicit -1 step) whose
    # spurious bins the exact filter removes but whose fan-out a badly
    # inverted window could make huge; with it they match nothing.
    wn = windows.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b),
                F.greatest(
                    F.floor(F.col(hi_col) / b), F.floor(F.col(lo_col) / b)
                ),
            )
        ),
    )
    return (
        ev.join(wn, "__bin")
        .filter((F.col("__s") >= F.col(lo_col)) & (F.col("__s") < F.col(hi_col)))
        .drop("__bin")
        .withColumnRenamed("__s", "ts_epoch")
    )


def parse_props(
    events: DataFrame,
    schema: str = "k int",
    props_col: str = "props",
) -> DataFrame:
    """Parse the semi-structured JSON ``props`` column into typed
    fields (``from_json`` — JVM-side, codegen, no Python).  Malformed
    JSON yields nulls, the standard permissive contract."""
    return events.withColumn("__p", F.from_json(F.col(props_col), schema)).select(
        "*", F.col("__p.*")
    ).drop("__p")


def props_stats_by_type(
    events: DataFrame,
    field: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Typed aggregation over a JSON property: per event type, count /
    sum / mean / min / max of ``props.$field``.  One shuffle; the JSON
    parse happens once per row inside codegen."""
    parsed = parse_props(events, f"{field} int", props_col)
    return parsed.groupBy(type_col).agg(
        F.count(field).alias("n"),
        F.sum(field).cast("bigint").alias("sum_k"),
        F.round(F.avg(field), 4).alias("avg_k"),
        F.min(field).alias("min_k"),
        F.max(field).alias("max_k"),
    )


def value_anomalies(
    events: DataFrame,
    z_threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Statistical outliers: events whose value sits more than
    ``z_threshold`` population standard deviations from their type's
    mean.  Two passes expressed as one aggregation + one broadcast-able
    join (the per-type stats table has one row per type) — the corpus
    is scanned twice but never shuffled on anything finer than the
    type key.  Returns (id, type, value, z) ordered nowhere (filter
    semantics)."""
    stats = events.groupBy(type_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        events.join(F.broadcast(stats), type_col)
        .filter(F.col("__sigma") > 0)
        # filter on the RAW z, round only for output — rounding first
        # would admit |z| in [thr - 0.5e-4, thr) that the oracle's
        # unrounded filter rejects
        .filter(F.abs(z) >= float(z_threshold))
        .withColumn("z", F.round(z, 4))
        .select(id_col, type_col, F.round(value_col, 4).alias("value"), "z")
    )


def top_session_paths(
    events: DataFrame,
    top_n: int = 20,
    gap_seconds: float = 1800.0,
    max_len: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Path analysis: the ``top_n`` most common event-type sequences
    (first ``max_len`` steps of each session, '>'-joined) — the "what
    do users actually do" report.

    Sessionization is the same lag-gap window the sessionize operator
    uses; per-session paths collect with an explicit (ts, id) sort so
    the sequence is deterministic; the path count is one
    map-side-combined aggregation + TakeOrdered."""
    ev = to_instant(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sess = ev.withColumn(
        "__sess", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    paths = (
        sess.groupBy(user_col, "__sess")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col(ts_col).cast("double").alias("s"),
                                    F.col(id_col).alias("i"),
                                    F.col(type_col).alias("t"),
                                )
                            )
                        ),
                        lambda x: x["t"],
                    ),
                    1,
                    int(max_len),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(int(top_n))
    )


def activity_heatmap(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap: (dow, hour, n,
    n_types) — the standard load-shape rollup dashboards draw.  One
    map-side-combined aggregation; dow is ISO-style 1=Monday..7=Sunday
    (computed from Spark's Sunday-first dayofweek so the SQL replay is
    unambiguous across engines)."""
    ev = to_instant(events, ts_col)
    # Spark dayofweek: 1=Sunday..7=Saturday -> ISO 1=Monday..7=Sunday
    iso_dow = F.when(F.dayofweek(ts_col) == 1, 7).otherwise(
        F.dayofweek(ts_col) - 1
    )
    return (
        ev.groupBy(
            iso_dow.cast("int").alias("dow"),
            F.hour(ts_col).cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct(type_col).cast("bigint").alias("n_types"),
        )
    )
