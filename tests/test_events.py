"""Library-level event analytics (operators/events.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.functions.time import to_instant
from chromem_go_spark.operators import events as EV


@pytest.fixture()
def events(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return to_instant(spark.read.parquet(f"{sf_dir}/events.parquet"), "ts")


def test_percentile_modes_agree_within_sketch_error(events):
    """percentile_approx guarantees bounded RANK error (and returns a
    real sample value, no interpolation), so the right tolerance is in
    quantile space: each approx pXX must fall inside the exact
    [pXX-5, pXX+5] value band."""
    lo = {
        r["event_type"]: r
        for r in EV.event_percentiles(
            events, quantiles=(0.45, 0.85, 0.94)
        ).collect()
    }
    hi = {
        r["event_type"]: r
        for r in EV.event_percentiles(
            events, quantiles=(0.55, 0.95, 1.0)
        ).collect()
    }
    approx = {
        r["event_type"]: r
        for r in EV.event_percentiles(events, mode="approx", accuracy=10_000).collect()
    }
    assert lo.keys() == approx.keys()
    bands = [("p50", "p45", "p55"), ("p90", "p85", "p95"), ("p99", "p94", "p100")]
    for et, ar in approx.items():
        for c, c_lo, c_hi in bands:
            assert lo[et][c_lo] <= ar[c] <= hi[et][c_hi], (
                et, c, lo[et][c_lo], ar[c], hi[et][c_hi],
            )


def test_percentile_mode_validation(events):
    with pytest.raises(ValueError, match="exact.*approx"):
        EV.event_percentiles(events, mode="tdigest")


def test_percentile_custom_quantiles(events):
    out = EV.event_percentiles(events, quantiles=(0.25, 0.75))
    assert set(out.columns) == {"event_type", "p25", "p75"}
    row = out.collect()[0]
    assert row["p25"] <= row["p75"]


def test_sessionize_by_gap_matches_session_window_count(events):
    """The lag-window session count and the native session_window op
    must agree on sessions-per-user (same 30-min gap semantics)."""
    from chromem_go_spark.streaming.ingest import sessionize_events

    by_gap = {
        r["user_id"]: r["n_sessions"]
        for r in EV.sessionize_by_gap(events, 1800).collect()
    }
    by_window = {
        r["user_id"]: r["n"]
        for r in sessionize_events(events, gap="30 minutes", watermark=None)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_gap == by_window


def test_trending_bounded_per_hour(events):
    out = EV.trending_types(events, per_hour=2).collect()
    per_hour: dict[int, int] = {}
    for r in out:
        per_hour[r["hour_start"]] = per_hour.get(r["hour_start"], 0) + 1
        assert 1 <= r["rank"] <= 2
    assert per_hour and max(per_hour.values()) <= 2


def test_funnel_counts_hand_case(spark):
    """Hand-built log covering the funnel semantics: ordering is
    enforced (step 2 before step 1 doesn't count), the conversion
    window drops late completions, and earliest-completion is used."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(uid, typ, minutes):
        return (uid, typ, base + dt.timedelta(minutes=minutes))

    rows = [
        # u1: clean A -> B -> C conversion
        ev(1, "A", 0), ev(1, "B", 10), ev(1, "C", 20),
        # u2: B before A only -> counts for A, not B
        ev(2, "B", 0), ev(2, "A", 10),
        # u3: A -> B but B outside the 30-min window
        ev(3, "A", 0), ev(3, "B", 60),
        # u4: never does A -> counts nowhere
        ev(4, "B", 0), ev(4, "C", 5),
        # u5: A -> B in-window, no C
        ev(5, "A", 0), ev(5, "B", 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in EV.funnel_counts(
            df, ["A", "B", "C"], within_seconds=1800
        ).collect()
    }
    assert got == {(1, "A"): 4, (2, "B"): 2, (3, "C"): 1}


def test_funnel_requires_steps(events):
    with pytest.raises(ValueError, match="non-empty"):
        EV.funnel_counts(events, [])


def test_retention_cohorts_hand_case(spark):
    """Two cohorts over three days: counts per (cohort, offset) match
    the hand computation; offset 0 equals cohort size."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(uid, day):
        return (uid, base + dt.timedelta(days=day, hours=3))

    rows = [
        ev(1, 0), ev(2, 0),          # cohort day0 = {1, 2}
        ev(1, 1),                     # u1 retained day1
        ev(1, 2), ev(2, 2),          # both retained day2
        ev(3, 1),                     # cohort day1 = {3}
        ev(3, 2),                     # u3 retained at offset 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    d0 = int(base.timestamp()) // 86400 * 86400
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in EV.retention_cohorts(df, period_seconds=86400).collect()
    }
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 2): 2,
        (d0 + 86400, 0): 1, (d0 + 86400, 1): 1,
    }


def test_retention_max_offset_trims(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(days=5))], "user_id long, ts timestamp"
    )
    offs = {
        r["period_offset"]
        for r in EV.retention_cohorts(df, 86400, max_offset=2).collect()
    }
    assert offs == {0}


def test_asof_prior_hand_case(spark):
    """As-of semantics on a hand log: strictly-prior (no same-row
    match), latest lookup wins, anchors before any lookup keep nulls,
    and users never see each other's events."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, uid, typ, minutes, value):
        return (eid, base + dt.timedelta(minutes=minutes), uid, typ, float(value))

    rows = [
        ev(1, 1, "click", 0, 1.0),
        ev(2, 1, "click", 5, 2.0),
        ev(3, 1, "purchase", 10, 99.0),   # -> click@5 (value 2.0)
        ev(4, 1, "purchase", 3, 98.0),    # -> click@0 (value 1.0)
        ev(5, 2, "purchase", 1, 97.0),    # no prior click -> nulls
        ev(6, 2, "click", 2, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["event_id"]: r for r in EV.asof_prior(df, "purchase", "click").collect()}
    assert set(got) == {3, 4, 5}
    assert got[3]["prior_value"] == 2.0 and got[3]["gap_seconds"] == 300.0
    assert got[4]["prior_value"] == 1.0 and got[4]["gap_seconds"] == 180.0
    assert got[5]["prior_ts_epoch"] is None and got[5]["prior_value"] is None


def test_time_rollup_hierarchy_consistency(events):
    """The three grains must be mutually consistent: hour rows sum to
    their day row, day rows sum to the per-type total."""
    rows = EV.time_rollup(events).collect()
    by_grain: dict = {0: {}, 1: {}, 3: {}}
    for r in rows:
        if r["grain"] == 0:
            by_grain[0][(r["event_type"], r["day_epoch"], r["hour_epoch"])] = r["n"]
        elif r["grain"] == 1:
            by_grain[1][(r["event_type"], r["day_epoch"])] = r["n"]
        else:
            by_grain[3][r["event_type"]] = r["n"]
    assert by_grain[0] and by_grain[1] and by_grain[3]
    # hours -> day
    agg_day: dict = {}
    for (et, d, _h), n in by_grain[0].items():
        agg_day[(et, d)] = agg_day.get((et, d), 0) + n
    assert agg_day == by_grain[1]
    # days -> total
    agg_tot: dict = {}
    for (et, _d), n in by_grain[1].items():
        agg_tot[et] = agg_tot.get(et, 0) + n
    assert agg_tot == by_grain[3]


def test_percentile_edge_quantiles(events):
    """Quantile naming survives 0, 1, and fractional percents; bad
    inputs raise clearly."""
    out = EV.event_percentiles(events, quantiles=(0, 0.999, 1.0))
    assert set(out.columns) == {"event_type", "p0", "p99_9", "p100"}
    r = out.collect()[0]
    assert r["p0"] <= r["p99_9"] <= r["p100"]
    with pytest.raises(ValueError, match="duplicate"):
        EV.event_percentiles(events, quantiles=(0.5, 0.50))
    with pytest.raises(ValueError, match="out of"):
        EV.event_percentiles(events, quantiles=(1.5,))


# ------------------------- binned interval join


def test_interval_join_binned_matches_bruteforce(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import interval_join_binned

    base = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=i * 37), i % 5, "t", 1.0) for i in range(200)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    windows = spark.createDataFrame(
        [
            (100, float(base.timestamp()) + 50.0, float(base.timestamp()) + 450.0),
            (101, float(base.timestamp()) + 400.0, float(base.timestamp()) + 460.0),
            (102, float(base.timestamp()) + 7000.0, float(base.timestamp()) + 7400.0),
        ],
        "window_id long, lo_epoch double, hi_epoch double",
    )
    got = {
        (r["window_id"], r["event_id"])
        for r in interval_join_binned(events, windows, bin_seconds=400.0).collect()
    }
    b0 = base.timestamp()
    expect = {
        (w, i)
        for i in range(200)
        for (w, lo, hi) in [(100, b0 + 50, b0 + 450), (101, b0 + 400, b0 + 460), (102, b0 + 7000, b0 + 7400)]
        if lo <= b0 + i * 37 < hi
    }
    assert got == expect
    assert len(got) > 0


def test_interval_join_binned_half_open_boundaries(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import interval_join_binned

    t0 = dt.datetime(2024, 6, 1)
    s0 = t0.timestamp()
    events = spark.createDataFrame(
        [(1, t0, 1, "t", 0.0), (2, t0 + dt.timedelta(seconds=10), 1, "t", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    windows = spark.createDataFrame(
        [(9, s0, s0 + 10.0)], "window_id long, lo_epoch double, hi_epoch double"
    )
    got = [r["event_id"] for r in interval_join_binned(events, windows, 60.0).collect()]
    assert got == [1]  # lo inclusive, hi exclusive


def test_interval_join_binned_is_equi_join_not_cartesian(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import interval_join_binned

    t0 = dt.datetime(2024, 6, 1)
    events = spark.createDataFrame(
        [(1, t0, 1, "t", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    windows = spark.createDataFrame(
        [(9, t0.timestamp(), t0.timestamp() + 5.0)],
        "window_id long, lo_epoch double, hi_epoch double",
    )
    plan = interval_join_binned(events, windows, 60.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_parse_props_and_stats(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import parse_props, props_stats_by_type

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (1, t0, 1, "click", 0.0, '{"k": 10}'),
            (2, t0, 1, "click", 0.0, '{"k": 20}'),
            (3, t0, 2, "view", 0.0, '{"k": 7}'),
            (4, t0, 2, "view", 0.0, "not json"),       # malformed -> null
            (5, t0, 2, "view", 0.0, None),             # null passthrough
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    parsed = {r["event_id"]: r["k"] for r in parse_props(events).collect()}
    assert parsed[1] == 10 and parsed[3] == 7
    assert parsed[4] is None and parsed[5] is None

    stats = {r["event_type"]: r for r in props_stats_by_type(events).collect()}
    assert stats["click"]["n"] == 2 and stats["click"]["sum_k"] == 30
    assert stats["view"]["n"] == 1 and stats["view"]["min_k"] == 7


def test_interval_join_binned_window_spanning_many_bins(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import interval_join_binned

    t0 = dt.datetime(2024, 6, 1)
    s0 = t0.timestamp()
    events = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i * 100), 1, "t", 0.0) for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    # one window covering [150, 850) — spans many 100s bins (explode > 2)
    windows = spark.createDataFrame(
        [(1, s0 + 150.0, s0 + 850.0)], "window_id long, lo_epoch double, hi_epoch double"
    )
    got = sorted(r["event_id"] for r in interval_join_binned(events, windows, bin_seconds=100.0).collect())
    assert got == [2, 3, 4, 5, 6, 7, 8]  # ts 200..800 inclusive-lo, exclusive-hi


def test_value_anomalies_zscore(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import value_anomalies

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "buy", 10.0) for i in range(20)]
    rows.append((99, t0, 1, "buy", 1000.0))           # the outlier
    rows.append((100, t0, 2, "flat", 5.0))            # sigma == 0 type
    rows.append((101, t0, 2, "flat", 5.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = value_anomalies(events, z_threshold=3.0).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z"] > 4
    # zero-variance types never divide by zero / never flag
    assert not any(r["event_type"] == "flat" for r in out)


def test_top_session_paths_orders_and_truncates(spark):
    import datetime as dt

    from chromem_go_spark.operators.events import top_session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # three users with the same fast session a>b>c; one long session
    # a>b>c>d>e>f that must truncate at 5 steps
    for u in range(3):
        for j, t in enumerate(["a", "b", "c"]):
            rows.append((eid, t0 + dt.timedelta(seconds=j), u, t, 0.0)); eid += 1
    for j, t in enumerate(["a", "b", "c", "d", "e", "f"]):
        rows.append((eid, t0 + dt.timedelta(seconds=j), 9, t, 0.0)); eid += 1
    # user 0 returns much later -> separate session
    rows.append((eid, t0 + dt.timedelta(hours=5), 0, "z", 0.0)); eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = top_session_paths(events, top_n=10, max_len=5).collect()
    got = {r["path"]: r["n_sessions"] for r in out}
    assert got["a>b>c"] == 3
    assert got["a>b>c>d>e"] == 1          # truncated at 5 steps
    assert got["z"] == 1                  # the late return is its own session
    assert out[0]["path"] == "a>b>c"


def test_activity_heatmap_iso_dow(spark):
    """Known timestamps: 2026-01-05 is a Monday (ISO dow 1),
    2026-01-11 a Sunday (ISO dow 7)."""
    from chromem_go_spark.operators.events import activity_heatmap

    ev = spark.createDataFrame(
        [
            (1, "2026-01-05 09:15:00", "a", 1.0, 1),
            (2, "2026-01-05 09:45:00", "b", 1.0, 1),
            (3, "2026-01-11 23:05:00", "a", 1.0, 1),
        ],
        "event_id long, ts string, event_type string, value double, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r["dow"], r["hour"]): (r["n"], r["n_types"]) for r in activity_heatmap(ev).collect()}
    assert out == {(1, 9): (2, 2), (7, 23): (1, 1)}
