from pyspark.sql import functions as F

from seatunnel_spark.dataops.timeseries import (
    asof_join,
    range_join_bucketed,
    session_stats,
    sessionize,
)


def _ts(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_asof_join_backward(spark):
    trades = _ts(spark, [
        (1, "A", "2024-01-01 10:00:05"),
        (2, "A", "2024-01-01 10:00:20"),
        (3, "B", "2024-01-01 10:00:10"),
        (4, "A", "2024-01-01 09:00:00"),  # before any quote
    ], ["trade_id", "sym", "ts"])
    quotes = _ts(spark, [
        ("A", "2024-01-01 10:00:00", 100.0),
        ("A", "2024-01-01 10:00:10", 101.0),
        ("B", "2024-01-01 10:00:10", 200.0),  # tie: inclusive match
    ], ["sym", "ts", "px"])
    out = asof_join(trades, quotes, "ts", ["sym"])
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 200.0, 4: None}


def test_sessionize_and_stats(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:30:00"),  # > 30 min gap -> new session
        (2, "2024-01-01 09:00:00"),
    ]
    df = _ts(spark, rows, ["uid", "ts"])
    s = sessionize(df, "ts", ["uid"], gap="30 minutes")
    sid = {(r["uid"], str(r["ts"])): r["session_id"] for r in s.collect()}
    assert sid[(1, "2024-01-01 10:00:00")] == 0
    assert sid[(1, "2024-01-01 10:10:00")] == 0
    assert sid[(1, "2024-01-01 11:30:00")] == 1
    assert sid[(2, "2024-01-01 09:00:00")] == 0

    stats = session_stats(df, "ts", ["uid"], gap="30 minutes")
    r = stats.filter("uid = 1 AND session_id = 0").first()
    assert r["n_events"] == 2 and r["duration_sec"] == 600


def test_range_join_bucketed(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 50.0)], ["pid", "x"])
    ranges = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 12.0, 30.0)], ["rid", "lo", "hi"]
    )
    out = range_join_bucketed(points, ranges, "x", "lo", "hi", bucket_width=10.0)
    got = {(r["pid"], r["rid"]) for r in out.collect()}
    assert got == {(1, 10), (2, 20)}


def test_gapfill_daily_locf(spark):
    from seatunnel_spark.dataops.timeseries import gapfill_daily

    e = _ts(spark, [
        ("A", "2024-01-01 05:00:00", 1.0),
        ("A", "2024-01-01 06:00:00", 2.0),   # day 1 sum = 3
        ("A", "2024-01-04 05:00:00", 7.0),   # days 2,3 missing -> locf 3
        ("B", "2024-01-02 05:00:00", 5.0),   # B spans the GLOBAL span
    ], ["k", "ts", "v"])
    out = gapfill_daily(e, "ts", ["k"], "sum(v)")
    rows = {(r["k"], str(r["day"])): r for r in out.collect()}
    # dense spine: every key x every day of the global span
    assert len(rows) == 2 * 4
    assert rows[("A", "2024-01-01")]["day_value"] == 3.0
    assert rows[("A", "2024-01-02")]["day_value"] is None
    assert rows[("A", "2024-01-02")]["filled_value"] == 3.0   # locf
    assert rows[("A", "2024-01-03")]["filled_value"] == 3.0
    assert rows[("A", "2024-01-04")]["filled_value"] == 7.0
    assert rows[("A", "2024-01-02")]["had_data"] is False
    # B before its first observation: nothing to fill from
    assert rows[("B", "2024-01-01")]["filled_value"] is None
    assert rows[("B", "2024-01-02")]["filled_value"] == 5.0
    assert rows[("B", "2024-01-04")]["filled_value"] == 5.0


def test_ewma_last_known_series_and_guard(spark):
    """EWMA fold: hand-computed values, (ts, order) tie determinism,
    single-point entities return their value, and the max_events
    guard drops hot entities deterministically."""
    import datetime as _dt

    from seatunnel_spark.dataops.timeseries import ewma_last

    t0 = _dt.datetime(2026, 1, 1)
    s = lambda k: t0 + _dt.timedelta(seconds=k)  # noqa: E731
    rows = ([(i, s(i), 1, float(v)) for i, v in
             enumerate([10.0, 20.0, 30.0])]          # u1: 3 points
            + [(10, s(0), 2, 7.5)]                   # u2: single point
            # u3: same ts, order decides 1.0 then 100.0
            + [(21, s(0), 3, 100.0), (20, s(0), 3, 1.0)]
            + [(100 + i, s(i), 4, 1.0) for i in range(5)])  # hot u4
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r["entity"]: (r["n_points"], r["ewma"]) for r in
           ewma_last(df, alpha=0.5, max_events=4).collect()}
    # u1: y=10 -> 15 -> 22.5
    assert got[1] == (3, 22.5)
    assert got[2] == (1, 7.5)
    # u3: init 1.0 (event 20 first), then 0.5*1 + 0.5*100 = 50.5
    assert got[3] == (2, 50.5)
    assert 4 not in got  # guard fired
    assert 4 in {r["entity"] for r in
                 ewma_last(df, alpha=0.5, max_events=None).collect()}


def test_acf_alternating_series_exact(spark):
    """Alternating 2/8 over 8 days: mean 5, deviations ±3. Biased
    estimator: acf(1) = -7·9/(8·9) = -0.875, acf(2) = 6/8 = 0.75;
    n_pairs = n - lag."""
    import datetime as _dt

    from seatunnel_spark.dataops.timeseries import acf

    t0 = _dt.datetime(2024, 3, 1)
    rows = [(i, t0 + _dt.timedelta(days=i), float(2 if i % 2 == 0 else 8))
            for i in range(8)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {r["lag"]: (r["acf"], r["n_pairs"])
           for r in acf(df, "ts", "sum(value)", max_lag=3).collect()}
    assert got[1] == (-0.875, 7)
    assert got[2] == (0.75, 6)
    assert got[3] == (-0.625, 5)


def test_cusum_step_change_peak(spark):
    """0,0,0,0,0 then 10,10,10,10,10: mean 5, σ 5, z = ∓1 — S walks to
    -5 at the step boundary and back to 0; the boundary day alone is
    the peak. A constant series yields cusum 0 (no σ=0 blowup)."""
    import datetime as _dt

    from seatunnel_spark.dataops.timeseries import cusum_changepoint

    t0 = _dt.datetime(2024, 3, 1)
    rows = [(i, t0 + _dt.timedelta(days=i), 0.0 if i < 5 else 10.0)
            for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {r["day"].day: (r["cusum"], r["is_peak"])
           for r in cusum_changepoint(df, "ts", "sum(value)").collect()}
    assert got[5] == (-5.0, True)          # 2024-03-05 = day index 4
    assert [got[d][0] for d in range(1, 11)] == [
        -1.0, -2.0, -3.0, -4.0, -5.0, -4.0, -3.0, -2.0, -1.0, 0.0]
    assert [d for d in range(1, 11) if got[d][1]] == [5]

    const = spark.createDataFrame(
        [(i, t0 + _dt.timedelta(days=i), 7.0) for i in range(4)],
        "event_id long, ts timestamp, value double")
    cz = cusum_changepoint(const, "ts", "sum(value)").collect()
    assert all(r["cusum"] == 0.0 and r["is_peak"] for r in cz)


def test_holt_linear_matches_reference_fold(spark):
    """Engine fold == pure-Python reference fold on a noisy linear
    series; on a PERFECT linear ramp the trend estimate approaches the
    true slope from below (b init 0)."""
    import datetime as _dt

    from seatunnel_spark.dataops.timeseries import holt_linear

    t0 = _dt.datetime(2024, 3, 1)
    xs = [10.0 + 2.0 * i + (3.0 if i % 5 == 0 else -1.0)
          for i in range(40)]
    df = spark.createDataFrame(
        [(i, t0 + _dt.timedelta(days=i), x) for i, x in enumerate(xs)],
        "event_id long, ts timestamp, value double")
    row = holt_linear(df, "ts", "sum(value)", alpha=0.3,
                      beta=0.1).collect()[0]

    l, b = xs[0], 0.0
    for x in xs[1:]:
        nl = 0.3 * x + 0.7 * (l + b)
        nb = 0.1 * (nl - l) + 0.9 * b
        l, b = nl, nb
    assert row["n_days"] == 40
    assert row["level"] == round(l, 6)
    assert row["trend"] == round(b, 6)
    assert row["forecast_1"] == round(l + b, 6)
    assert row["forecast_7"] == round(l + 7 * b, 6)
    assert 1.0 < row["trend"] < 2.5  # tracking the true slope 2


def test_seasonal_anomalies_flags_injected_spike(spark):
    """A clean weekly pattern with one spiked day: only the spiked day
    is flagged; edge days without a full trend window are excluded."""
    import datetime as _dt

    from seatunnel_spark.dataops.timeseries import seasonal_anomalies

    t0 = _dt.datetime(2024, 3, 4)  # a Monday
    weekly = [100.0, 110.0, 105.0, 95.0, 90.0, 60.0, 55.0]
    rows = []
    for i in range(28):
        v = weekly[i % 7] + (300.0 if i == 15 else 0.0)
        rows.append((i, t0 + _dt.timedelta(days=i), v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")
    got = {r["day"].isoformat(): r for r in
           seasonal_anomalies(df, "ts", "sum(value)",
                              period=7).collect()}
    flagged = [d for d, r in got.items() if r["is_anomaly"]]
    assert flagged == ["2024-03-19"]
    assert len(got) == 22  # 28 days minus 3 leading + 3 trailing
