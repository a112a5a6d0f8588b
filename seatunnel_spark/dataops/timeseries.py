"""Time-series operators: as-of join, sessionization, range join.

None of these exist in the reference (no joins at all — SURVEY.md §2.7)
and Spark has no native as-of join either; they're implemented as
compositions of DataFrame ops chosen for shuffle behavior at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    right.ts <= left.ts within the same `by` key (backward as-of).

    Scale design: the naive formulation is a range join (O(n·m) pair
    blowup). This implementation is the union-and-carry-forward trick:
    tag both sides, union, sort within key by (ts, side), and carry the
    last-seen right values forward with last_value(ignorenulls) — ONE
    shuffle on the key, linear work, no range explosion. Ties
    (equal ts) resolve to the right row (side orders right before left).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != ts_col]

    lhs = left.withColumn("__side", F.lit(1)).withColumns(
        {f"__r_{c}": F.lit(None).cast(dict(right.dtypes)[c]) for c in right_cols}
    )
    rhs = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # align schemas for the union
    lhs_cols = set(lhs.columns)
    rhs = rhs.withColumns(
        {c: F.lit(None).cast(dict(lhs.dtypes)[c])
         for c in lhs_cols - set(rhs.columns)}
    ).select(*lhs.columns)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).withColumns(
        {
            f"__c_{c}": F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
            for c in right_cols
        }
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__c_{c}").alias(f"{c}{suffix}" if c in left.columns else c)
              for c in right_cols],
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign gap-based session ids per key (batch sessionization).

    session boundary = time since previous event > gap; session_id =
    running count of boundaries (0-based) per key. One shuffle on the
    key; window functions do the rest. Streaming equivalent:
    F.session_window — this is the batch analog producing stable ids.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new_session", is_new).withColumn(
        "session_id",
        (F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("long"),
    ).drop("__new_session")


def session_stats(
    df: DataFrame, ts_col: str, key_cols: list[str], gap: str = "30 minutes"
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration seconds."""
    s = sessionize(df, ts_col, key_cols, gap)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .cast("long")
        .alias("duration_sec"),
    )


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join points to [lo, hi] intervals without a cross product.

    Buckets both sides by floor(value/width); an interval registers in
    every bucket it overlaps (sequence+explode). The equi-join on
    bucket id turns the range join into a hash join; the residual
    between-filter runs post-join. Pick bucket_width ~ typical interval
    length so each interval lands in O(1) buckets.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(r, "__bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bucket")
    )


def gapfill_daily(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_expr: str,
    out_col: str = "day_value",
) -> DataFrame:
    """Hypertable-style time_bucket_gapfill + locf: bucket events to
    days, emit EVERY day of the observed span for EVERY key, and
    forward-fill missing days from the last observed value.

    -> (keys..., day, day_value nullable, filled_value, had_data)

    Plan shape (the 100 TB concern): the event table is touched ONCE —
    a map-side-combined groupBy(keys, day) reduces it to at most
    |keys| x |days| rows before anything else happens. The day spine
    is sequence(min_day, max_day) from a single-row global agg
    (broadcast, zero cost) crossed with the distinct key set — spine
    size is |keys| x |days|, independent of event count. The
    forward-fill window partitions BY KEY over day-grained rows, so
    each window partition holds |days| rows (thousands), never raw
    events; skew is impossible by construction.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (df.groupBy(*key_cols, day)
             .agg(F.expr(value_expr).alias(out_col)))
    span = (df.select(
        F.sequence(F.min(F.to_date(F.col(ts_col))),
                   F.max(F.to_date(F.col(ts_col)))).alias("__days")))
    keys = df.select(*key_cols).distinct()
    spine = (keys.join(F.broadcast(span))
             .select(*key_cols, F.explode("__days").alias("day")))
    w = (Window.partitionBy(*key_cols).orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(daily, [*key_cols, "day"], "left")
            .select(*key_cols, "day", out_col,
                    F.last(out_col, ignorenulls=True).over(w)
                    .alias("filled_value"),
                    F.col(out_col).isNotNull().alias("had_data")))


def seasonal_decompose(df: DataFrame, ts_col: str, value_expr: str,
                       period: int = 7,
                       round_to: int = 4) -> DataFrame:
    """Classic additive seasonal decomposition of the DAILY series ->
    (day, value, trend, seasonal, resid): trend = centered
    `period`-day moving average (full windows only), seasonal = mean
    detrended value per phase (day-index mod period, normalized to sum
    to ~0), resid = value - trend - seasonal. The standard
    decomposition behind seasonality-aware anomaly detection ("is
    Sunday low because it's Sunday?").

    Scale: the event table is touched ONCE (map-side-combined
    groupBy(day) — at most |days| rows out); every window/join after
    runs on the |days|-row series, the same convention as
    moving_average/gapfill. The phase means are a |period|-row
    broadcast."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(day).agg(F.expr(value_expr).alias("value"))
    half = period // 2
    w = (Window.orderBy("day")
         .rowsBetween(-half, period - half - 1))
    trend = F.when(F.count(F.lit(1)).over(w) == period,
                   F.round(F.avg("value").over(w), round_to))
    phase = (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
             % period).alias("phase")
    dt = (daily.withColumn("trend", trend)
          .withColumn("phase", phase))
    seas = (dt.filter(F.col("trend").isNotNull())
            .groupBy("phase")
            .agg(F.round(F.avg(F.col("value") - F.col("trend")),
                         round_to).alias("__s_raw")))
    center = seas.agg(F.round(F.avg("__s_raw"), round_to).alias("__c"))
    seas = (seas.join(F.broadcast(center))
            .select("phase", F.round(F.col("__s_raw") - F.col("__c"),
                                     round_to).alias("seasonal")))
    return (dt.join(F.broadcast(seas), "phase", "left")
            .select("day", "value", "trend", "seasonal",
                    F.round(F.col("value") - F.col("trend")
                            - F.col("seasonal"), round_to)
                    .alias("resid")))


def ewma_last(df: DataFrame, entity_col: str = "user_id",
              ts_col: str = "ts", order_col: str = "event_id",
              value_col: str = "value", alpha: float = 0.1,
              round_to: int = 6,
              max_events: int | None = 100_000) -> DataFrame:
    """Per-entity exponentially-weighted moving average, final state
    -> (entity, n_points, ewma): the standard smoothed-activity /
    smoothed-latency readout (y_1 = x_1; y_t = (1-alpha)*y_{t-1}
    + alpha*x_t over the (ts, order_col)-sorted series — the
    tiebreaker makes the fold, hence the result, deterministic under
    equal timestamps in any engine).

    Scale: EWMA is inherently sequential per entity, so the series
    is collected per entity (ONE map-side-combined shuffle — the same
    inherent cost as any per-entity sequence semantics) and folded
    with F.aggregate — pure codegen, zero UDF, O(n) per entity where
    any closed-form pow() reformulation is O(n^2) or numerically
    explosive. Degenerate hot entities are guarded IN CODE by
    `max_events` (deterministic DROP before the array materializes —
    the event_pattern_match discipline); None disables.

    Engine portability: a strict LEFT fold over doubles — DuckDB's
    list_reduce applies the identical operation sequence to the
    identically-sorted list, so the pre-rounding float is
    bit-identical (both engines run acc*(1-alpha) + x*alpha in IEEE
    double, same order)."""
    df = df.filter(F.col(value_col).isNotNull())
    if max_events is not None:
        ok = (df.groupBy(entity_col)
              .agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") <= max_events)
              .select(entity_col))
        df = df.join(ok, entity_col, "left_semi")
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col), F.col(order_col),
        F.col(value_col).cast("double").alias("__v"))))
    vals = F.transform(ordered, lambda s: s["__v"])
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ew = F.aggregate(
        rest, F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha))
    return (df.groupBy(F.col(entity_col).alias("entity"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.round(ew, round_to).alias("ewma")))


def acf(df: DataFrame, ts_col: str, value_expr: str,
        max_lag: int = 7, round_to: int = 6) -> DataFrame:
    """Sample autocorrelation of the DAILY series at row-lags
    1..max_lag -> (lag, acf, n_pairs): the standard biased estimator
    acf(l) = Σ_t (x_t - m)(x_{t+l} - m) / Σ_t (x_t - m)² — the
    seasonality/persistence fingerprint (a weekly-seasonal series
    spikes at lag 7) read BEFORE choosing seasonal_decompose's period.
    Lags are ROW lags over the day-ordered series; run gapfill_daily
    upstream if calendar lags over a gappy series are wanted.

    Scale: the event table collapses to the |days|-row daily series in
    one map-side-combined shuffle; all max_lag leads come out of a
    single window pass over that series (the WindowExec
    single-partition warning is benign by the same |days|-row argument
    as seasonal_decompose), and the answer is a max_lag-row stack of
    one aggregate row. Prefer integer-valued value_expr (count) so no
    partition-order-dependent double sum feeds the estimator."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(day).agg(
        F.expr(value_expr).cast("double").alias("value"))
    m = daily.agg(F.avg("value").alias("__m"))
    w = Window.orderBy("day")
    led = daily.select(
        "value",
        *[F.lead("value", lag).over(w).alias(f"__x{lag}")
          for lag in range(1, max_lag + 1)],
    ).join(F.broadcast(m))
    c = F.col("value") - F.col("__m")
    aggs = [F.sum(c * c).alias("__den")]
    for lag in range(1, max_lag + 1):
        aggs.append(F.sum(c * (F.col(f"__x{lag}") - F.col("__m")))
                    .alias(f"__n{lag}"))
        aggs.append(F.count(F.col(f"__x{lag}")).alias(f"__c{lag}"))
    row = led.agg(*aggs)
    stacked = ", ".join(f"{lag}, __n{lag} / __den, __c{lag}"
                        for lag in range(1, max_lag + 1))
    return (row.selectExpr(
        f"stack({max_lag}, {stacked}) AS (lag, __r, n_pairs)")
        .select("lag", F.round("__r", round_to).alias("acf"), "n_pairs"))


def cusum_changepoint(df: DataFrame, ts_col: str, value_expr: str,
                      round_to: int = 6) -> DataFrame:
    """Standardized CUSUM over the daily series -> (day, value, cusum,
    is_peak): S_t = Σ_{i<=t} (x_i - mean)/σ, the classic level-shift
    detector — S drifts away from 0 after a mean change, and the day
    of max |S| is the maximum-likelihood changepoint estimate (Page
    1954). is_peak marks that day (possibly several on exact ties).

    Determinism discipline: the peak compare runs on the ROUNDED
    cusum (round first, then max), so the flag survives the ~1e-15
    summation-order noise a raw float equality would trip on across
    engines. Scale: one map-side-combined shuffle to the |days|-row
    series; the cumulative window and both 1-row broadcasts run on
    that series only. σ=0 (constant series) yields cusum 0 everywhere
    rather than a division error."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(day).agg(
        F.expr(value_expr).cast("double").alias("value"))
    st = daily.agg(F.avg("value").alias("__m"),
                   F.stddev_pop("value").alias("__sd"))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    z = F.when(F.col("__sd") == 0, F.lit(0.0)) \
         .otherwise((F.col("value") - F.col("__m")) / F.col("__sd"))
    scored = (daily.join(F.broadcast(st))
              .withColumn("cusum", F.round(F.sum(z).over(w), round_to)))
    peak = scored.agg(F.max(F.abs(F.col("cusum"))).alias("__p"))
    return (scored.join(F.broadcast(peak))
            .select("day", "value", "cusum",
                    (F.abs(F.col("cusum")) == F.col("__p"))
                    .alias("is_peak")))


def holt_linear(df: DataFrame, ts_col: str, value_expr: str,
                alpha: float = 0.3, beta: float = 0.1,
                round_to: int = 6) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing of the daily
    series, final state -> one row (n_days, level, trend, forecast_1,
    forecast_7): l_t = α·x_t + (1-α)(l_{t-1}+b_{t-1}),
    b_t = β(l_t−l_{t-1}) + (1-β)b_{t-1}, init l_1 = x_1, b_1 = 0 —
    the trend-aware upgrade of ewma_last, and forecast_h = l + h·b is
    the capacity-planning readout ("what will tomorrow / next week's
    volume be").

    Like EWMA, the recurrence is inherently sequential, so the
    |days|-row daily series (one map-side-combined shuffle — the only
    corpus pass) is collected into a single day-sorted array and
    folded with F.aggregate over a struct accumulator — pure codegen,
    zero UDF, and the fold's IEEE operation sequence is identical in
    any engine, so results replay bit-for-bit (rounded only at
    output; the q_ewma oracle discipline)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(day).agg(
        F.expr(value_expr).cast("double").alias("value"))
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "value")))
        .alias("__s"),
        F.count(F.lit(1)).alias("n_days"))
    xs = F.transform(F.col("__s"), lambda s: s["value"])
    rest = F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0)))
    a, b_ = F.lit(float(alpha)), F.lit(float(beta))

    def step(acc, x):
        nl = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        nb = b_ * (nl - acc["l"]) + (F.lit(1.0) - b_) * acc["b"]
        return F.struct(nl.alias("l"), nb.alias("b"))

    st = F.aggregate(
        rest,
        F.struct(F.element_at(xs, 1).alias("l"),
                 F.lit(0.0).alias("b")),
        step)
    return arr.select(
        "n_days",
        F.round(st["l"], round_to).alias("level"),
        F.round(st["b"], round_to).alias("trend"),
        F.round(st["l"] + st["b"], round_to).alias("forecast_1"),
        F.round(st["l"] + 7 * st["b"], round_to).alias("forecast_7"))


def seasonal_anomalies(df: DataFrame, ts_col: str, value_expr: str,
                       period: int = 7, n_sigmas: float = 3.0,
                       round_to: int = 4) -> DataFrame:
    """Seasonality-aware anomaly flags -> (day, value, resid, sigma,
    is_anomaly): decompose (seasonal_decompose), then flag days whose
    residual exceeds n_sigmas population standard deviations — the
    answer to "is Sunday low because it's Sunday, or is something
    wrong?" that a raw z-score gets wrong on seasonal series. Days
    without a full trend window (the first/last period/2) have no
    residual and are excluded rather than guessed.

    Scale: everything after the one corpus shuffle runs on the
    |days|-row decomposition; sigma is a 1-row broadcast. The flag
    compares ROUNDED residuals against the rounded sigma (both at
    `round_to`), keeping the boundary engine-stable."""
    dec = (seasonal_decompose(df, ts_col, value_expr, period, round_to)
           .filter(F.col("resid").isNotNull()))
    sd = dec.agg(F.round(F.stddev_pop("resid"), round_to)
                 .alias("__sd"))
    return (dec.join(F.broadcast(sd))
            .select("day", "value", "resid",
                    F.col("__sd").alias("sigma"),
                    (F.abs(F.col("resid"))
                     > F.lit(float(n_sigmas)) * F.col("__sd"))
                    .alias("is_anomaly")))
