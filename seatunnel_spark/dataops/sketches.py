"""Mergeable quantile sketch (DDSketch) — the quantile member of the
sketch family next to the count-min sketch (text.py:cms_build) and the
Misra-Gries heavy-hitter summary (text.py:heavy_hitters).

DDSketch (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees", PVLDB 12(12), 2019)
buckets values on a geometric grid: with gamma = (1+alpha)/(1-alpha),
every v > 0 maps to index ceil(log_gamma(v)), and the bucket midpoint
2*gamma^i/(gamma+1) is within relative error alpha of every value in
the bucket. The sketch is just (bucket -> count):

  - FULLY MERGEABLE: merging sketches = summing counts per bucket —
    associative, commutative, deterministic. Per-corpus / per-day /
    per-partition sketches combine into one with no loss, which is
    what `percentile()`-style exact quantiles (a full sort-based
    aggregation per group) can never do at 100 TB.
  - STREAMABLE: the build is a plain additive groupBy aggregation, so
    the same code runs on a readStream and yields a bit-identical
    sketch (see tests/test_streaming.py) — the same mergeable-
    aggregation property the CMS build demonstrates.
  - BOUNDED: bucket count ~ log_gamma(max/min), independent of row
    count — the shuffle carries at most n_buckets * n_partitions
    partial rows no matter the data size, and the finished sketch
    (a few hundred rows) broadcasts anywhere.

Cross-engine determinism (the DuckDB-oracle contract this repo holds
every operator to): the index is DEFINED as ceil(round(ln(|v|) /
ln(gamma), 9)) — the round-to-9-decimals step makes the bucket
decision identical between Spark's Math.log and DuckDB's libm log,
whose results can differ by 1 ulp (a flip would need the true value
within ~1 ulp of a boundary, vanishing in practice and harmless to the
error bound in theory, since both adjacent buckets are within alpha).

Reference parity note: the reference engine (seatunnel) exposes no
sketch/quantile surface at all — this module is part of the
training-data-pipeline extension the assignment calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ddsketch_build", "ddsketch_merge", "ddsketch_quantiles",
           "ddsketch_build_grouped", "ddsketch_quantiles_grouped",
           "ddsketch_rolling_quantiles",
           "hll_build", "hll_build_grouped", "hll_merge",
           "hll_estimate", "hll_intersect_estimate",
           "hll_rolling_estimate"]


def _gamma(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_build(df: DataFrame, value_col: str,
                   alpha: float = 0.01) -> DataFrame:
    """Build a DDSketch over a numeric column -> (kind, idx, cnt).

    kind separates the three sign domains (-1 negative, 0 zero,
    1 positive); negative values use the mirrored index of |v| (the
    paper's two-sketch construction flattened into one keyed table),
    zeros get their own bucket, NULLs are dropped. One scan, one
    map-side-combined groupBy on at most a few hundred (kind, idx)
    keys — sketches of ANY two datasets built with the same alpha
    merge exactly via `ddsketch_merge`.
    """
    import math

    lng = math.log(_gamma(alpha))
    v = F.col(value_col).cast("double")
    # when() guards keep ln() off the v==0 row entirely (per-row
    # short-circuit survives any Catalyst conjunct reorder)
    idx = F.when(v == 0, F.lit(0)).otherwise(
        F.ceil(F.round(F.log(F.abs(v)) / F.lit(lng), 9))).cast("int")
    kind = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)) \
        .otherwise(F.lit(0)).cast("int")
    return (df.filter(v.isNotNull())
            .select(kind.alias("kind"), idx.alias("idx"))
            .groupBy("kind", "idx")
            .agg(F.count(F.lit(1)).alias("cnt")))


def ddsketch_build_grouped(df: DataFrame, group_cols: list[str],
                           value_col: str,
                           alpha: float = 0.01) -> DataFrame:
    """Per-group DDSketch -> (group..., kind, idx, cnt): one map-side-
    combined groupBy over (group, kind, idx) — the shuffle carries at
    most |groups| x n_buckets keys, NEVER the raw values. This is the
    scale path for per-group percentiles: exact `percentile()` is a
    full sort-based aggregation buffering every group member, while
    the sketch is a bounded additive aggregate with an alpha relative-
    error guarantee. Grouped sketches with the same alpha merge by
    summing cnt on (group, kind, idx)."""
    import math

    lng = math.log(_gamma(alpha))
    v = F.col(value_col).cast("double")
    idx = F.when(v == 0, F.lit(0)).otherwise(
        F.ceil(F.round(F.log(F.abs(v)) / F.lit(lng), 9))).cast("int")
    kind = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)) \
        .otherwise(F.lit(0)).cast("int")
    return (df.filter(v.isNotNull())
            .select(*group_cols, kind.alias("kind"), idx.alias("idx"))
            .groupBy(*group_cols, "kind", "idx")
            .agg(F.count(F.lit(1)).alias("cnt")))


def ddsketch_quantiles_grouped(sketch: DataFrame, group_cols: list[str],
                               qs: list[float], alpha: float = 0.01,
                               round_to: int = 4) -> DataFrame:
    """Per-group quantile estimates from a grouped sketch ->
    (group..., q, est). Same rank rule and midpoint estimate as
    `ddsketch_quantiles`, with the cumulative walk partitioned by
    group — every window/join here runs on the (|groups| x n_buckets)-
    row sketch, not the data."""
    from pyspark.sql import Window

    g = _gamma(alpha)
    spark = sketch.sparkSession
    order = [F.col("kind").asc(),
             F.when(F.col("kind") == -1, -F.col("idx"))
             .otherwise(F.col("idx")).asc()]
    w = (Window.partitionBy(*group_cols).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (sketch
           .withColumn("cum_hi", F.sum("cnt").over(w))
           .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt")))
    totals = sketch.groupBy(*group_cols).agg(F.sum("cnt").alias("__n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    rank = (F.floor(F.round(F.col("q") * (F.col("__n") - 1), 6)) + 1)
    est = (F.col("kind")
           * F.round(F.lit(2.0) * F.pow(F.lit(g), F.col("idx"))
                     / F.lit(g + 1.0), round_to))
    return (totals.join(F.broadcast(qdf))
            .join(cum, group_cols)
            .filter((F.col("cum_lo") < rank) & (rank <= F.col("cum_hi")))
            .select(*group_cols, "q", est.alias("est"))
            .orderBy(*group_cols, "q"))


def ddsketch_rolling_quantiles(df: DataFrame, ts_col: str,
                               value_col: str, window_days: int = 7,
                               qs: list[float] | None = None,
                               alpha: float = 0.01,
                               round_to: int = 4) -> DataFrame:
    """Rolling trailing-`window_days` quantile estimates from DAILY
    DDSketches -> (day, q, est): the quantile twin of
    hll_rolling_estimate. The event log is scanned ONCE into per-day
    (day, kind, idx, cnt) buckets; a trailing window is then a SUM of
    counts per bucket over the window (sketch merge is exactly
    count addition), and every width (7-day p95, 28-day p50, quarter
    p99) re-windows the same persisted bucket table — the exact
    percentile would re-sort raw values per width.

    Spine discipline (the hll_rolling lesson, applied from day one):
    buckets are densified against the full CALENDAR range crossed
    with the observed (kind, idx) keys — sketch-sized × |days|, never
    data-sized — so zero-event gap days hold ROWS-frame slots and a
    window never silently spans extra calendar days. Days whose whole
    window is empty produce no row (n = 0 has no order statistics).
    Estimates use the same type-1 rank rule and midpoint arithmetic
    as ddsketch_quantiles, so the oracle replays bit-for-bit."""
    from pyspark.sql import Window

    if qs is None:
        qs = [0.5, 0.95]
    day = F.to_date(F.col(ts_col)).alias("day")
    sk = ddsketch_build_grouped(
        df.select(day, F.col(value_col)), ["day"], value_col, alpha)
    days = (sk.agg(F.min("day").alias("__lo"),
                   F.max("day").alias("__hi"))
            .select(F.explode(F.sequence("__lo", "__hi")).alias("day")))
    buckets = sk.select("kind", "idx").distinct()
    dense = (days.crossJoin(buckets)
             .join(sk, ["day", "kind", "idx"], "left")
             .select("day", "kind", "idx",
                     F.coalesce("cnt", F.lit(0)).alias("cnt")))
    w = (Window.partitionBy("kind", "idx").orderBy("day")
         .rowsBetween(-(window_days - 1), 0))
    rolled = (dense.select("day", "kind", "idx",
                           F.sum("cnt").over(w).alias("cnt"))
              .filter(F.col("cnt") > 0))
    return ddsketch_quantiles_grouped(rolled, ["day"], list(qs),
                                      alpha, round_to)


def ddsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME alpha: union + sum counts
    per bucket. Exact (no approximation is added by merging) because
    the bucket mapping is value-deterministic — the defining DDSketch
    property. All inputs must share the (kind, idx, cnt) schema."""
    if not sketches:
        raise ValueError("ddsketch_merge: no sketches given")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("kind", "idx").agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantiles(sketch: DataFrame, qs: list[float],
                       alpha: float = 0.01,
                       round_to: int = 4) -> DataFrame:
    """Estimate quantiles from a sketch -> (q, est), one row per
    requested quantile, est within relative error alpha of the true
    rank-floor(q*(n-1)) ORDER STATISTIC (the discontinuous / type-1
    quantile — the definition the paper's guarantee covers; an
    interpolating percentile() can land between order stats that are
    farther than alpha apart on sparse data). Sign-exact:
    negative/zero/positive domains keep their true order.

    rank r = floor(q * (n-1)); the answer bucket is the first, in
    value order (kind asc, then mirrored idx for negatives), whose
    cumulative count reaches r+1; est is the bucket midpoint
    kind * 2*gamma^idx/(gamma+1), rounded for cross-engine replay.

    Scale: everything here runs on the SKETCH (a few hundred rows) —
    the single-partition window cumsum and the tiny quantile join are
    deliberate driver-scale work; the data-sized cost was paid once in
    `ddsketch_build`.
    """
    from pyspark.sql import Window

    g = _gamma(alpha)
    spark = sketch.sparkSession
    order = [F.col("kind").asc(),
             F.when(F.col("kind") == -1, -F.col("idx"))
             .otherwise(F.col("idx")).asc()]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    cum = (sketch
           .withColumn("cum_hi", F.sum("cnt").over(w))
           .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt")))
    total = sketch.agg(F.sum("cnt").alias("__n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    rank = (F.floor(F.round(F.col("q") * (F.col("__n") - 1), 6)) + 1)
    est = (F.col("kind")
           * F.round(F.lit(2.0) * F.pow(F.lit(g), F.col("idx"))
                     / F.lit(g + 1.0), round_to))
    return (qdf.join(F.broadcast(total))
            .join(cum, (F.col("cum_lo") < rank) & (rank <= F.col("cum_hi")))
            .select("q", est.alias("est"))
            .orderBy("q"))


# --------------------------------------------------------------------------
# HyperLogLog (deterministic, engine-portable)
# --------------------------------------------------------------------------
#
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) estimates
# distinct counts from a register table: hash each value to 64 bits,
# route it to register r = top p bits, and keep per register the
# maximum rho = 1 + (number of leading zeros of the remaining bits).
# Like the DDSketch above, the sketch is FULLY MERGEABLE (merge = MAX
# per register — associative, commutative, idempotent, so it tolerates
# replays/at-least-once delivery for free) and BOUNDED (2^p rows no
# matter the data), which is what Spark's native approx_count_distinct
# gives you per-query but NOT as a persistable, cross-job artifact.
# This build materializes the registers as a plain DataFrame you can
# store per day/source/partition and fold later — the 100 TB pattern.
#
# Engine portability (the DuckDB-oracle contract): the hash is md5 hex
# split at the hex-digit boundary — p must be a multiple of 4 so the
# register is the first p/4 hex digits and the remainder the next
# 16 - p/4 digits — and rho derives from the binary-string length of
# the remainder (length(bin(w)) = floor(log2(w)) + 1, exact integer
# arithmetic in both engines; float log2 of near-boundary values is
# NOT trusted). The estimator's only float work is one literal*1/sum
# division where the sum is an EXACT integer (sum of 2^(63-rho) as
# decimal), so both engines round identically.


def _hll_check_p(p: int) -> int:
    if p % 4 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4,16], got {p}")
    return 16 - p // 4  # hex digits left for the rho remainder


def hll_build_grouped(df: DataFrame, group_cols: list[str],
                      value_col: str, p: int = 8) -> DataFrame:
    """Build per-group HLL registers -> (*group_cols, reg, rho):
    one map-side-combined MAX aggregation over the scan; output is
    <= 2^p rows per group. Absent registers (no value routed there)
    are simply missing rows — hll_estimate counts them as zeros."""
    rem = _hll_check_p(p)
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("int")
    w = F.conv(F.substring(h, p // 4 + 1, rem), 16, 10).cast("long")
    rho = (F.when(w == 0, F.lit(rem * 4 + 1))
           .otherwise(rem * 4 - F.length(F.bin(w)) + 1)).cast("int")
    return (df.filter(F.col(value_col).isNotNull())
            .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
            .groupBy(*group_cols, "reg")
            .agg(F.max("rho").alias("rho")))


def hll_build(df: DataFrame, value_col: str, p: int = 8) -> DataFrame:
    """Ungrouped HLL registers -> (reg, rho); see hll_build_grouped."""
    return hll_build_grouped(df, [], value_col, p)


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables with identical grouping -> MAX per
    (group, reg). Associative/commutative/idempotent, so partial
    sketches from any partitioning of the data fold into the sketch
    of the union — bit-identical to a single build (tested)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Distinct-count estimate from a register table ->
    (*group_cols, est): the classic alpha_m * m^2 / sum(2^-rho)
    harmonic estimator with linear counting (m * ln(m/V)) below the
    2.5m small-range threshold when empty registers exist.

    Exactness discipline: sum(2^-rho) is computed as the exact
    integer sum of 2^(63-rho) in decimal(38,0) — every term a power
    of two — so the only floating-point step is one literal/sum
    division (and libm ln only on the small-range branch); identical
    in any engine. The whole estimate runs on the <= 2^p-row sketch,
    never the data."""
    rem = _hll_check_p(p)
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    # numerator literal: alpha * m^2 * 2^63, computed once in Python
    num = float(alpha) * float(m) * float(m) * float(1 << 63)
    gb = sketch.groupBy(*group_cols) if group_cols else sketch.groupBy()
    agg = gb.agg(
        F.sum(F.expr("cast(shiftleft(cast(1 as bigint), 63 - rho) "
                     "as decimal(38,0))")).alias("__s"),
        F.count(F.lit(1)).alias("__nz"))
    # empty registers contribute 2^-0 = 1 each: add (m - nz) * 2^63
    s_full = (F.col("__s")
              + (F.lit(m) - F.col("__nz")).cast("decimal(38,0)")
              * F.expr("cast(9223372036854775808 as decimal(38,0))"))
    raw = F.lit(num) / s_full.cast("double")
    v = F.lit(m) - F.col("__nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 2).alias("est"))


def hll_intersect_estimate(a: DataFrame, b: DataFrame, p: int = 8,
                           round_to: int = 2) -> DataFrame:
    """Inclusion-exclusion intersection estimate from two ungrouped
    register tables -> one row (est_a, est_b, est_union,
    est_intersection): |A∩B| ≈ est(A) + est(B) - est(A∪B), where the
    union sketch is the per-register MAX merge (bit-identical to
    building over the concatenated data — the hll_merge identity).
    The audience-overlap / cross-day-retention readout two persisted
    sketches can answer WITHOUT rescanning either corpus.

    Caveat inherited from the estimator (documented, not hidden):
    inclusion-exclusion compounds the ±1.04/√m relative error of
    three estimates onto a possibly much smaller intersection, so the
    result can be negative for near-disjoint sets — it is reported
    as computed (the standard HLL behavior) rather than clamped, so
    callers can see the sign carry the uncertainty. All arithmetic
    runs on the <= 3·2^p register rows."""
    ea = hll_estimate(a, [], p).select(F.col("est").alias("est_a"))
    eb = hll_estimate(b, [], p).select(F.col("est").alias("est_b"))
    eu = (hll_estimate(hll_merge(a, b), [], p)
          .select(F.col("est").alias("est_union")))
    return (ea.join(eb).join(eu)
            .select("est_a", "est_b", "est_union",
                    F.round(F.col("est_a") + F.col("est_b")
                            - F.col("est_union"), round_to)
                    .alias("est_intersection")))


def hll_rolling_estimate(df: DataFrame, ts_col: str, value_col: str,
                         window_days: int = 7, p: int = 8) -> DataFrame:
    """Rolling distinct-count estimates from DAILY sketches ->
    (day, est): per-day HLL registers merged over a trailing
    `window_days` window by per-register MAX — the sketch-algebra
    form of rolling DAU. The point at 100 TB: the event log is
    scanned ONCE to produce |days|×2^p register rows, and every
    window width (7-day, 28-day, quarter) is answerable afterwards by
    re-windowing the same persisted register table — the exact
    rolling-distinct (analytics.rolling_distinct) must re-shuffle
    (day, entity) pairs per width and keeps |days|×|entities| state.

    Mechanics: the register table is densified against the day
    spine (a 2^p×|days| frame — sketch-sized, never data-sized) so
    absent registers don't shorten window frames; the trailing MAX
    runs per register ordered by day; the estimate is the same
    exact-integer harmonic sum as hll_estimate, grouped by day."""
    from pyspark.sql import Window

    rem = _hll_check_p(p)
    m = 1 << p
    day = F.to_date(F.col(ts_col)).alias("day")
    regs = hll_build_grouped(
        df.select(day, F.col(value_col)), ["day"], value_col, p)
    # CALENDAR spine, not observed-days: with a ROWS-based trailing
    # window, a zero-event gap day must still occupy a frame slot or
    # the window silently spans more than `window_days` calendar days
    # and overestimates (diverging from the calendar-based exact
    # rolling_distinct this is interchangeable with). sequence() over
    # the [min, max] day range is gapless by construction.
    days = (regs.agg(F.min("day").alias("__lo"),
                     F.max("day").alias("__hi"))
            .select(F.explode(F.sequence("__lo", "__hi")).alias("day")))
    spine = days.crossJoin(
        regs.sparkSession.range(m).select(
            F.col("id").cast("int").alias("reg")))
    dense = (spine.join(regs, ["day", "reg"], "left")
             .select("day", "reg",
                     F.coalesce("rho", F.lit(0)).alias("rho")))
    w = (Window.partitionBy("reg").orderBy("day")
         .rowsBetween(-(window_days - 1), 0))
    rolled = dense.select(
        "day", "reg", F.max("rho").over(w).alias("rho"))
    # estimate per day over the rolled registers; rho=0 rows ARE the
    # empty registers, so nz must count only rho>0
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    num = float(alpha) * float(m) * float(m) * float(1 << 63)
    # rho=0 (empty register) contributes 2^63, which overflows a
    # 64-bit shift — branch to the literal instead
    term = ("case when rho = 0 "
            "then cast(9223372036854775808 as decimal(38,0)) "
            "else cast(shiftleft(cast(1 as bigint), 63 - rho) "
            "as decimal(38,0)) end")
    agg = rolled.groupBy("day").agg(
        F.sum(F.expr(term)).alias("__s"),
        F.sum((F.col("rho") > 0).cast("int")).alias("__nz"))
    raw = F.lit(num) / F.col("__s").cast("double")
    v = F.lit(m) - F.col("__nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select("day", F.round(est, 2).alias("est"))
