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
           "ddsketch_build_grouped", "ddsketch_quantiles_grouped"]


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
