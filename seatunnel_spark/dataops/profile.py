"""Table profiling — the data-quality pass a training pipeline runs
before/after every transformation: per-column null rate, distinct
count, min/max, mean/stddev for numerics, length stats for strings.

Scale design: ONE aggregation pass over the table computes every
column's stats together (a single job, map-side combined — no
per-column scans); the narrow unpivot to one-row-per-column happens on
the already-tiny aggregate. Exact distinct counts shuffle per column —
pass approx=True at 100 TB to switch to HLL approx_count_distinct
(1 pass, no shuffle explosion), which is what you want when profiling
petabyte corpora; exact mode is the correctness baseline the DuckDB
oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False, round_to: int = 4) -> DataFrame:
    """One row per column: (column, n_rows, n_null, null_rate,
    n_distinct, min_s, max_s, mean, stddev) — numerics profile their
    values; strings profile their lengths; min/max stringified for a
    uniform schema."""
    cols = columns or [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c]
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(col).alias(f"nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"mx_{c}"))
        if isinstance(dt, _NUMERIC):
            num = col.cast("double")
        elif isinstance(dt, T.StringType):
            num = F.length(col).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.avg(num).alias(f"avg_{c}"))
        aggs.append(F.stddev_samp(num).alias(f"sd_{c}"))
    row = df.agg(*aggs)
    # unpivot the single aggregate row into (column, stats) rows —
    # pure Catalyst (stack), no driver collect
    parts = []
    for c in cols:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"nn_{c}").alias("n_null"),
                F.round(F.col(f"nn_{c}") / F.col("__n"), round_to)
                .alias("null_rate"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_s"),
                F.col(f"mx_{c}").alias("max_s"),
                F.round(F.col(f"avg_{c}"), round_to).alias("mean"),
                F.round(F.col(f"sd_{c}"), round_to).alias("stddev"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")


def dq_checks(df: DataFrame, rules: list[dict],
              round_to: int = 4) -> DataFrame:
    """Declarative data-quality gate (the Deequ/Great-Expectations
    shape) -> one row per rule: (check, metric, min_rate, passed).

    Rule kinds:
      {"name", "kind": "rate",   "expr": <bool SQL>, "min": r}
          metric = fraction of rows satisfying expr (nulls count as
          failing — explicit `IS NOT NULL AND ...` semantics via
          coalesce, so a null never silently passes a gate)
      {"name", "kind": "unique", "col": c, "min": r,
       "approx": False}
          metric = count_distinct(c) / count(*); with "approx": True
          the distinct is HyperLogLog++ (approx_count_distinct, ±~2%)
          — no per-column exact-distinct shuffle, the right mode for
          100 TB audit runs where the gate threshold has slack.

    Scale: ALL rules evaluate in ONE aggregation pass over one scan —
    adding a rule never adds a job, and an approx unique rule keeps
    the whole gate a single map-side-combinable aggregate. The
    rule->row unpivot is pure Catalyst on the single aggregate row."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r["kind"] == "rate":
            ok = F.coalesce(F.expr(r["expr"]).cast("int"), F.lit(0))
            aggs.append(F.avg(ok).alias(f"m_{i}"))
        elif r["kind"] == "unique":
            # try_divide: ANSI `/` THROWS on an empty table (0/0);
            # NULL flows to the explicit fail-below handling instead
            nd = (F.approx_count_distinct(F.col(r["col"]))
                  if r.get("approx") else
                  F.count_distinct(F.col(r["col"])))
            aggs.append(F.try_divide(
                nd, F.count(F.lit(1))).alias(f"m_{i}"))
        else:
            raise ValueError(f"unknown rule kind: {r['kind']!r}")
    row = df.agg(*aggs)
    # An EMPTY table must FAIL every rule, not sail through: rate
    # metrics avg to NULL and unique metrics to 0/0 = NaN there, and
    # Spark orders NaN above every number (NaN >= 1.0 is true), so the
    # pass test must reject NULL/NaN explicitly before comparing.
    parts = []
    for i, r in enumerate(rules):
        m = F.round(F.col(f"m_{i}"), round_to)
        ok = F.coalesce(
            F.when(F.isnan(m), F.lit(False))
            .otherwise(m >= float(r["min"])), F.lit(False))
        parts.append(F.struct(
            F.lit(r["name"]).alias("check"),
            F.when(F.isnan(m), None).otherwise(m).alias("metric"),
            F.lit(float(r["min"])).alias("min_rate"),
            ok.alias("passed"),
        ))
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")



def benford_check(df: DataFrame, value_col: str,
                  round_to: int = 4) -> DataFrame:
    """Benford's-law digit audit -> one row per leading digit 1..9:
    (digit, n, obs_share, exp_share, abs_dev). Naturally-occurring
    multi-scale quantities (prices, populations, transaction amounts)
    follow P(d) = log10(1 + 1/d); fabricated or truncated data
    doesn't — the classic forensic data-quality screen to run next to
    `dq_checks` when a feed looks too clean.

    The leading digit is floor(|v| / 10^floor(log10 |v|)), computed
    with the same round-guarded log trick as the DDSketch bucket
    mapping (round to 9 decimals before floor) so any engine replays
    it; zeros/NULLs are excluded (no leading digit). One
    map-side-combined 9-row aggregation over one scan."""
    import math

    v = F.abs(F.col(value_col).cast("double"))
    mag = F.floor(F.round(F.log10(v), 9))
    digit = F.floor(v / F.pow(F.lit(10.0), mag)).cast("int")
    counted = (df.filter(F.col(value_col).isNotNull() & (v > 0))
               .select(digit.alias("digit"))
               .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    total = counted.agg(F.sum("n").alias("__t"))
    exp = F.element_at(
        F.array(*[F.lit(round(math.log10(1 + 1 / d), 6))
                  for d in range(1, 10)]), F.col("digit"))
    obs = F.round(F.try_divide(F.col("n"), F.col("__t")), round_to)
    return (counted.join(F.broadcast(total))
            .select("digit", "n",
                    obs.alias("obs_share"),
                    exp.alias("exp_share"),
                    F.round(F.abs(obs - exp), round_to).alias("abs_dev"))
            .orderBy("digit"))


__all__ = ["profile_table", "dq_checks", "benford_check"]


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """Re-identification risk ledger -> the quasi-identifier groups
    with FEWER than k rows (*quasi_cols, n_rows): every row in these
    groups is k-anonymity-violating (an attacker knowing just the
    quasi-identifiers pins it to < k candidates) — the release gate
    that runs AFTER pii_redact, which removes direct identifiers but
    cannot see combination risk. Suppress or generalize the listed
    groups before publishing.

    One map-side-combined groupBy on the quasi columns; output is
    bounded by the violating-group count (on well-generalized data,
    near zero — an empty result IS the pass signal)."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .filter(F.col("n_rows") < k))


def profile_drift(a: DataFrame, b: DataFrame,
                  columns: list[str] | None = None,
                  approx: bool = False,
                  round_to: int = 4) -> DataFrame:
    """Snapshot-over-snapshot drift -> one row per column (column,
    null_rate_a, null_rate_b, null_rate_delta, n_distinct_a,
    n_distinct_b, mean_a, mean_b, mean_delta): profile_table run on
    both frames and joined — the yesterday-vs-today schema-health
    diff that catches a upstream change (a field suddenly nullable, a
    cardinality collapse, a unit change shifting the mean) before it
    poisons a training run. `approx` switches distinct counts to HLL
    for the 100 TB path, same as profile_table.

    Cost is two profile passes (each one aggregate over its frame);
    the join is |columns|-row."""
    pa = profile_table(a, columns, approx, round_to).select(
        "column", F.col("null_rate").alias("null_rate_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("mean").alias("mean_a"))
    pb = profile_table(b, columns, approx, round_to).select(
        "column", F.col("null_rate").alias("null_rate_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("mean").alias("mean_b"))
    return (pa.join(pb, "column")
            .select("column", "null_rate_a", "null_rate_b",
                    F.round(F.col("null_rate_b")
                            - F.col("null_rate_a"), round_to)
                    .alias("null_rate_delta"),
                    "n_distinct_a", "n_distinct_b",
                    "mean_a", "mean_b",
                    F.round(F.col("mean_b") - F.col("mean_a"),
                            round_to).alias("mean_delta")))


def psi_report(a: DataFrame, b: DataFrame, value_expr: str,
               bins: int = 10, round_to: int = 6) -> DataFrame:
    """Population Stability Index between two snapshots of one
    numeric expression -> (bin, lo, hi, frac_a, frac_b, psi_term,
    psi): bin edges are exact quantiles of A (the reference
    population — the standard convention), both snapshots are
    fractioned into them, and PSI = Σ (f_b − f_a)·ln(f_b/f_a). The
    scorecard-monitoring staple: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted. Complements profile_drift (moment deltas) with a
    distribution-shape test.

    Scale: edges are ONE exact-percentile aggregate over A
    (broadcast; the equidepth discipline), binning is a codegen
    comparison chain on both scans, and everything after the two
    bin-count aggregations is bins-sized. Empty-bin fractions are
    floored at 1e-6 (the standard smoothing) so the log stays
    finite; `psi` repeats the total on every row."""
    # edges and compared values round to 4 decimals (the equidepth
    # oracle discipline): percentile interpolation can differ by an
    # ulp across engines, and a value sitting exactly on an edge must
    # bin identically everywhere
    edges = a.agg(F.transform(F.percentile(
        F.expr(value_expr).cast("double"),
        F.array(*[F.lit(i / bins) for i in range(1, bins)])
    ), lambda t: F.round(t, 4)).alias("__e"))

    def binned(df: DataFrame, tag: str) -> DataFrame:
        v = F.expr(value_expr).cast("double")
        bucket = F.aggregate(
            F.col("__e"), F.lit(0).cast("int"),
            lambda acc, t: acc + (F.round(v, 4) > t).cast("int"))
        return (df.join(F.broadcast(edges))
                .filter(v.isNotNull())
                .select(bucket.alias("bin"))
                .groupBy("bin")
                .agg(F.count(F.lit(1)).alias(f"__n_{tag}")))
    ca, cb = binned(a, "a"), binned(b, "b")
    spine = (edges.select(F.explode(F.sequence(
        F.lit(0), F.lit(bins - 1))).alias("bin"), "__e"))
    ta = F.broadcast(ca.agg(F.sum("__n_a").cast("double")
                            .alias("__ta")))
    tb = F.broadcast(cb.agg(F.sum("__n_b").cast("double")
                            .alias("__tb")))
    fa = F.greatest(F.coalesce(F.col("__n_a"), F.lit(0))
                    / F.col("__ta"), F.lit(1e-6))
    fb = F.greatest(F.coalesce(F.col("__n_b"), F.lit(0))
                    / F.col("__tb"), F.lit(1e-6))
    term = F.round((fb - fa) * F.log(fb / fa), round_to)
    lo = F.when(F.col("bin") == 0, F.lit(None).cast("double")) \
          .otherwise(F.element_at("__e", F.col("bin")))
    hi = F.when(F.col("bin") == bins - 1,
                F.lit(None).cast("double")) \
          .otherwise(F.element_at("__e", F.col("bin") + 1))
    out = (spine.join(ca, "bin", "left").join(cb, "bin", "left")
           .join(ta).join(tb)
           .select("bin",
                   F.round(lo, round_to).alias("lo"),
                   F.round(hi, round_to).alias("hi"),
                   F.round(fa, round_to).alias("frac_a"),
                   F.round(fb, round_to).alias("frac_b"),
                   term.alias("psi_term")))
    tot = F.broadcast(out.agg(F.round(F.sum("psi_term"), round_to)
                              .alias("psi")))
    return out.join(tot)
