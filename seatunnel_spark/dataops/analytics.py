"""Event-analytics operators a training-data/product pipeline needs at
100 TB: ordered funnels, cohort retention, wide pivots, and corpus
n-gram statistics — each a single-shuffle conditional-aggregation plan
(map-side combined; no self-joins, no windows over the whole table),
so the shuffle volume is one row per (group) not per (event)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from seatunnel_spark.dataops._cache import scoped_persist


def funnel_user_state(df: DataFrame, user_col: str, ts_col: str,
                      type_col: str, steps: list[str]) -> DataFrame:
    """Per-user funnel STATE: first-occurrence timestamp of each step
    -> (user, __t0..__tN). A pure conditional-min aggregation — fully
    mergeable (min is associative/commutative), which is exactly what
    makes the funnel streamable: the same expression runs on a
    readStream (streaming.stream_funnel_state) and the incrementally
    maintained state is bit-identical to a batch build. The shuffle
    carries |users| rows x |steps| timestamps, never the event log."""
    mins = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__t{i}")
        for i, s in enumerate(steps)
    ]
    return df.groupBy(user_col).agg(*mins)


def funnel_finish(per_user: DataFrame, steps: list[str]) -> DataFrame:
    """Fold per-user funnel state into the funnel readout
    (step, step_idx, users): strict-order completion flags + one tiny
    global aggregation. Runs over |users| rows — cheap enough to call
    on every micro-batch readout of a streaming state table."""
    done: Column = F.col("__t0").isNotNull()
    flags = [done.cast("long").alias("__s0")]
    for i in range(1, len(steps)):
        done = done & F.col(f"__t{i}").isNotNull() \
            & (F.col(f"__t{i}") > F.col(f"__t{i-1}"))
        flags.append(done.cast("long").alias(f"__s{i}"))
    totals = per_user.select(*flags).agg(
        *[F.sum(f"__s{i}").alias(f"__n{i}") for i in range(len(steps))])
    rows = totals.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("step"), F.lit(i).alias("step_idx"),
                 F.col(f"__n{i}").alias("users"))
        for i, s in enumerate(steps)])).alias("r"))
    return rows.select("r.step", "r.step_idx", "r.users")


def funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
           steps: list[str]) -> DataFrame:
    """Ordered funnel: users whose FIRST occurrence of each step is
    strictly after the previous step's first occurrence.

    Composition of `funnel_user_state` (one map-side-combined shuffle
    of |users| rows, never the event log) and `funnel_finish` (tiny
    global aggregation of step-completion flags). Output:
    (step, step_idx, users)."""
    return funnel_finish(
        funnel_user_state(df, user_col, ts_col, type_col, steps), steps)


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     unit_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST activity
    period; counts of distinct users active k periods later.

    Two shuffles total: groupBy(user) for the cohort assignment (the
    min-ts partial agg combines map-side), then the (cohort, offset)
    distinct-count — never a per-event self-join. Periods are
    `unit_days`-wide buckets of epoch days (calendar-agnostic, so the
    oracle matches exactly)."""
    period = (F.datediff(F.col(ts_col).cast("date"),
                         F.lit("1970-01-01").cast("date"))
              / unit_days).cast("long")
    ev = df.select(F.col(user_col).alias("__u"), period.alias("__p"))
    first = ev.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    joined = ev.join(first, "__u")
    return (joined
            .groupBy(F.col("__cohort").alias("cohort_period"),
                     (F.col("__p") - F.col("__cohort")).alias("offset"))
            .agg(F.count_distinct("__u").alias("users")))


def pivot_counts(df: DataFrame, row_col: Column, type_col: str,
                 values: list[str], row_alias: str) -> DataFrame:
    """Wide pivot via explicit conditional aggregation — the value set
    is declared, so no extra distinct-values job runs and the plan is
    one map-side-combined shuffle (Spark's .pivot with values does the
    same; this keeps the column naming deterministic)."""
    aggs = [F.sum((F.col(type_col) == v).cast("long")).alias(v)
            for v in values]
    return df.groupBy(row_col.alias(row_alias)).agg(*aggs)


def ngram_stats(docs: DataFrame, text_col: str = "text", n: int = 2,
                top: int = 20) -> DataFrame:
    """Corpus-level top n-grams: split once, slide with arrays_zip over
    shifted slices (no UDF), explode, count with map-side combine; only
    the (ngram, partial-count) pairs shuffle. Deterministic order:
    count desc, ngram asc."""
    w = F.split(F.trim(F.col(text_col)), " ")
    slices = [F.slice(w, i + 1, F.greatest(
        F.size(w) - F.lit(n - 1), F.lit(0))) for i in range(n)]
    zipped = F.arrays_zip(*slices)
    gram = F.concat_ws(" ", *[F.col(f"g.{i}") for i in range(n)])
    grams = (docs
             .filter(F.size(w) >= n)
             .select(F.explode(zipped).alias("g"))
             .select(gram.alias("ngram")))
    return (grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("ngram")).limit(top))


def corpus_overlap(df: DataFrame, source_col: str, text_col: str = "text",
                   k: int = 3) -> DataFrame:
    """Contamination surface between corpus subsets: for every pair of
    sources, the number of distinct k-word shingles they share.

    Scale shape: ONE shuffle — groupBy(shingle) with a partial
    (map-side) collect_set of sources, which dedupes (source, shingle)
    during the map phase, so no separate dropDuplicates exchange is
    needed. The per-shingle work is bounded by |sources|² (a partition
    dimension, ~10s-100s), NEVER by corpus size, so no hot-token cap
    is needed. Pair expansion happens inside the ≤|sources| sorted
    array (tiny interpreted HOF), not via a token self-join. Docs
    shorter than k words carry no shingles (same rule as
    ngram_stats)."""
    from seatunnel_spark.dataops.dedup import _shingle_str, _shingle_structs

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (df.filter(F.size(words) >= k)
            .select(F.col(source_col).alias("__src"),
                    F.explode(_shingle_structs(F.col(text_col), k))
                    .alias("g"))
            .select("__src", _shingle_str(F.col("g"), k).alias("__tok")))
    srcs = toks.groupBy("__tok").agg(
        F.sort_array(F.collect_set("__src")).alias("s"))
    # Second-level rollup: collapse shingles to their SOURCE SET before
    # expanding pairs, so the interpreted pair-expansion HOF runs over
    # |distinct source sets| rows (hundreds) instead of |shingles|
    # (corpus-scale) — the set counts are map-side combined.
    sets = srcs.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = sets.select(
        "cnt",
        F.explode(F.flatten(F.transform(
            "s", lambda x, i: F.transform(
                F.slice(F.col("s"), i + F.lit(2), F.size("s")),
                lambda y: F.struct(x.alias("a"), y.alias("b")))))).alias("p"))
    return (pairs.groupBy(F.col("p.a").alias("source_a"),
                          F.col("p.b").alias("source_b"))
            .agg(F.sum("cnt").alias("shared_shingles")))


def json_bucket_stats(df: DataFrame, json_col: str, field: str,
                      value_col: str, bucket: int = 10) -> DataFrame:
    """Semi-structured profiling: extract a numeric field from a JSON
    string column (JVM-side get_json_object — no Python UDF), bucket
    it, and aggregate counts + value means per bucket. One map-side-
    combined shuffle of (bucket) keys."""
    kv = F.get_json_object(F.col(json_col), f"$.{field}").cast("int")
    return (df.groupBy((kv - kv % bucket).alias(f"{field}_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(value_col), 4).alias("avg_value")))


def moving_average(df: DataFrame, ts_col: str, group_col: str,
                   window_rows: int = 7) -> DataFrame:
    """Per-group daily series with an N-point trailing moving average.

    Two steps: (1) the daily aggregation — map-side-combined shuffle
    on (group, day); (2) a window over the AGGREGATED series (rows =
    groups × days, orders of magnitude smaller than the event log, so
    the per-group sort inside the window is cheap). The window frame
    is ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW."""
    from pyspark.sql import Window

    day = F.col(ts_col).cast("date")
    daily = df.groupBy(F.col(group_col).alias("grp"),
                       day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("grp").orderBy("day") \
        .rowsBetween(-(window_rows - 1), 0)
    return daily.select(
        "grp", "day", "n",
        F.round(F.avg("n").over(w), 4).alias(f"ma{window_rows}_n"))


def zscore_outliers(df: DataFrame, group_col: str, value_col: str,
                    threshold: float = 2.5,
                    round_to: int = 3) -> DataFrame:
    """Per-group z-score anomaly flagging: rows whose value sits more
    than `threshold` sample standard deviations from their group mean.

    Two-pass shape that scales: (1) one map-side-combined aggregation
    computes each group's mean/stddev (tiny result — |groups| rows);
    (2) the stats broadcast back onto the fact table, so the event log
    itself never shuffles — the ONLY wide exchange carries |groups|
    rows. A window over the raw rows would instead sort the whole fact
    table per group. Degenerate groups (n < 2 or zero variance) emit
    no outliers, matching the SQL NULL-stddev semantics."""
    stats = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"))
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sd")
    return (df.join(F.broadcast(stats),
                    F.col(group_col) == F.col("__g"))
            .filter(F.col("__sd") > 0)
            .withColumn("z", F.round(z, round_to))
            .filter(F.abs(F.col("z")) > threshold)
            .drop("__g", "__mu", "__sd"))


def equiwidth_histogram(df: DataFrame, value_col: str,
                        n_bins: int = 20) -> DataFrame:
    """Equi-width histogram of a numeric column -> (bin, lo, hi, cnt).

    The [min, max] span comes from a 1-row aggregate broadcast onto
    the scan (BroadcastNestedLoopJoin of one row — never a driver
    collect), then bin = floor((v - mn) / width) clamped so v == max
    lands in the last bin. ONE full-width pass; the shuffle carries at
    most n_bins × n_partitions partial counts. All arithmetic in
    double so any engine replays bit-identically."""
    span = df.agg(F.min(F.col(value_col).cast("double")).alias("__mn"),
                  F.max(F.col(value_col).cast("double")).alias("__mx"))
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_bins))
    v = F.col(value_col).cast("double")
    # a constant column has width 0 -> (v-mn)/0 is NaN and the ANSI
    # int cast would throw; everything lands in bin 0 by definition
    bin_ = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)) \
        .otherwise(F.least(F.floor((v - F.col("__mn")) / width),
                           F.lit(n_bins - 1))).cast("int")
    return (df.join(F.broadcast(span))
            .filter(v.isNotNull())
            .withColumn("bin", bin_)
            .withColumn("lo", F.round(F.col("__mn")
                                      + F.col("bin") * width, 4))
            .withColumn("hi", F.round(F.col("__mn")
                                      + (F.col("bin") + 1) * width, 4))
            # lo/hi are functions of bin: grouping by all three keeps
            # the single map-side-combined exchange
            .groupBy("bin", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("bin", "lo", "hi", "cnt"))


def event_pattern_match(df: DataFrame, pattern: str,
                        entity_col: str = "user_id",
                        ts_col: str = "ts",
                        order_col: str = "event_id",
                        type_col: str = "event_type",
                        max_events: int | None = 100_000,
                        strict: bool = False) -> DataFrame:
    """CEP-style sequence-pattern matching: entities whose time-ordered
    event-type sequence matches a regex — the batch analog of
    MATCH_RECOGNIZE / FlinkCEP for shapes like "3 consecutive errors"
    or "view then cart then purchase" that funnel() (min-timestamp
    conditional agg) cannot express, because they need adjacency and
    repetition, not just ordering.

    The per-entity sequence is built as a space-joined string of event
    types sorted by (ts, order_col) — the tiebreaker makes the
    sequence, and therefore the match, deterministic under equal
    timestamps in any engine.

    Scale: the event log shuffles ONCE on entity (inherent to any
    per-entity sequence semantics); everything after operates on
    |entities| rows. Degenerate hot entities (bots with millions of
    events) are guarded IN CODE by `max_events`: a map-side-combined
    count on the same key drops any entity whose event count exceeds
    the cap BEFORE its sequence is collected, so no aggregation buffer
    ever materializes an unbounded array — a deterministic DROP, not a
    truncation, because a truncated sequence could silently report a
    different (prefix-only) match result; excluded-entity semantics
    are explicit and order-independent. The guard's narrow (entity,
    count) shuffle and the semi join hash on the same key the groupBy
    needs, so the event log still shuffles once. `max_events=None`
    disables the guard for pre-capped inputs. The regex runs once per
    entity, JVM-side.

    `strict=True` makes the cap DETECTABLE instead of silent: if any
    entity exceeds `max_events` the call raises with the dropped-
    entity count (a 1-row aggregate over the same narrow count frame
    the guard computes anyway), so callers find out the cap fired
    here rather than discovering missing entities downstream."""
    if max_events is not None:
        cnt = (df.groupBy(entity_col)
               .agg(F.count(F.lit(1)).alias("__n")))
        if strict:
            dropped = (cnt.filter(F.col("__n") > max_events)
                       .count())
            if dropped:
                raise ValueError(
                    f"event_pattern_match: {dropped} entities exceed "
                    f"max_events={max_events} and would be dropped; "
                    f"raise the cap, pre-filter, or pass strict=False "
                    f"to accept the deterministic drop")
        ok = (cnt.filter(F.col("__n") <= max_events)
              .select(entity_col))
        df = df.join(ok, entity_col, "left_semi")
    ordered = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col), F.col(order_col), F.col(type_col))))
    seq = F.array_join(
        F.transform(ordered, lambda s: s[type_col]), " ")
    return (df.groupBy(F.col(entity_col).alias("entity"))
            .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("__seq"))
            .filter(F.col("__seq").rlike(pattern))
            .select("entity", "n_events"))


def copurchase_pairs(df: DataFrame, basket_col: str, item_col: str,
                     min_support: int = 2,
                     max_basket: int | None = 1_000) -> DataFrame:
    """Market-basket pair support: item pairs co-occurring in the same
    basket (order/session/document) at least `min_support` times ->
    (p1, p2, support), p1 < p2 — the counting core of association-rule
    mining (Apriori's k=2 pass).

    Scale: pair fan-out is Σ_b |basket_b|² — bounded by basket size
    (single digits for retail orders), NEVER corpus-quadratic. Pairs
    are generated INSIDE each basket's sorted item array (index-aware
    transform over a collect_set — which also kills multi-quantity
    double counts) rather than by a basket-keyed self-join: the join
    form re-shuffles both sides onto the basket key, the array form
    needs exactly TWO map-side-combined shuffles total (basket
    collect, pair count) — measured 2.4x faster and 10x-data = 1.4x
    wall at sf1.

    Degenerate mega-baskets (a bot session, a default SKU holding the
    whole catalog) are guarded IN CODE by `max_basket`: the pair array
    is materialized per ROW, |basket|²/2 structs that cannot spill, so
    any basket with more than `max_basket` distinct items is DROPPED
    after the basket aggregation (a pure size() filter — deterministic,
    order-independent, and a drop rather than a truncation because a
    truncated basket would report a biased pair subset). The same
    hot-key discipline as dedup's `_cap_buckets` and
    event_pattern_match's `max_events`. `max_basket=None` disables the
    guard for pre-capped inputs."""
    return _pairs_from_baskets(
        _cap_baskets(_baskets(df, basket_col, item_col), max_basket),
        min_support)


def _cap_baskets(baskets: DataFrame,
                 max_basket: int | None) -> DataFrame:
    """Drop baskets whose distinct-item count exceeds the cap — the
    in-row pair array is |basket|²/2 structs in ONE task buffer (in-row
    arrays cannot spill), so the bound must hold before pair
    generation. A zero-shuffle codegen filter on the basket table."""
    if max_basket is None:
        return baskets
    return baskets.filter(F.size("__s") <= max_basket)


def _baskets(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """One row per basket with its sorted distinct item array — the
    shared base of copurchase_pairs and association_rules, so both
    metrics derive from a single fact-table aggregation (ReusedExchange
    dedups it when they appear in one plan)."""
    return (df.groupBy(F.col(basket_col).alias("__b"))
            .agg(F.array_sort(F.collect_set(item_col)).alias("__s")))


def _pairs_from_baskets(baskets: DataFrame,
                        min_support: int) -> DataFrame:
    pair_arr = F.flatten(F.transform(
        "__s", lambda x, i: F.transform(
            F.slice("__s", i + 2, F.size("__s")),
            lambda y: F.struct(x.alias("p1"), y.alias("p2")))))
    return (baskets.select(F.explode(pair_arr).alias("__pr"))
            .select("__pr.p1", "__pr.p2")
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support))


def _degrees(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-vertex degree table (__v, __deg) of a canonical edge list:
    one explode(array(src, dst)) projection (half the stages/tasks of
    the unionAll form — measured 0.66 s vs 1.07 s on the sf0.1
    co-purchase graph) feeding a plain groupBy, so Catalyst plans
    partial aggregation BEFORE the exchange — the shuffle carries
    per-partition (vertex, count) partials bounded by |V|, never the
    raw 2|E| endpoint rows.

    On SMALL clusters only (defaultParallelism <= 64 — local mode and
    dev boxes, where per-task latency dominates) an explicit hash
    repartition on __v shrinks the reducer count (dp/8, floor 4 —
    0.25 s measured locally). The gate matters: the repartition is an
    exchange placed BEFORE the partial agg, so at real scale it would
    ship all 2|E| exploded rows raw AND cap reducers below what AQE
    would pick — a big cluster takes the partial-agg + AQE plan
    instead. Sized from defaultParallelism, NOT
    df.rdd.getNumPartitions(): touching .rdd under AQE forces
    query-stage execution to resolve partitioning — a whole extra job
    (measured +0.9 s on q_triangles)."""
    sc = edges.sparkSession.sparkContext
    dp = sc.defaultParallelism
    ends = edges.select(F.explode(F.array(src, dst)).alias("__v"))
    if dp <= 64:
        ends = ends.repartition(max(4, dp // 8), "__v")
    return ends.groupBy("__v").agg(F.count(F.lit(1)).alias("__deg"))


def _capped_edges(edges: DataFrame, src: str, dst: str,
                  max_degree: int | None,
                  keep_degrees: bool = True
                  ) -> tuple[DataFrame, int, DataFrame | None]:
    """persist() the edge list, drop every edge touching a SUPER-HUB
    vertex (degree > `max_degree`), and return
    (capped_edges, max_degree_bound, degree_table) — the shared
    in-code scale guard of `triangle_count` and
    `clustering_coefficient`, plus the runtime statistic
    `_closed_wedges` picks its wedge strategy from.
    `keep_degrees=False` skips persisting/returning the degree table
    for callers that never read it back (triangle_count's mild path
    consumes only the scalars) — the persist's materialization was
    the last measurable slice of the guard's overhead (~0.3 s of the
    r9 +10% residual at sf0.1); the rare degree-ordered path then
    recomputes degrees once inside _closed_wedges. `degree_table` is
    the PERSISTED (__v, __deg) table of the returned edge frame —
    filled as a side effect of the stats collect, so consumers
    (clustering's readout, the degree-ordered wedge path) reuse it
    instead of re-aggregating; it is None when hubs were dropped
    (the pre-cap degrees are stale for the capped graph — the rare
    path recomputes).

    Why the cap lives here: the wedge join's cost is Σ_v deg(v)² — on
    power-law graphs ONE hub of degree d contributes d² wedges, which
    turns the package's steepest cost curve quadratic in the hub
    degree. Dropping the hub (every incident edge — a deterministic
    DROP, not a truncation, because a sampled neighborhood would
    report biased triangle counts) bounds every vertex's wedge
    contribution at max_degree² while leaving all vertices NOT
    adjacent to a hub bit-identical. Same hot-key discipline as
    dedup's `_cap_buckets` and event_pattern_match's `max_events`;
    `max_degree=None` disables (the degree pass still runs — the
    strategy decision needs the true max degree).

    ONE degree aggregation over the persisted edges yields, in a
    single 1-row collect, BOTH the over-cap vertex list and the max
    degree. Hubs are applied as a LITERAL isin() filter when the
    list is small (the by-construction case — super-hubs are rare):
    a pure codegen projection over the cache, so the three wedge
    branches re-run only a filter, never a join or a second degree
    scan (the broadcast-anti-join form re-executed its hub-scan
    subplan per consuming branch — measured 7.4 s vs 1.6 s for the
    whole of q_triangles at sf0.1). A pathological >4096-hub graph
    falls back to broadcast anti joins with the capped frame
    persisted, paying one materialization instead.

    Why persist(): the edge list appears three times in the wedge
    join and AQE does NOT reuse upstream exchanges, so a derived
    edge list (e.g. the co-purchase pipeline) would recompute per
    branch. persist() (lazy compressed-columnar cache) makes the
    derivation run once; at sf10 — where the co-purchase derivation
    alone costs ~25s — triple-rescan ballooned to 148s while the
    cache form runs it once (33.6s cold). An EAGER localCheckpoint
    is strictly worse (deserialized blocks, unrecoverable on
    eviction — the pagerank sf10 OOM lesson, graph.py). The cache
    backs the LAZY returned frame, so it cannot be unpersisted here;
    long-lived sessions should spark.catalog.clearCache() between
    operator batches (see dedup.py's module note — same contract)."""
    edges = scoped_persist(edges)
    deg = _degrees(edges, src, dst)
    if keep_degrees:
        deg = scoped_persist(deg)
    ret_deg = deg if keep_degrees else None
    if max_degree is None:
        row = deg.agg(F.max("__deg").alias("mx")).collect()[0]
        return edges, row["mx"] or 0, ret_deg
    row = deg.agg(F.max("__deg").alias("mx"),
                  F.collect_list(
                      F.when(F.col("__deg") > max_degree,
                             F.col("__v"))).alias("hubs")).collect()[0]
    maxdeg = row["mx"] or 0
    hubs = list(row["hubs"])
    if not hubs:
        return edges, maxdeg, ret_deg
    bound = min(maxdeg, max_degree)
    if len(hubs) <= 4096:
        return edges.filter(~F.col(src).isin(hubs)
                            & ~F.col(dst).isin(hubs)), bound, None
    hub_f = deg.filter(F.col("__deg") > max_degree).select("__v")
    capped = (edges
              .join(F.broadcast(hub_f), edges[src] == hub_f["__v"],
                    "left_anti")
              .join(F.broadcast(hub_f), edges[dst] == hub_f["__v"],
                    "left_anti"))
    return scoped_persist(capped), bound, None


def _closed_wedges(edges: DataFrame, src: str, dst: str,
                   maxdeg: int | None = None,
                   orient_threshold: int = 512,
                   deg: DataFrame | None = None) -> DataFrame:
    """(a, b, c) rows, one per triangle {a, b, c} of the canonical
    edge list — the shared wedge-close core of `triangle_count` and
    `clustering_coefficient`. Callers pass edges through
    `_capped_edges` first (persist + super-hub guard + the max-degree
    statistic) so both operators stay in lockstep.

    ADAPTIVE orientation (measured both ways, round 8): the physical
    wedge strategy is picked from the graph's actual max degree —
    `maxdeg`, already known from _capped_edges' single degree pass
    (computed here with one extra aggregation only when a caller
    passes None) — the AQE discipline: decide the plan from runtime
    statistics, not hope.

      * max degree <= `orient_threshold` (default 512): the plain
        ID-ORDERED two-join close — Σ deg² is bounded by m·maxdeg,
        and skipping the orientation machinery (two degree joins +
        an extra persisted copy of the edges) is worth ~3x on
        TPC-H-shaped graphs where the edge DERIVATION dominates
        (q_triangles 5.78 s → 1.7 s-class at sf0.1 uniform).
      * above it: DEGREE-ORDERED enumeration (compact-forward /
        Schank-Wagner, cf. Latapy 2008) — orient every edge from its
        lower-(degree, id) endpoint, enumerate wedges only at each
        triangle's minimum-order vertex, close on the oriented edge
        between the two higher-order endpoints. Wedge work drops
        from Σ deg² (quadratic in a power-law hub's degree) to
        Σ outdeg² with outdeg ≲ √(2m) — O(m^1.5) REGARDLESS of
        skew: q_triangles 133.6 s → 73.3 s at Zipf(1.2) sf1
        (BENCH_SKEW_r08.json), identical counts everywhere.

    Each triangle is found exactly once on either path (both orders
    are total); output rows are a per-triangle vertex labeling, and
    both consumers treat them as unordered sets. The degree table
    (vertex-sized) and the oriented edge list persist on the skewed
    path — they feed multiple branches and AQE reuses no exchanges
    (see dedup.py's cache-lifetime module note)."""
    if maxdeg is None:
        if deg is None:
            deg = scoped_persist(_degrees(edges, src, dst))
        maxdeg = deg.agg(F.max("__deg").alias("mx")) \
            .collect()[0]["mx"] or 0
    if maxdeg <= orient_threshold:
        # mild path never reads the degree table — callers may pass
        # deg=None with a known maxdeg (triangle_count's
        # keep_degrees=False) and skip its materialization entirely
        e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
        e3 = edges.select(F.col(src).alias("a"), F.col(dst).alias("c"))
        return e1.join(e2, "b").join(e3, ["a", "c"])
    if deg is None:  # degree-ordered path: recompute once, persisted
        deg = scoped_persist(_degrees(edges, src, dst))
    e = (edges
         .join(deg.select(F.col("__v").alias(src),
                          F.col("__deg").alias("__d1")), src)
         .join(deg.select(F.col("__v").alias(dst),
                          F.col("__deg").alias("__d2")), dst))
    fwd = (F.struct(F.col("__d1"), F.col(src))
           < F.struct(F.col("__d2"), F.col(dst)))
    o = scoped_persist(e.select(
        F.when(fwd, F.col(src)).otherwise(F.col(dst)).alias("u"),
        F.when(fwd, F.col(dst)).otherwise(F.col(src)).alias("w"),
        F.when(fwd, F.col("__d2")).otherwise(F.col("__d1")).alias("dw"),
    ))
    # EAGER materialization: a lazy cache is filled per-partition by
    # whichever task first needs it, and the wedge join's THREE
    # consumers of `o` run concurrently in one job — each recomputes
    # the missing partitions (the orientation joins) before blocks
    # land, up to 3x duplicated work with run-to-run variance
    # (q_clustering_coef measured 12.6-33.5 s across identical zipf
    # runs). One count() barrier makes the derivation run exactly
    # once; the skewed path already pays a driver action for the
    # strategy decision, so this adds one job, not a new pattern.
    o.count()
    x, y = o.alias("x"), o.alias("y")
    wedges = (x.join(y, (F.col("x.u") == F.col("y.u"))
                     & (F.struct(F.col("x.dw"), F.col("x.w"))
                        < F.struct(F.col("y.dw"), F.col("y.w"))))
              .select(F.col("x.u").alias("a"),
                      F.col("x.w").alias("b"),
                      F.col("y.w").alias("c")))
    close = o.select(F.col("u").alias("b"), F.col("w").alias("c"))
    return wedges.join(close, ["b", "c"]).select("a", "b", "c")


def triangle_count(edges: DataFrame, src: str = "p1",
                   dst: str = "p2",
                   max_degree: int | None = 10_000,
                   strategy: str = "auto") -> DataFrame:
    """Global triangle count over an undirected graph given as
    canonical edges (src < dst) -> one row (n_triangles). Each
    triangle a<b<c is counted exactly once by composing its three
    canonical edges.

    Scale: the standard two-shuffle plan (`_closed_wedges`). Wedge
    count Σ_v deg(v)² governs the cost, the same bound every
    distributed triangle algorithm carries; super-hub vertices above
    `max_degree` are dropped IN CODE before the join
    (`_capped_edges`) so a power-law hub cannot make the wedge join
    quadratic in its degree.

    Guard cost: the degree/hub statistic is ONE extra action
    (explode + map-side-combined agg + a scalar collect over the
    just-persisted edges) — a ~0.4 s CONSTANT on local[32]
    regardless of sf (it is dominated by action latency), so its
    relative cost vanishes as data grows; at bench scale sf0.1-sf1
    it reads as ~10%. Callers who can ASSERT the graph shape skip
    it: strategy='plain' with max_degree=None runs the id-ordered
    close with zero statistic jobs (both strategies produce
    identical counts — the choice is physical only);
    strategy='ordered' forces the degree-ordered Schank-Wagner path
    for known-skewed graphs. 'auto' (default) measures and decides —
    the AQE discipline, and the only safe choice under a hub cap."""
    if strategy not in ("auto", "plain", "ordered"):
        raise ValueError(f"strategy must be auto|plain|ordered, "
                         f"got {strategy!r}")
    if strategy == "plain" and max_degree is None:
        capped = scoped_persist(edges)
        return (_closed_wedges(capped, src, dst, 0, deg=None)
                .agg(F.count(F.lit(1)).alias("n_triangles")))
    capped, maxdeg, deg = _capped_edges(edges, src, dst, max_degree,
                                        keep_degrees=False)
    if strategy == "plain":
        maxdeg = 0          # force the id-ordered close
    elif strategy == "ordered":
        maxdeg = 1 << 30    # force the degree-ordered close
    return (_closed_wedges(capped, src, dst, maxdeg, deg=deg)
            .agg(F.count(F.lit(1)).alias("n_triangles")))


def rolling_distinct(df: DataFrame, entity_col: str, ts_col: str,
                     window_days: int = 7) -> DataFrame:
    """Exact trailing-N-day distinct entities per day (rolling DAU/WAU)
    -> (day, dauN). A windowed COUNT(DISTINCT) is not partial-
    aggregable; the scalable exact form inverts it: each (entity, day)
    CONTRIBUTES to the next N days, so explode every distinct
    (entity, day) into its <= N target days and count distinct
    contributions per target.

    Scale: the expansion is a pure projection (N rows per entity-day,
    not per event); both the entity-day dedup and the final count are
    map-side-combined shuffles. No window ever sees raw events, no
    distinct-state accumulates across days. Target days past the data
    horizon are cut by a 1-row max-day broadcast."""
    ud = (df.select(F.col(entity_col).alias("__u"),
                    F.col(ts_col).cast("date").alias("__d"))
          .distinct())
    hi = ud.agg(F.max("__d").alias("__hi"))
    cover = (ud.select("__u", F.explode(F.sequence(
                 F.col("__d"),
                 F.date_add(F.col("__d"), window_days - 1))).alias("day"))
             .join(F.broadcast(hi))
             .filter(F.col("day") <= F.col("__hi"))
             .select("__u", "day").distinct())
    return (cover.groupBy("day")
            .agg(F.count(F.lit(1)).alias(f"dau{window_days}")))


def group_mad(df: DataFrame, group_col: str, value_col: str,
              round_to: int = 4) -> DataFrame:
    """Robust per-group dispersion -> (group, median, mad): median
    absolute deviation, the outlier-resistant alternative to stddev
    (one corrupt value can move a stddev arbitrarily, never a MAD).

    Two exact interpolated-percentile aggregations: (1) per-group
    median (map-side partial over the fact scan), (2) broadcast the
    |groups|-row medians back and take the median of |x - median|.
    The fact table never shuffles — the same broadcast-stats shape as
    zscore_outliers; exchange reuse covers the second scan."""
    med = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med"))
    return (df.join(F.broadcast(med), F.col(group_col) == F.col("__g"))
            .groupBy(group_col)
            .agg(F.round(F.max("__med"), round_to).alias("median"),
                 F.round(F.expr(
                     f"percentile(abs({value_col} - __med), 0.5)"),
                     round_to).alias("mad")))


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_support: int = 2,
                      round_to: int = 4,
                      max_basket: int | None = 1_000) -> DataFrame:
    """Association-rule metrics over co-occurring item pairs ->
    (p1, p2, support, conf_12, conf_21, lift): confidence in both
    directions and lift vs independence — Apriori's rule step on the
    k=2 itemsets from `copurchase_pairs`.

    conf(a→b) = support(a,b) / baskets(a);
    lift = conf(a→b) / (baskets(b) / N) — symmetric, > 1 means the
    pair attracts. Scale note (measured, not assumed): marginals and
    N come from a codegen'd distinct over a SECOND scan rather than
    from the pair path's collect_set basket table — AQE does not
    reuse exchanges across branches, and both sharing alternatives
    benchmark slower at sf1 (branching the object-agg basket table
    re-runs it per branch: 4 scans; lineage-cutting it with an eager
    localCheckpoint serializes a materialization job in front: ~2x
    this form). Parallel columnar scans are cheap; object-agg
    materialization is not. The pair table (already support-filtered)
    joins the marginals — AQE broadcast when the catalog is small —
    and N rides a 1-row broadcast.

    Mega-baskets above `max_basket` (see copurchase_pairs — the
    in-row pair array cannot spill) are excluded from the ENTIRE
    analysis — pairs, marginals, and N — so confidence/lift stay
    internally consistent on the capped basket universe (a marginal
    that counted a basket whose pairs were dropped would bias
    confidence downward). The over-cap basket set is one map-side-
    combined count over the same distinct projection the marginals
    need, applied as a broadcast anti join (degenerate baskets are
    rare by construction, so the set is tiny)."""
    items = df.select(F.col(basket_col).alias("__b"),
                      F.col(item_col).alias("__p")).distinct()
    if max_basket is not None:
        over = (items.groupBy("__b")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_basket)
                .select("__b"))
        items = items.join(F.broadcast(over), "__b", "left_anti")
    pairs = copurchase_pairs(df, basket_col, item_col, min_support,
                             max_basket=max_basket)
    marg = items.groupBy("__p").agg(F.count(F.lit(1)).alias("nb"))
    n = items.agg(F.count_distinct("__b").alias("N"))
    m1 = marg.select(F.col("__p").alias("p1"), F.col("nb").alias("n1"))
    m2 = marg.select(F.col("__p").alias("p2"), F.col("nb").alias("n2"))
    return (pairs.join(m1, "p1").join(m2, "p2").join(F.broadcast(n))
            .select(
                "p1", "p2", "support",
                F.round(F.col("support") / F.col("n1"), round_to)
                .alias("conf_12"),
                F.round(F.col("support") / F.col("n2"), round_to)
                .alias("conf_21"),
                F.round(F.col("support") * F.col("N")
                        / (F.col("n1") * F.col("n2")), round_to)
                .alias("lift")))


def clustering_coefficient(edges: DataFrame, src: str = "p1",
                           dst: str = "p2",
                           round_to: int = 4,
                           max_degree: int | None = 10_000) -> DataFrame:
    """Local clustering coefficient per vertex -> (vertex, degree,
    triangles, cc): how tightly each vertex's neighborhood closes
    (cc = triangles / (deg choose 2)) — community cores vs bridges.

    Same wedge-close join as `triangle_count`, but each found
    triangle (a<b<c) is exploded back to its three member vertices
    and counted per vertex; degrees come from one union-explode of
    the canonical edge list. Vertices of degree < 2 have no wedges
    and are excluded (cc undefined). Cost is the triangle join's
    Σ deg² wedge bound (`_closed_wedges`, shared with
    triangle_count); everything after is vertex-sized.

    Super-hub vertices above `max_degree` are dropped IN CODE before
    the join (`_capped_edges`, shared with triangle_count) —
    degrees, triangles, and cc are all computed on the CAPPED graph
    so the three columns stay mutually consistent; vertices not
    adjacent to a dropped hub are bit-identical to the uncapped
    result."""
    edges, maxdeg, dtab = _capped_edges(edges, src, dst, max_degree)
    tri = _closed_wedges(edges, src, dst, maxdeg, deg=dtab)
    tv = (tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
          .groupBy("v").agg(F.count(F.lit(1)).alias("triangles")))
    # reuse the persisted degree table from the stats pass when it is
    # valid for the returned graph; recompute only on the (rare)
    # hub-capped path where pre-cap degrees are stale
    if dtab is None:
        dtab = _degrees(edges, src, dst)
    deg = dtab.select(F.col("__v").alias("v"),
                      F.col("__deg").alias("degree"))
    wedges = F.col("degree") * (F.col("degree") - 1) / 2
    return (deg.filter(F.col("degree") >= 2)
            .join(tv, "v", "left")
            .select(F.col("v").alias("vertex"), "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"),
                    F.round(F.coalesce("triangles", F.lit(0)) / wedges,
                            round_to).alias("cc")))


__all__ = ["funnel", "funnel_user_state", "funnel_finish",
           "event_transitions",
           "cohort_retention", "pivot_counts", "ngram_stats",
           "corpus_overlap", "json_bucket_stats", "moving_average",
           "zscore_outliers", "equiwidth_histogram",
           "event_pattern_match", "copurchase_pairs", "triangle_count",
           "winsorize", "equidepth_histogram", "inter_event_stats",
           "rolling_distinct", "group_mad", "association_rules",
           "clustering_coefficient"]

def event_transitions(df: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      type_col: str = "event_type",
                      round_to: int = 4) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences -> (from_type, to_type, n, prob): how users actually
    move between states (view -> click -> ...), the journey-analysis
    complement of funnel() (which fixes the path) and
    event_pattern_match (which matches a declared shape).

    prob = n(from, to) / sum_to' n(from, to') — rows sum to 1 per
    from-state. The (ts, order_col) tiebreak makes consecutive pairs
    deterministic under equal timestamps in any engine.

    Scale: ONE event-log shuffle (the per-entity window ordering —
    inherent to sequence semantics), then everything is
    |event_types|²-sized: pair counts combine map-side, and the
    per-from marginals come from a window over the tiny PAIRS frame —
    a separate marginal aggregation would re-run the whole event
    pipeline for its branch (AQE reuses no exchanges), so the shuffle
    it saves is event-log-sized, not pairs-sized."""
    from pyspark.sql import Window

    w = (Window.partitionBy(entity_col)
         .orderBy(F.col(ts_col).asc(), F.col(order_col).asc()))
    pairs = (df
             .withColumn("__next", F.lead(type_col).over(w))
             .filter(F.col("__next").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("__next").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / tot, round_to).alias("prob"))


def winsorize(df: DataFrame, group_col: str, value_col: str,
              lo: float = 0.05, hi: float = 0.95,
              round_to: int = 4) -> DataFrame:
    """Per-group winsorization: clip a value column to its group's
    [lo, hi] exact interpolated percentiles -> the input plus
    (clip_lo, clip_hi, <value>_w). The robust alternative to dropping
    outliers before averaging quality scores / losses / prices — one
    corrupt value moves a mean arbitrarily, never a winsorized mean.

    Scale: one map-side-combined percentile aggregation over the fact
    scan (|groups| rows out), broadcast back onto a second scan, clip
    as a pure codegen projection — the fact table never shuffles, the
    same broadcast-stats shape as zscore_outliers/group_mad."""
    b = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("__hi"))
    v = F.col(value_col)
    return (df.join(F.broadcast(b), F.col(group_col) == F.col("__g"))
            .withColumn("clip_lo", F.round("__lo", round_to))
            .withColumn("clip_hi", F.round("__hi", round_to))
            .withColumn(f"{value_col}_w",
                        F.round(F.least(F.greatest(v, F.col("__lo")),
                                        F.col("__hi")), round_to))
            .drop("__g", "__lo", "__hi"))


def equidepth_histogram(df: DataFrame, value_col: str,
                        n_bins: int = 10,
                        round_to: int = 4) -> DataFrame:
    """Equi-depth (quantile) histogram -> (bin, lo, hi, cnt): bin
    edges at the exact interpolated k/n_bins percentiles, so bins hold
    ~equal row counts — the shape that resolves skewed distributions
    where equi-width piles everything into one bar (and the boundary
    table a range-partitioner or a CBO would want).

    Scale: ONE percentile aggregation over the scan (n_bins+1 edge
    values out — map-side combined), broadcast back, bin assignment
    as a codegen projection, then the same bounded (n_bins x
    partitions) count shuffle as equiwidth_histogram. Ties on edge
    values all fall to the LOWEST containing bin (deterministic in
    any engine); duplicate edges (heavy ties) yield empty higher
    bins rather than double counting."""
    qs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.agg(*[
        F.round(F.expr(f"percentile({value_col}, {q})"), round_to)
        .alias(f"__e{i}") for i, q in enumerate(qs)])
    v = F.round(F.col(value_col).cast("double"), round_to)
    # lowest bin whose [lo, hi] contains v: count how many edges are
    # strictly below v (edges are sorted), clamp to the last bin
    below = sum((v > F.col(f"__e{i}")).cast("int")
                for i in range(1, n_bins))
    bin_ = F.least(below, F.lit(n_bins - 1)).cast("int")
    edge_arr = F.array(*[F.col(f"__e{i}") for i in range(n_bins + 1)])
    return (df.join(F.broadcast(edges))
            .filter(F.col(value_col).isNotNull())
            .withColumn("bin", bin_)
            .withColumn("lo", F.element_at(edge_arr, F.col("bin") + 1))
            .withColumn("hi", F.element_at(edge_arr, F.col("bin") + 2))
            .groupBy("bin", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("bin", "lo", "hi", "cnt"))


def inter_event_stats(df: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      round_to: int = 4) -> DataFrame:
    """Per-entity inter-event cadence -> (entity, n_events,
    median_gap_s, iqr_s): the median and interquartile range of the
    seconds between consecutive events. The standard bot/automation
    signal — machine traffic has an unnaturally tight cadence (tiny
    IQR around a fixed median), humans don't — and the quantitative
    companion to event_pattern_match's max_events guard: rank entities
    by iqr_s/median_gap_s to find what to cap. Entities with a single
    event have no gaps and are excluded.

    Scale: ONE event-log shuffle (the per-entity ordering window,
    inherent to sequence semantics); the percentile aggregation folds
    the |events|-row gap stream map-side into |entities| rows. The
    (ts, order_col) tiebreak makes gaps deterministic under equal
    timestamps in any engine."""
    from pyspark.sql import Window

    w = (Window.partitionBy(entity_col)
         .orderBy(F.col(ts_col).asc(), F.col(order_col).asc()))
    # cast-to-double keeps the fractional (micro)seconds that
    # unix_timestamp would truncate — exact in double, so any engine
    # replays the gaps bit-identically (the timestamp hop handles
    # TIMESTAMP_NTZ inputs; the engine session runs in UTC)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    gaps = (df.withColumn("__gap", gap)
            .filter(F.col("__gap").isNotNull()))
    return (gaps.groupBy(F.col(entity_col).alias("entity"))
            .agg((F.count(F.lit(1)) + 1).alias("n_events"),
                 F.round(F.expr("percentile(__gap, 0.5)"), round_to)
                 .alias("median_gap_s"),
                 F.round(F.expr("percentile(__gap, 0.75)")
                         - F.expr("percentile(__gap, 0.25)"), round_to)
                 .alias("iqr_s")))


def touch_attribution(df: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      conversion: str = "purchase",
                      order_col: str = "event_id") -> DataFrame:
    """First/last-touch attribution -> one row per conversion event
    (entity, conv_id, conv_ts, first_touch, last_touch, n_touches):
    each conversion is credited with the touches in ITS segment — the
    events since the previous conversion (or the start of history) —
    the standard multi-conversion attribution window, deterministic
    under equal timestamps via the (ts, order_col) total order.

    Scale: one entity-keyed shuffle total. The segment index is a
    running prior-conversion count (window sum), touch extremes are
    struct-ordered min_by/max_by aggregates per (entity, segment) —
    no touch×conversion pair join ever materializes, so a hot entity
    costs its event count, not events², and the conversion join is
    |conversions|-row on both sides."""
    w = (Window.partitionBy(entity_col)
         .orderBy(F.col(ts_col), F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    is_conv = (F.col(type_col) == conversion).cast("int")
    seg = F.coalesce(F.sum(is_conv).over(w), F.lit(0))
    tagged = df.select(
        F.col(entity_col).alias("entity"), F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__t"), F.col(order_col).alias("__o"),
        seg.alias("__seg"))
    ordkey = F.struct(F.col("__ts").alias("ts"), F.col("__o").alias("o"))
    touches = (tagged.filter(F.col("__t") != conversion)
               .groupBy("entity", "__seg")
               .agg(F.min_by("__t", ordkey).alias("first_touch"),
                    F.max_by("__t", ordkey).alias("last_touch"),
                    F.count(F.lit(1)).alias("n_touches")))
    convs = (tagged.filter(F.col("__t") == conversion)
             .select("entity", "__seg",
                     F.col("__o").alias("conv_id"),
                     F.col("__ts").alias("conv_ts")))
    return (convs.join(touches, ["entity", "__seg"], "left")
            .select("entity", "conv_id", "conv_ts",
                    "first_touch", "last_touch",
                    F.coalesce("n_touches", F.lit(0))
                    .alias("n_touches")))


def grouped_ols(df: DataFrame, group_cols: list[str], x_expr: str,
                y_expr: str, round_to: int = 6) -> DataFrame:
    """Per-group simple linear regression -> (*group_cols, n, slope,
    intercept, r2): one map-side-combined aggregation computes the
    five OLS sums per group, the closed form does the rest — the
    "fit a line per segment" primitive (price elasticity per region,
    tokens-vs-chars per source, latency-vs-size per endpoint) that
    needs no ML runtime and exactly one shuffle at any scale. Groups
    with zero x-variance return null slope/r2 rather than dividing
    by zero; rows with a null on either side are excluded (the
    standard pairwise-complete convention)."""
    x = F.expr(x_expr).cast("double")
    y = F.expr(y_expr).cast("double")
    base = (df.select(*group_cols, x.alias("__x"), y.alias("__y"))
            .filter(F.col("__x").isNotNull()
                    & F.col("__y").isNotNull()))
    s = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").alias("__sx"), F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"))
    cov = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = (F.col("__n") * F.col("__sxx")
            - F.col("__sx") * F.col("__sx"))
    vary = (F.col("__n") * F.col("__syy")
            - F.col("__sy") * F.col("__sy"))
    slope = F.when(varx > 0, cov / varx)
    return s.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round((F.col("__sy") - slope * F.col("__sx")) / F.col("__n"),
                round_to).alias("intercept"),
        F.round(F.when((varx > 0) & (vary > 0),
                       cov * cov / (varx * vary)), round_to)
        .alias("r2"))


def logreg_fit(df: DataFrame, feature_cols: list[str],
               label_col: str, iters: int = 3, lr: float = 1.0,
               round_to: int = 6, standardize: bool = False,
               l2: float = 0.0) -> DataFrame:
    """Distributed logistic-regression fit by full-batch gradient
    descent -> (feature, weight) rows (intercept as '__intercept'):
    the TRAINABLE quality classifier the heuristic
    text_quality_score composite cannot be — train on seed labels
    (a curated domain, a language flag), score the corpus. No ML
    runtime: each iteration is ONE map-side-combined aggregation
    computing the d+1 gradient sums Σ (σ(w·x) − y)·x_j over the
    persisted feature frame, the weight update happens on the
    d+1-double model in the driver — the grouped_ols/kmeans_fit
    closed-form-iteration discipline.

    Replay contract: weights start at 0, every update is rounded to
    `round_to` BEFORE the next pass, and σ uses the literal
    1/(1+exp(−z)) form — so `iters` unrolled SQL CTEs (one gradient
    aggregation + one 1-row weight update each) reproduce the run
    bit-for-bit in any engine; a numpy twin pins the arithmetic in
    unit tests. Rows with a NULL feature or label are excluded
    (pairwise-complete, the grouped_ols convention).

    Scale: the corpus is scanned `iters` times (scoped_persist makes
    the scans cache-backed); only the d+1 gradient doubles ever
    reach the driver. Labels must be 0/1.

    `standardize=True` makes the fit robust to RAW-magnitude signals
    at the fixed step: one extra aggregation computes per-feature
    μ = round(Σx/n, round_to) and σ = round(sqrt(max(Σx²/n −
    (Σx/n)², 0)), round_to) (population form, explicit Σ/Σ²
    arithmetic — no stddev implementation skew), a constant feature
    (σ=0) standardizes to 0 via σ:=1, and GD runs on (x−μ)/σ with
    μ/σ applied as LITERALS — still fully SQL-replayable. The output
    then carries (feature, weight, mu, sigma) rows (intercept row:
    mu=0, sigma=1) so logreg_score can apply the same transform;
    without standardize the historic (feature, weight) schema is
    unchanged. `l2` adds ridge shrinkage to the NON-intercept
    gradient (w_j ← w_j − lr·(g_j/n + l2·w_j)) — literal arithmetic,
    replayable like everything else."""
    from seatunnel_spark.dataops._cache import scoped_persist

    if iters < 1:
        raise ValueError(f"logreg_fit needs iters >= 1, got {iters}")
    d = len(feature_cols)
    xs = [F.col(c).cast("double").alias(f"__x{j}")
          for j, c in enumerate(feature_cols)]
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    base = scoped_persist(
        df.filter(cond)
        .select(F.col(label_col).cast("double").alias("__y"), *xs))
    mus = [0.0] * d
    sigmas = [1.0] * d
    if standardize:
        saggs = [F.count(F.lit(1)).alias("__n")]
        for j in range(d):
            x = F.col(f"__x{j}")
            saggs += [F.sum(x).alias(f"__s{j}"),
                      F.sum(x * x).alias(f"__q{j}")]
        srow = base.agg(*saggs).collect()[0]
        n = srow["__n"]
        if n == 0:
            raise ValueError("logreg_fit: no complete rows to fit")
        for j in range(d):
            m = srow[f"__s{j}"] / n
            var = max(srow[f"__q{j}"] / n - m * m, 0.0)
            mus[j] = round(m, round_to)
            sg = round(math.sqrt(var), round_to)
            sigmas[j] = sg if sg > 0 else 1.0
        base = base.select(
            "__y",
            *[((F.col(f"__x{j}") - F.lit(mus[j])) / F.lit(sigmas[j]))
              .alias(f"__x{j}") for j in range(d)])
    w = [0.0] * (d + 1)  # [intercept, w_1 .. w_d]
    for _ in range(iters):
        z = F.lit(w[0])
        for j in range(d):
            z = z + F.lit(w[j + 1]) * F.col(f"__x{j}")
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("__y")
        aggs = [F.count(F.lit(1)).alias("__n"),
                F.sum(resid).alias("__g0")]
        aggs += [F.sum(resid * F.col(f"__x{j}")).alias(f"__g{j + 1}")
                 for j in range(d)]
        row = base.agg(*aggs).collect()[0]
        n = row["__n"]
        if n == 0:
            raise ValueError("logreg_fit: no complete rows to fit")
        w = [round(w[j] - lr * (row[f"__g{j}"] / n
                                + (l2 * w[j] if j > 0 else 0.0)),
                   round_to)
             for j in range(d + 1)]
    spark = df.sparkSession
    if standardize:
        rows = [("__intercept", w[0], 0.0, 1.0)] + [
            (c, w[j + 1], mus[j], sigmas[j])
            for j, c in enumerate(feature_cols)]
        return spark.createDataFrame(
            rows, "feature string, weight double, mu double, "
                  "sigma double")
    rows = [("__intercept", w[0])] + [
        (c, w[j + 1]) for j, c in enumerate(feature_cols)]
    return spark.createDataFrame(rows, "feature string, weight double")


def logreg_score(df: DataFrame, weights: DataFrame | dict,
                 feature_cols: list[str], out_col: str = "score",
                 round_to: int = 6) -> DataFrame:
    """Apply a logreg_fit model -> df + `out_col` =
    round(σ(w·x), round_to), pure codegen with the model as
    literals — scan-speed scoring at any scale (the
    text_quality_score shape). `weights` is logreg_fit's output
    frame (collected — it is model-sized) or a {feature: weight}
    dict with '__intercept'. A standardized model (mu/sigma columns
    present, or dict values as (weight, mu, sigma) tuples) scores as
    σ(w0 + Σ w_j·(x_j−μ_j)/σ_j) — the same literal transform the
    fit trained on, so raw features go in unchanged."""
    if isinstance(weights, DataFrame):
        has_std = "mu" in weights.columns
        weights = {
            r["feature"]: ((r["weight"], r["mu"], r["sigma"])
                           if has_std else r["weight"])
            for r in weights.collect()}
    w0 = weights.get("__intercept", 0.0)
    z = F.lit(float(w0[0] if isinstance(w0, tuple) else w0))
    for c in feature_cols:
        wc = weights[c]
        x = F.col(c).cast("double")
        if isinstance(wc, tuple):
            wj, mu, sg = (float(v) for v in wc)
            z = z + F.lit(wj) * ((x - F.lit(mu)) / F.lit(sg))
        else:
            z = z + F.lit(float(wc)) * x
    return df.withColumn(
        out_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to))


def ab_welch_t(df: DataFrame, flag: Column, value_col: str,
               round_to: int = 6) -> DataFrame:
    """Welch's unequal-variance t-test between the rows where `flag`
    is true (variant A) and false (variant B) -> one row (n_a, n_b,
    mean_a, mean_b, mean_diff, t_stat, dof): the A/B-readout
    primitive robust to unequal group sizes/variances (Student's
    pooled test silently mis-states the error when the big control
    arm has different variance than the small treatment).

    t = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b), dof by
    Welch–Satterthwaite. ONE map-side-combined aggregation pass
    (conditional sums — no split, no join, no second scan); variances
    come from explicit Σv/Σv² arithmetic rather than var_samp so any
    SQL engine replays the identical expression (the grouped_ols
    discipline). The t-to-p lookup is left to the caller's stats
    table (erf is not portable across engines, so shipping a p-value
    here would break the oracle-replay discipline every other
    operator holds). Groups need n >= 2 each; degenerate inputs yield
    NULL t/dof rather than ANSI division errors."""
    v = F.col(value_col).cast("double")
    a, b = flag, ~flag
    s = df.agg(
        F.count(F.when(a, 1)).alias("__na"),
        F.count(F.when(b, 1)).alias("__nb"),
        F.sum(F.when(a, v)).alias("__sa"),
        F.sum(F.when(b, v)).alias("__sb"),
        F.sum(F.when(a, v * v)).alias("__qa"),
        F.sum(F.when(b, v * v)).alias("__qb"))
    s = s.select(
        "*",
        (F.col("__sa") / F.col("__na")).alias("__ma"),
        (F.col("__sb") / F.col("__nb")).alias("__mb"),
        F.when(F.col("__na") >= 2,
               (F.col("__qa")
                - F.col("__sa") * F.col("__sa") / F.col("__na"))
               / (F.col("__na") - 1)).alias("__va"),
        F.when(F.col("__nb") >= 2,
               (F.col("__qb")
                - F.col("__sb") * F.col("__sb") / F.col("__nb"))
               / (F.col("__nb") - 1)).alias("__vb"))
    sea = F.col("__va") / F.col("__na")
    seb = F.col("__vb") / F.col("__nb")
    se2 = sea + seb
    # both variances must be individually non-negative: the Σv²−(Σv)²/n
    # form can go slightly negative under catastrophic cancellation
    # (large mean, tiny variance), and one negative + one positive
    # variance could still pass a bare se2 > 0 with a misleading t/dof
    ok = ((F.col("__na") >= 2) & (F.col("__nb") >= 2)
          & (F.col("__va") >= 0) & (F.col("__vb") >= 0) & (se2 > 0))
    t = F.when(ok, (F.col("__ma") - F.col("__mb")) / F.sqrt(se2))
    dof = F.when(ok, se2 * se2
                 / (sea * sea / (F.col("__na") - 1)
                    + seb * seb / (F.col("__nb") - 1)))
    return s.select(
        F.col("__na").alias("n_a"), F.col("__nb").alias("n_b"),
        F.round("__ma", round_to).alias("mean_a"),
        F.round("__mb", round_to).alias("mean_b"),
        F.round(F.col("__ma") - F.col("__mb"), round_to)
        .alias("mean_diff"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("dof"))
