"""Deterministic corpus sampling — hash splits, stratified rates,
domain rebalancing.

Training-data pipelines need REPRODUCIBLE sampling: the same doc must
land in the same split on every run, on any cluster layout, or
train/eval contamination and silent dataset drift follow. Random
sampling (`df.sample`) is seed-and-partitioning dependent; everything
here derives from a content hash instead — `md5(id)`'s first 8 hex
digits as a uniform bucket in [0, 10000) — so membership is a pure
function of the row.

100 TB design: every operator below is one scan with a per-row hash +
filter (no shuffle at all) except `domain_rebalance`, which needs one
small aggregate (count per domain — map-side combined, domains are
few) joined back as a broadcast. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = _BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 hex chars
    of md5 of the value's string form. Reproducible outside Spark
    (DuckDB: ('0x' || substr(md5(v::varchar), 1, 8))::bigint % b)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % buckets).alias("bucket")


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 train: float = 0.9, val: float = 0.05) -> DataFrame:
    """Add a `split` column: train/val/test by hash range. The test
    share is the remainder. Same id -> same split, forever."""
    b = hash_bucket(F.col(id_col))
    t_hi = int(train * _BUCKETS)
    v_hi = t_hi + int(val * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"))


def leakage_safe_split(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       train: float = 0.9, val: float = 0.05,
                       cluster_col: str | None = None) -> DataFrame:
    """`split_assign`, but leakage-safe: duplicate documents ALWAYS
    land in the same split. Hashing the doc id puts two copies of the
    same text on different sides of the train/test fence — the classic
    silent eval contamination — so the split key here is the CONTENT
    (md5(text)), making membership a pure function of what the model
    would actually memorize. For near-duplicate safety, pass
    `cluster_col` (e.g. the cluster_id from dedup.duplicate_clusters
    over MinHash pairs) and the whole near-dup cluster moves together.

    Scale: identical to split_assign — one scan, a per-row hash +
    range test, zero shuffle (the md5 the exact-dedup path computes
    anyway). Same content -> same split, forever, on any layout."""
    key = F.col(cluster_col) if cluster_col else F.md5(F.col(text_col))
    b = hash_bucket(key)
    t_hi = int(train * _BUCKETS)
    v_hi = t_hi + int(val * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"))


def stratified_sample(df: DataFrame, strat_col: str, rates: dict[str, float],
                      id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    kept iff hash_bucket(id) < rate * 10000. A stratum absent from
    `rates` uses default_rate."""
    expr = F.lit(int(default_rate * _BUCKETS))
    for k, v in rates.items():
        expr = F.when(F.col(strat_col) == k, int(v * _BUCKETS)).otherwise(expr)
    return df.filter(hash_bucket(F.col(id_col)) < expr)


def domain_rebalance(df: DataFrame, domain_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Downsample every domain to the size of the smallest one (uniform
    target mixture), deterministically: keep-rate_d = min_count /
    count_d, membership by hash bucket.

    The per-domain counts are a tiny aggregate (one row per domain)
    broadcast back onto the scan — the corpus itself never shuffles.
    The global min is a scalar aggregate broadcast-cross-joined back
    onto the counts frame (not an OVER () window, which would funnel
    the frame through one partition and spam WindowExec warnings).
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_d"))
    min_n = counts.agg(F.min("n_d").alias("__min_n"))
    counts = counts.join(F.broadcast(min_n)).withColumn(
        "keep_buckets",
        F.floor(F.col("__min_n") * F.lit(_BUCKETS) / F.col("n_d")))
    return (df.join(F.broadcast(counts.select(domain_col, "keep_buckets")),
                    domain_col)
            .filter(hash_bucket(F.col(id_col)) < F.col("keep_buckets"))
            .drop("keep_buckets"))


def global_shuffle(df: DataFrame, id_col: str = "doc_id",
                   seed: int = 42, num_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every row gets a (shard, pos) address that is a pure function of
    (id, seed) — the same corpus shuffles identically on any cluster
    layout, and changing the seed reshuffles everything.

    shard = first-8-hex-digits of md5(id:seed) mod num_shards (uniform);
    pos = rank within the shard by the full digest. Writers emit one
    file per shard; trainers read shards in order.

    100 TB design: the shard assignment is a pure projection; the only
    shuffle is the per-shard ranking window — each shard sorts
    INDEPENDENTLY (partitionBy shard), so the sort is num_shards-way
    parallel and nothing funnels through one task. With num_shards
    sized to the cluster (e.g. 10k shards for 100 TB) each shard's
    sort is a few GB — never a global single-partition ORDER BY.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                            F.lit(str(int(seed)))))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
             % int(num_shards))
    out = df.withColumns({"__key": key, "shard": shard})
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (out.withColumn("pos", F.row_number().over(w))
            .drop("__key"))


def temperature_sample(df: DataFrame, domain_col: str = "source",
                       id_col: str = "doc_id", alpha: float = 0.5,
                       budget_frac: float = 0.5,
                       buckets: int = 1_000_000) -> DataFrame:
    """Temperature (alpha) domain sampling — the standard multilingual
    /multi-source data-mix rule: domain s gets weight n_s^alpha / Z,
    so alpha=1 keeps natural proportions, alpha=0 is uniform, and
    values in between up-weight small domains. The total budget is
    budget_frac of the corpus; per-domain acceptance probability
    p_s = min(1, budget * N * w_s / n_s) is materialized as an integer
    hash threshold so membership is a pure function of the doc id —
    the same mix reproduces on any cluster layout, and re-runs are
    incremental-friendly.

    -> (domain, n_docs, thr, n_sampled): the realized plan plus the
    exact deterministic draw (thr over a `buckets`-sized hash space).

    100 TB shape: one map-side-combined count per domain (a handful of
    rows, broadcast back), then a pure-projection accept test — no
    shuffle of the corpus at all beyond the final per-domain count.
    """
    c = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"))
    tot = F.broadcast(c.agg(
        F.sum(F.pow("n_docs", float(alpha))).alias("__z"),
        F.sum("n_docs").alias("__N")))
    thr = F.round(
        F.least(
            F.lit(1.0),
            float(budget_frac) * F.col("__N")
            * F.pow("n_docs", float(alpha)) / F.col("__z")
            / F.col("n_docs"),
        ) * int(buckets)
    ).cast("bigint")
    plan = c.join(tot).select("domain", "n_docs", thr.alias("thr"))
    b = hash_bucket(F.col(id_col), int(buckets))
    return (
        df.select(F.col(domain_col).alias("domain"), b.alias("__b"))
        .join(F.broadcast(plan), "domain")
        .groupBy("domain", "n_docs", "thr")
        .agg(F.sum((F.col("__b") < F.col("thr")).cast("long"))
             .alias("n_sampled"))
    )


def group_sample_topk(df: DataFrame, group_col: str, k: int,
                      id_col: str = "doc_id", salt: int = 32) -> DataFrame:
    """Exactly-k uniform sample per group, deterministic and skew-proof.

    Priority = md5 of the id — a fixed-width hex STRING, so the order
    is identical in any engine (no float math, no RNG, no seed). The
    k smallest priorities per group are a uniform without-replacement
    k-sample, reproducible forever.

    A single window partitioned by group would funnel each group's
    ENTIRE row set through one task — a hot domain at 100 TB is a
    straggler. Two phases fix it: (1) rank within (group, salt) —
    `salt` buckets from the id hash — and keep each bucket's top k;
    (2) rank the survivors (<= salt*k rows per group, thousands not
    billions) within the group. Any group winner is also a winner of
    its own salt bucket, so phase 2 sees every true top-k candidate.
    """
    from pyspark.sql import Window

    pri = F.md5(F.col(id_col).cast("string"))
    slt = F.conv(F.substring(pri, 25, 6), 16, 10).cast("long") % salt
    w1 = (Window.partitionBy(group_col, "__salt")
          .orderBy("__pri", id_col))
    w2 = Window.partitionBy(group_col).orderBy("__pri", id_col)
    return (df
            .withColumn("__pri", pri).withColumn("__salt", slt)
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("sample_rank", F.row_number().over(w2).cast("int"))
            .filter(F.col("sample_rank") <= k)
            .drop("__pri", "__salt", "__r1"))


def weighted_sample_topk(df: DataFrame, group_col: str, k: int,
                         weight_col: str, id_col: str = "doc_id",
                         salt: int = 32) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement per group,
    deterministic (Efraimidis–Spirakis A-ES): key = u^(1/w) with u a
    uniform in (0,1), keep the k largest keys. P(selection) is
    proportional to weight — e.g. weight by document length to bias a
    QA sample toward long documents — and the whole draw replays
    bit-identically in any engine because u derives from md5(id), not
    an RNG: u = (first-8-hex-of-md5 + 0.5) / 16^8 (exact in double).

    Rows whose weight is NULL or <= 0 are dropped IN-OPERATOR: A-ES
    gives weight-0 rows zero selection probability by definition, a
    null weight would make the key null (and DESC null ordering
    differs across engines — Spark sorts nulls last, DuckDB first),
    and a negative weight flips u^(1/w) into a u^(-x) explosion.
    Enforcing the precondition here instead of in a docstring keeps
    the draw well-defined on any input. Same salted two-phase window
    as `group_sample_topk` (any group-wide top-k key is also its salt
    bucket's top-k), so a hot group never funnels through one task.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(weight_col).isNotNull()
                   & (F.col(weight_col).cast("double") > 0))
    h = F.md5(F.col(id_col).cast("string"))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 0.5)
         / F.lit(float(16 ** 8)))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    slt = F.conv(F.substring(h, 25, 6), 16, 10).cast("long") % salt
    w1 = (Window.partitionBy(group_col, "__salt")
          .orderBy(F.col("__key").desc(), id_col))
    w2 = (Window.partitionBy(group_col)
          .orderBy(F.col("__key").desc(), id_col))
    return (df
            .withColumn("__key", key).withColumn("__salt", slt)
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("sample_rank", F.row_number().over(w2).cast("int"))
            .filter(F.col("sample_rank") <= k)
            .drop("__key", "__salt", "__r1"))


__all__ = ["hash_bucket", "split_assign", "leakage_safe_split",
           "stratified_sample", "mixture_plan", "mixture_apply",
           "domain_rebalance", "global_shuffle", "temperature_sample",
           "group_sample_topk", "weighted_sample_topk"]


def mixture_plan(df: DataFrame, domain_col: str, weights: dict[str, float],
                 token_budget: int, token_col: str | None = None,
                 text_col: str = "text") -> DataFrame:
    """Training-mixture plan -> (domain, n_docs, n_tokens,
    target_tokens, rate, epochs): given target mixture weights and a
    total token budget, how much of each source to take — the
    LLaMA/Dolma-style "data mixing" step between cleaning and
    training. rate = target/available may exceed 1 (upsampling):
    epochs = ceil(rate) full passes, with the last pass sampled at the
    fractional remainder. Domains absent from `weights` get weight 0.

    Scale: ONE map-side-combined aggregation over the corpus (token
    counts per domain — |domains| rows out); the plan itself is
    domain-sized arithmetic. Apply it with `mixture_apply`, a pure
    projection (explode epochs + hash threshold), zero shuffle."""
    from seatunnel_spark.dataops.text import token_count

    ntok = (F.col(token_col) if token_col
            else token_count(F.col(text_col)))
    agg = (df.groupBy(F.col(domain_col).alias("domain"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(ntok).alias("n_tokens")))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = F.coalesce(wmap[F.col("domain")], F.lit(0.0))
    target = F.round(w * F.lit(float(token_budget))).cast("long")
    rate = F.round(F.try_divide(target.cast("double"),
                                F.col("n_tokens").cast("double")), 6)
    return (agg
            .withColumn("target_tokens", target)
            .withColumn("rate", F.coalesce(rate, F.lit(0.0)))
            .withColumn("epochs", F.ceil("rate").cast("int")))


def mixture_apply(df: DataFrame, plan: DataFrame, domain_col: str,
                  id_col: str = "doc_id") -> DataFrame:
    """Materialize a `mixture_plan`: emit each document `epochs` times
    (epoch column added), with the LAST epoch sampled at the
    fractional remainder of `rate` by deterministic hash membership —
    so the expected token take per domain equals target_tokens, every
    full epoch is complete (no within-epoch bias), and membership is a
    pure function of (id, epoch): reproducible on any layout, zero
    shuffle (the plan is a |domains|-row broadcast)."""
    p = F.broadcast(plan.select(F.col("domain").alias("__d"),
                                "rate", "epochs"))
    joined = df.join(p, F.col(domain_col) == F.col("__d"))
    out = (joined.filter(F.col("epochs") > 0)
           .withColumn("epoch", F.explode(
               F.sequence(F.lit(1), F.col("epochs")))))
    frac = F.col("rate") - (F.col("epochs") - 1)
    keep_buckets = F.floor(frac * _BUCKETS)
    keep = F.when(F.col("epoch") < F.col("epochs"), F.lit(True)) \
        .otherwise(hash_bucket(F.concat(F.col(id_col).cast("string"),
                                        F.lit("#"),
                                        F.col("epoch").cast("string")))
                   < keep_buckets)
    return out.filter(keep).drop("__d", "rate", "epochs")


def _dsir_features(df: DataFrame, id_col: str, text_col: str,
                   width_hex: int) -> DataFrame:
    """Hashed unigram+bigram feature stream -> (__id, __b): the DSIR
    feature space — every token and every adjacent token pair, hashed
    to a 16^width_hex-bucket hex-string key via the _cms_pos
    discipline (md5 prefix strings replay bit-identically in any
    engine; bigrams carry an internal space so they never collide
    with a unigram's text, only via the hash — which is the point of
    hashed features). Bigrams come from the shifted-slice arrays_zip
    trick (bigram_logprob) — zero UDF, one tokenize pass."""
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("__id"), w.alias("__w"))
    m = F.greatest(F.size("__w") - 1, F.lit(0))
    uni = (base.select("__id", F.explode("__w").alias("__f"))
           .filter(F.col("__f") != ""))
    zipped = F.arrays_zip(F.slice("__w", 1, m).alias("a"),
                          F.slice("__w", 2, m).alias("b"))
    bi = (base.select("__id", F.explode(zipped).alias("p"))
          .select("__id", F.concat_ws(
              " ", F.col("p.a"), F.col("p.b")).alias("__f")))
    return (uni.unionByName(bi)
            .select("__id", F.substring(
                F.md5(F.col("__f")), 1, width_hex).alias("__b")))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    width_hex: int = 3, alpha: float = 1.0,
                    round_to: int = 6) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    DSIR) -> (id, n_feats, log_weight) for every raw document with
    at least one feature: the log importance weight
    log p_target(x) / p_raw(x) under hashed-n-gram bag models — the
    data-selection signal that upweights raw documents that LOOK
    LIKE the curated target distribution (Wikipedia, textbooks, a
    curated domain) without any trained classifier.

    Per bucket b (hashed unigram+bigram space, 16^width_hex
    buckets): p(b) = (n_b + alpha) / (N + alpha·B), add-alpha
    smoothed so buckets unseen in the target stay finite (an EMPTY
    target degenerates to the uniform 1/B prior — the smoothing
    limit, not an error); per doc,
    log_weight = Σ_b c_doc(b)·(ln p_t(b) − ln p_r(b)). Feed the
    output to weighted_sample_topk / a threshold filter for the
    resampling step; keep temperatures in log space until the final
    select (the weights span hundreds of nats).

    100 TB shape: ONE scan of each corpus. The raw feature stream
    aggregates straight to (doc, bucket) counts — map-side combined,
    ≤ B distinct buckets per doc — and is scoped_persisted; BOTH the
    raw profile (Σ over docs) and the per-doc fold reuse it, so the
    raw text is tokenized exactly once. Profiles are ≤ B rows —
    broadcast joins, never a shuffle; corpus totals ride 1-row
    broadcast spines (no driver collect). Everything is md5-prefix
    and ln literal arithmetic, so a SQL engine replays it
    bit-for-bit."""
    from seatunnel_spark.dataops._cache import scoped_persist

    n_buckets = 16 ** width_hex
    docf = scoped_persist(
        _dsir_features(raw, id_col, text_col, width_hex)
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).alias("__c")))
    prof_r = docf.groupBy("__b").agg(F.sum("__c").alias("__nr"))
    prof_t = (_dsir_features(target, id_col, text_col, width_hex)
              .groupBy("__b").agg(F.count(F.lit(1)).alias("__nt")))
    tot_r = prof_r.agg(F.sum("__nr").alias("__tot_r"))
    tot_t = prof_t.agg(F.sum("__nt").alias("__tot_t"))
    a, ab = F.lit(float(alpha)), F.lit(float(alpha) * n_buckets)
    lp = (F.log((F.coalesce(F.col("__nt"), F.lit(0)) + a)
                / (F.coalesce(F.col("__tot_t"), F.lit(0)) + ab))
          - F.log((F.col("__nr") + a) / (F.col("__tot_r") + ab)))
    return (docf.join(F.broadcast(prof_t), "__b", "left")
            .join(F.broadcast(prof_r), "__b")
            .join(F.broadcast(tot_t))
            .join(F.broadcast(tot_r))
            .groupBy(F.col("__id").alias(id_col))
            .agg(F.sum("__c").alias("n_feats"),
                 F.round(F.sum(F.col("__c") * lp), round_to)
                 .alias("log_weight")))
