"""Skew-handling join strategies for the 100 TB regime.

A shuffled join on a skewed key funnels the hot key's rows through one
reducer; at 1000 executors that one task dominates the stage. Two
remedies, composable with everything else in dataops:

  * AQE skew-join splitting (on by default in session.py) — handles
    skew Spark can SEE (post-shuffle partition sizes).
  * Explicit salting (this module) — handles skew you know about up
    front, works for any join shape AQE can't split (e.g. when the
    skewed side feeds an aggregation on the same key and you want to
    keep one shuffle).

Salting is result-neutral: the skewed side gets a uniform salt in
[0, S); the other side is replicated S× with every salt value; the
equi-join on (key, salt) then produces exactly the plain join's rows,
with the hot key spread over S reducers. The replication cost is
S × |small side| — pick S ≈ observed hot-key multiplicity / target
rows-per-task, and keep the replicated side the SMALL one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from seatunnel_spark.dataops._cache import scoped_persist


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted and `other` replicated.

    `how` supports 'inner' and 'left' (left = skewed side preserved —
    the shapes where per-row salting keeps semantics exact; for right/
    full joins flip the operands). Output columns = skewed's then
    other's non-key columns, like a plain df.join(other, on, how).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = s.join(o, keys + ["__salt"], how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key_col: str, top: int = 10,
                round_to: int = 6) -> DataFrame:
    """Key-skew diagnostic -> `top` rows (key, cnt, share, cum_share,
    skew_ratio, n_keys, entropy_norm): the pre-flight check before
    shuffling on `key_col` — exactly the read that decides between a
    plain join, `salted_join`, and a hot-key cap. Per hot key: its
    row share, the cumulative head share, and skew_ratio =
    cnt / (N / n_keys) (how many times an average reducer's load the
    hottest task would carry). entropy_norm is the normalized Shannon
    entropy of the FULL key distribution (1 = uniform, → 0 = one key
    owns the table), constant across the report's rows.

    Scale: one map-side-combined count per key; the head is a
    distributed TakeOrdered (never a key-cardinality sort); entropy
    folds the (cnt)-table in the same aggregate pass as N and n_keys.
    Deterministic head order: cnt desc, key asc (stringified)."""
    counts = (df.select(F.col(key_col).cast("string").alias("key"))
              .groupBy("key").agg(F.count(F.lit(1)).alias("cnt")))
    counts = scoped_persist(counts)
    tot = counts.agg(
        F.sum("cnt").cast("double").alias("__n"),
        F.count(F.lit(1)).alias("n_keys"),
        # Σ p ln p folded in the same pass; guarded for single-key
        F.sum(F.col("cnt").cast("double")
              * F.log(F.col("cnt").cast("double"))).alias("__slnc"))
    head = (counts.orderBy(F.col("cnt").desc(), F.col("key"))
            .limit(top))
    w = Window.orderBy(F.col("cnt").desc(), F.col("key")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # H = ln N - (1/N) Σ c ln c ; normalized by ln(n_keys)
    ent = F.when(
        F.col("n_keys") > 1,
        (F.log(F.col("__n")) - F.col("__slnc") / F.col("__n"))
        / F.log(F.col("n_keys").cast("double"))).otherwise(F.lit(0.0))
    return (head.join(F.broadcast(tot))
            .select("key", "cnt",
                    F.round(F.col("cnt") / F.col("__n"), round_to)
                    .alias("share"),
                    F.round(F.sum(F.col("cnt")).over(w)
                            / F.col("__n"), round_to)
                    .alias("cum_share"),
                    F.round(F.col("cnt")
                            / (F.col("__n") / F.col("n_keys")),
                            round_to).alias("skew_ratio"),
                    "n_keys",
                    F.round(ent, round_to).alias("entropy_norm")))


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Inner/semi join with a BLOOM PRE-FILTER on the big side —
    the explicit form of the runtime row-level filtering Spark's
    optimizer only applies under its own heuristics. The small side's
    keys are folded into an m_bits Bloom filter (k xxhash64 probes);
    the big side is filtered by the bloom BEFORE its shuffle, so rows
    that cannot possibly join never enter the exchange. With a 1%-ish
    false-positive rate the exchange shrinks to ~|matching| rows — on
    a 100 TB fact table joining a selective dimension, the shuffle is
    the dominant cost and this is the single biggest lever AQE cannot
    always reach (it requires its own thresholds and join shapes).

    Correctness contract: a Bloom filter has NO false negatives, so
    the final equi-join output is EXACTLY the plain join's rows
    (false positives are eliminated by the join itself) — the oracle
    for any query built on this is the plain SQL join.

    Build: NATIVE path first — the small side's xxhash64(key) longs
    feed Spark's JVM `BloomFilter` (a distributed treeAggregate, one
    job), the serialized sketch (m_bits/8 bytes — 128 KiB at the
    default 2^20) becomes ONE binary literal probed by a single
    `might_contain` expression inside whole-stage codegen (the same
    BloomFilterMightContain the optimizer's InjectRuntimeFilter
    emits; it isn't SQL-registered in Spark 4.1, so the Column is
    assembled via ExpressionUtils). Where the classic JVM internals
    are unavailable (e.g. Spark Connect), a PORTABLE fallback builds
    the filter as per-row bit positions -> explode -> bit_or per
    64-bit word and probes a literal array — same contract, bigger
    plan constant.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the default
    (m=2^20 bits, k=4) holds ~1% up to n ≈ 130k distinct keys —
    size m_bits ~ 10-16 bits per expected distinct key."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_prefilter_join supports inner/"
                         f"left_semi, got {how!r}")
    cond = _native_bloom_probe(small, small_key, big_key, m_bits, k)
    if cond is None:
        cond = _portable_bloom_probe(small, small_key, big_key,
                                     m_bits, k)
    filtered = big.filter(F.col(big_key).isNotNull() & cond)
    return filtered.join(small, filtered[big_key] == small[small_key],
                         how)


def _native_bloom_probe(small: DataFrame, small_key: str,
                        big_key: str, m_bits: int, k: int):
    """JVM-native Bloom build + probe -> a boolean Column over
    `big_key`, or None when the classic py4j internals are absent.

    Both sides work in the xxhash64(key) LONG domain so any key type
    (string, long, date...) round-trips through the same
    putLong/mightContainLong pair: the build inserts xxhash64(key)
    via DataFrameStatFunctions.bloomFilter (distributed JVM
    treeAggregate), the probe is BloomFilterMightContain(
    lit(serialized), xxhash64(key)) — one binary literal in the plan
    instead of the portable path's k copies of a words array.
    expectedNumItems is derived as m*ln2/k so the JVM sizing math
    (numHashFunctions = round(m/n * ln2)) lands on exactly `k`."""
    import math

    try:
        from pyspark.sql.classic.column import Column as _Col
        spark = small.sparkSession
        jvm = spark._jvm
        h = (small.filter(F.col(small_key).isNotNull())
             .select(F.xxhash64(small_key).alias("__h")))
        expected = max(1, round(m_bits * math.log(2) / max(k, 1)))
        jbf = h._jdf.stat().bloomFilter("__h", expected, m_bits)
        bos = jvm.java.io.ByteArrayOutputStream()
        jbf.writeTo(bos)
        data = bytes(bos.toByteArray())
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        expr = (jvm.org.apache.spark.sql.catalyst.expressions
                .BloomFilterMightContain(
                    eu.expression(F.lit(bytearray(data))._jc),
                    eu.expression(F.xxhash64(F.col(big_key))._jc)))
        return _Col(eu.column(expr))
    except Exception:  # pragma: no cover - Connect / moved internals
        return None


def _portable_bloom_probe(small: DataFrame, small_key: str,
                          big_key: str, m_bits: int, k: int):
    """Pure-DataFrame Bloom build + literal-array probe (the pre-r10
    path, kept as the Connect-safe fallback): per-row bit positions
    -> explode -> bit_or per 64-bit word (one map-side-combined
    aggregation), the word array collected (m_bits/64 longs) and
    probed with k element_at lookups. Identical no-false-negative
    contract; the literal array is embedded per-probe, so prefer the
    native path where available."""
    words_n = (m_bits + 63) // 64

    def positions(col):
        return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
                for i in range(k)]

    built = (small.select(F.explode(F.array(
                 *positions(F.col(small_key)))).alias("__p"))
             .select((F.col("__p") / 64).cast("long").alias("__w"),
                     F.call_function(
                         "shiftleft", F.lit(1).cast("long"),
                         F.pmod(F.col("__p"), F.lit(64)).cast("int"))
                     .alias("__m"))
             .groupBy("__w").agg(F.bit_or("__m").alias("__bits"))
             .collect())
    arr = [0] * words_n
    for r in built:
        arr[r["__w"]] = r["__bits"]
    bf = F.lit(arr)
    cond = None
    for p in positions(F.col(big_key)):
        word = F.element_at(bf, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            F.pmod(p, F.lit(64)).cast("int"))
        c = word.bitwiseAND(bit) != 0
        cond = c if cond is None else (cond & c)
    return cond
