"""Probabilistic record linkage (Fellegi & Sunter 1969).

Entity resolution across two tables that share no reliable key — the
master-data step a training-data pipeline needs when the same entity
arrives from multiple feeds (two CRM extracts, crawl metadata vs a
catalog). Every pair gets a LOG-LIKELIHOOD score: per field, agreement
contributes log2(m/u) and disagreement log2((1-m)/(1-u)), where m is
the probability the field agrees on a TRUE match and u on a random
non-match. Scores are additive under field independence (the naive-
Bayes assumption the original paper makes explicitly), so the score is
a pure codegen projection — no Python in the hot path.

Scale shape: candidate pairs come from BLOCKING (equi-join on cheap
deterministic keys), never a cross join — the same discipline as the
dedup family's LSH buckets. Cost is Σ block², bounded by the
`max_block` hot-block cap (shared _cap_buckets semantics). All field
comparators are Catalyst expressions; with e exact comparators the
score is replayable in any SQL engine, which is what the DuckDB
oracle does.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["link_score_pairs", "link_field_weights",
           "golden_records"]


def link_field_weights(fields: dict[str, tuple[float, float]]
                       ) -> dict[str, tuple[float, float]]:
    """(m, u) per field -> (agree_weight, disagree_weight) in log2 —
    exposed so callers can inspect/report the weight table the score
    uses. Raises on degenerate probabilities (m <= u would invert the
    evidence; 0/1 would produce infinities)."""
    out = {}
    for col, (m, u) in fields.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"field {col!r}: need 0 < u < m < 1, got m={m}, u={u}")
        out[col] = (math.log2(m / u),
                    math.log2((1.0 - m) / (1.0 - u)))
    return out


def link_score_pairs(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    block_cols: list[str],
    fields: dict[str, tuple[float, float]],
    threshold: float = 0.0,
    max_block: int | None = 100_000,
    round_to: int = 4,
) -> DataFrame:
    """Fellegi-Sunter pair scores -> (id_a, id_b, n_agree, score):
    block-join `a` x `b` on `block_cols`, compare each field in
    `fields` (null-safe EXACT equality after the caller's own
    normalization — pass pre-lowered/trimmed columns), sum the log2
    agreement/disagreement weights, keep pairs with score >=
    `threshold`. A NULL on either side contributes 0 (no evidence),
    the standard treatment.

    Scale: one equi-join on the block keys (both sides shuffle once
    on cheap keys); `max_block` drops blocks whose a-side or b-side
    exceeds the cap (a degenerate block key — e.g. a null-ish city —
    would otherwise go quadratic), the _cap_buckets discipline. The
    score itself is a pure codegen projection over the joined rows.
    Weights are Python-computed literals (log2 of the caller's m/u),
    so the whole comparison replays in SQL for the oracle."""
    from seatunnel_spark.dataops.dedup import _cap_buckets

    weights = link_field_weights(fields)
    cols = list(fields)
    aa = a.select(F.col(id_a).alias("id_a"),
                  *[F.col(c).alias(f"__a_{c}") for c in cols],
                  *[F.col(c) for c in block_cols])
    bb = b.select(F.col(id_b).alias("id_b"),
                  *[F.col(c).alias(f"__b_{c}") for c in cols],
                  *[F.col(c) for c in block_cols])
    aa = _cap_buckets(aa, block_cols, max_block)
    bb = _cap_buckets(bb, block_cols, max_block)
    j = aa.join(bb, block_cols)

    def field_term(c: str) -> tuple[Column, Column]:
        av, bv = F.col(f"__a_{c}"), F.col(f"__b_{c}")
        wa, wd = weights[c]
        agree = av == bv
        term = (F.when(av.isNull() | bv.isNull(), F.lit(0.0))
                .when(agree, F.lit(wa)).otherwise(F.lit(wd)))
        hit = (F.when(av.isNull() | bv.isNull(), F.lit(0))
               .when(agree, F.lit(1)).otherwise(F.lit(0)))
        return term, hit

    terms = [field_term(c) for c in cols]
    score = terms[0][0]
    hits = terms[0][1]
    for t, h in terms[1:]:
        score = score + t
        hits = hits + h
    return (j.select("id_a", "id_b", hits.alias("n_agree"),
                     F.round(score, round_to).alias("score"))
            .filter(F.col("score") >= threshold))


def golden_records(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: str,
    fields: list[str] | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Survivorship after linkage -> one GOLDEN record per matched
    cluster: link pairs become connected components
    (dedup.duplicate_clusters — transitive matches fuse), then each
    field independently survives as the value from the LATEST
    (order_col, id) row where that field is NON-NULL — the standard
    master-data rule (a stale row's phone fills a fresh row's null,
    but a fresh non-null always wins). Output: (cluster_id,
    n_members, <fields...>), cluster_id = the cluster's minimum id;
    unmatched records pass through as 1-member clusters.

    Scale: the pair graph is near-duplicate-shaped (tiny components),
    so the CC converges in 2-3 label rounds; survivorship is ONE
    map-side-combined max_by aggregation per field over |records|
    rows keyed by cluster — no window, no per-cluster sort. The
    (order_col, id) struct key makes every pick deterministic even
    under order ties, so SQL engines replay it (arg_max over the
    same tuple)."""
    from seatunnel_spark.dataops.dedup import duplicate_clusters

    if fields is None:
        fields = [c for c in records.columns
                  if c not in (id_col, order_col)]
    clusters = duplicate_clusters(pairs, id_a, id_b)
    r = (records.join(
            clusters.withColumnRenamed("id", id_col), [id_col], "left")
         .withColumn("__cid", F.coalesce("cluster_id", F.col(id_col))))
    key = F.struct(F.col(order_col).alias("o"),
                   F.col(id_col).alias("i"))
    aggs = [F.count(F.lit(1)).alias("n_members")]
    for c in fields:
        aggs.append(F.max_by(
            F.col(c),
            F.when(F.col(c).isNotNull(), key)).alias(c))
    return (r.groupBy(F.col("__cid").alias("cluster_id"))
            .agg(*aggs))
