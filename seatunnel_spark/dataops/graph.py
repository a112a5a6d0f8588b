"""Iterative graph analytics as DataFrame algebra: PageRank.

Reference parity: the reference has no graph engine; this extends the
training-data-pipeline surface (site/source importance weighting for
crawl corpora, citation-graph scoring) the brief asks for.

Scale shape: each PageRank iteration is exactly one shuffle of
(dst, contribution) pairs — the edge list itself is never moved after
the first degree join, and ranks are a |V|-row table, never collected
to the driver. Dedup-ed edges + out-degrees are computed once and
reused across iterations (cache-friendly; at cluster scale persist
`edges` and `deg` or write them bucketed by src so every iteration's
rank join co-locates without reshuffling the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
    dedupe: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Nodes are the union of endpoints; initial rank is 1/N. Each
    iteration computes r'(v) = (1-d)/N + d * sum over in-edges u->v of
    r(u)/outdeg(u); nodes with no out-edges (dangling) simply leak
    their mass, the classic simplification — feed a symmetrized edge
    list if you need mass conservation. Ranks are rounded to
    `round_to` after every iteration so fixed-iteration runs are
    reproducible bit-for-bit across engines and summation orders
    (same convention as embeddings.kmeans_fit).
    """
    # The deduped edge list feeds degree, the node set, and every
    # iteration: cut lineage so upstream joins/distinct run ONCE
    # instead of once per consumer (same convention as
    # dedup.minhash_lsh_pairs; at cluster scale persist or write the
    # edge list bucketed by src instead). Pass dedupe=False when the
    # input is already distinct — e.g. deduped upstream on narrower
    # pre-stringified keys — to skip a full edge shuffle.
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    if dedupe:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select("__dst"))
        .distinct()
    )
    deg = e.groupBy("__src").agg(F.count("*").alias("__deg"))
    n1 = F.broadcast(nodes.agg(F.count("*").cast("double").alias("__n")))
    ranks = nodes.join(n1).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            e.join(deg, "__src")
            .join(ranks.withColumnRenamed("node", "__src"), "__src")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .join(n1)
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
        )
    return ranks
