"""Lexical retrieval over the document corpus: BM25 scoring and
top-k search expressed as pure DataFrame algebra (zero UDF).

Reference parity: the reference ships no retrieval engine — this is
part of the training-data-pipeline surface (corpus triage, RAG
pre-filtering, query-based decontamination) the brief asks for beyond
reference coverage.

Scale shape (100 TB corpus, handful-to-thousands of queries):
  * the corpus is tokenized ONCE (one scan, one (doc, term) partial
    aggregation — map-side combined);
  * the query term table is broadcast, so candidate generation is a
    broadcast hash join against the per-doc term frequencies — the
    corpus-wide posting list is never shuffled on its own;
  * document frequencies are computed corpus-wide but reduced to the
    query vocabulary BEFORE the score join, so the idf side is tiny
    and broadcast too;
  * the only all-corpus shuffle is the (doc_id, doc_len) join — two
    8-byte columns, the minimum any length-normalized scorer needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (id, token): lowercase whitespace tokenization —
    the same split the rest of dataops/text.py uses, so the
    vocabulary agrees across operators."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 matches per query -> (query_id, doc_id, score, rank).

    idf is the Lucene/Robertson variant ln(1 + (N - df + .5)/(df + .5))
    (never negative); tf saturation k1 and length normalization b are
    the standard defaults. The score is rounded BEFORE ranking and
    ties break on doc_id, so rankings are reproducible bit-for-bit
    across engines and summation orders (same convention as
    similarity.brute_force_topk's round_to).

    Per-query ranking is a row_number window: fine while |queries| is
    small relative to cores (the usual case — a query batch probes a
    huge corpus, not the reverse). For a million-query batch, feed the
    scored table through a two-phase top-k instead.
    """
    toks = _tokens(docs, id_col, text_col)
    # tf feeds doc lengths, document frequencies, AND the score join —
    # its exchange is identical in all three subplans, so Catalyst's
    # ReusedExchange materializes it once (verified: a lineage cut
    # here changes nothing).
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # corpus scalars as a broadcast 1-row frame (no driver collect)
    stats = F.broadcast(
        dl.agg(
            F.count("*").cast("double").alias("__n"),
            (F.sum("dl") / F.count("*")).alias("__avgdl"),
        )
    )

    qt = (
        _tokens(queries, query_id, query_text)
        .distinct()
        .withColumnRenamed(query_id, "__qid")
    )
    # document frequency, cut to the query vocabulary before broadcast
    dfreq = (
        tf.join(F.broadcast(qt.select("tok").distinct()), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )

    hits = (
        tf.join(F.broadcast(qt), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .join(stats)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        hits.select(
            "__qid", F.col(id_col), (idf * tf_part).alias("__contrib")
        )
        .groupBy("__qid", id_col)
        .agg(F.round(F.sum("__contrib"), round_to).alias("score"))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"), id_col, "score", "rank"
        )
    )


def rrf_fuse(results: list, k: int = 60, topk: int | None = None,
             round_to: int = 6) -> "DataFrame":
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of ranked result lists sharing the (query_id, match_id,
    rank) schema every topk operator here emits (bm25_topk,
    brute_force_topk, lsh_bucketed_topk, ivf_topk, search_ivf_index)
    -> (query_id, match_id, rrf_score, rank): the standard glue for
    HYBRID search — lexical BM25 + vector ANN — because it needs no
    score calibration between systems, only ranks:
    score(d) = Σ_lists 1/(k + rank_list(d)).

    k=60 is the paper's constant. Ties break on match_id, so the
    fused ranking is reproducible across engines; with two input
    lists the score is a sum of at most two doubles (exactly
    commutative) — for many lists, `round_to` absorbs summation-order
    ulps before ranking (the brute_force_topk convention).

    Scale: inputs are |queries| x k rows — everything here is
    negligible next to the searches that produced them; one
    map-side-combined sum and a per-query window over <= |lists|*k
    rows."""
    from pyspark.sql import Window

    parts = [r.select("query_id", "match_id",
                      (1.0 / (F.lit(k) + F.col("rank"))).alias("__c"))
             for r in results]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    fused = (out.groupBy("query_id", "match_id")
             .agg(F.round(F.sum("__c"), round_to).alias("rrf_score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("match_id").asc())
    fused = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        fused = fused.filter(F.col("rank") <= topk)
    return fused
