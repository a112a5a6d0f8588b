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
