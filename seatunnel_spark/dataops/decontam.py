"""Benchmark decontamination — flag training documents that share long
word n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (the 13-gram collision rule from
the GPT-3/PaLM data cards): any training doc containing an exact
13-gram that also appears in a benchmark document is flagged (or
dropped) before training.

100 TB design: the benchmark side is SMALL (eval suites are MBs, the
corpus is TBs) — its distinct n-gram set is built once and broadcast,
so the corpus-side pass is scan + explode + broadcast-hash-semi-join
with NO corpus shuffle. Corpus n-grams are never collected or grouped;
each doc's grams stream through the join and aggregate back to one row
per doc (partial map-side count). A corpus-vs-corpus variant would
instead shuffle on the gram hash — that's `dedup.ngram_jaccard_pairs`'
territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_ngrams(text: F.Column, n: int) -> F.Column:
    """Whitespace-token word n-grams as an array<string> column.

    Pure Catalyst: split + sequence + slice/array_join — no UDF. Docs
    shorter than n words yield an empty array (sequence(1, k) with
    k < 1 would count DOWN in Spark, hence the explicit guard).
    """
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def benchmark_ngram_set(bench: DataFrame, text_col: str = "text",
                        n: int = 13) -> DataFrame:
    """Distinct n-grams of the benchmark set — one column `gram`."""
    return (bench
            .select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
            .distinct())


def flag_contaminated(docs: DataFrame, bench: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 13) -> DataFrame:
    """-> (id, ngram_hits, contaminated) — ngram_hits counts DISTINCT
    benchmark n-grams found in the doc.

    The benchmark gram set is broadcast; the corpus side is a single
    scan with an exploded broadcast join, aggregated back per doc.
    """
    grams = (docs
             .select(F.col(id_col),
                     F.explode_outer(word_ngrams(F.col(text_col), n))
                     .alias("gram")))
    bset = F.broadcast(benchmark_ngram_set(bench, text_col, n))
    hits = (grams
            .join(bset, "gram", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("ngram_hits")))
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("ngram_hits", F.lit(0)).alias("ngram_hits"),
                    (F.coalesce("ngram_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


__all__ = ["word_ngrams", "benchmark_ngram_set", "flag_contaminated"]
