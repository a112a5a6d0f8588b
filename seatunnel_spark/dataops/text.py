"""Text analysis operators: token counting, quality signals,
language ID, document fingerprinting.

All pure Catalyst expressions (regex + string builtins) — zero Python
in the hot path, so they run at scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null-safe at caller)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy: word pieces + digits + punctuation as
    separate tokens (the regex GPT-style tokenizers use as pre-split)."""
    # contractions | words | numbers | non-space punctuation runs
    pattern = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumns(
        {
            "ws_tokens": token_count(F.col(text_col)),
            "bpe_tokens": bpe_ish_token_count(F.col(text_col)),
        }
    )


# --------------------------------------------------------------------------
# quality signals
# --------------------------------------------------------------------------

_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "as", "was", "with", "be", "by", "on", "not", "he", "this", "are",
]


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style quality columns: length, mean word length,
    punctuation ratio, digit ratio, stopword ratio, uppercase ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    lower_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(F.array_intersect(F.array_distinct(lower_words),
                                         F.array(*[F.lit(s) for s in _STOPWORDS])))
    non_alnum = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_words": n_words,
            "q_mean_word_len": ratio(
                F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)), n_words
            ),
            "q_punct_ratio": ratio(non_alnum, n_chars),
            "q_digit_ratio": ratio(
                F.length(F.regexp_replace(t, r"[^0-9]", "")), n_chars
            ),
            "q_stopword_hits": stop_hits,
            "q_upper_ratio": ratio(
                F.length(F.regexp_replace(t, r"[^A-Z]", "")), n_chars
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single [0,1] score combining the signals (heuristic weights)."""
    sig = quality_signals(df, text_col)
    score = (
        F.least(F.col("q_n_words") / 50.0, F.lit(1.0)) * 0.35
        + F.when((F.col("q_mean_word_len") >= 3) & (F.col("q_mean_word_len") <= 10),
                 0.25).otherwise(0.0)
        + F.when(F.col("q_punct_ratio") <= 0.2, 0.2).otherwise(0.0)
        + F.least(F.col("q_stopword_hits") / 5.0, F.lit(1.0)) * 0.2
    )
    return sig.withColumn("quality_score", F.round(score, 4))


# --------------------------------------------------------------------------
# language id (n-gram/stopword heuristic)
# --------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "con", "por"],
    "it": ["il", "che", "di", "non", "una", "per", "sono", "con"],
}


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID — argmax over marker-word hit counts.

    Ties and zero-evidence fall back to 'und' (undetermined), matching
    fastText-style labels. Pure Catalyst: one lower+split, one
    array_intersect per language.
    """
    words = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    scores = [
        F.struct(
            F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers]))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, markers in _LANG_MARKERS.items()
    ]
    # array_max over structs orders by first field (hits) then code — the
    # code tiebreak is alphabetical-max; deterministic either way.
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")),
    )


# --------------------------------------------------------------------------
# fingerprinting
# --------------------------------------------------------------------------

def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    strip punctuation, md5. Stable across engines (DuckDB-replayable) —
    the canonical key for exact-dup detection after formatting noise."""
    t = F.col(text_col)
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(t), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return df.withColumn(out_col, F.md5(normalized))
