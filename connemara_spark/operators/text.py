"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All native expressions (regexp/array functions) —
each is SQL-expressible so every one carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword profiles (public common-word lists). The
# heuristic is argmax of stopword hits per language — the classic cheap
# n-gram/stopword language-ID baseline.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}

# BPE-ish tokenizer regex: words OR single non-word-non-space marks — the
# pre-tokenization split most BPE vocabularies assume.
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_count(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def whitespace_token_count(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(c, r"\s+"))


def stopword_hits(text_col: str | Column, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s stopword list."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.lower(c), r"\s+")
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit counts,
    ties broken by language code order, 'und' when no hits at all."""
    langs = sorted(STOPWORDS)
    scored = df.select(
        "*", *[stopword_hits(text_col, l).alias(f"hits_{l}") for l in langs]
    )
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties → build right-to-left
        pred = F.when(F.col(f"hits_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score in [0, 1].

    Features mirror standard corpus-filtering heuristics: length, mean word
    length, alpha ratio, digit ratio, punctuation ratio, stopword ratio,
    distinct-token ratio. The composite is a fixed linear blend — a
    deterministic stand-in for a learned quality model.
    """
    c = F.col(text_col)
    words = F.split(c, r"\s+")
    n_chars = F.length(c)
    n_words = F.size(words)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    n_stop = stopword_hits(text_col, "en")
    n_distinct = F.size(F.array_distinct(words))

    out = df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_stop / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
        (n_distinct / F.greatest(n_words, F.lit(1))).alias("distinct_ratio"),
        (n_chars / F.greatest(n_words, F.lit(1))).alias("mean_word_len"),
    )
    score = (
        F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.col("alpha_ratio") * 0.25
        + (F.lit(1.0) - F.col("digit_ratio")) * 0.15
        + (F.lit(1.0) - F.col("punct_ratio")) * 0.15
        + F.col("distinct_ratio") * 0.20
    )
    return out.withColumn("quality_score", F.round(score, 6))


def min_shingle_fingerprint(text_col: str | Column, k: int = 5) -> Column:
    """Document fingerprint: lexicographic min of word-k-gram md5s — a
    winnowing-style content fingerprint stable under local edits outside the
    minimal shingle."""
    from connemara_spark.operators.dedup import word_shingles

    shingles = word_shingles(text_col, k)
    return F.array_min(F.transform(shingles, lambda s: F.md5(s)))


def fingerprint_docs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5) -> DataFrame:
    return df.select(
        F.col(id_col),
        min_shingle_fingerprint(text_col, k).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("exact_fingerprint"),
    )
