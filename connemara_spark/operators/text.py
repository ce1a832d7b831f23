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


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


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


def _dup_gram_frac(words: Column, n: int) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram —
    the Gopher-style repetition signal. One O(len) pass: the incoming
    ``words`` expression is ``bind_array``-ed (an unbound split would
    re-tokenize inside every gram lambda, O(len²)), the gram array is
    built once, and total vs distinct counts compare (never per-gram
    rescans)."""
    from connemara_spark.functions.arrays import bind_array

    def frac(w: Column) -> Column:
        cnt = F.size(w) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
        return F.when(
            cnt > 0,
            (cnt - F.size(F.array_distinct(grams))).cast("double") / cnt,
        ).otherwise(F.lit(0.0))

    return bind_array(words, frac)


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_word_max: float = 0.20,
    dup_2gram_max: float = 0.35,
) -> DataFrame:
    """Repetition-based quality filters in the style of the Gopher /
    MassiveText rules: documents dominated by one word or by repeated
    phrases are low-quality (boilerplate, spam, generator loops).

    - ``top_word_frac``  — occurrences of the most frequent word / n_words,
      computed by explode → (doc, word) count → per-doc max: two partial-
      aggregated shuffles on the doc key, the scalable idiom (no O(n·d)
      per-row HOF rescans).
    - ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of word n-grams
      that repeat, one array pass each.
    - ``repetition_flag`` — true when either signal crosses its threshold.
    """
    words = F.split(F.col(text_col), " ")
    ex = df.select(F.col(id_col).alias("__id"), F.explode(words).alias("w"))
    top = (
        ex.groupBy("__id", "w")
        .count()
        .groupBy("__id")
        .agg(F.max("count").alias("__max_c"), F.sum("count").alias("__n_words"))
    )
    base = df.select(
        "*",
        (F.size(words)).alias("n_words"),
        F.round(_dup_gram_frac(words, 2), 6).alias("dup_2gram_frac"),
        F.round(_dup_gram_frac(words, 3), 6).alias("dup_3gram_frac"),
    )
    out = base.join(top, base[id_col] == top["__id"], "left").select(
        base["*"],
        F.round(
            F.coalesce(F.col("__max_c").cast("double") / F.col("__n_words"), F.lit(0.0)), 6
        ).alias("top_word_frac"),
    )
    return out.withColumn(
        "repetition_flag",
        (F.col("top_word_frac") > top_word_max) | (F.col("dup_2gram_frac") > dup_2gram_max),
    )


# PII redaction patterns. Deliberately restricted to the regex subset that
# behaves identically in Java regex (Spark) and RE2 (DuckDB/Go tooling):
# no lookaround, no backrefs, character classes + bounded repetition only —
# so the redaction a 100 TB Spark job applies is reproducible by any
# RE2-based auditor. Order matters: emails before URLs before IPs before
# bare digit runs (each later pattern could partially match an earlier
# category's text).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("digit_run", r"[0-9]{7,}", "<NUM>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact common PII shapes (emails, URLs, IPv4s, long digit runs) with
    typed placeholder tokens, plus per-category match counts taken on the
    ORIGINAL text (categories may overlap; counts are independent signals).

    All native ``regexp_replace`` / ``regexp_extract_all`` — JVM-side,
    codegen-friendly, no UDFs in the redaction hot path.
    """
    cleaned = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, token)
    return df.select(
        "*",
        cleaned.alias(out_col),
        *[
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    )


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


# ---------------------------------------------------------------------------
# Mojibake repair (ftfy-class encoding fixes, fully native)
# ---------------------------------------------------------------------------

# The dominant real-world corruption: UTF-8 bytes decoded as Windows-1252
# ("é" -> "Ã©", "—" -> "â€”"). The repair table is GENERATED, not
# hand-written: for each target char, bad = char.encode('utf-8')
# .decode('cp1252'); chars whose UTF-8 bytes hit CP1252's five unmapped
# codes (0x81 8D 8F 90 9D — e.g. U+201D) are skipped automatically.
# Repair is a chain of native replace()s — portable verbatim to any SQL
# engine, so the oracle runs the IDENTICAL chain.
_MOJIBAKE_TARGETS = (
    "‘’“–—…€«»°£"
    "éèêàáâäçíïñ"
    "óöúüß"
)


def mojibake_pairs() -> list[tuple[str, str]]:
    """(corrupted, repaired) pairs, longest-corruption-first then lexical —
    a deterministic order shared by the Spark chain and the SQL oracle."""
    pairs = []
    for ch in _MOJIBAKE_TARGETS:
        try:
            bad = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue  # UTF-8 byte lands on an unmapped CP1252 code
        pairs.append((bad, ch))
    return sorted(pairs, key=lambda p: (-len(p[0]), p[0]))


def repair_mojibake(text_col: str | Column) -> Column:
    """Native replace-chain repair of UTF-8-as-CP1252 mojibake. O(pairs)
    scans per value, all JVM-side; idempotent on clean text (repaired
    output contains none of the corruption patterns)."""
    col = _col(text_col)
    for bad, good in mojibake_pairs():
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def mojibake_marker_count(text_col: str | Column) -> Column:
    """Occurrences of the CP1252 misdecode lead characters ('Ã' for 2-byte
    UTF-8, 'â' for 3-byte, 'Â' for stray NBSP-class bytes) — the cheap
    detection gate a curation pass thresholds on before paying for repair."""
    col = _col(text_col)
    total = F.lit(0)
    for marker in ("Ã", "â", "Â"):
        total = total + (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
    return total


def mojibake_sql_chain(inner: str) -> str:
    """The SAME repair chain rendered as nested SQL replace() calls —
    the oracle-side twin of repair_mojibake."""
    expr = inner
    for bad, good in mojibake_pairs():
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        expr = f"replace({expr}, '{b}', '{g}')"
    return expr


def compression_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    level: int = 6,
    n_partitions: int | None = None,
) -> DataFrame:
    """zlib-compressibility quality signal — the classic cheap proxy for
    boilerplate/repetition (highly templated or looping text compresses
    far below natural prose; near-random noise barely compresses at all).
    Quality pipelines gate on both tails.

    This is the module's one Arrow-batched python stage (DEFLATE has no
    Catalyst expression); the kernel is bytes-in/ints-out per row, so the
    batch shape is exactly where a JVM codec would slot in. Determinism
    caveat: compressed LENGTH is a function of the zlib build — pin one
    zlib version fleet-wide (the oracle recomputes with the same CPython
    zlib, making the check cross-implementation but same-library).
    """
    src = df.select(id_col, text_col)
    if n_partitions:
        src = src.repartition(n_partitions)

    def feats(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            out = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                raw = (txt or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                out.append(
                    (
                        int(did),
                        len(raw),
                        len(comp),
                        len(comp) / len(raw) if raw else 0.0,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_raw", "n_zlib", "compress_ratio"]
            )

    return src.mapInPandas(
        feats, "doc_id long, n_raw long, n_zlib long, compress_ratio double"
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / long-context
    preprocessing shape): whitespace-token windows of ``size`` tokens
    advancing by ``size - overlap``, the final window allowed short.

    Returns (id_col, chunk_id 1-based, chunk). Chunk boundaries are a pure
    function of the text, so re-chunking a re-crawled corpus yields
    identical ids — downstream dedup/embedding caches stay valid.

    Plan shape: one ``sequence`` of window starts posexploded per document
    (no higher-order-function lambda references the word array, so the
    split is evaluated at most twice per row — the O(n^2) producer-tree
    substitution trap documented in operators/dedup.py never arises), then
    one ``slice`` + ``array_join`` per chunk. Empty/whitespace-only texts
    yield exactly one chunk (their degenerate window) rather than
    disappearing — a chunker that silently drops rows would break
    join-back accounting.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    step = size - overlap
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            words.alias("__w"),
            F.posexplode(starts).alias("__pos", "__st"),
        )
        .select(
            F.col(id_col),
            (F.col("__pos") + 1).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__w"), F.col("__st"), F.lit(size)), " "
            ).alias("chunk"),
        )
    )
