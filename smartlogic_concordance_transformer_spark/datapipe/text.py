"""Text analysis: language-ID, quality scoring, token counting, document
fingerprinting. All native Column expressions (codegen, oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword dictionaries for the n-gram/stopword-hit
# heuristic. Deliberately small: language ID at corpus scale is a
# ratio-of-hits argmax, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "y", "de", "que", "en", "un", "una", "por"],
}


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " "))), r"\s+")


def token_count(text: Column | str, bpe_like: bool = False) -> Column:
    """Whitespace token count; bpe_like additionally splits punctuation
    and camelCase-ish boundaries (a cheap BPE proxy: count of regex
    word-pieces)."""
    c = F.col(text) if isinstance(text, str) else text
    if bpe_like:
        pieces = F.regexp_replace(
            F.regexp_replace(c, r"([a-z])([A-Z])", r"$1 $2"),
            r"([\p{L}\p{N}]+|[^\p{L}\p{N}\s])",
            r"$1 ",
        )
        return F.size(F.split(F.trim(F.regexp_replace(pieces, r"\s+", " ")), " "))
    return F.size(F.split(F.trim(c), r"\s+"))


def detect_language(text: Column | str) -> Column:
    """Argmax over stopword-hit counts; 'und' (undetermined) when nothing
    hits. One pass, no UDF: array_intersect against literal dictionaries."""
    toks = F.array_distinct(_tokens(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier dict entries win ties (deterministic)
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band, alpha ratio,
    stopword presence, mean word length sanity. Mirrors the usual
    pretraining-corpus filters (C4-style) as pure SQL."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    toks = _tokens(c)
    n_words = F.size(toks)
    alpha_ratio = F.length(F.regexp_replace(c, r"[^\p{L}]", "")) / F.greatest(n_chars, F.lit(1))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    )
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    len_ok = F.when((n_chars >= 200) & (n_chars <= 100000), 1.0).otherwise(
        F.when(n_chars >= 50, 0.5).otherwise(0.0)
    )
    word_len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.0)
    stop_ok = F.when(stop_hits >= 2, 1.0).otherwise(F.when(stop_hits >= 1, 0.5).otherwise(0.0))
    alpha_ok = F.when(alpha_ratio >= 0.6, 1.0).otherwise(F.when(alpha_ratio >= 0.4, 0.5).otherwise(0.0))
    return ((len_ok + word_len_ok + stop_ok + alpha_ok) / 4).cast("double")


# PII scrub patterns, applied in this order. Deliberately restricted to
# regex constructs shared by Java regex (Spark) and RE2 (DuckDB oracle):
# no backreferences, no lookaround — so the oracle can replicate exactly.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CC>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"(\+\d{1,2}[ ]?)?(\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Redact emails, credit cards, SSNs, IPv4s, phone numbers with typed
    placeholder tokens — the standard pretraining-corpus hygiene pass.
    Chained native ``regexp_replace`` (global), zero UDF: at 100 TB this
    stays inside whole-stage codegen, one projection, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_stats(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Gopher-style repetition filter inputs (Rae et al. 2021, app. A1):
    per document, the duplicate-word fraction and the fraction of all
    word n-grams taken by the single most frequent n-gram. High values
    flag boilerplate/spam/keyword-stuffed documents before pretraining.

    Plan: ONE corpus scan, zero joins. The duplicate-word fraction is
    in-row array math and rides through the gram explode as an 8-byte
    grouping key, so the whole operator is explode -> groupBy(key, frac,
    gram) count -> groupBy(key, frac) max/sum — both aggregations
    partially aggregate map-side; payloads are counts. Grams come from
    the same ``shingles`` builder the dedup/decontamination operators
    use (``distinct=False``), so gram semantics cannot drift between
    operators.

    Returns (key, dup_word_frac, top_ngram_frac), both rounded to 6.
    """
    from .dedup import shingles

    c = F.col(text_col)
    words = F.split(F.trim(F.lower(F.regexp_replace(c, r"\s+", " "))), " ")
    total = F.size(words)
    distinct = F.size(F.array_distinct(words))
    dup = F.round((total - distinct) / F.greatest(total, F.lit(1)), 6)
    exploded = df.select(
        key_col,
        dup.alias("dup_word_frac"),
        F.explode(shingles(c, k=n, word_grams=True, distinct=False)).alias("_g"),
    )
    return (
        exploded.groupBy(key_col, "dup_word_frac", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key_col, "dup_word_frac")
        .agg(F.round(F.max("_c") / F.sum("_c"), 6).alias("top_ngram_frac"))
        .select(key_col, "dup_word_frac", "top_ngram_frac")
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: sha256 over the
    whitespace/case-normalized text — the content identity used by exact
    dedup and the lineage ledger."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))), 256)


def winnowing_fingerprints(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): min hash per sliding window
    over char k-gram hashes — a robust partial-overlap fingerprint set.
    Native: two nested transforms over sequences + array_min + distinct."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.regexp_replace(c, r"\s+", " "))
    n_grams = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.xxhash64(F.substring(norm, i, k))
    )
    n_windows = F.greatest(F.size(gram_hashes) - F.lit(window - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(gram_hashes, i, window)),
        )
    )
