"""Text-analysis column functions for the documents table.

All JVM-side built-ins (whole-stage codegen, no Python in the hot
path) — the training-data-pipeline extension of the reference's string
toolbox (compound keys via concat, DeduplicationProvider.kt:44;
deterministic ids via hashing replacing UUIDv4, :43).

Every function returns a Column, so they compose into any query and
keep Catalyst free to prune/push down around them.


SCOPE — Latin-script kernel: normalize() keeps [a-z0-9] only, and every
regex here uses Java's ASCII \\w/\\b. This is the deliberate,
cross-engine-exact contract shared verbatim with the DuckDB oracle
twins (_NORM_SQL) across the query registry — NOT a universal
tokenizer. CJK and other non-Latin scripts normalize to '' (so
fingerprints/quality scores are meaningless for them); a production
multilingual pipeline plugs a segmenter in ahead of these kernels.
Known cross-engine-consistent edges, relied on by the oracles: empty
text tokenizes to [''] (token_count 1), and punct_ratio on empty text
is NULL (0/0) in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword kernels for the n-gram language heuristic.
# Public knowledge (standard stopword lists).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "los", "una"),
    "zh": ("的", "是", "了", "在", "我"),
}


def normalize(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form used for fingerprints and shingles."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize(col), r" ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def word_regex_count(col: Column | str) -> Column:
    """BPE-ish token count: word pieces plus standalone punctuation
    (`\\w+` or single non-space symbol) — a cheap proxy for tokenizer
    budget accounting at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation/symbols (quality
    signal: high ratio → boilerplate/markup)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.length(c)


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of stopword occurrences for one language."""
    c = F.col(col) if isinstance(col, str) else col
    words = "|".join(LANG_STOPWORDS[lang])
    return F.regexp_count(F.lower(c), F.lit(rf"\b({words})\b"))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + word shape.

    Deterministic, per-row double arithmetic only (safe for the
    oracle). Mirrors the shape of published pipeline heuristics
    (C4/Gopher-style length & symbol filters).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    nw = token_count(c)
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    wordiness = F.least(nw / F.lit(100.0), F.lit(1.0))
    mean_wl = n / (nw + F.lit(1))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + wordiness + wl_ok) / F.lit(3.0)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (the exact-dup key; the reference's deterministic-id discipline
    applied to content instead of attempts)."""
    return F.md5(normalize(col))


def dsir_bucket(col: Column | str) -> Column:
    """DSIR hashed-unigram feature bucket: first 2 hex chars of the
    token's md5 (256 buckets, DuckDB twin substr(md5(w),1,2)) — THE
    featurization `dsir_importance_weights` and `source_token_drift`
    both build on; one definition so their documented equivalence
    cannot drift."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("binary")), 1, 2)


def bigrams(col: Column | str) -> Column:
    """Adjacent-token bigram array ("w1 w2") over a token-array column
    — empty for arrays shorter than 2 (never build the raw sequence on
    a short array: sequence(1, 0) DESCENDS). THE shared kernel behind
    every bigram query (top-bigrams, lift, novelty, Zipf, Heaps,
    coverage), one definition so the derivation cannot drift between
    them. DuckDB twin: list_transform(range(1, len(t)),
    i -> t[i] || ' ' || t[i+1])."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(c) - 1),
        lambda i: F.concat(F.element_at(c, i), F.lit(" "),
                           F.element_at(c, i + 1)))
    return F.when(F.size(c) >= 2, grams) \
            .otherwise(F.array().cast("array<string>"))
