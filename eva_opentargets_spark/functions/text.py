"""Text-analysis functions for the training-data pipeline: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

These are engine-new (the reference has no document-quality surface) but are
first-class operators for a 100 TB corpus pipeline. All are native column
expressions (JVM-side, codegen-friendly); each has a DuckDB-oracle twin in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language marker-word profiles for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "y", "es"],
}


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: split on word/number/punct boundaries —
    a regex stand-in for a real tokenizer, counted JVM-side."""
    pieces = F.split(col, r"(?<=[a-z0-9])(?=[^a-z0-9 ])|(?<=[^a-z0-9 ])(?=[a-z0-9])| ")
    return F.size(F.filter(pieces, lambda p: p != ""))


def lang_score(col: Column, lang: str) -> Column:
    """Fraction of whitespace tokens that are marker words for `lang`."""
    markers = LANG_MARKERS[lang]
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(col: Column) -> Column:
    """Argmax of marker-word profile scores, alphabetical tie-break."""
    best = None
    best_score = None
    for lang in sorted(LANG_MARKERS):
        s = lang_score(col, lang)
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return best


def quality_score(col: Column) -> Column:
    """Length/stopword-ratio quality heuristic in [0, 1]:
    0.5 * min(1, n_tokens/20) + 0.5 * (1 - stopword_ratio)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "is"))) / F.greatest(n, F.lit(1))
    return 0.5 * F.least(F.lit(1.0), n / F.lit(20.0)) + 0.5 * (1 - stop_ratio)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — exact-dedup key (content-defined, engine-portable)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def rolling_fingerprint(col: Column, k: int = 8) -> Column:
    """Rolling-hash document fingerprint (winnowing-style): the minimum
    md5 over all character k-grams. Robust to content reordering at the
    document level (any shared k-gram window can supply the minimum), the
    way shingle-min fingerprints behave; md5 keeps it engine-portable
    (DuckDB twin in the text_stats oracle). All JVM-side: sequence +
    transform + array_min, no UDF."""
    n_grams = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(col.substr(i, F.lit(k))),
        )
    )
