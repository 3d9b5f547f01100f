"""Text-analysis column functions for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all pure
Column expressions over the ``documents`` table so they stay JVM-side
and scale linearly with no shuffle.

Oracle-compatibility note: every function here is written so an
equivalent ANSI-SQL expression exists for the DuckDB oracle (no
Spark-specific hash functions in results; md5 only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Chosen to be high-frequency and disjoint.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " que ", " los "],
}

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def norm_key(col: Column) -> Column:
    """Canonical dedup key: md5 of normalized text (exact-dup hash)."""
    return F.md5(normalize_text(col))


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = normalize_text(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    ).cast("bigint")


def _occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of a literal substring via length arithmetic —
    deliberately replace()-based so DuckDB computes it identically."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are . , ; : ! or ?"""
    stripped = F.regexp_replace(col, r"[.,;:!?]", "")
    return F.when(F.length(col) > 0, (F.length(col) - F.length(stripped)) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column) -> Column:
    """Share of tokens that are top-10 English stopwords."""
    t = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    hits = None
    for w in EN_STOPWORDS:
        occ = _occurrences(t, f" {w} ")
        hits = occ if hits is None else hits + occ
    return F.when(token_count(col) > 0, hits / token_count(col)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-range length,
    sane punctuation density, and natural stopword frequency."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    from .metrics import portable_round
    return portable_round((len_ok + punct_ok + stop_ok) / 3.0, 4)


def lang_score(col: Column, lang: str) -> Column:
    """Marker-hit count for one language over normalized text."""
    t = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    score = None
    for marker in LANG_MARKERS[lang]:
        occ = _occurrences(t, marker)
        score = occ if score is None else score + occ
    return score


def lang_id(col: Column) -> Column:
    """Argmax language over marker scores; 'und' when all zero.
    Deterministic tie-break: language list order en>fr>de>es."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = None
    expr = F.lit("und")
    # Build a when-ladder: en wins ties by being tested first against
    # the running max of the others.
    langs = list(LANG_MARKERS)
    maxscore = scores[langs[0]]
    for lang in langs[1:]:
        maxscore = F.greatest(maxscore, scores[lang])
    for lang in langs:
        cond = (scores[lang] == maxscore) & (maxscore > 0)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def doc_fingerprint(col: Column, prefix_tokens: int = 32) -> Column:
    """Locality-insensitive fingerprint: md5 over the first N
    normalized tokens — a cheap rolling-hash stand-in that catches
    shared-prefix boilerplate duplicates."""
    t = normalize_text(col)
    head = F.array_join(F.slice(F.split(t, " "), 1, prefix_tokens), " ")
    return F.md5(head)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of word n-gram shingle strings over normalized text.

    Built from built-in array functions (transform over token index) —
    no UDF, so shingling runs inside codegen at 100 TB scale.
    """
    toks = F.split(normalize_text(col), " ")
    count = F.size(toks) - (n - 1)
    shingled = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(count >= 1, shingled).otherwise(
        F.array().cast("array<string>")
    )
