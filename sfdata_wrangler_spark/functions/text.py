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
# language-ID heuristic. Chosen to be high-frequency and disjoint;
# matched as whole tokens of the normalized text.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "que", "los"],
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


def token_count_from_tokens(col: Column) -> Column:
    """:func:`token_count` over an ALREADY-split token array
    (``split(normalize_text(text), ' ')``). An empty text normalizes
    to the single-element array [''] — that case must count 0, same
    as token_count's length-0 guard; every other array counts its
    size. Bit-identical to token_count(text) by construction; lets a
    pipeline that materialized the tokens skip the normalize regex."""
    return (
        F.when(
            (F.size(col) == 1) & (F.element_at(col, 1) == ""), F.lit(0)
        )
        .otherwise(F.size(col))
        .cast("bigint")
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are . , ; : ! or ?"""
    stripped = F.regexp_replace(col, r"[.,;:!?]", "")
    return F.when(F.length(col) > 0, (F.length(col) - F.length(stripped)) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_hits(col: Column, words: list[str]) -> Column:
    """Count of tokens that belong to ``words``: ONE normalize+split
    per row, then a linear array filter. (The padded-replace idiom
    this replaced re-evaluated the normalize chain ~2x per marker
    word — 20 regex passes per row for 10 stopwords, measured 8x
    slower — and undercounted consecutive marker words to boot.)"""
    toks = F.split(normalize_text(col), " ")
    return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("bigint")


def stopword_ratio(col: Column) -> Column:
    """Share of tokens that are top-10 English stopwords."""
    hits = stopword_hits(col, EN_STOPWORDS)
    return F.when(
        token_count(col) > 0, hits / token_count(col)
    ).otherwise(F.lit(0.0))


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
    """Marker-token hit count for one language (single split + array
    filter, same one-pass shape as :func:`stopword_hits`)."""
    return stopword_hits(col, LANG_MARKERS[lang])


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

    Built from built-in array functions — no UDF, so shingling runs
    inside codegen at 100 TB scale. Construction is n-1 ``zip_with``
    merges against the k-shifted token array (linear in tokens), NOT
    ``transform(sequence(...), i -> slice(...))``: a Generate that
    explodes a transform-built array re-evaluates the generator
    expression per emitted row, turning each document quadratic in
    its token count (measured 11x slower at 5k docs; far worse on
    10k-token web pages)."""
    toks = F.split(normalize_text(col), " ")
    size = F.size(toks)
    out = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(size - k, F.lit(0))
        )
        out = F.zip_with(
            out,
            shifted,
            lambda x, y: F.when(
                y.isNotNull() & x.isNotNull(),
                F.concat(x, F.lit(" "), y),
            ),
        )
    return F.filter(out, lambda p: p.isNotNull())
