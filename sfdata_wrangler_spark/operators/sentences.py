"""Sentence segmentation and sentence-aware chunking.

Token-window chunking (operators/chunking.py) cuts mid-sentence;
retrieval quality measurably prefers chunks aligned to sentence
boundaries. Segmentation here is the deterministic regex kind
(terminal punctuation followed by whitespace), built WITHOUT
lookbehind so the construction stays inside the Java∩RE2 subset the
oracles require: a marker character is inserted after terminators
(three capture-free replaces — portable, unlike ``$1``/``\\1``
replacement syntax which differs between engines), then one split.
Abbreviation handling ("Dr. Smith") is out of scope for the regex
tier — the downstream stats are robust to occasional over-splits.

Chunk assembly: per document, sentences pack into chunks by their
EXCLUSIVE prefix token count div budget — one window pass, no
sequential scan. Semantics (deliberate, documented): every chunk
holds consecutive whole sentences; a chunk's token count can exceed
the budget by at most its boundary sentence (the greedy
close-the-chunk-early variant needs per-row state; this div rule is
the order-free formulation, same trade as packing.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

_MARK = "\x1f"
_ESC = "\x1e"


def split_sentences(col: Column) -> Column:
    """Text → array of trimmed sentences (empty sentences dropped at
    use sites via filter; terminal punctuation kept with its
    sentence).

    A literal 0x1F in the input (plausible in crawl data) would
    otherwise read as a sentence boundary and skew chunk/token
    counts — and simply stripping it (the r4 fix) silently mutated
    document content (ADVICE r5). Content-preserving scheme instead:
    escape the escape byte (0x1E → 0x1E'0') and the marker
    (0x1F → 0x1E'1') before boundary markers are inserted, then
    unescape inside each split sentence. All literal replaces plus
    capture-free regex inserts — portable between Java and RE2. TWO
    oracle copies restate this split and must both mirror any change
    here: catalog32's shared ``_SENT_SQL`` and the independent copy
    inlined in catalog31's pipe_curation_v4 oracle (it threads the
    host column through, so it can't share)."""
    marked = F.replace(col, F.lit(_ESC), F.lit(_ESC + "0"))
    marked = F.replace(marked, F.lit(_MARK), F.lit(_ESC + "1"))
    for p in (".", "!", "?"):
        # capture-free: portable between Java and RE2 replacement
        marked = F.regexp_replace(
            marked, "\\" + p + r"\s+", p + _MARK
        )
    return F.filter(
        F.transform(
            F.split(marked, _MARK),
            lambda s: F.replace(
                F.replace(F.trim(s), F.lit(_ESC + "1"), F.lit(_MARK)),
                F.lit(_ESC + "0"),
                F.lit(_ESC),
            ),
        ),
        lambda s: F.length(s) > 0,
    )


def sentence_chunks(
    docs: DataFrame,
    budget: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """→ (id_col, carry_cols..., chunk_idx, n_sentences, n_tokens,
    chunk_text): consecutive whole sentences per chunk, chunk
    boundaries at the exclusive-prefix-tokens div ``budget`` rule.
    ``carry_cols`` (functionally dependent on ``id_col``, e.g. a host
    or source column) ride through the explode and the grouping, so
    callers never pay a join back to the pre-chunk frame — which
    would re-evaluate its whole subtree."""
    carry = list(carry_cols)
    sents = docs.select(
        F.col(id_col),
        *carry,
        F.posexplode(split_sentences(normalize_text(F.col(text_col)))).alias(
            "sidx", "sentence"
        ),
    ).withColumn(
        "__nt", F.size(F.split(F.col("sentence"), " "))
    )
    w = Window.partitionBy(id_col).orderBy("sidx")
    with_chunk = sents.withColumn(
        "__before", F.coalesce(F.sum("__nt").over(w) - F.col("__nt"), F.lit(0))
    ).withColumn(
        "chunk_idx", F.expr(f"CAST(__before div {budget} AS INT)")
    )
    return (
        with_chunk.groupBy(id_col, *carry, "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum("__nt").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sidx", "sentence"))
                    ),
                    lambda x: x["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
