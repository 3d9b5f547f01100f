"""Document chunking: fixed-width token windows with overlap.

The retrieval/RAG and long-context-training preprocessing primitive:
split each document into windows of ``width`` tokens advancing by
``stride`` (stride < width ⇒ overlapping context, the standard
retrieval-chunking setup; stride = width ⇒ disjoint blocks, the
training-token-shard setup — packing.py then fits chunks to a budget).

Pure column algebra — ``split`` → ``sequence`` of window starts →
``transform``+``slice`` → ``posexplode`` — so chunking is a per-row
codegen'd projection with NO shuffle: the output is written straight
back partition-aligned with its input, which is exactly what you want
when chunking 100 TB (the explode multiplies rows ~n/stride-fold;
size ``spark.sql.files.maxPartitionBytes`` accordingly).

Short documents (≤ width tokens) yield exactly one window. Empty/
whitespace-only documents yield none (there is nothing to embed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def chunk_token_windows(
    docs: DataFrame,
    width: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).

    Window starts are 0, stride, 2·stride, … while start < n_tokens
    EXCEPT that a start inside the final full window is redundant
    (its window would be a suffix of the previous one), so starts are
    capped at the last index that begins a maximal window:
    max(0, n - width) rounded UP to a stride multiple. This yields
    full-width windows everywhere except a possibly-short final one —
    the convention retrieval chunkers use (no tiny tail fragments
    duplicating covered text when (n - width) % stride == 0).
    """
    if not (0 < stride <= width):
        raise ValueError("need 0 < stride <= width")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size("__toks")
    # last useful start: ceil((n - width)/stride)*stride, floored at 0
    last = F.greatest(
        F.lit(0),
        F.expr(
            f"CAST(ceil((size(__toks) - {width}) / {stride}.0) AS INT)"
            f" * {stride}"
        ),
    )
    with_toks = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .where((n > 0) & (F.element_at("__toks", 1) != ""))
        .withColumn("__starts", F.sequence(F.lit(0), last, F.lit(stride)))
    )
    exploded = with_toks.select(
        id_col,
        F.posexplode("__starts").alias("chunk_idx", "chunk_start"),
        F.col("__toks"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_start") + 1, width)
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
