"""Streaming exact deduplication (beyond-reference training-data
surface): the ingest-time twin of ``operators.dedup.exact_dedup``.

A 100 TB corpus is not re-deduplicated from scratch per batch — new
documents stream in and duplicates must be dropped AT INGEST against
everything already seen inside the retention horizon. Structured
Streaming's ``dropDuplicates`` keeps the seen-key set as managed state;
the watermark bounds that state (keys older than the horizon are
evicted — the standard state/completeness trade).

Same normalized-md5 key as the batch operator, so batch backfill and
streaming ingest agree on what "duplicate" means (batch ≡ stream is
asserted in tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_key


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact duplicates (normalized-text md5 key) from a
    (possibly streaming) document frame.

    With ``ts_col``, a watermark bounds the dedup state to the
    retention horizon — required for unbounded streams (state would
    otherwise grow with corpus cardinality). Without it, state is
    unbounded (fine for batch or bounded backfills).
    """
    keyed = docs.withColumn("__key", norm_key(F.col(text_col)))
    if ts_col is not None and docs.isStreaming:
        # watermark bounds the seen-key state; within the horizon the
        # semantics match the batch dropDuplicates on the same key
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__key"]
        )
    else:
        out = keyed.dropDuplicates(["__key"])
    return out.drop("__key")


def stream_incremental_neardup(
    stream_docs: DataFrame,
    index: DataFrame,
    append_sink,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
):
    """Near-dup-filter a document STREAM against a static LSH band
    index (``operators.dedup.minhash_band_index`` — the persisted
    corpus artifact): every micro-batch runs the batch
    ``incremental_dedup`` equi-join and hands only its novel docs to
    ``append_sink(new_docs_df, batch_id)``.

    ``foreachBatch`` is the right Structured Streaming shape here:
    the per-doc "any band collides?" decision is an aggregation over
    the exploded band rows, which append-mode streaming cannot
    finalize without an event-time window — but each doc lives in
    exactly one micro-batch, so per-trigger batch semantics are
    EXACT, and the full DataFrame API (broadcast hints, AQE) applies
    inside the batch. The index is read as-of each trigger; refreshing
    it with the accepted novel docs is the caller's cadence decision
    (the classic index-staleness / ingest-latency trade).

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.dedup import incremental_dedup

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        flags = incremental_dedup(
            index,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            hash_fn=hash_fn,
        )
        new_docs = batch_df.join(
            flags.where(F.col("is_new")).select(id_col), id_col
        )
        append_sink(new_docs, batch_id)

    return stream_docs.writeStream.foreachBatch(_process)
