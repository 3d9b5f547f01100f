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


def stream_selfmaintaining_neardup(
    stream_docs: DataFrame,
    index_path: str,
    accepted_sink,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
):
    """The CLOSED ingest loop :func:`stream_incremental_neardup`
    leaves to the caller: each micro-batch near-dup-checks against the
    band index ON DISK (``index_path`` — a parquet dir seeded with the
    corpus snapshot's :func:`~...operators.dedup.minhash_band_index`),
    hands accepted docs to ``accepted_sink(new_docs_df, batch_id)``,
    and APPENDS the accepted docs' own band rows back to the index —
    so batch N dedups against the snapshot PLUS batches 1..N-1, with
    zero re-hash of anything already indexed (O(batch) per trigger,
    the only admissible cost at 100 TB).

    Semantics contract (same as ``incremental_dedup``, now applied
    per trigger): duplicates WITHIN one micro-batch are not resolved
    against each other — both pass if neither collides with the index
    as of the trigger start. Run :func:`stream_dedup_exact` upstream
    for exact within-stream dupes, or shrink the trigger to tighten
    the window; the per-batch granularity is the standard
    index-staleness/latency trade stated honestly. Deterministic
    given the same batch boundaries (equivalence with a sequential
    batch replay is pinned in tests/test_streaming_dedup.py).

    The batch frame is pinned (eager localCheckpoint) before use: the
    accepted set is read TWICE (sink + index append), and the second
    read must not recompute against the index rows the first just
    appended — the foreachBatch re-evaluation trap from
    streaming/ann_stream.py, here with a self-feedback edge.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.dedup import incremental_dedup, minhash_band_index

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        spark = batch_df.sparkSession
        index = spark.read.parquet(index_path)
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
        ).localCheckpoint(eager=True)
        minhash_band_index(
            new_docs,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            hash_fn=hash_fn,
        ).write.mode("append").parquet(index_path)
        accepted_sink(new_docs, batch_id)

    return stream_docs.writeStream.foreachBatch(_process)
