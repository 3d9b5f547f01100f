"""Streaming ANN index maintenance: IVF-PQ ingest via foreachBatch.

The streaming twin of the batch append path
(plans/catalog35.emb_ivfpq_incremental): new embedding batches arrive
on a stream and must join the serving index WITHOUT retraining — each
micro-batch is encoded against the FROZEN coarse centroids and
residual codebooks (operators/pq.ivfpq_encode) and appended to the
cid-partitioned code table, so a searcher's partition pruning keeps
working as the corpus grows.

``foreachBatch`` is the right Structured Streaming shape: encoding is
a multi-stage aggregation (coarse argmin, per-subspace code argmin)
that append-mode streaming cannot finalize without event-time
windows, but every vector lives in exactly one micro-batch so
per-trigger batch semantics are EXACT, and the full DataFrame API
(broadcast codebooks, AQE) applies inside the batch. Quantizer
refresh (retraining centroids/codebooks as the distribution drifts —
visible in emb_ivfpq_stats' list balance) is the caller's cadence
decision, the same staleness/latency trade as the LSH band index in
:mod:`.dedup_stream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_ivfpq_ingest(
    stream_vecs: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    append_sink,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Encode a vector STREAM against a frozen IVF-PQ quantizer pair
    and hand each micro-batch's code rows ``(id, cid, subspace,
    code)`` to ``append_sink(codes_df, batch_id)`` — typically
    ``df.write.partitionBy("cid").mode("append")``.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.

    The quantizer frames are materialized HERE (eager local
    checkpoint) before the stream starts: foreachBatch re-evaluates
    captured DataFrames every trigger, so un-materialized quantizers
    would re-run their training job per micro-batch — and, worse, if
    their lineage read a table that grows during the stream, the
    "frozen" quantizer would silently drift between batches,
    assigning inconsistent cids to identical vectors.
    """
    from ..operators.pq import ivfpq_encode

    centroids = centroids.localCheckpoint(eager=True)
    codebooks = codebooks.localCheckpoint(eager=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        codes = ivfpq_encode(
            batch_df,
            centroids,
            codebooks,
            m=m,
            sub_dim=sub_dim,
            id_col=id_col,
            vec_col=vec_col,
        )
        append_sink(codes, batch_id)

    return stream_vecs.writeStream.foreachBatch(_process)
