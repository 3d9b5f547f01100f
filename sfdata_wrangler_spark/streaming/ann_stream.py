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
refresh under distribution drift is no longer just "the caller's
cadence decision" (the r9 gap): :mod:`..operators.ann_refresh` owns
the closed loop — generation-layout artifacts, a
``list_imbalance``/``needs_refresh`` drift trigger fed by the same
telemetry as emb_ivfpq_stats, retrain + re-encode into a NEW
generation, and an atomic pointer swap that serving (including
:func:`stream_ivfpq_serve` pointed at a generation's codes dir)
resolves. The staleness/latency trade mirrors the LSH band index in
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

    NOTE (code-review r14): this function is GENERATION-AGNOSTIC —
    the caller's sink owns the destination. Pointing it at a managed
    generation's ``codes`` dir bypasses the lifecycle bookkeeping
    (``ingest_counts`` per-cell deltas), leaving ``list_imbalance``/
    ``tombstone_fraction``'s dimension-sized artifacts stale and the
    drift trigger blind to the streamed vectors. To ingest into a
    managed generation, use :func:`stream_generation_ingest`.
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


def stream_generation_ingest(
    stream_vecs: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    missing_ok: bool = False,
):
    """Generation-AWARE streaming ingest: each micro-batch goes
    through :func:`..operators.ann_refresh.ingest_batch` against
    whatever generation ``_current`` points at WHEN THE TRIGGER FIRES
    — codes land under the serving generation and the drift-trigger
    artifacts (per-cell ``ingest_counts`` deltas) stay current, so
    ``needs_refresh`` keeps seeing streamed vectors without any
    corpus rescan. This is the managed-lifecycle twin of
    :func:`stream_ivfpq_ingest` (which hands codes to a caller-owned
    sink and maintains no bookkeeping — fine for a standalone code
    lake, blind-spot-inducing for a managed generation).

    Per-trigger cost: the generation's quantizers are re-read each
    trigger (two dimension-sized parquet reads) so a rotation between
    triggers is picked up automatically — the same
    resolve-per-trigger rule as :func:`stream_tombstones`.

    ``missing_ok=False`` (default) fails the trigger when no
    generation is active (checkpoint unadvanced → the batch replays
    once one exists — at-least-once ingest); ``True`` idles.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.ann_refresh import ingest_batch

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            ingest_batch(
                spark, root, batch_df, id_col=id_col, vec_col=vec_col
            )
        except FileNotFoundError:
            if missing_ok:
                return
            raise

    return stream_vecs.writeStream.foreachBatch(_process)


def stream_ivfpq_serve(
    query_stream: DataFrame,
    codes_path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    result_sink,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int = 32,
    m: int = 8,
    sub_dim: int = 8,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    corpus_path: str | None = None,
):
    """Serve a QUERY stream against a persisted IVF-PQ lake (round 9
    — the query-side twin of :func:`stream_ivfpq_ingest`): each
    micro-batch runs ``operators.pq.serve_pruned`` — THE serving
    recipe the batch serve queries use (one probe computation feeding
    both the static partition filter and the search; cid dtype from
    the centroid table; never drifts from the batch path because it
    IS the batch path) — and results go to
    ``result_sink(topk_df, batch_id)``.

    Freshness, stated precisely (code-review r9 pass-4 #1/#3): the
    CODE LAKE is re-read as of each trigger, so an ingest stream's
    appended cid partitions are searchable on the next trigger. The
    exact-rerank corpus is fresh only when ``corpus_path`` is given
    (re-read per trigger alongside the codes); the ``corpus``
    DataFrame argument is treated as FROZEN — with a growing corpus
    and no ``corpus_path``, newly ingested vectors would ADC-rank
    into the shortlist and then drop at the rerank join. Pass
    ``corpus_path`` whenever serving runs concurrently with ingest.
    Until the code lake exists (serve started before the ingest's
    first commit), triggers idle (no sink call) instead of killing
    the query.

    Quantizers are materialized here for the same reasons as the
    ingest path — foreachBatch re-evaluates captured lineage per
    trigger, and a drifting "frozen" quantizer would probe cells
    inconsistent with the lake's assignments.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.pq import serve_pruned

    centroids = centroids.localCheckpoint(eager=True)
    codebooks = codebooks.localCheckpoint(eager=True)
    if corpus_path is None:
        corpus = corpus.localCheckpoint(eager=True)

    def _search(spark, queries, rerank_corpus):
        return serve_pruned(
            queries,
            codes_path,
            centroids,
            codebooks,
            rerank_corpus,
            k=k,
            n_probe=n_probe,
            shortlist=shortlist,
            m=m,
            sub_dim=sub_dim,
            query_id=query_id,
            corpus_id=corpus_id,
            vec_col=vec_col,
            missing_ok=True,
        )

    return query_stream.writeStream.foreachBatch(
        _serve_process(_search, corpus, corpus_path, result_sink)
    )


def _serve_process(search, corpus, corpus_path: str | None, result_sink):
    """THE foreachBatch scaffold both serve streams share (code-review
    r10 pass-2 #7: two hand-copied loops had already drifted on the
    idle-not-die handling). ``search(spark, queries, rerank_corpus)``
    returns the top-k frame or ``None`` to idle this trigger.

    The query batch is pinned with persist (NOT localCheckpoint) —
    releasable per trigger (ADVICE r9 #4), and lazy, so an idle
    trigger (unready lake / corpus) pays no storage job at all;
    recompute-on-eviction is safe because a micro-batch's offsets are
    fixed, unlike the dedup stream's self-feedback batch which must
    keep localCheckpoint. All readiness probes live in the search
    callables (serve_pruned / serve_current with ``missing_ok=True``)
    so idling can never diverge between the two streams again."""
    from ..operators.pq import _lake_has_data

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if corpus_path is not None and not _lake_has_data(
            spark, corpus_path
        ):
            return
        queries = batch_df.persist()
        try:
            rerank_corpus = (
                spark.read.parquet(corpus_path)
                if corpus_path is not None
                else corpus
            )
            out = search(spark, queries, rerank_corpus)
            if out is not None:
                result_sink(out, batch_id)
        finally:
            queries.unpersist()

    return _process


def stream_ivfpq_serve_rotating(
    query_stream: DataFrame,
    root: str,
    corpus: DataFrame,
    result_sink,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int = 32,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    corpus_path: str | None = None,
):
    """Serve a query stream against a GENERATION ROOT
    (operators/ann_refresh.py layout) instead of a frozen codes dir:
    every trigger re-resolves the ``_current`` pointer, so a
    concurrent :func:`~..operators.ann_refresh.refresh_generation`
    swap takes effect on the NEXT micro-batch without restarting the
    query — the streaming half of the drift-refresh loop (VERDICT r9
    ask #2). Probe geometry comes from each generation's own meta, so
    a rotation that changes m/sub_dim cannot desynchronize a running
    server. Triggers idle while no generation is active yet, and when
    an active generation's artifacts have been swept (the same
    idle-not-die contract as :func:`stream_ivfpq_serve` —
    ``serve_current(missing_ok=True)`` owns every readiness probe).
    Within one trigger the generation is resolved once inside
    serve_current; a swap landing mid-trigger affects the next
    trigger, never tears the current one.

    Pointer resolution is a ~100-byte control-file read per trigger;
    the per-trigger costs that matter are unchanged from
    :func:`stream_ivfpq_serve` (probe + pruned scan + rerank).

    ``corpus``/``corpus_path`` semantics match
    :func:`stream_ivfpq_serve`: pass ``corpus_path`` when serving
    runs concurrently with ingest so the exact rerank sees fresh
    vectors.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.ann_refresh import serve_current

    if corpus_path is None:
        corpus = corpus.localCheckpoint(eager=True)

    def _search(spark, queries, rerank_corpus):
        return serve_current(
            spark,
            root,
            queries,
            rerank_corpus,
            k=k,
            n_probe=n_probe,
            shortlist=shortlist,
            query_id=query_id,
            corpus_id=corpus_id,
            vec_col=vec_col,
            missing_ok=True,
        )

    return query_stream.writeStream.foreachBatch(
        _serve_process(_search, corpus, corpus_path, result_sink)
    )


def stream_tombstones(
    id_stream: DataFrame,
    root: str,
    id_col: str = "vec_id",
    missing_ok: bool = False,
    auto_reissue: bool = True,
):
    """Apply a DELETION stream (takedown / GDPR queue) to the serving
    generation: each micro-batch of ids is appended to the CURRENT
    generation's tombstone table
    (:func:`~..operators.ann_refresh.tombstone_ids`), so the next
    serve call — batch or streaming — excludes them via the broadcast
    pre-shortlist anti-join, at O(batch) cost per trigger and no
    corpus-scale work ever.

    The pointer is re-resolved per trigger: a takedown always lands
    on the generation that is serving WHEN IT ARRIVES. Unlike the
    serve streams, the default here is FAIL-LOUD, not idle-not-die
    (``missing_ok=False``): silently dropping a deletion because no
    generation is active yet is a compliance bug, while failing the
    trigger leaves the checkpoint unadvanced so the batch REPLAYS on
    restart — at-least-once takedown semantics, and re-applied ids
    are free (the anti-join is duplicate-insensitive). Pass
    ``missing_ok=True`` only for pipelines where the index is
    strictly a derived cache that a later bootstrap rebuilds from an
    already-cleaned corpus.

    Rotation interplay — AUTOMATED re-issue (VERDICT r13 ask #3): a
    refresh_generation that TRAINED before a takedown arrived but
    activated after it does not contain that takedown's fold — the id
    sits only in the SUPERSEDED generation's tombstone table, and
    without intervention the new generation would resurrect it. The
    stream now closes that race itself: it records the generation it
    last wrote to in a ``_takedown_lastgen`` control file under
    ``root``; when a trigger finds the active generation CHANGED, it
    first re-applies the superseded generations' tombstones onto the
    current one — RESTRICTED to ids still present in the current
    generation's code table (a broadcast semi-join against one pruned
    id-column scan, once per rotation): ids the fold already removed
    must NOT be re-issued, or every historical takedown would stay
    tombstoned forever and deletion debt would never clear — THEN
    processes the batch. The r13 "deployments must re-emit in-flight ids after
    each rotation" manual rule is gone. Coverage is bounded by gc
    retention: ``refresh_generation``'s default ``retain=2`` keeps
    each superseded generation through one full rotation, which
    covers the train→activate window; a deployment that sets
    ``retain=None``/higher only widens it. Pass
    ``auto_reissue=False`` to restore the manual contract (e.g. when
    several takedown streams share one root and a single
    re-issue owner is wanted).

    The generation is resolved ONCE per trigger and passed through
    (ADVICE r13 #2: resolve-then-re-resolve was a TOCTOU — a rotation
    plus gc between the two raised FileNotFoundError through the
    ``missing_ok=True`` promise); a generation vanishing mid-trigger
    under ``missing_ok=True`` now idles the trigger instead of
    killing the stream.

    Returns the ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..operators.ann_refresh import (
        current_generation,
        generation_tombstones,
        list_generations,
        tombstone_ids,
    )
    from ..sources.lake import atomic_write_text, read_text

    lastgen_path = f"{root.rstrip('/')}/_takedown_lastgen"

    def _reissue(spark, cur: str) -> None:
        from pyspark.sql import functions as F

        # Only re-apply tombstones the new generation's fold MISSED:
        # an id the rotation folded away is physically absent from
        # cur's code table, so re-issuing it would (a) keep every
        # historical takedown alive forever — deletion debt never
        # clears, and a drift daemon whose needs_refresh fired on
        # tombstone_fraction would rotate in a loop (code-review r14
        # #1) — and (b) re-delete ids a later refresh intentionally
        # re-added. Intersecting with cur's indexed ids keeps exactly
        # the in-flight set (tombstoned after the fold's read, hence
        # still encoded in cur): a broadcast semi-join of the
        # takedown-sized table against one pruned id-column scan of
        # the code table, once per detected rotation — the same order
        # of work the fold itself just paid.
        from ..sources.lake import has_committed_data

        gdir = f"{root.rstrip('/')}/generations/{cur}"
        codes_path = f"{gdir}/codes"
        if not has_committed_data(spark, codes_path):
            # cur swept mid-trigger: raise the exception _process's
            # missing_ok contract understands (a bare parquet read
            # would surface AnalysisException at plan time instead)
            raise FileNotFoundError(
                f"generation {cur!r} lost its codes mid-trigger"
            )
        codes_ids = spark.read.parquet(codes_path).select(F.col(id_col))
        for g in list_generations(spark, root):
            if g == cur:
                continue
            tomb = generation_tombstones(spark, root, g, id_col)
            if tomb is None:
                continue
            missed = codes_ids.join(
                F.broadcast(tomb.distinct()), id_col, "left_semi"
            ).distinct()
            # eager takedown-sized collect (same rationale as the
            # fold's): one scan, and the write cannot re-resolve a
            # corpus-scale lineage later
            rows = missed.collect()
            if rows:
                tombstone_ids(
                    spark,
                    root,
                    spark.createDataFrame(rows, missed.schema),
                    id_col=id_col,
                    gen=cur,
                )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cur = current_generation(spark, root)
        if cur is None:
            if missing_ok:
                return  # derived-cache mode: bootstrap owns these ids
            raise FileNotFoundError(f"no active generation under {root}")
        try:
            if auto_reissue:
                last = read_text(spark, lastgen_path)
                if last is not None and last != cur:
                    _reissue(spark, cur)
            tombstone_ids(
                spark, root, batch_df.select(id_col), id_col=id_col, gen=cur
            )
        except FileNotFoundError:
            # cur was swept mid-trigger (rotation + gc). Loud mode
            # fails the trigger so the checkpoint replays the batch
            # onto the new generation; derived-cache mode idles.
            if not missing_ok:
                raise
            return
        except Exception:
            # check-then-read residual (r14 pass-2 #2, the
            # refresh_generation fold's rule): a sweep landing between
            # a committed-data check and the read it guards surfaces
            # AnalysisException/Py4JJavaError, not FileNotFoundError.
            # Re-check rather than string-match: the generation no
            # longer having committed codes IS the vanished signature;
            # anything else stays loud.
            from ..sources.lake import has_committed_data

            gdir = f"{root.rstrip('/')}/generations/{cur}"
            if has_committed_data(spark, f"{gdir}/codes"):
                raise
            if not missing_ok:
                raise FileNotFoundError(
                    f"generation {cur!r} swept mid-trigger under {root}"
                )
            return
        # AFTER the successful write: a failed trigger must replay
        # with the OLD marker so the re-issue still happens
        atomic_write_text(spark, lastgen_path, cur)

    return id_stream.writeStream.foreachBatch(_process)
