"""Catalog wave 24: two-stage retrieval (lexical recall → dense
rerank) — the standard search/RAG serving architecture stated as one
lazy plan.

Stage 1 (recall) is ``ir_bm25_topk``'s inverted-index-shaped BM25
over the full corpus; stage 2 (precision) reranks ONLY the k
candidates by exact embedding cosine against the query vector. The
expensive dense math therefore touches a candidate-sized frame, never
the corpus — exactly how a 100 TB retrieval stack splits the work
(sparse index prunes, dense scorer refines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.metrics import portable_round
from ..operators.retrieval import bm25_oracle_sql, bm25_topk
from ..operators.similarity import cosine
from .catalog import _events, _register, _t
from .catalog11 import _BM25_K, _BM25_TERMS

_QUERY_VEC_ID = 0
_RERANK_K = 10


@_register(
    "ir_rerank_two_stage",
    f"""
    WITH cand AS ({bm25_oracle_sql(_BM25_TERMS, k=_BM25_K)}),
    qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
      WHERE vec_id = {_QUERY_VEC_ID}
    ),
    scored AS (
      SELECT cand.doc_id, cand.score_micro,
             list_cosine_similarity(qv.qe, CAST(e.embedding AS DOUBLE[]))
               AS sim_exact
      FROM cand
      JOIN embeddings e ON e.vec_id = cand.doc_id
      CROSS JOIN qv
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           score_micro,
           CAST(round(sim_exact, 4) AS DOUBLE) AS sim,
           CAST(row_number() OVER (ORDER BY sim_exact DESC, doc_id)
                AS INT) AS rerank
    FROM scored
    QUALIFY row_number() OVER (ORDER BY sim_exact DESC, doc_id)
      <= {_RERANK_K}
    """,
    bench=True,
)
def ir_rerank_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 top-{k} lexical recall over the
    corpus (operators/retrieval.py — postings pre-filtered to query
    terms, broadcast idf), then exact-cosine dense rerank of ONLY
    those candidates against the query embedding
    (operators/similarity.cosine, JVM-side zip_with/aggregate).
    The rerank window runs on a candidate-sized frame (k rows), so
    the single-partition sort is k log k regardless of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    cand = bm25_topk(docs, _BM25_TERMS, k=_BM25_K).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "score_micro"
    )
    qv = emb.where(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("__qv")
    )
    scored = (
        cand.join(emb, cand.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "score_micro",
            cosine(F.col("__qv"), F.col("embedding")).alias("__sim_exact"),
        )
    )
    w = Window.orderBy(F.col("__sim_exact").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rerank", F.row_number().over(w))
        .where(F.col("rerank") <= _RERANK_K)
        .select(
            "doc_id",
            "score_micro",
            portable_round(F.col("__sim_exact"), 4).alias("sim"),
            F.col("rerank").cast("int").alias("rerank"),
        )
    )


@_register(
    "a12_rolling_wau",
    """
    WITH per_day AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
    ),
    contrib AS (
      SELECT DISTINCT u,
             CAST(unnest(generate_series(
               CAST(d AS TIMESTAMP),
               CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
               INTERVAL 1 DAY)) AS DATE) AS win_day
      FROM per_day
    ),
    wau AS (
      SELECT win_day, CAST(count(*) AS BIGINT) AS wau
      FROM contrib GROUP BY win_day
    ),
    dau AS (
      SELECT d AS win_day, CAST(count(*) AS BIGINT) AS dau
      FROM per_day GROUP BY d
    )
    SELECT strftime(w.win_day, '%Y-%m-%d') AS win_day,
           w.wau,
           CAST(COALESCE(dd.dau, 0) AS BIGINT) AS dau,
           CAST((COALESCE(dd.dau, 0) * 10000) // w.wau AS BIGINT)
             AS stickiness_bp
    FROM wau w LEFT JOIN dau dd USING (win_day)
    """,
)
def a12_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct-user counts per day (WAU) with
    same-day DAU and integer stickiness (operators/windows.
    rolling_distinct_users). Distinct is not additive, so no range
    frame works: the scale shape reduces events to (user, day) FIRST,
    then explodes each activity day into the 7 window-ends it feeds
    — the ×7 multiplication hits the day-granular frame, never raw
    events."""
    from ..operators.windows import rolling_distinct_users

    ev = _events(spark, sf_dir)
    out = rolling_distinct_users(ev, ts_col="ts", user_col="user_id")
    return out.select(
        F.date_format("win_day", "yyyy-MM-dd").alias("win_day"),
        "wau",
        "dau",
        "stickiness_bp",
    )
