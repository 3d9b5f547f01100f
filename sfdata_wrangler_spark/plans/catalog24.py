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
from .catalog import _register, _t
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
