"""Catalog wave 11 (round 3, queued behind wave 10 for the driver
sweep rotation): lexical retrieval and training-mixture sampling —
the two selection primitives a 100 TB curation pipeline runs after
dedup/quality filtering (pick what to train on, and in what
proportion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import bm25_oracle_sql, bm25_topk
from ..operators.sampling import (
    temperature_sample,
    temperature_sample_oracle_sql,
)
from .catalog import _register, _t

# 'dup' is the corpus's rare marker token (~30× rarer than content
# words) — high idf, so the ranking exercises the term-rarity weight,
# not just tf saturation.
_BM25_TERMS = ["dup", "spark", "vector"]
_BM25_K = 15


@_register(
    "ir_bm25_topk",
    bm25_oracle_sql(_BM25_TERMS, k=_BM25_K),
    bench=True,
)
def ir_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (operators/retrieval.py):
    inverted-index shape — postings pre-filtered to the query terms,
    broadcast idf, doc-keyed score join, distributed top-k. The
    deterministic odds-ratio idf + integer micro-unit scores make the
    result hash-exact against the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_terms_hit",
        "dl",
        "score_micro",
    )


_MIX_C = 6.0


@_register(
    "txt_mixture_sample",
    temperature_sample_oracle_sql(
        "lang",
        _MIX_C,
        "CAST(doc_id AS BIGINT) AS doc_id, lang",
    ),
)
def txt_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted training mixture (operators/sampling.py):
    per-language keep rate ``min(1, C/sqrt(n))`` (alpha = 0.5), keep
    decision by md5-prefix hash threshold. One tiny stratum-count
    aggregate broadcast back over the corpus — no corpus shuffle, no
    RNG state, byte-reproducible at any scale."""
    docs = _t(spark, sf_dir, "documents")
    return temperature_sample(docs, "lang", _MIX_C).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        "n_stratum",
        "rate_micro",
    )
