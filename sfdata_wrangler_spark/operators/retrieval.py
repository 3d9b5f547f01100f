"""BM25 keyword retrieval over a document corpus.

Beyond-reference surface (the reference has no text-retrieval
tooling): training-data pipelines use BM25-shaped lexical scoring for
quality-targeted selection (e.g. "documents that look like the
benchmark set"), contamination triage, and hard-negative mining.

Architecture — inverted-index shape, never a scan-per-query:

1. One corpus pass for per-doc length ``dl`` (no explode; the
   ``token_count`` expression is a single split).
2. One explode pass *pre-filtered to the query terms* — Catalyst
   pushes the ``tok IN (...)`` filter below the aggregation, so the
   shuffled postings list is |docs containing a query term| rows, not
   corpus tokens.
3. ``df``/``idf`` per term: a groupBy over those postings (≤ |terms|
   result rows, broadcast back).
4. Score join: postings ⨝ broadcast(idf) ⨝ dl (doc-keyed equi join),
   then one aggregation per doc and a distributed top-k
   (``TakeOrderedAndProject``, no single-partition window).

Determinism (DuckDB-oracle hash parity): the classic BM25 idf uses
``ln``, a transcendental that Java's ``Math.log`` and C libm round
differently in the last ulp. This operator uses the odds-ratio idf
``(N - df + 0.5) / (df + 0.5)`` — the same monotone term-rarity
weight built only from IEEE basic ops (+, -, ×, ÷), which every
engine rounds identically. Per-term scores are then scaled to
integer micro-units BEFORE the per-doc sum, so accumulation order
cannot perturb the total. Swapping in the textbook ``ln`` idf is a
one-line change if cross-engine bit-parity is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text, token_count


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25 with
    the deterministic odds-ratio idf (see module docstring).

    Returns ``(id_col, n_terms_hit, dl, score_micro)`` ordered by
    ``(score_micro DESC, id_col)`` — a total order, so the result set
    is a pure function of the corpus.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")

    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("dl")
    )

    # corpus stats: one tiny aggregate, broadcast to every score row
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )

    # postings restricted to the query terms (filter below the agg)
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .where(F.col("tok").isin(*terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )

    # document frequency / odds-ratio idf per term (≤ |terms| rows)
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(base, id_col)
        .crossJoin(F.broadcast(stats))
    )
    # identical parenthesization to the oracle SQL: every step is an
    # IEEE basic op, so both engines produce the same double
    idf = (
        F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    term_score = (
        idf
        * (tfd * F.lit(k1 + 1.0))
        / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / F.col("avgdl"))))
    )
    per_term = scored.select(
        F.col(id_col),
        F.col("dl"),
        F.floor(term_score * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("score_micro_term"),
    )
    return (
        per_term.groupBy(id_col, "dl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
            F.sum("score_micro_term").cast("bigint").alias("score_micro"),
        )
        .select(id_col, "n_terms_hit", "dl", "score_micro")
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    norm_sql_expr: str | None = None,
) -> str:
    """DuckDB oracle for :func:`bm25_topk` — the same pipeline stated
    relationally, with literally the same score parenthesization."""
    norm = norm_sql_expr or (
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    )
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
    WITH dl AS (
      SELECT doc_id,
             CAST(CASE WHEN length({norm}) = 0 THEN 0
                  ELSE len(string_split({norm}, ' ')) END AS BIGINT) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split({norm}, ' ')) AS tok
            FROM documents)
      WHERE tok IN ({inlist})
      GROUP BY doc_id, tok
    ), df_t AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ), per_term AS (
      SELECT tf.doc_id, dl.dl,
             CAST(floor(
               (CAST(stats.n_docs AS DOUBLE) - CAST(df_t.df AS DOUBLE) + 0.5)
                 / (CAST(df_t.df AS DOUBLE) + 0.5)
               * (CAST(tf.tf AS DOUBLE) * {k1 + 1.0!r})
               / (CAST(tf.tf AS DOUBLE)
                  + {k1!r} * ({1.0 - b!r} + {b!r}
                              * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))
               * 1e6 + 0.5) AS BIGINT) AS score_micro_term
      FROM tf
      JOIN df_t ON tf.tok = df_t.tok
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_hit,
           dl,
           CAST(sum(score_micro_term) AS BIGINT) AS score_micro
    FROM per_term
    GROUP BY doc_id, dl
    ORDER BY score_micro DESC, doc_id
    LIMIT {k}
    """


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf — the
    keyword-extraction twin of :func:`bm25_topk` (same ln-free
    odds-ratio idf, same integer micro-unit scores, so the ranking is
    engine-reproducible).

    Shape: one explode → (doc, token) tf groupBy (map-side
    combinable) → token-keyed df groupBy (vocabulary-sized, broadcast
    back) → per-doc window rank. The corpus is scanned once; the
    only non-doc-keyed shuffle is the vocabulary aggregation, which
    Zipf keeps tiny relative to the corpus. Ties break on the token
    string for a total order.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .where(F.length("tok") >= min_token_len)
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_docs_df = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_docs")
    )
    df_t = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = tf.join(F.broadcast(df_t), "tok").crossJoin(
        F.broadcast(n_docs_df)
    )
    idf = (
        F.col("__n_docs").cast("double")
        - F.col("df").cast("double")
        + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    score = F.floor(
        F.col("tf").cast("double") * idf * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    ranked = scored.select(
        F.col(id_col),
        "tok",
        F.col("tf"),
        F.col("df"),
        score.alias("score_micro"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.col("score_micro").desc(), F.col("tok")
            )
        ),
    )
    return ranked.where(F.col("rank") <= k)
