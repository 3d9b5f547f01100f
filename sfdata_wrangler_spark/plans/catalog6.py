"""Catalog wave 6: BPE-ish tokenization and embedding array
analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import portable_round as _pr
from .catalog import _register, _t

# word runs | digit runs | single other-symbols — identical semantics
# in Java regex (Spark) and RE2 (DuckDB); space excluded
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@_register(
    "txt_bpe_tokens",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                END AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def txt_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (letter runs / digit runs / symbols) vs
    whitespace tokens — the tokenizer-budget estimator for training-
    data pipelines; pure regexp, codegen'd."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.when(F.length(ws) == 0, F.lit(0))
        .otherwise(F.size(F.split(ws, " ")))
        .cast("bigint")
        .alias("n_ws_tokens"),
    )


@_register(
    "emb_label_centroids",
    """
    SELECT CAST(label AS BIGINT) AS label,
           CAST(dim AS INT) AS dim,
           CAST(round(avg(x), 6) AS DOUBLE) AS centroid
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids: posexplode → (label, dim) mean.
    The building block for IVF-style coarse quantization (assign to
    nearest centroid → bucketed ANN) and for class-prototype dedup."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    return exploded.groupBy(
        "label", (F.col("pos") + 1).cast("int").alias("dim")
    ).agg(_pr(F.avg(F.col("x").cast("double")), 6).alias("centroid"))


@_register("emb_ivf_topk", None)
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only: k-means training is iterative, not
    SQL-expressible): deterministic centroids (fixed seeds/iteration
    count) → cell-equi candidate join → per-query rank. Recall vs
    brute force asserted in tests/test_similarity.py."""
    from ..operators.similarity import ivf_topk, kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, k=8, iterations=3)
    out = ivf_topk(queries, emb, cents, k=5, n_probe=2)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


@_register(
    "qc_lineitem_checks",
    """
    SELECT 'qty_positive' AS check, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_range', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.5)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_after_order', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN NOT (l_shipdate >= o_orderdate) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def qc_lineitem_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime data-quality checks (SURVEY §5 embedded-QC parity) as a
    driver-visible query: single-pass conditional-count framework
    (operators/quality.run_checks) over fact + referential rules."""
    from ..operators.quality import Check, run_checks

    li = _t(spark, sf_dir, "lineitem")
    base = run_checks(
        li,
        [
            Check("qty_positive", F.col("l_quantity") > 0),
            Check(
                "discount_range",
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.5),
            ),
        ],
    ).select("check", "n_rows", "n_violations")
    joined = li.join(
        _t(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    ref = run_checks(
        joined,
        [Check("ship_after_order", F.col("l_shipdate") >= F.col("o_orderdate"))],
    ).select("check", "n_rows", "n_violations")
    return base.unionByName(ref)


@_register(
    "dd_embedding_neardup",
    """
    SELECT CAST(a.vec_id AS BIGINT) AS id_a,
           CAST(b.vec_id AS BIGINT) AS id_b,
           CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])), 4)
                AS DOUBLE) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.9
    """,
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup
    complement to MinHash): exact all-pairs at verification scale;
    the 100 TB path swaps the self-join for the LSH/IVF bucket join
    (emb_lsh_topk / emb_ivf_topk) with identical scoring."""
    from ..operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("__va"), F.col("__vb"))
    return (
        pairs.select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            sim.alias("__sim"),
        )
        .where(F.col("__sim") >= 0.9)
        .select("id_a", "id_b", _pr(F.col("__sim"), 4).alias("sim"))
    )


@_register(
    "o4_ranking_distributions",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def o4_ranking_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-distribution windows (ntile/percent_rank/cume_dist) —
    the quantile-bucketing primitives for stratified sampling and
    quality-score binning of training corpora. Total ordering via the
    unique key tie-break keeps them cross-engine deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
