"""Catalog wave 17 (round 3): distributed PCA for embedding columns —
the whitening/decorrelation step in front of SemDedup clustering and
ANN indexing. The corpus-side sufficient statistics (gram matrix +
column sums, exact integer micro-units) are hash-exact against
DuckDB; the driver-side eigendecomposition + projection is iterative
linear algebra (rows-only, pinned by a numpy differential)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pca import gram_micro, pca_fit, pca_project
from .catalog import _register, _t

_GRAM_ORACLE = """
WITH flat AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       CAST(sum(a.q * b.q) AS BIGINT) AS s_xy
FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


@_register("emb_pca_gram", _GRAM_ORACLE)
def emb_pca_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA sufficient statistics (operators/pca.py): the d(d+1)/2
    upper-triangle gram cells as exact BIGINT micro^2 sums — one
    posexplode, one id-keyed self-join, one combinable groupBy; the
    output is basis-sized (2080 rows for d=64) no matter how large
    the corpus is."""
    emb = _t(spark, sf_dir, "embeddings")
    return gram_micro(emb).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "s_xy",
    )


@_register("emb_pca_project", None)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 principal projection of every embedding: fit from the
    distributed statistics (driver eigh over d×d, sign-fixed), project
    via broadcast basis literals + zip_with folds. Iterative linear
    algebra — rows-only; exactness vs a numpy replica is pinned in
    tests/test_pca.py."""
    emb = _t(spark, sf_dir, "embeddings")
    means, comps, _ = pca_fit(emb, k=4)
    out = pca_project(emb, means, comps)
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform("proj", lambda x: F.round(x, 6)).alias("proj_r6"),
    )


@_register("dd_dup_clusters", None)
def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components as a declared query
    (operators/dedup.cluster_duplicates — min-label propagation with
    batched convergence probes, previously test-only): LSH candidate
    pairs → components → per-cluster rollup with a member checksum.
    Iterative fixpoint — rows-only; component correctness is pinned
    by tests/test_dedup.py's chain/clique tests."""
    from ..operators.dedup import cluster_duplicates, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, hash_fn="md5", num_hashes=8, bands=4)
    clusters = cluster_duplicates(pairs)
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("member_id_sum"),
        )
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "n_docs",
            "member_id_sum",
        )
    )
