"""Distributed PCA / whitening for embedding columns.

The preprocessing step in front of SemDedup-style clustering and ANN
indexing (centering + decorrelation materially improves both): fit
the principal components of an ``array<float>`` column at corpus
scale, project every vector onto the top-k basis.

The scale factorization is the classic one — the SUFFICIENT
STATISTICS are tiny even when the corpus is not:

1. Gram matrix ``X^T X`` (d×d) and column sums (d): one posexplode to
   ``(id, i, q_i)``, an id-keyed self-join for the upper-triangle
   products, and a map-side-combinable groupBy down to d(d+1)/2
   cells. Values are quantized to integer micro-units FIRST, so the
   cell sums are exact BIGINTs — order-free, partition-invariant, and
   hash-reproducible by an external SQL engine (same policy as BM25 /
   the bigram LM).
2. The d×d eigendecomposition runs on the DRIVER over those
   statistics (d ~ 10^2: microseconds in LAPACK — the k-means
   "collect only the centroids" precedent; the corpus never moves).
3. Projection broadcasts the (k×d) basis back as column literals:
   per-row ``aggregate(zip_with(...))`` dot products, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def _quantized(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * MICRO).cast("bigint")
    )


def gram_micro(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Upper-triangle second-moment sums in micro^2 units:
    ``(i, j, s_xy)`` with i <= j, s_xy = Σ_rows q_i · q_j (BIGINT,
    exact). d(d+1)/2 output rows regardless of corpus size."""
    flat = emb.select(
        F.col(id_col), F.posexplode(_quantized(vec_col)).alias("i", "q")
    )
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col(f"a.{id_col}") == F.col(f"b.{id_col}"),
                F.col("a.i") <= F.col("b.i"),
            ],
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).cast("bigint").alias("s_xy"))
    )


def col_sums_micro(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension first-moment sums in micro units: (i, s_x, n)."""
    flat = emb.select(
        F.col(id_col), F.posexplode(_quantized(vec_col)).alias("i", "q")
    )
    return flat.groupBy("i").agg(
        F.sum("q").cast("bigint").alias("s_x"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def pca_fit(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Fit top-``k`` principal components from the distributed
    sufficient statistics. Returns ``(means, components, variances)``
    as plain Python lists: means is length-d, components is k rows of
    length-d (descending eigenvalue order, sign fixed so each row's
    largest-|coefficient| entry is positive — LAPACK sign ambiguity
    removed for reproducibility)."""
    import numpy as np

    sums = col_sums_micro(emb, vec_col, id_col).collect()
    d = len(sums)
    n = sums[0]["n"]
    s1 = np.zeros(d)
    for r in sums:
        s1[r["i"]] = r["s_x"]
    s2 = np.zeros((d, d))
    for r in gram_micro(emb, vec_col, id_col).collect():
        s2[r["i"], r["j"]] = r["s_xy"]
        s2[r["j"], r["i"]] = r["s_xy"]
    mean = s1 / (n * MICRO)
    cov = s2 / (n * MICRO * MICRO) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    variances = []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(x) for x in v])
        variances.append(float(vals[idx]))
    return [float(x) for x in mean], comps, variances


def pca_project(
    emb: DataFrame,
    means: list,
    components: list,
    variances: list | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> DataFrame:
    """Project each vector onto the fitted basis: ``(id_col,
    out_col=array<double> length k)``. Basis and means travel as
    column literals (broadcast-sized); the dot products are
    aggregate-over-zip_with folds — no UDF, no shuffle.

    Pass ``variances`` (from :func:`pca_fit`) to WHITEN: each
    component is divided by its standard deviation, so projections
    have unit variance per axis — the preprocessing SemDedup-style
    cosine thresholds and k-means both behave better under (distance
    is no longer dominated by the top component). Components with
    near-zero variance are left unscaled rather than exploded."""
    mean_arr = F.array(*[F.lit(m) for m in means])
    centered = F.zip_with(
        F.col(vec_col), mean_arr, lambda x, m: x.cast("double") - m
    )
    scales = [1.0] * len(components)
    if variances is not None:
        scales = [
            1.0 / (v ** 0.5) if v > 1e-12 else 1.0 for v in variances
        ]
    projs = []
    for comp, s in zip(components, scales):
        c_arr = F.array(*[F.lit(c * s) for c in comp])
        projs.append(
            F.aggregate(
                F.zip_with(centered, c_arr, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return emb.select(F.col(id_col), F.array(*projs).alias(out_col))
