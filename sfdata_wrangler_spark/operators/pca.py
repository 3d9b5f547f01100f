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


# --------------------------------------------------------------------------- #
# Integer fixed-point basis — the hash-exact promotion device (round 9)       #
# --------------------------------------------------------------------------- #

Q_BASIS = 10_000  # basis fixed-point scale: keeps every distributed
# projection term inside BIGINT through sf0.5 (|q|*n*Q*d ~ 7.7e17);
# at true 100 TB row counts the projection sum moves to DECIMAL(38,0)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Python ``//``
    floors, but Spark ``div`` and DuckDB ``//`` both truncate
    (verified: -7 div 2 == -7 // 2 == -3), and the fixed point must
    replay bit-identically in all three."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _rescale(u: list[int], q: int = Q_BASIS) -> list[int]:
    mx = max(max(abs(x) for x in u), 1)
    return [_tdiv(x * q, mx) for x in u]


def _sign_fix(v: list[int]) -> list[int]:
    mx = max(abs(x) for x in v)
    lead = next(x for x in v if abs(x) == mx)  # lowest index among ties
    return [-x for x in v] if lead < 0 else list(v)


def pca_fit_int(
    emb: DataFrame,
    k: int = 4,
    iterations: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Top-``k`` principal directions as an INTEGER FIXED POINT —
    the oracle-replayable twin of :func:`pca_fit` (same promotion
    device as the integer pagerank / GD / k-means queries).

    The scatter matrix ``M = n·S2 − s1·s1ᵀ`` (∝ covariance, exact
    Python big-ints from the same distributed sufficient statistics
    :func:`gram_micro` / :func:`col_sums_micro` collect — d(d+1)/2
    rows to the driver, never the corpus) drives orthogonal power
    iteration where EVERY step is integer: mat-vec, rescale to
    ``Q_BASIS`` by truncating division, previous-component removal
    as ``u·(w·w) − (u·w)·w``, final deterministic sign fix (leading
    max-|coefficient| entry positive, lowest index on ties). With
    ``iterations`` fixed, the basis is a pure integer function of
    the data — bit-identical under any partitioning, and replayable
    by an external SQL engine as unrolled CTEs. Convergence to the
    true eigh basis is approximate (quantization + finite T) and is
    pinned ≥ 0.98 |cosine| per component in tests/test_pca.py.

    Returns ``(basis, s1, n)``: ``basis`` is k integer vectors at
    scale ``Q_BASIS``; ``s1``/``n`` are the exact micro column sums
    and row count (the rational mean ``s1/n`` for centering).
    """
    sums = col_sums_micro(emb, vec_col, id_col).collect()
    d = len(sums)
    n = int(sums[0]["n"])
    s1 = [0] * d
    for r in sums:
        s1[r["i"]] = int(r["s_x"])
    m = [[0] * d for _ in range(d)]
    for r in gram_micro(emb, vec_col, id_col).collect():
        v = n * int(r["s_xy"]) - s1[r["i"]] * s1[r["j"]]
        m[r["i"]][r["j"]] = v
        m[r["j"]][r["i"]] = v

    basis: list[list[int]] = []
    for _comp in range(k):
        u = [Q_BASIS] * d
        for w in basis:  # orthogonalize the start vector too
            ww = sum(x * x for x in w)
            uw = sum(a * b for a, b in zip(u, w))
            u = _rescale([x * ww - uw * y for x, y in zip(u, w)])
        for _it in range(iterations):
            u = _rescale([sum(m[i][j] * u[j] for j in range(d)) for i in range(d)])
            for w in basis:
                ww = sum(x * x for x in w)
                uw = sum(a * b for a, b in zip(u, w))
                u = _rescale([x * ww - uw * y for x, y in zip(u, w)])
        basis.append(_sign_fix(u))
    return basis, s1, n


def pca_project_int(
    emb: DataFrame,
    basis: list[list[int]],
    s1: list[int],
    n: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coord_abs_max: float = 1.0,
) -> DataFrame:
    """Exact fixed-point projection onto the integer basis:
    ``proj_q = (Σ_i (q_i·n − s1_i)·w_i) div n`` — the centered dot
    product scaled by ``n·Q_BASIS`` so it stays integer end to end
    (``q_i·n − s1_i`` is the exactly-centered micro coordinate times
    n). Basis and sums travel as column literals; the fold is
    aggregate-over-zip_with, JVM-side, no UDF, no shuffle. Output is
    posexploded ``(id, dim, proj_q BIGINT)`` scalars — atomic schema
    for the driver canon, per-axis true scale recoverable as
    ``proj_q·MICRO⁻¹ / ‖w‖`` for consumers that want floats.

    BIGINT safety is ENFORCED, not assumed (ADVICE r9 #2: in
    non-ANSI Spark the zip_with/aggregate fold wraps silently on
    overflow — a silent divergence from the HUGEINT oracle). The
    conservative per-query bound is
    ``d · max_i|q_i·n − s1_i| · max|w|``; with ``|w| ≤ Q_BASIS``
    (exact after ``_rescale``) and ``|q_i| ≤ ⌈coord_abs_max·MICRO⌉``
    (ceiling, not truncation: floor quantization of a negative
    coordinate overshoots the truncated product by one) it is
    ``d · (n·(⌊coord_abs_max·MICRO⌋+1) + max_i|s1_i|) · Q_BASIS``
    (``s1`` is known exactly on the driver — no data scan needed).
    ``coord_abs_max`` defaults to 1.0 (unit-bounded embeddings, the
    common corpus shape); callers with unnormalized data MUST pass
    the true coordinate bound or the guard under-estimates. When the bound does not fit in int64 the
    call raises with the DECIMAL(38,0) migration pointer instead of
    producing silently-wrapped projections."""
    d = len(s1)
    max_s1 = max((abs(x) for x in s1), default=0)
    # +1: floor quantization makes |q| of a NEGATIVE coordinate at
    # the bound exceed the truncated product by one (floor(-c·1e6) =
    # -(int(c·1e6)+1) when c·1e6 is fractional) — without it the
    # guard could certify a corpus that still wraps (code-review r10)
    q_abs = int(coord_abs_max * MICRO) + 1
    bound = d * (n * q_abs + max_s1) * Q_BASIS
    if bound >= 2**63:
        raise ValueError(
            "pca_project_int: projection fold can exceed int64 "
            f"(conservative bound {bound:.3e} ≥ 2^63) at n={n}, d={d}, "
            f"coord_abs_max={coord_abs_max}; re-fit at a smaller "
            "Q_BASIS or port the fold to DECIMAL(38,0) before "
            "running at this corpus size"
        )
    nq = F.lit(n).cast("bigint")
    s1_arr = F.array(*[F.lit(x).cast("bigint") for x in s1])
    qv = _quantized(vec_col)
    # The static bound above trusts the CALLER's coord_abs_max; an
    # unnormalized corpus passed with the default would still certify
    # and wrap silently (ADVICE r10 #2). Verify the assertion against
    # the DATA, in-row and JVM-side: assert_true returns NULL when the
    # predicate holds (folded into the sum as +0) and raises on the
    # first row whose quantized coordinate exceeds the certified
    # |q| ≤ q_abs — no extra scan, no UDF.
    bound_ok = F.coalesce(
        F.assert_true(
            F.forall(qv, lambda q: F.abs(q) <= F.lit(q_abs)),
            F.lit(
                "pca_project_int: embedding coordinate exceeds "
                f"coord_abs_max={coord_abs_max} — the int64 overflow "
                "guard certified a bound the data violates; pass the "
                "true coordinate bound"
            ),
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    centered = F.zip_with(qv, s1_arr, lambda q, s: q * nq - s)
    projs = []
    for w in basis:
        w_arr = F.array(*[F.lit(x).cast("bigint") for x in w])
        num = F.aggregate(
            F.zip_with(centered, w_arr, lambda c, ww: c * ww),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        projs.append(num + bound_ok)
    out = emb.select(
        F.col(id_col),
        F.posexplode(F.array(*projs)).alias("dim", "__num"),
    )
    return out.select(
        id_col,
        F.col("dim").cast("int").alias("dim"),
        F.expr("__num div " + str(int(n))).cast("bigint").alias("proj_q"),
    )
