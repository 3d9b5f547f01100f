"""Distributed PCA: the Spark sufficient-statistics path must match a
numpy replica of the SAME quantized pipeline exactly, and basic
spectral properties must hold."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.pca import (
    MICRO,
    col_sums_micro,
    gram_micro,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic anisotropic cloud: dim 0 carries 10x the variance
    rows = []
    for i in range(300):
        base = [((i * 31 + k * 7) % 97 - 48) / 97.0 for k in range(8)]
        base[0] *= 10.0
        rows.append((i, base))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _np_vecs(emb):
    return np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()]
    )


def test_gram_matches_numpy_quantized_exactly(spark, emb):
    X = _np_vecs(emb)
    Q = np.floor(X * MICRO).astype(np.int64)
    expected = Q.T @ Q
    got = {(r["i"], r["j"]): r["s_xy"] for r in gram_micro(emb).collect()}
    d = X.shape[1]
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == expected[i, j]
    sums = {r["i"]: r["s_x"] for r in col_sums_micro(emb).collect()}
    for i in range(d):
        assert sums[i] == Q[:, i].sum()


def test_fit_matches_numpy_replica(spark, emb):
    X = _np_vecs(emb)
    Q = np.floor(X * MICRO).astype(np.int64)
    n, d = X.shape
    mean = Q.sum(axis=0) / (n * MICRO)
    cov = (Q.T @ Q) / (n * MICRO * MICRO) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    means, comps, variances = pca_fit(emb, k=3)
    assert np.allclose(means, mean, atol=1e-12)
    assert np.allclose(variances, vals[order], rtol=1e-9)
    for got_c, idx in zip(comps, order):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(got_c, v, atol=1e-9)


def test_top_component_finds_planted_axis(spark, emb):
    _, comps, variances = pca_fit(emb, k=3)
    # dim 0 carries the planted 10x variance
    assert abs(comps[0][0]) > 0.99
    assert variances[0] > 5 * variances[1]
    assert variances[0] >= variances[1] >= variances[2]


def test_projection_matches_numpy(spark, emb):
    X = _np_vecs(emb)
    means, comps, _ = pca_fit(emb, k=2)
    P = (X - np.array(means)) @ np.array(comps).T
    got = {
        r["vec_id"]: r["proj"]
        for r in pca_project(emb, means, comps).collect()
    }
    for i in range(X.shape[0]):
        assert np.allclose(got[i], P[i], atol=1e-9)


def test_whitened_projection_has_unit_variance(spark, emb):
    means, comps, variances = pca_fit(emb, k=3)
    got = pca_project(emb, means, comps, variances=variances)
    import numpy as np

    P = np.array([r["proj"] for r in got.orderBy("vec_id").collect()])
    # population variance of each whitened axis ~ 1 (fit and projection
    # use the same corpus)
    var = P.var(axis=0)
    assert np.allclose(var, 1.0, rtol=1e-6)


def test_int_fixed_point_basis_close_to_eigh_and_deterministic(spark, emb):
    """The r9 promotion device (pca_fit_int): the integer
    orthogonal-iteration basis must align with the true eigh basis
    (|cos| >= 0.98 per component), be bit-identical across
    re-trainings, and the fixed-point projection must equal a pure
    big-int replica of the same arithmetic."""
    from sfdata_wrangler_spark.operators.pca import (
        Q_BASIS,
        _tdiv,
        pca_fit_int,
        pca_project_int,
    )

    basis, s1, n = pca_fit_int(emb, k=3, iterations=6)
    again, s1b, nb = pca_fit_int(emb, k=3, iterations=6)
    assert basis == again and s1 == s1b and n == nb

    _means, comps, _vars = pca_fit(emb, k=3)
    for w, c in zip(basis, comps):
        wv = np.array(w, dtype=float)
        cv = np.array(c)
        cos = abs(wv @ cv) / (np.linalg.norm(wv) * np.linalg.norm(cv))
        assert cos >= 0.98, cos

    # projection: exact vs a python big-int replica
    X = _np_vecs(emb)
    q = np.floor(X * MICRO).astype(object)  # arbitrary precision
    got = {
        (r["vec_id"], r["dim"]): r["proj_q"]
        for r in pca_project_int(
            emb, basis, s1, n, coord_abs_max=5.0
        ).collect()
    }
    for i in range(X.shape[0]):
        for m, w in enumerate(basis):
            num = sum(
                (int(q[i][j]) * n - s1[j]) * w[j] for j in range(len(w))
            )
            assert got[(i, m)] == _tdiv(num, n)
    assert all(abs(w0) <= Q_BASIS for w in basis for w0 in w)


def test_pca_project_int_overflow_guard(spark, emb):
    """ADVICE r9 #2: the BIGINT bound is enforced, not a comment —
    a corpus size whose conservative fold bound exceeds int64 must
    raise instead of silently wrapping in non-ANSI Spark."""
    from sfdata_wrangler_spark.operators.pca import (
        pca_fit_int,
        pca_project_int,
    )

    basis, s1, n = pca_fit_int(emb, k=2, iterations=4)
    # a fabricated 100TB-class row count blows the bound even with
    # the true s1: d*(n*MICRO + max|s1|)*Q_BASIS >= 2^63
    huge_n = 10**13
    with pytest.raises(ValueError, match="DECIMAL"):
        pca_project_int(emb, basis, s1, huge_n)
    # the real corpus passes and still projects exactly
    out = pca_project_int(emb, basis, s1, n, coord_abs_max=5.0)
    assert out.count() == emb.count() * len(basis)


def test_pca_project_int_coord_bound_verified_against_data(spark, emb):
    """ADVICE r10 #2: the overflow guard no longer trusts the
    caller-asserted coord_abs_max — the fixture's dim-0 coordinates
    reach ~4.95, so the DEFAULT bound (1.0) must raise at execution
    instead of certifying a fold that wraps silently; the true bound
    projects fine."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sfdata_wrangler_spark.operators.pca import (
        pca_fit_int,
        pca_project_int,
    )

    basis, s1, n = pca_fit_int(emb, k=2, iterations=4)
    with pytest.raises(SparkRuntimeException, match="coord_abs_max"):
        pca_project_int(emb, basis, s1, n).collect()
    ok = pca_project_int(emb, basis, s1, n, coord_abs_max=5.0)
    assert ok.count() == emb.count() * len(basis)
