"""The DETERMINISTIC integer-micro trainer
(operators/classifier.logreg_train_micro): learns planted signal,
replays exactly in an integer numpy replica, and — the whole point —
is bit-identical under different partitionings (the float trainer's
gradient sums are reduce-order dependent; this one's cannot be)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.classifier import (
    BIAS_BUCKET,
    hashed_token_features_micro,
    logreg_predict_micro,
    logreg_train_micro,
)
from tests.test_classifier import planted_corpus

N_BUCKETS = 64


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        planted_corpus(), ["doc_id", "text", "y"]
    ).localCheckpoint(eager=True)


def test_learns_planted_signal_on_holdout(spark, corpus):
    train = corpus.where(F.col("doc_id") % 5 != 4)
    test = corpus.where(F.col("doc_id") % 5 == 4)
    w = logreg_train_micro(
        hashed_token_features_micro(train, n_buckets=N_BUCKETS),
        train.select("doc_id", "y"),
        iterations=25,
    )
    pred = logreg_predict_micro(
        hashed_token_features_micro(test, n_buckets=N_BUCKETS), w
    )
    joined = pred.join(test.select("doc_id", "y"), "doc_id")
    acc = joined.where(
        (F.col("pred") & (F.col("y") == 1))
        | (~F.col("pred") & (F.col("y") == 0))
    ).count() / joined.count()
    assert acc >= 0.95


def _int_div(a: np.ndarray, b: int) -> np.ndarray:
    """Truncation-toward-zero integer division — Spark's ``div`` and
    DuckDB's ``//`` semantics (numpy's // floors for negatives)."""
    return (np.sign(a) * (np.abs(a) // b)).astype(np.int64)


def test_matches_integer_numpy_replica_exactly(spark, corpus):
    iters, lr = 10, 2
    sub = corpus.where(F.col("doc_id") < 40)
    feats = hashed_token_features_micro(sub, n_buckets=N_BUCKETS)
    w = logreg_train_micro(
        feats, sub.select("doc_id", "y"), iterations=iters, lr=lr
    )

    rows = feats.collect()
    ids = sorted({r["doc_id"] for r in rows})
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), N_BUCKETS + 1), dtype=np.int64)
    for r in rows:
        b = N_BUCKETS if r["bucket"] == BIAS_BUCKET else r["bucket"]
        X[idx[r["doc_id"]], b] = r["x_micro"]
    y = np.zeros(len(ids), dtype=np.int64)
    for r in sub.select("doc_id", "y").collect():
        y[idx[r["doc_id"]]] = r["y"]

    n = len(ids)
    wv = np.zeros(N_BUCKETS + 1, dtype=np.int64)
    seen = X.any(axis=0)  # train-feature buckets only, like the op
    for _ in range(iters):
        m12 = X @ wv
        p = np.clip(_int_div(m12, 4_000_000) + 500_000, 0, 1_000_000)
        resid = p - y * 1_000_000
        g12 = X.T @ resid
        wv = wv - lr * _int_div(g12, n * 1_000_000)
        wv[~seen] = 0

    got = {
        (N_BUCKETS if r["bucket"] == BIAS_BUCKET else r["bucket"]): r["w_micro"]
        for r in w.collect()
    }
    for b in range(N_BUCKETS + 1):
        if seen[b]:
            assert got[b] == wv[b], b  # EXACT, not approximate


def test_bit_identical_under_repartition(spark, corpus):
    """The determinism claim itself: train on 2 vs 16 partitions and
    demand byte-identical weights (the float trainer only promises
    'up to float sum order')."""
    train = corpus.where(F.col("doc_id") % 5 != 4)

    def _weights(parts):
        f = hashed_token_features_micro(
            train.repartition(parts), n_buckets=N_BUCKETS
        )
        w = logreg_train_micro(
            f, train.select("doc_id", "y"), iterations=8
        )
        return sorted((r["bucket"], r["w_micro"]) for r in w.collect())

    assert _weights(2) == _weights(16)


def test_hard_sigmoid_saturates_exactly(spark):
    """Margins beyond +/-2.0 clamp to p in {0, 1}: residuals for
    saturated correct predictions are exactly zero, so the gradient
    contribution vanishes (no drift from already-won examples)."""
    feats = spark.createDataFrame(
        [(1, -1, 1_000_000), (2, -1, 1_000_000)],
        ["doc_id", "bucket", "x_micro"],
    )
    labels = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "y"])
    # one bias-only bucket, both docs positive: first iteration sees
    # p=0.5 -> resid=-0.5e6 -> g12 = 1e6 * -5e5 * 2 docs / ...
    w = logreg_train_micro(feats, labels, iterations=30, lr=2)
    wv = {r["bucket"]: r["w_micro"] for r in w.collect()}
    # once w >= 2e6 the margin saturates p=1=y, resid=0, w stops moving
    assert wv[-1] >= 2_000_000
    w2 = logreg_train_micro(feats, labels, iterations=60, lr=2)
    assert {r["bucket"]: r["w_micro"] for r in w2.collect()} == wv
