"""Tests for the distributed logistic-regression text classifier:
learnability on a planted-signal corpus, exact-math differential
against a dense numpy implementation, and holdout generalization."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.classifier import (
    BIAS_BUCKET,
    hashed_token_features,
    logreg_predict,
    logreg_train,
)

POS_WORDS = ["crisp", "lucid", "coherent", "structured"]
NEG_WORDS = ["garble", "spamspam", "clickbait", "keysmash"]
FILLER = ["the", "data", "spark", "table", "row", "join"]


def planted_corpus(n=160):
    """Deterministic corpus: doc i is positive iff i % 2 == 0; each doc
    carries 4 class-marker words and 4 shared filler words."""
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        vocab = POS_WORDS if pos else NEG_WORDS
        words = [vocab[(i + k) % len(vocab)] for k in range(4)]
        words += [FILLER[(i + k) % len(FILLER)] for k in range(4)]
        rows.append((i, " ".join(words), 1 if pos else 0))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        planted_corpus(), ["doc_id", "text", "y"]
    ).localCheckpoint(eager=True)


def test_learns_planted_signal_on_holdout(spark, corpus):
    # i % 5 == 4 covers both parities -> the holdout has both classes,
    # and the training set stays balanced
    train = corpus.where(F.col("doc_id") % 5 != 4)
    test = corpus.where(F.col("doc_id") % 5 == 4)
    w = logreg_train(
        hashed_token_features(train), train.select("doc_id", "y"),
        iterations=25,
    )
    pred = logreg_predict(hashed_token_features(test), w)
    joined = pred.join(test.select("doc_id", "y"), "doc_id")
    acc = joined.where(
        (F.col("pred") & (F.col("y") == 1))
        | (~F.col("pred") & (F.col("y") == 0))
    ).count() / joined.count()
    assert acc >= 0.95


def test_matches_dense_numpy_gd(spark, corpus):
    n_buckets, iters, lr, reg = 64, 10, 2.0, 1e-4
    sub = corpus.where(F.col("doc_id") < 40)
    feats = hashed_token_features(sub, n_buckets=n_buckets)
    w = logreg_train(
        feats, sub.select("doc_id", "y"), iterations=iters, lr=lr, reg=reg
    )
    # dense replica: bucket -1 (bias) mapped to column n_buckets
    rows = feats.collect()
    ids = sorted({r["doc_id"] for r in rows})
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), n_buckets + 1))
    for r in rows:
        b = n_buckets if r["bucket"] == BIAS_BUCKET else r["bucket"]
        X[idx[r["doc_id"]], b] = r["x"]
    y = np.array(
        [r["y"] for r in sorted(sub.select("doc_id", "y").collect(),
                                key=lambda r: idx[r["doc_id"]])],
        dtype=float,
    )
    # only buckets present in the feature table carry weights
    active = sorted(
        {n_buckets if r["bucket"] == BIAS_BUCKET else r["bucket"] for r in rows}
    )
    wv = np.zeros(n_buckets + 1)
    for _ in range(iters):
        resid = 1.0 / (1.0 + np.exp(-X @ wv)) - y
        g = X.T @ resid / len(ids)
        upd = wv * (1.0 - lr * reg) - lr * g
        wv = np.zeros(n_buckets + 1)
        wv[active] = upd[active]
    got = {
        (n_buckets if r["bucket"] == BIAS_BUCKET else r["bucket"]): r["w"]
        for r in w.collect()
    }
    for b in active:
        assert math.isclose(got[b], wv[b], rel_tol=1e-6, abs_tol=1e-9)


def test_loss_decreases_with_training(spark, corpus):
    feats = hashed_token_features(corpus)
    labels = corpus.select("doc_id", "y")

    def loss(iters):
        w = logreg_train(feats, labels, iterations=iters)
        scored = logreg_predict(feats, w).join(labels, "doc_id")
        eps = 1e-12
        return scored.select(
            F.avg(
                -F.col("y") * F.log(F.col("score") + eps)
                - (1 - F.col("y")) * F.log(1 - F.col("score") + eps)
            ).alias("ll")
        ).collect()[0]["ll"]

    l0, l5, l20 = loss(0), loss(5), loss(20)
    assert l0 == pytest.approx(math.log(2), rel=1e-6)  # zero weights
    assert l5 < l0 and l20 < l5


class TestEvaluationOps:
    def test_threshold_report_hand_computed(self, spark):
        from sfdata_wrangler_spark.operators.classifier import (
            binary_classification_report,
        )

        rows = [
            (0.9, 1), (0.8, 1), (0.7, 0), (0.4, 1), (0.2, 0), (0.1, 0),
        ]
        df = spark.createDataFrame(rows, "score double, y int")
        out = {
            round(r.threshold, 2): r
            for r in binary_classification_report(
                df, thresholds=(0.5, 0.85)
            ).collect()
        }
        r5 = out[0.5]
        assert (r5.tp, r5.fp, r5.fn, r5.tn) == (2, 1, 1, 2)
        assert r5.precision == 2 / 3 and r5.recall == 2 / 3
        r85 = out[0.85]
        assert (r85.tp, r85.fp, r85.fn, r85.tn) == (1, 0, 2, 3)
        assert r85.precision == 1.0 and r85.recall == 1 / 3

    def test_threshold_report_degenerate_all_negative(self, spark):
        from sfdata_wrangler_spark.operators.classifier import (
            binary_classification_report,
        )

        df = spark.createDataFrame(
            [(0.2, 0), (0.3, 0)], "score double, y int"
        )
        r = binary_classification_report(df, thresholds=(0.5,)).collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (0, 0, 0, 2)
        assert r.precision is None and r.recall is None
        assert r.accuracy == 1.0  # both correctly rejected

    def test_calibration_buckets(self, spark):
        from sfdata_wrangler_spark.operators.classifier import (
            calibration_table,
        )

        rows = (
            [(0.05, 0)] * 9 + [(0.05, 1)]          # bucket 0: 10% pos
            + [(0.95, 1)] * 9 + [(0.95, 0)]        # bucket 9: 90% pos
            + [(1.0, 1)]                           # score 1.0 clamps to 9
        )
        df = spark.createDataFrame(rows, "score double, y int")
        out = {r.bucket: r for r in calibration_table(df).collect()}
        assert set(out) == {0, 9}
        assert out[0].n == 10 and out[0].pos_rate == 0.1
        assert out[9].n == 11 and out[9].n_pos == 10
        assert out[0].mean_score == 0.05


def test_distilled_model_evaluation_integration(spark):
    """End-to-end model-quality loop: train the distilled quality
    classifier on the sf0.001 corpus, score the holdout, and read it
    out through the evaluation ops — the report must show the model
    actually learned the rule (precision and recall comfortably above
    the positive-rate baseline at the 0.5 threshold)."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.functions.text import quality_score
    from sfdata_wrangler_spark.operators.classifier import (
        binary_classification_report,
        calibration_table,
        hashed_token_features,
        logreg_predict,
        logreg_train,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).withColumn("y", (quality_score(F.col("text")) >= F.lit(1.0)).cast("int"))
    train = docs.where(F.col("doc_id") % 5 != 4)
    holdout = docs.where(F.col("doc_id") % 5 == 4)
    w = logreg_train(
        hashed_token_features(train), train.select("doc_id", "y"),
        iterations=15,
    )
    scored = logreg_predict(hashed_token_features(holdout), w).join(
        holdout.select("doc_id", "y"), "doc_id"
    )
    rep = {
        round(r.threshold, 2): r
        for r in binary_classification_report(
            scored, score_col="score", label_col="y",
            thresholds=(0.5,),
        ).collect()
    }[0.5]
    n = rep.tp + rep.fp + rep.fn + rep.tn
    base_rate = (rep.tp + rep.fn) / n
    assert n == holdout.count()
    assert rep.precision is not None and rep.precision >= base_rate
    assert rep.recall is not None and rep.recall > 0.6
    cal = calibration_table(scored, score_col="score", label_col="y")
    rows = cal.collect()
    assert sum(r.n for r in rows) == n
    # calibration direction: the highest-score bucket must have a
    # higher positive rate than the lowest-score bucket
    lo = min(rows, key=lambda r: r.bucket)
    hi = max(rows, key=lambda r: r.bucket)
    assert hi.pos_rate >= lo.pos_rate


class TestGroupedReport:
    def test_per_slice_cells_and_rates(self, spark):
        from sfdata_wrangler_spark.operators.classifier import (
            grouped_classification_report,
        )

        rows = (
            # slice A: perfect scorer
            [("A", 0.9, 1)] * 3 + [("A", 0.1, 0)] * 3
            # slice B: scorer always fires, labels half positive
            + [("B", 0.9, 1)] * 2 + [("B", 0.9, 0)] * 2
        )
        df = spark.createDataFrame(rows, "g string, score double, y int")
        out = {r.g: r for r in grouped_classification_report(
            df, ["g"]
        ).collect()}
        a = out["A"]
        assert (a.tp, a.fp, a.fn, a.tn) == (3, 0, 0, 3)
        assert a.precision == 1.0 and a.recall == 1.0 and a.accuracy == 1.0
        assert a.selection_rate == 0.5
        b = out["B"]
        assert (b.tp, b.fp, b.fn, b.tn) == (2, 2, 0, 0)
        assert b.precision == 0.5 and b.recall == 1.0
        assert b.selection_rate == 1.0  # the disparity the slice shows

    def test_empty_slice_denominators_null(self, spark):
        from sfdata_wrangler_spark.operators.classifier import (
            grouped_classification_report,
        )

        df = spark.createDataFrame(
            [("C", 0.2, 0)], "g string, score double, y int"
        )
        r = grouped_classification_report(df, ["g"]).collect()[0]
        assert r.precision is None and r.recall is None
        assert r.accuracy == 1.0 and r.selection_rate == 0.0
