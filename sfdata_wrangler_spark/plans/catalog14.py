"""Catalog wave 14 (round 3): trained quality classifier.

Heuristic distillation, the fasttext deployment pattern: label a
corpus slice with the cheap rule-based quality score, train the
hashed-feature logistic model on it, score a holdout slice. Training
is iterative (batch GD) — not SQL-expressible, so rows-only; the
math is pinned by tests/test_classifier.py's exact dense-numpy
differential and a planted-signal holdout-accuracy test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.classifier import (
    hashed_token_features,
    logreg_predict,
    logreg_train,
)
from .catalog import _register, _t


@_register("txt_quality_distill", None)
def txt_quality_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the rule-based quality filter into a linear model
    (operators/classifier.py): train on doc_id % 5 != 4, score the
    holdout. Corpus work per GD step is two compact-key shuffles; the
    model stays a broadcast-size (bucket, w) table."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "y", (quality_score(F.col("text")) >= F.lit(1.0)).cast("int")
    )
    train = docs.where(F.col("doc_id") % 5 != 4)
    holdout = docs.where(F.col("doc_id") % 5 == 4)
    w = logreg_train(
        hashed_token_features(train),
        train.select("doc_id", "y"),
        iterations=15,
    )
    scored = logreg_predict(hashed_token_features(holdout), w)
    return scored.join(holdout.select("doc_id", "y"), "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("y").cast("bigint").alias("label"),
        F.col("pred").cast("bigint").alias("pred"),
        F.round(F.col("score"), 4).alias("score_r4"),
    )
