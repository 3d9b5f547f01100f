"""Catalog wave 14 (round 3): trained quality classifier + Z-order
layout keys.

The classifier is heuristic distillation, the fasttext deployment
pattern: label a corpus slice with the cheap rule-based quality
score, train the hashed-feature logistic model on it, score a
holdout slice. Training is iterative (batch GD) — not
SQL-expressible, so rows-only; the math is pinned by
tests/test_classifier.py's exact dense-numpy differential and a
planted-signal holdout-accuracy test.

The Z-order key is pure bit arithmetic — hash-exact against DuckDB;
its data-skipping efficacy is measured in tests/test_zorder.py from
real parquet row-group stats.
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
from ..operators.zorder import add_zorder_key, zorder_oracle_sql
from .catalog import _register, _t


@_register("txt_quality_distill", None)
def txt_quality_distill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the rule-based quality filter into a linear model
    (operators/classifier.py): train on doc_id % 5 != 4, score the
    holdout. Corpus work per GD step is two compact-key shuffles; the
    model stays a broadcast-size (bucket, w) table.

    twins: ``txt_quality_distill_det`` (hash-exact, round 8) replays
    the SAME pipeline with the integer-micro deterministic trainer —
    the whole GD trajectory is oracle-checked bit-for-bit there;
    ``qc_classification_report`` / ``qc_calibration_table``
    (hash-exact, driver-green r4) verify the scorer-evaluation math;
    holdout accuracy ≥ 0.95 on planted signal is pinned in
    tests/test_classifier.py. This float-sigmoid variant stays
    rows-only: its gradient sums are reduce-order dependent by
    construction."""
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


_Z_COLS = ["l_partkey", "l_suppkey"]
_Z_SELECT = (
    "CAST(l_orderkey AS BIGINT) AS l_orderkey, "
    "CAST(l_linenumber AS BIGINT) AS l_linenumber, "
    "CAST(l_partkey AS BIGINT) AS l_partkey, "
    "CAST(l_suppkey AS BIGINT) AS l_suppkey"
)


@_register(
    "z1_zorder_key",
    zorder_oracle_sql("lineitem", _Z_COLS, _Z_SELECT),
)
def z1_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton layout key over (part, supplier) (operators/zorder.py):
    broadcast bounds dim + bit-interleaved ranks, all integer/IEEE
    column ops — writing range-partitioned by this key makes parquet
    min/max skipping effective on BOTH dimensions (measured in
    tests/test_zorder.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return add_zorder_key(li, _Z_COLS).select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
        F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
        "zkey",
    )
