"""DSIR importance resampling (operators/dsir.py): planted-signal
recovery, ratio calibration, partition invariance, broadcast plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.dsir import (
    dsir_bucket_counts,
    dsir_select,
    dsir_weights,
)


def _corpora(spark):
    # target vocabulary: code-ish; off-target vocabulary: cooking-ish
    target_rows = [(100 + i, "spark shuffle join hash scan") for i in range(10)]
    raw_rows = (
        [(i, "spark shuffle join hash scan") for i in range(5)]
        + [(50 + i, "flour sugar butter eggs milk") for i in range(5)]
    )
    t = spark.createDataFrame(target_rows, "doc_id long, text string")
    r = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return r, t


def test_target_like_docs_score_higher(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target)
    scores = {r["doc_id"]: r["mean_ratio_micro"] for r in w.collect()}
    on_target = [scores[i] for i in range(5)]
    off_target = [scores[50 + i] for i in range(5)]
    assert min(on_target) > max(off_target)
    # and the on-target docs sit above ratio 1.0, off-target below
    assert all(s > 1_000_000 for s in on_target)
    assert all(s < 1_000_000 for s in off_target)


def test_select_keeps_exactly_on_target(spark):
    raw, target = _corpora(spark)
    kept = {r["doc_id"] for r in dsir_select(raw, target, 1_000_000).collect()}
    assert kept == {0, 1, 2, 3, 4}


def test_bucket_counts_bounded_and_total(spark):
    raw, _ = _corpora(spark)
    counts = dsir_bucket_counts(raw)
    assert counts.count() <= 256
    assert counts.agg(F.sum("cnt")).collect()[0][0] == 50  # 10 docs × 5 toks


def test_partition_invariance(spark):
    raw, target = _corpora(spark)
    a = sorted(map(tuple, dsir_weights(raw, target).collect()))
    b = sorted(
        map(tuple, dsir_weights(raw.repartition(7), target.repartition(3)).collect())
    )
    assert a == b


def test_scoring_joins_broadcast_model(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
