"""Product quantization (operators/pq.py): planted-cluster encoding,
ADC vs exact-distance agreement, partition invariance, broadcast
plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)


def _clustered(spark, n_per=6, d=16):
    """Two well-separated clusters with labels 0/1; d=16, m=2
    subspaces of 8."""
    rng = random.Random(7)
    rows = []
    for label, base in ((0, -0.5), (1, 0.5)):
        for i in range(n_per):
            vec = [base + rng.uniform(-0.05, 0.05) for _ in range(d)]
            rows.append((label * 100 + i, vec, label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_encode_recovers_planted_clusters(spark):
    emb = _clustered(spark)
    cb = pq_codebooks(emb, m=2, sub_dim=8)
    enc = pq_encode(emb, cb, m=2, sub_dim=8)
    rows = enc.collect()
    assert len(rows) == 12 * 2  # every vector × every subspace
    for r in rows:
        assert r["code"] == (0 if r["vec_id"] < 100 else 1)


def test_adc_topk_stays_in_cluster(spark):
    emb = _clustered(spark)
    cb = pq_codebooks(emb, m=2, sub_dim=8)
    enc = pq_encode(emb, cb, m=2, sub_dim=8)
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_adc_topk(queries, enc, cb, k=5, m=2, sub_dim=8).collect()
    assert len(top) == 5
    assert all(r["vec_id"] < 100 for r in top)  # same-cluster neighbors


def test_encode_partition_invariance(spark):
    emb = _clustered(spark)
    cb = pq_codebooks(emb, m=2, sub_dim=8)
    a = sorted(map(tuple, pq_encode(emb, cb, m=2, sub_dim=8).collect()))
    b = sorted(
        map(tuple, pq_encode(emb.repartition(5), cb, m=2, sub_dim=8).collect())
    )
    assert a == b


def test_adc_scan_never_joins_vectors(spark):
    """The ADC join touches only (subspace, code) — both join inputs
    must broadcast-join, with no sort-merge of the corpus."""
    emb = _clustered(spark)
    cb = pq_codebooks(emb, m=2, sub_dim=8)
    enc = pq_encode(emb, cb, m=2, sub_dim=8)
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        pq_adc_topk(queries, enc, cb, k=3, m=2, sub_dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
