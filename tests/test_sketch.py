"""Count-min sketch (operators/sketch.py): the one-sided estimate
guarantee, cell-wise mergeability, bounded cell count, and the
broadcast-probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _items(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "tok string")


def test_cms_never_underestimates(spark):
    rows = ["a"] * 50 + ["b"] * 30 + [f"rare_{i}" for i in range(40)]
    items = _items(spark, rows)
    cms = cms_build(items, "tok", depth=4, width_hex=1)
    cands = items.select("tok").distinct()
    est = cms_estimate(cms, cands, "tok", depth=4, width_hex=1)
    exact = items.groupBy("tok").count()
    j = est.join(exact, "tok").collect()
    assert len(j) == 42
    assert all(r["cms_est"] >= r["count"] for r in j)


def test_cms_cell_count_bounded(spark):
    items = _items(spark, [f"t{i}" for i in range(500)])
    cms = cms_build(items, "tok", depth=4, width_hex=1)
    assert cms.count() <= 4 * 16
    # total mass per hash row equals the stream length
    per_seed = cms.groupBy("seed").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == 500 for r in per_seed)


def test_cms_mergeable(spark):
    """sketch(A ∪ B) == cellwise sum of sketch(A) and sketch(B) — the
    property that makes the build a distributable aggregation."""
    a = _items(spark, ["x"] * 5 + ["y"] * 3)
    b = _items(spark, ["y"] * 4 + ["z"] * 2)
    whole = cms_build(a.unionByName(b), "tok", depth=2, width_hex=1)
    merged = (
        cms_build(a, "tok", depth=2, width_hex=1)
        .unionByName(cms_build(b, "tok", depth=2, width_hex=1))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cms_heavy_hitters_no_false_negatives(spark):
    rows = ["hot"] * 100 + ["warm"] * 50 + [f"cold_{i}" for i in range(60)]
    hh = cms_heavy_hitters(_items(spark, rows), "tok", threshold=50)
    got = {r["tok"] for r in hh.collect()}
    assert {"hot", "warm"} <= got  # true heavies always survive


def test_cms_estimate_broadcasts_sketch(spark):
    items = _items(spark, [f"t{i}" for i in range(100)])
    cms = cms_build(items, "tok", depth=4, width_hex=1)
    est = cms_estimate(cms, items.select("tok").distinct(), "tok", 4, 1)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
