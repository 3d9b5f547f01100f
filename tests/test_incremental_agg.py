"""Incremental aggregate maintenance (operators/incremental_agg.py):
the merge law, fold-order independence, disjoint/overlapping keys,
and the aggregate-grain join property."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.incremental_agg import (
    merge_aggregates,
    partial_aggregate,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_merge_law(spark):
    a = _facts(spark, [("x", 1.5), ("x", 2.5), ("y", 10.0)])
    b = _facts(spark, [("x", 3.0), ("z", -4.25)])
    merged = merge_aggregates(
        partial_aggregate(a, ["k"], "v"),
        partial_aggregate(b, ["k"], "v"),
        ["k"],
    )
    whole = partial_aggregate(a.unionByName(b), ["k"], "v")
    assert _canon(merged) == _canon(whole)


def test_fold_order_independent(spark):
    batches = [
        _facts(spark, [("a", 1.0), ("b", 2.0)]),
        _facts(spark, [("a", 3.0)]),
        _facts(spark, [("c", 4.0), ("a", -1.0)]),
    ]
    parts = [partial_aggregate(x, ["k"], "v") for x in batches]
    fwd = reduce(lambda p, q: merge_aggregates(p, q, ["k"]), parts)
    rev = reduce(lambda p, q: merge_aggregates(p, q, ["k"]), parts[::-1])
    assert _canon(fwd) == _canon(rev)


def test_disjoint_keys_pass_through(spark):
    a = partial_aggregate(_facts(spark, [("only_a", 7.0)]), ["k"], "v")
    b = partial_aggregate(_facts(spark, [("only_b", 9.0)]), ["k"], "v")
    rows = {r["k"]: r for r in merge_aggregates(a, b, ["k"]).collect()}
    assert rows["only_a"]["cnt"] == 1 and rows["only_a"]["min_v"] == 7.0
    assert rows["only_b"]["cnt"] == 1 and rows["only_b"]["max_v"] == 9.0


def test_min_max_cross_batch(spark):
    a = _facts(spark, [("k", 5.0)])
    b = _facts(spark, [("k", 1.0), ("k", 9.0)])
    r = merge_aggregates(
        partial_aggregate(a, ["k"], "v"),
        partial_aggregate(b, ["k"], "v"),
        ["k"],
    ).collect()[0]
    assert (r["min_v"], r["max_v"], r["cnt"]) == (1.0, 9.0, 3)


def test_merge_join_is_aggregate_grain(spark):
    """The merge plan joins two aggregates — no scan of raw facts on
    the history side ever reappears after the partial."""
    a = partial_aggregate(_facts(spark, [("x", 1.0)]), ["k"], "v")
    b = partial_aggregate(_facts(spark, [("x", 2.0)]), ["k"], "v")
    plan = (
        merge_aggregates(a, b, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
