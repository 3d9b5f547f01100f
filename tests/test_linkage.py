"""Blocked fuzzy linkage (operators/linkage.py): hand-checked pairs,
blocking recall boundary, hot-block cap + reporting, no-cartesian
plan."""

from __future__ import annotations

from sfdata_wrangler_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    oversized_blocks,
)


def _df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "p_name string")


def test_pairs_hand_checked(spark):
    df = _df(spark, ["red plate", "hot plate", "red plates", "blue widget"])
    pairs = blocked_fuzzy_pairs(df, "p_name", max_distance=3)
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in pairs.collect()}
    # same block 'plate': red/hot differ by 3; 'plates' is its own block
    assert got == {("hot plate", "red plate"): 3}


def test_blocking_bounds_recall(spark):
    """A near-identical pair in DIFFERENT blocks is (by design) not
    found — the documented blocking trade-off."""
    df = _df(spark, ["red plate", "red plato"])
    assert blocked_fuzzy_pairs(df, "p_name", max_distance=2).count() == 0


def test_hot_block_cap_drops_and_reports(spark):
    names = [f"name{i:03d} smith" for i in range(20)] + ["a jones", "b jones"]
    df = _df(spark, names)
    pairs = blocked_fuzzy_pairs(df, "p_name", max_distance=10, max_block=10)
    assert all("jones" in r["name_a"] for r in pairs.collect())
    over = oversized_blocks(df, "p_name", max_block=10).collect()
    assert [(r["block"], r["block_n"]) for r in over] == [("smith", 20)]


def test_case_and_whitespace_normalized(spark):
    df = _df(spark, ["Red  Plate", "red plate"])
    # normalize collapses both to one distinct entity → no pair
    assert blocked_fuzzy_pairs(df, "p_name", max_distance=3).count() == 0


def test_no_cartesian_in_plan(spark):
    df = _df(spark, ["red plate", "hot plate"])
    plan = (
        blocked_fuzzy_pairs(df, "p_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_blocking_quality_report(spark):
    from sfdata_wrangler_spark.operators.linkage import blocking_quality

    ents = spark.createDataFrame(
        [(n,) for n in ["ann", "anne", "bob", "bobby", "carl"]], ["name"]
    )
    cands = spark.createDataFrame(
        [("ann", "anne"), ("bob", "bobby"), ("ann", "bob")],
        ["name_a", "name_b"],
    )
    truth = spark.createDataFrame(
        [("ann", "anne"), ("bob", "bobby"), ("bobby", "carl")],
        ["name_a", "name_b"],
    )
    r = blocking_quality(ents, cands, truth).collect()[0]
    assert (r.n, r.n_candidates, r.n_truth, r.n_truth_found) == (5, 3, 3, 2)
    assert abs(r.reduction_ratio - (1 - 3 / 10)) < 1e-12
    assert abs(r.pair_completeness - 2 / 3) < 1e-12


def test_blocking_quality_truth_is_a_set(spark):
    """r5 review: a duplicated labeled row must not inflate
    n_candidates (left-join fan-out) or halve completeness
    (count_distinct found vs raw truth rows)."""
    from sfdata_wrangler_spark.operators.linkage import blocking_quality

    ents = spark.createDataFrame([("a",), ("b",), ("c",)], ["name"])
    cands = spark.createDataFrame([("a", "b")], ["name_a", "name_b"])
    truth = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], ["name_a", "name_b"]
    )
    row = blocking_quality(ents, cands, truth).collect()[0]
    assert row["n_candidates"] == 1
    assert row["n_truth"] == 2
    assert row["n_truth_found"] == 1
    assert abs(row["pair_completeness"] - 0.5) < 1e-12
