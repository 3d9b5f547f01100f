"""Table diff (operators/diff.py): three statuses, identical
snapshots, portability guard, delta-sized output."""

from __future__ import annotations

import pytest

from sfdata_wrangler_spark.operators.diff import diff_summary, table_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a long, b string")


def test_three_statuses(spark):
    left = _snap(spark, [(1, 10, "x"), (2, 20, "y"), (3, 30, "z")])
    right = _snap(spark, [(1, 10, "x"), (2, 99, "y"), (4, 40, "w")])
    got = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_identical_snapshots_empty_diff(spark):
    s = _snap(spark, [(1, 10, "x"), (2, 20, "y")])
    assert table_diff(s, s, ["k"]).count() == 0


def test_summary_counts(spark):
    left = _snap(spark, [(1, 1, "a"), (2, 2, "b"), (3, 3, "c")])
    right = _snap(spark, [(2, 2, "b"), (3, 9, "c"), (5, 5, "e"), (6, 6, "f")])
    got = {r["status"]: r["n"] for r in diff_summary(left, right, ["k"]).collect()}
    assert got == {"removed": 1, "changed": 1, "added": 2}


def test_double_columns_rejected(spark):
    bad = spark.createDataFrame([(1, 1.5)], "k long, v double")
    with pytest.raises(ValueError, match="integer units"):
        table_diff(bad, bad, ["k"])


def test_key_only_payload_order_irrelevant(spark):
    """Same payload values in differently-ORDERED column lists hash
    per-column-position — reordering columns is a schema change and
    must surface as 'changed', not silently match."""
    left = _snap(spark, [(1, 7, "q")])
    right = spark.createDataFrame([(1, "q", 7)], "k long, a string, b long")
    got = table_diff(left, right, ["k"]).collect()
    assert [r["status"] for r in got] == ["changed"]
