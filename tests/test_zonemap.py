"""Zone-map pruning: the one-sided skip guarantee must hold on any
layout, and the skip RATE must reward clustered layouts — the whole
point of z-order/sort-key writes."""

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.zonemap import (
    prune_files,
    skip_rate,
    zonemap_stats,
)


def _with_files(spark, layout):
    """300 rows, k in 0..299; 'clustered' files are contiguous key
    ranges (what a sorted/z-ordered write produces), 'shuffled' files
    interleave the whole range (round-robin write)."""
    rows = []
    for k in range(300):
        f = k // 50 if layout == "clustered" else k % 6
        rows.append((f"f{f}", k, float(k) * 2.0))
    return spark.createDataFrame(rows, ["file", "k", "v"])


class TestZonemapPruning:
    def test_no_false_skips_any_layout(self, spark):
        preds = [("k", "between", 100, 120)]
        for layout in ("clustered", "shuffled"):
            df = _with_files(spark, layout)
            zm = zonemap_stats(df, "file", ["k", "v"])
            pruned = prune_files(zm, preds)
            skipped = {
                r["file"] for r in pruned.where(~F.col("may_match")).collect()
            }
            # a skipped file must contain ZERO matching rows
            actual = df.where((F.col("k") >= 100) & (F.col("k") <= 120))
            assert (
                actual.where(F.col("file").isin(list(skipped) or ["_"]))
                .count()
                == 0
            )

    def test_clustered_layout_skips_shuffled_does_not(self, spark):
        preds = [("k", "between", 100, 120)]
        rates = {}
        for layout in ("clustered", "shuffled"):
            zm = zonemap_stats(
                _with_files(spark, layout), "file", ["k", "v"]
            )
            s = skip_rate(prune_files(zm, preds)).collect()[0]
            rates[layout] = (s.files_skipped, s.n_files, s.rows_skipped)
        # contiguous spans: the 21-key range hits 1-2 of 6 files
        assert rates["clustered"][0] >= 4
        assert rates["clustered"][2] >= 200
        # interleaved spans cover the full range: nothing skippable
        assert rates["shuffled"][0] == 0

    def test_equality_and_inequality_ops(self, spark):
        df = _with_files(spark, "clustered")
        zm = zonemap_stats(df, "file", ["k", "v"])
        # k = 275 lives only in f5 (250-299)
        p = prune_files(zm, [("k", "=", 275)])
        assert {
            r["file"] for r in p.where(F.col("may_match")).collect()
        } == {"f5"}
        # k < 50 lives only in f0
        p = prune_files(zm, [("k", "<", 50)])
        assert {
            r["file"] for r in p.where(F.col("may_match")).collect()
        } == {"f0"}
        # contradictory conjunction across columns: v >= 500 needs
        # k >= 250 (f5) but k <= 149 needs f0-f2 — every file fails
        # one of the two interval tests, so ALL files prune
        p = prune_files(zm, [("v", ">=", 500.0), ("k", "<=", 149)])
        assert p.where(F.col("may_match")).count() == 0

    def test_bad_op_raises(self, spark):
        zm = zonemap_stats(
            _with_files(spark, "clustered"), "file", ["k"]
        )
        with pytest.raises(ValueError):
            prune_files(zm, [("k", "!=", 5)]).collect()
