"""Tests for SCD2 interval collapse and one-pass table profiling."""

import datetime

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.profile import profile_table
from sfdata_wrangler_spark.operators.scd2 import collapse_to_intervals


def _ts(day, h=0):
    return datetime.datetime(2024, 1, day, h)


class TestSCD2:
    def test_runs_collapse_with_half_open_intervals(self, spark):
        rows = [
            # user 1: A A B A -> three intervals
            (1, 1, _ts(1), "A"), (1, 2, _ts(2), "A"),
            (1, 3, _ts(3), "B"), (1, 4, _ts(4), "A"),
            # user 2: single run
            (2, 5, _ts(1), "X"), (2, 6, _ts(9), "X"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "attr"])
        out = sorted(
            collapse_to_intervals(
                df, ["user_id"], ["attr"], ["ts", "event_id"]
            ).collect(),
            key=lambda r: (r["user_id"], r["valid_from"]),
        )
        got = [
            (r["user_id"], r["attr"], r["valid_from"].day,
             r["valid_until"].day if r["valid_until"] else None,
             r["n_snapshots"])
            for r in out
        ]
        assert got == [
            (1, "A", 1, 3, 2),
            (1, "B", 3, 4, 1),
            (1, "A", 4, None, 1),
            (2, "X", 1, None, 2),
        ]

    def test_null_attr_transitions(self, spark):
        rows = [
            (1, 1, _ts(1), None), (1, 2, _ts(2), None),  # null run
            (1, 3, _ts(3), "A"),                          # null -> A opens
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "attr"])
        out = sorted(
            collapse_to_intervals(
                df, ["user_id"], ["attr"], ["ts", "event_id"]
            ).collect(),
            key=lambda r: r["valid_from"],
        )
        assert [(r["attr"], r["n_snapshots"]) for r in out] == [
            (None, 2), ("A", 1),
        ]

    def test_multi_attr_any_change_opens_interval(self, spark):
        rows = [
            (1, 1, _ts(1), "A", 10), (1, 2, _ts(2), "A", 20),
            (1, 3, _ts(3), "A", 20),
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "event_id", "ts", "a1", "a2"]
        )
        out = collapse_to_intervals(
            df, ["user_id"], ["a1", "a2"], ["ts", "event_id"]
        ).collect()
        assert len(out) == 2  # a2 change split the run despite equal a1


class TestProfile:
    def test_exact_profile_hand_checked(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (None, "y"), (4, None)], ["a", "b"]
        )
        got = {
            (r["column"], r["metric"]): r["value"]
            for r in profile_table(df, exact=True).collect()
        }
        assert got[("a", "n")] == "3"
        assert got[("a", "nulls")] == "1"
        assert got[("a", "min")] == "1"
        assert got[("a", "max")] == "4"
        assert got[("a", "distinct")] == "3"
        assert got[("b", "distinct")] == "2"
        assert got[("b", "nulls")] == "1"

    def test_single_job_not_per_column(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("a"), (F.col("id") % 7).alias("b"),
            (F.col("id") % 3).alias("c"),
        )
        plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
        # one aggregate over the scan: no join/union fan-out per column
        assert "Union" not in plan and "Join" not in plan

    def test_sketch_within_relative_error(self, spark):
        n = 20000
        df = spark.range(n).select(
            (F.col("id") % 4999).alias("a"), F.col("id").alias("b")
        )
        got = {
            (r["column"], r["metric"]): int(r["value"])
            for r in profile_table(df, ["a", "b"]).collect()
            if r["metric"] == "distinct"
        }
        # approx_count_distinct default rsd = 5%
        assert got[("a", "distinct")] == pytest.approx(4999, rel=0.1)
        assert got[("b", "distinct")] == pytest.approx(n, rel=0.1)

    def test_quantile_sketch_close_to_exact(self, spark):
        df = spark.range(10001).select(F.col("id").cast("double").alias("a"),
                                       F.col("id").cast("string").alias("s"))
        got = {
            (r["column"], r["metric"]): r["value"]
            for r in profile_table(
                df, quantiles=(0.5, 0.9)
            ).collect()
        }
        assert float(got[("a", "p50")]) == pytest.approx(5000, rel=0.02)
        assert float(got[("a", "p90")]) == pytest.approx(9000, rel=0.02)
        # non-numeric columns get no quantile rows
        assert ("s", "p50") not in got
