"""Tests for the rule-driven aggregation engine (§2.4,
SFMuniDataAggregator.py:1018-1214 semantics)."""

import pytest
from pyspark.sql import Row

from sfdata_wrangler_spark.operators.aggregate import (
    AggRule,
    aggregate_records,
    update_speeds,
)


def _df(spark):
    rows = [
        # group, seq, x, w
        Row(g="a", seq=2, x=20.0, w=1.0),
        Row(g="a", seq=1, x=10.0, w=3.0),
        Row(g="a", seq=3, x=None, w=2.0),
        Row(g="b", seq=1, x=5.0, w=2.0),
    ]
    return spark.createDataFrame(rows)


def test_first_last_require_order(spark):
    with pytest.raises(ValueError, match="order_by"):
        aggregate_records(
            _df(spark), ["g"], [AggRule("f", "x", "first")]
        )


def test_first_last_pinned_ordering(spark):
    out = {
        r.g: r
        for r in aggregate_records(
            _df(spark),
            ["g"],
            [
                AggRule("first_x", "x", "first"),
                AggRule("last_x", "x", "last"),
            ],
            order_by=["seq"],
        ).collect()
    }
    assert out["a"].first_x == 10.0  # seq=1, regardless of input order
    assert out["a"].last_x is None  # seq=3 row carries null
    assert out["b"].first_x == 5.0


def test_weighted_aggregations_nan_skipping(spark):
    """wgtAvg skips null-x pairs in BOTH numerator and denominator
    (pandas NaN-skipping parity)."""
    out = {
        r.g: r
        for r in aggregate_records(
            _df(spark),
            ["g"],
            [
                AggRule("ws", "x", "wgtSum"),
                AggRule("wa", "x", "wgtAvg"),
                AggRule("n", "x", "count", dtype="bigint"),
                AggRule("nu", "seq", "countUnique", dtype="bigint"),
            ],
            weight="w",
        ).collect()
    }
    # a: ws = 10*3 + 20*1 (null row contributes nothing) = 50
    assert out["a"].ws == 50.0
    # a: wa = 50 / (3+1) — null-x row's weight excluded
    assert out["a"].wa == 12.5
    assert out["a"].n == 2  # count skips nulls
    assert out["a"].nu == 3


def test_level_gating(spark):
    """Rules above the target level are dropped
    (SFMuniDataAggregator.py:1092-1101)."""
    out = aggregate_records(
        _df(spark),
        ["g"],
        [
            AggRule("fine", "x", "sum", maxlevel="trip"),
            AggRule("coarse", "x", "sum", maxlevel="system"),
        ],
        level="route",
    )
    assert out.columns == ["g", "coarse"]


def test_update_speeds_guards(spark):
    """RUNSPEED = miles/(runtime/60) with 0-runtime → 0.0 and
    negative → null (SFMuniDataAggregator.py:1257-1270)."""
    df = spark.createDataFrame(
        [
            Row(SERVMILES=6.0, RUNTIME=30.0),
            Row(SERVMILES=6.0, RUNTIME=0.0),
            Row(SERVMILES=6.0, RUNTIME=-1.0),
        ]
    )
    out = update_speeds(df, tottime_col=None).collect()
    assert out[0].RUNSPEED == 12.0
    assert out[1].RUNSPEED == 0.0
    assert out[2].RUNSPEED is None
