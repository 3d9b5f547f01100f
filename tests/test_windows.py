"""Tests for the window-operator library (§2.5)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.windows import (
    bfill,
    dedup_by_order,
    ffill,
    interpolate_monthly,
    observed_runtime,
    sessionize,
    trend_diff,
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 12, 0) + datetime.timedelta(minutes=minute)


def test_sessionize_gap_rule(spark):
    """New session when gap > threshold; ids 1-based contiguous
    (ClipperHelper.py:226-244 / TaxiDataHelper.py:283-302)."""
    df = spark.createDataFrame(
        [
            Row(u=1, i=1, ts=_ts(0)),
            Row(u=1, i=2, ts=_ts(10)),
            Row(u=1, i=3, ts=_ts(200)),  # gap 190 > 90 → new session
            Row(u=1, i=4, ts=_ts(205)),
            Row(u=2, i=5, ts=_ts(0)),
        ]
    )
    out = sessionize(df, ["u"], "ts", gap_minutes=90.0, order_cols=["ts", "i"])
    got = {(r.u, r.i): r.SESSION_ID for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 2, (2, 5): 1}


def test_sessionize_extra_break(spark):
    """Status-flip breaks sessions even without a time gap
    (taxi meter flip, TaxiDataHelper.py:283-285)."""
    df = spark.createDataFrame(
        [
            Row(u=1, i=1, ts=_ts(0), flip=False),
            Row(u=1, i=2, ts=_ts(1), flip=True),
            Row(u=1, i=3, ts=_ts(2), flip=False),
        ]
    )
    out = sessionize(
        df,
        ["u"],
        "ts",
        gap_minutes=90.0,
        extra_break=F.col("flip"),
        order_cols=["ts", "i"],
    )
    got = [r.SESSION_ID for r in out.orderBy("i").collect()]
    assert got == [1, 2, 2]


def test_ffill_bfill(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, t=1, v=None),
            Row(k=1, t=2, v=10.0),
            Row(k=1, t=3, v=None),
            Row(k=1, t=4, v=20.0),
            Row(k=1, t=5, v=None),
        ]
    )
    f = {r.t: r.v for r in ffill(df, "v", ["k"], ["t"]).collect()}
    assert f == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: 20.0}
    b = {r.t: r.v for r in bfill(df, "v", ["k"], ["t"]).collect()}
    assert b == {1: 10.0, 2: 10.0, 3: 20.0, 4: 20.0, 5: None}


def test_interpolate_monthly_linear(spark):
    """Gap of two months interpolates linearly on month index; leading/
    trailing gaps stay null (endpoint extrapolation is separate)."""
    rows = [
        Row(m=datetime.date(2013, 1, 1), v=None),
        Row(m=datetime.date(2013, 2, 1), v=10.0),
        Row(m=datetime.date(2013, 3, 1), v=None),
        Row(m=datetime.date(2013, 4, 1), v=None),
        Row(m=datetime.date(2013, 5, 1), v=40.0),
        Row(m=datetime.date(2013, 6, 1), v=None),
    ]
    df = spark.createDataFrame(rows, "m: date, v: double")
    out = {
        r.m.month: r.v
        for r in interpolate_monthly(df, "m", "v").collect()
    }
    assert out[1] is None
    assert out[2] == 10.0
    assert out[3] == 20.0
    assert out[4] == 30.0
    assert out[5] == 40.0
    assert out[6] is None


def test_dedup_by_order_deterministic(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, ord=2, v="newer"),
            Row(k=1, ord=1, v="older"),
            Row(k=2, ord=5, v="only"),
        ]
    )
    out = {
        r.k: r.v
        for r in dedup_by_order(df, ["k"], [F.col("ord").desc()]).collect()
    }
    assert out == {1: "newer", 2: "only"}


def test_observed_runtime(spark):
    """max(0, arrival − prev departure), 0 at first stop
    (SFMuniDataExpander.py:35-53)."""
    df = spark.createDataFrame(
        [
            Row(trip=1, seq=1, arr=_ts(0), dep=_ts(1)),
            Row(trip=1, seq=2, arr=_ts(5), dep=_ts(6)),
            Row(trip=1, seq=3, arr=_ts(4), dep=_ts(7)),  # negative → 0
        ]
    )
    out = observed_runtime(df, "arr", "dep", ["trip"], ["seq"])
    got = {r.seq: r.RUNTIME for r in out.collect()}
    assert got == {1: 0.0, 2: 4.0, 3: 0.0}


def test_trend_diff(spark):
    df = spark.createDataFrame(
        [Row(k=1, t=i, v=float(i * 10)) for i in range(1, 5)]
    )
    out = trend_diff(df, "v", ["k"], ["t"], periods=2)
    got = {r.t: (r.v_DIFF2, r.v_PCT2) for r in out.collect()}
    assert got[1] == (None, None)
    assert got[3] == (20.0, 2.0)
    assert got[4] == (20.0, 1.0)
