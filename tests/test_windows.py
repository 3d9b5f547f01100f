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
    sessionize_bucketed,
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


def _assert_bucketed_matches(spark, rows, gap, bucket, extra=None):
    df = spark.createDataFrame(rows)
    kw = dict(gap_minutes=gap, order_cols=["ts", "i"], extra_break=extra)
    plain = sessionize(df, ["u"], "ts", **kw)
    buck = sessionize_bucketed(df, ["u"], "ts", bucket_minutes=bucket, **kw)
    assert sorted(plain.columns) == sorted(buck.columns)
    p = {(r.u, r.i): r.SESSION_ID for r in plain.collect()}
    b = {(r.u, r.i): r.SESSION_ID for r in buck.collect()}
    assert p == b, {k: (p[k], b.get(k)) for k in p if p[k] != b.get(k)}


def test_sessionize_bucketed_boundary_cases(spark):
    """The hand-picked hazards: a session continuing across a bucket
    boundary, a break exactly at the boundary, an empty bucket between
    events, a gap exactly equal to the threshold (strict >, no break),
    and an entity whose whole history sits in one bucket."""
    rows = [
        # u=1: session straddles the 60-min bucket edge (55 -> 65, gap 10)
        Row(u=1, i=1, ts=_ts(0)),
        Row(u=1, i=2, ts=_ts(55)),
        Row(u=1, i=3, ts=_ts(65)),
        # then a break across the next edge (65 -> 185: empty bucket between)
        Row(u=1, i=4, ts=_ts(185)),
        # u=2: gap exactly == threshold (30) -> same session (strict >)
        Row(u=2, i=5, ts=_ts(0)),
        Row(u=2, i=6, ts=_ts(30)),
        # u=3: single-bucket entity
        Row(u=3, i=7, ts=_ts(10)),
        Row(u=3, i=8, ts=_ts(50)),
    ]
    _assert_bucketed_matches(spark, rows, gap=30.0, bucket=60.0)


def test_sessionize_bucketed_extra_break_on_bucket_first_row(spark):
    """An extra_break that lands on the FIRST row of a bucket must
    still break (locally invisible gap, the delta-correction path) —
    and must not double-count with the cross-bucket gap break."""
    rows = [
        Row(u=1, i=1, ts=_ts(55), flip=False),
        Row(u=1, i=2, ts=_ts(61), flip=True),   # first row of bucket 2, flip
        Row(u=1, i=3, ts=_ts(62), flip=False),
        # flip AND a real gap on a bucket-first row: exactly one break
        Row(u=1, i=4, ts=_ts(200), flip=True),
    ]
    _assert_bucketed_matches(
        spark, rows, gap=30.0, bucket=60.0, extra=F.col("flip")
    )


def test_sessionize_bucketed_null_extra_break(spark):
    """A NULL extra flag on a bucket's first row must not swallow the
    cross-bucket gap break (code-review r11: True & ~NULL = NULL made
    the delta drop the break while the plain form's (gap>thr)|NULL
    still counted it)."""
    df = spark.createDataFrame(
        [(1, 1, _ts(55), None), (1, 2, _ts(200), None), (1, 3, _ts(205), True)],
        "u int, i int, ts timestamp, flip boolean",
    )
    kw = dict(gap_minutes=30.0, order_cols=["ts", "i"],
              extra_break=F.col("flip"))
    plain = sessionize(df, ["u"], "ts", **kw)
    buck = sessionize_bucketed(df, ["u"], "ts", bucket_minutes=60.0, **kw)
    p = {r.i: r.SESSION_ID for r in plain.collect()}
    b = {r.i: r.SESSION_ID for r in buck.collect()}
    assert p == b == {1: 1, 2: 2, 3: 3}
    # column contract: append-only, original order preserved
    assert buck.columns == df.columns + ["SESSION_ID"]


def test_sessionize_bucketed_null_entity_and_ts_rows_kept(spark):
    """Plain sessionize keeps rows with NULL entity keys or NULL
    timestamps (windows group nulls; NULL gap = no break); the
    bucketed join-back must be null-safe so they survive a drop-in
    swap (code-review r11: an equi-join silently dropped them)."""
    df = spark.createDataFrame(
        [
            (1, 1, _ts(0)), (1, 2, None), (1, 3, _ts(100)),
            (None, 4, _ts(0)), (None, 5, _ts(10)), (None, 6, None),
        ],
        "u int, i int, ts timestamp",
    )
    kw = dict(gap_minutes=30.0, order_cols=["ts", "i"])
    plain = sessionize(df, ["u"], "ts", **kw)
    buck = sessionize_bucketed(df, ["u"], "ts", bucket_minutes=60.0, **kw)
    p = {r.i: r.SESSION_ID for r in plain.collect()}
    b = {r.i: r.SESSION_ID for r in buck.collect()}
    assert len(b) == 6  # nothing dropped
    assert p == b


def test_sessionize_bucketed_replaces_existing_session_col(spark):
    """Re-sessionizing a frame that already carries session_col must
    replace it in place (one column, original position) exactly as
    plain sessionize's withColumn does."""
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 99), (1, 2, _ts(100), 99)],
        "u int, i int, ts timestamp, SESSION_ID int",
    )
    buck = sessionize_bucketed(
        df, ["u"], "ts", gap_minutes=30.0, order_cols=["ts", "i"],
        bucket_minutes=60.0,
    )
    assert buck.columns == df.columns  # replaced, not appended
    got = {r.i: r.SESSION_ID for r in buck.collect()}
    assert got == {1: 1, 2: 2}


def test_sessionize_bucketed_rejects_scratch_collision(spark):
    import pytest

    df = spark.createDataFrame([(1, _ts(0), 5)], "u int, ts timestamp, __sb_us int")
    with pytest.raises(ValueError, match="__sb_"):
        sessionize_bucketed(df, ["u"], "ts", gap_minutes=30.0)


def test_sessionize_bucketed_randomized_differential(spark):
    """Seeded random timelines over several users/days, compared
    row-for-row against the plain window form at two bucket sizes
    (including bucket == gap, the minimum legal split)."""
    import random

    rng = random.Random(11)
    rows = []
    i = 0
    for u in range(6):
        t = rng.uniform(0, 300)
        for _ in range(rng.randint(30, 120)):
            rows.append(Row(u=u, i=i, ts=_ts(t)))
            i += 1
            # mixture of within-session jitter and occasional big gaps
            t += rng.choice([rng.uniform(0, 5), rng.uniform(0, 40),
                             rng.uniform(60, 600)])
    for bucket in (30.0, 240.0):
        _assert_bucketed_matches(spark, rows, gap=30.0, bucket=bucket)


def test_sessionize_bucketed_guards(spark):
    import pytest

    df = spark.createDataFrame([Row(u=1, i=1, ts=_ts(0))])
    with pytest.raises(ValueError, match="bucket_minutes"):
        sessionize_bucketed(df, ["u"], "ts", gap_minutes=90.0,
                            bucket_minutes=30.0)
    with pytest.raises(ValueError, match="-major"):
        sessionize_bucketed(df, ["u"], "ts", gap_minutes=30.0,
                            order_cols=["i", "ts"])


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
