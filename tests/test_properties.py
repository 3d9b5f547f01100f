"""Property-based differential tests (hypothesis): the distributed
window kernels must equal naive single-threaded reference
implementations on arbitrary inputs."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.weighting import calc_weights
from sfdata_wrangler_spark.operators.windows import sessionize, sessionize_bucketed

T0 = datetime.datetime(2024, 1, 1, 0, 0)

# lists of per-entity minute offsets (sorted, possibly duplicated)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # entity
        st.integers(min_value=0, max_value=600),  # minute offset
    ),
    min_size=1,
    max_size=30,
)


def _naive_sessions(events, gap):
    """Reference implementation: sorted per-entity scan."""
    out = {}
    by_entity = {}
    for i, (e, m) in enumerate(events):
        by_entity.setdefault(e, []).append((m, i))
    for e, rows in by_entity.items():
        rows.sort()
        sid = 1
        prev = None
        for m, i in rows:
            if prev is not None and (m - prev) > gap:
                sid += 1
            out[i] = sid
            prev = m
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_sessionize_matches_naive(spark, events):
    df = spark.createDataFrame(
        [
            Row(idx=i, entity=e, ts=T0 + datetime.timedelta(minutes=m))
            for i, (e, m) in enumerate(events)
        ]
    )
    got = {
        r.idx: r.SESSION_ID
        for r in sessionize(
            df, ["entity"], "ts", gap_minutes=45.0, order_cols=["ts", "idx"]
        ).collect()
    }
    want = _naive_sessions(events, 45)
    # session ids must agree up to the per-entity ordering the naive
    # scan uses; ties on (minute) are broken by idx in both
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=events_strategy,
    bucket=st.sampled_from([45.0, 60.0, 240.0]),
)
def test_sessionize_bucketed_matches_naive(spark, events, bucket):
    """The bucketed form's delta/offset merge algebra must reproduce
    the naive per-entity scan on arbitrary timelines, at the minimum
    legal bucket (== gap), a non-divisor bucket, and a coarse one —
    hypothesis hunts boundary-straddling and empty-bucket shapes the
    fixtures might miss."""
    df = spark.createDataFrame(
        [
            Row(idx=i, entity=e, ts=T0 + datetime.timedelta(minutes=m))
            for i, (e, m) in enumerate(events)
        ]
    )
    got = {
        r.idx: r.SESSION_ID
        for r in sessionize_bucketed(
            df, ["entity"], "ts", gap_minutes=45.0,
            order_cols=["ts", "idx"], bucket_minutes=bucket,
        ).collect()
    }
    assert got == _naive_sessions(events, 45)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    observed=st.lists(st.booleans(), min_size=1, max_size=12),
)
def test_weight_invariant_property(spark, observed):
    """For any observation pattern: if any trip is observed, weighted
    trip-stops reproduce the scheduled total; else weights are null."""
    df = spark.createDataFrame(
        [
            Row(cell="c", trip=i, w=1.0 if obs else None, stops=1.0)
            for i, obs in enumerate(observed)
        ],
        "cell: string, trip: int, w: double, stops: double",
    )
    out = calc_weights(df, ["cell"], "w", "stops", "WEIGHT")
    tot = out.agg(
        F.sum(F.col("WEIGHT") * F.col("stops")).alias("w"),
        F.sum("stops").alias("t"),
    ).collect()[0]
    if any(observed):
        assert abs(tot.w - tot.t) < 1e-9
    else:
        assert tot.w is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_parts=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=100),
)
def test_dedup_and_firstlast_partition_invariant(spark, n_parts, seed):
    """Deterministic dedup and ordering-pinned first/last must return
    IDENTICAL results regardless of physical partitioning — the core
    distributed-determinism claim."""
    import random

    from sfdata_wrangler_spark.operators.aggregate import (
        AggRule,
        aggregate_records,
    )
    from sfdata_wrangler_spark.operators.windows import dedup_by_order

    rng = random.Random(seed)
    rows = [
        Row(k=rng.randint(1, 5), ord=i, v=rng.randint(0, 99))
        for i in range(40)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows).repartition(n_parts)

    dd = {
        r.k: (r.ord, r.v)
        for r in dedup_by_order(
            df, ["k"], [F.col("ord").desc()]
        ).collect()
    }
    fl = {
        r.k: (r.first_v, r.last_v)
        for r in aggregate_records(
            df,
            ["k"],
            [AggRule("first_v", "v", "first"), AggRule("last_v", "v", "last")],
            order_by=["ord"],
        ).collect()
    }
    # reference: single-threaded computation
    by_k = {}
    for r in rows:
        by_k.setdefault(r.k, []).append((r.ord, r.v))
    for k, items in by_k.items():
        items.sort()
        assert dd[k] == items[-1]
        assert fl[k] == (items[0][1], items[-1][1])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mask=st.lists(st.booleans(), min_size=4, max_size=12),
)
def test_interpolation_bounds_property(spark, mask):
    """Interpolated values always lie between their bracketing
    observed values; observed values pass through untouched."""
    import datetime as dt

    from sfdata_wrangler_spark.operators.windows import interpolate_monthly

    rows = [
        Row(
            m=dt.date(2020, 1, 1) + dt.timedelta(days=31 * i),
            v=float(10 + 7 * i) if obs else None,
        )
        for i, obs in enumerate(mask)
    ]
    rows = [Row(m=dt.date(2020, 1 + i, 1), v=r.v) for i, r in enumerate(rows)]
    df = spark.createDataFrame(rows, "m: date, v: double")
    out = interpolate_monthly(df, "m", "v", out="f").collect()
    obs_vals = [r.v for r in rows if r.v is not None]
    for r in sorted(out, key=lambda x: x.m):
        orig = next(x.v for x in rows if x.m == r.m)
        if orig is not None:
            assert r.f == orig
        elif r.f is not None:
            assert min(obs_vals) <= r.f <= max(obs_vals)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_parts=st.integers(min_value=1, max_value=12),
    budget=st.integers(min_value=7, max_value=300),
    width=st.integers(min_value=1, max_value=40),
)
def test_pack_windows_partition_invariant(spark, n_parts, budget, width):
    """Packing invariants under ANY partitioning / bucket width:
    equals the global cumsum; offsets stay inside the budget; window
    ids are monotone in layout order."""
    import pandas as pd

    from sfdata_wrangler_spark.operators.packing import pack_context_windows

    rows = [(i, (i * 53) % 211 + 1) for i in range(0, 240, 2)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    before = pdf["n_tokens"].cumsum() - pdf["n_tokens"]
    sdf = spark.createDataFrame(pdf).repartition(n_parts)
    got = (
        pack_context_windows(sdf, budget=budget, bucket_width=width)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.window_id) == list(before // budget)
    assert list(got.window_offset) == list(before % budget)
    assert (got.window_offset < budget).all()
    assert got.window_id.is_monotonic_increasing


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_parts=st.integers(min_value=1, max_value=8))
def test_strict_chain_partition_invariant(spark, n_parts):
    """strict_chain imputation is partition-invariant, and on a panel
    with NO missing cell-months it agrees with the converged window
    form except at the first month (which strict passes through)."""
    import pandas as pd

    from sfdata_wrangler_spark.operators.imputation import (
        impute_from_prior_month,
    )

    months = [f"2023-{m:02d}-01" for m in range(1, 7)]
    rows = []
    for cell in range(5):
        for mi, month in enumerate(months):
            obs = (cell + mi) % 3  # every cell has some obs-0 months
            rows.append(
                {"cell": cell, "MONTH": month, "OBS_TRIP_STOPS": obs,
                 "V": float(cell * 100 + mi)}
            )
    pdf = pd.DataFrame(rows)
    outs = []
    for parts in (1, n_parts):
        sdf = spark.createDataFrame(pdf).repartition(parts)
        out = impute_from_prior_month(
            sdf, ["cell"], "MONTH", ["V"], strict_chain=True
        ).toPandas().sort_values(["cell", "MONTH"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
