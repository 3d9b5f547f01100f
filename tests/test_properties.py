"""Property-based differential tests (hypothesis): the distributed
window kernels must equal naive single-threaded reference
implementations on arbitrary inputs."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.weighting import calc_weights
from sfdata_wrangler_spark.operators.windows import sessionize

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
