"""Round-4 property tests: qsketch error bound over arbitrary value
distributions, and the interval-overlap grid join vs a brute-force
reference under randomized keyed intervals."""

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

T0 = datetime.datetime(2024, 7, 1, 0, 0)

values_strategy = st.lists(
    st.floats(
        min_value=-10.0,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=values_strategy, q=st.sampled_from([0.25, 0.5, 0.9, 0.99]))
def test_qsketch_relative_error_bound_holds(spark, vals, q):
    from sfdata_wrangler_spark.operators.qsketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    sk = qsketch_build(df, ["g"], "v", scale=100, sub_bits=6)
    label = f"q{int(round(q * 100))}_scaled"
    out = qsketch_quantiles(sk, ["g"], [q], sub_bits=6).collect()[0]
    est = out[label]
    svals = sorted(int(math.floor(v * 100 + 0.5)) for v in vals)
    exact = svals[math.ceil(q * len(svals)) - 1]
    if exact <= 0:
        # zero-class: the sketch reports the class lower bound 0
        assert est == 0
    else:
        assert est <= exact
        assert exact <= est * (1 + 1 / 64) + 1, (vals, q, est, exact)


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=500),  # start minute
        st.integers(min_value=0, max_value=180),  # duration (0 = empty)
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a_rows=intervals_strategy, b_rows=intervals_strategy)
def test_interval_overlap_keyed_matches_brute_force(spark, a_rows, b_rows):
    from sfdata_wrangler_spark.operators.interval_lookup import (
        interval_overlap_join,
    )

    def mk(rows, pfx):
        return spark.createDataFrame(
            [
                (
                    i,
                    str(k),
                    T0 + datetime.timedelta(minutes=s),
                    T0 + datetime.timedelta(minutes=s + d),
                )
                for i, (k, s, d) in enumerate(rows)
            ],
            f"{pfx}_id bigint, k string, {pfx}_s timestamp, {pfx}_e timestamp",
        )

    got = {
        (r.a_id, r.b_id, r.overlap_us)
        for r in interval_overlap_join(
            mk(a_rows, "a"),
            mk(b_rows, "b"),
            "a_s",
            "a_e",
            "b_s",
            "b_e",
            bucket="45 minutes",
            keys=("k",),
        ).collect()
    }
    want = set()
    for i, (ka, sa, da) in enumerate(a_rows):
        for j, (kb, sb, db) in enumerate(b_rows):
            if ka != kb:
                continue
            ov = min(sa + da, sb + db) - max(sa, sb)
            if ov > 0:
                want.add((i, j, ov * 60 * 1_000_000))
    assert got == want
