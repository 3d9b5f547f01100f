"""Round-3-restart operator waves: pigeonhole SimHash pairs,
prefix-filter exact similarity join, skew/seasonal/winsorize QC,
rolling distinct users (exact + HLL), target encoding, FK integrity,
time-weighted averages, CUSUM, A/B z-test, correlation, join-size
pre-flight, SCD2 interval validation."""

import datetime

import pytest
import itertools

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.dedup import exact_jaccard_pairs
from sfdata_wrangler_spark.operators import (
    prefix_filter_pairs,
    seasonal_anomaly,
    simhash_hamming_pairs,
    skew_report,
    winsorize_bounds,
)


def _ham(a, b):
    return bin(a ^ b).count("1")


class TestSimhashHammingPairs:
    def test_hand_computed(self, spark):
        # 0b0000, 0b0001 (d=1), 0b1111 (d=4/3), 0b0011 (d=2/1/4)
        fps = spark.createDataFrame(
            [(1, 0b0000), (2, 0b0001), (3, 0b1111), (4, 0b0011)],
            ["doc_id", "fp"],
        )
        out = simhash_hamming_pairs(
            fps, fp_col="fp", id_col="doc_id", bits=16, max_hamming=2
        )
        got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
        assert got == {(1, 2): 1, (1, 4): 2, (2, 4): 1, (3, 4): 2}

    def test_no_false_negatives_random(self, spark):
        # pigeonhole blocking must find EVERY pair within the radius
        import random

        rng = random.Random(7)
        fps = [(i, rng.getrandbits(16)) for i in range(80)]
        want = {
            (a[0], b[0]): _ham(a[1], b[1])
            for a, b in itertools.combinations(fps, 2)
            if _ham(a[1], b[1]) <= 3
        }
        df = spark.createDataFrame(fps, ["doc_id", "fp"])
        out = simhash_hamming_pairs(
            df, fp_col="fp", id_col="doc_id", bits=16, max_hamming=3
        )
        got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
        assert got == want

    def test_64bit_fingerprints(self, spark):
        def signed(v):  # LongType stores the top bit as the sign bit
            return v - (1 << 64) if v >= (1 << 63) else v

        base = 0x0123_4567_89AB_CDEF
        fps = spark.createDataFrame(
            [(1, base), (2, signed(base ^ (1 << 63))), (3, base ^ 0b111)],
            ["doc_id", "fp"],
        )
        out = simhash_hamming_pairs(
            fps, fp_col="fp", id_col="doc_id", bits=64, max_hamming=2
        )
        got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
        # top-bit flip exercises signed shiftrightunsigned handling
        assert got == {(1, 2): 1}


class TestPrefixFilterPairs:
    DOCS = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a completely different document about spark engines"),
        (4, "a completely different document about spark engines"),
        (5, "short doc"),
    ]

    def test_differential_vs_exact_all_pairs(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b, r.inter, r.union_sz)
            for r in prefix_filter_pairs(df, threshold_pct=50).collect()
        }
        allp = exact_jaccard_pairs(df, shingle_n=3)
        want = {
            (r.id_a, r.id_b, r.inter, r.union_sz)
            for r in allp.collect()
            if r.inter * 100 >= 50 * r.union_sz
        }
        assert got == want
        assert (3, 4) in {(a, b) for a, b, *_ in got}  # exact dup pair

    def test_threshold_is_exact_integer_math(self, spark):
        # two docs sharing exactly half their shingles: J = 1/3 < 0.5
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x y")], ["doc_id", "text"]
        )
        assert prefix_filter_pairs(df, threshold_pct=50).count() == 0
        # at threshold 33% the pair J=2/6=0.333.. -> 2*100 >= 33*6 holds
        assert prefix_filter_pairs(df, threshold_pct=33).count() == 1


class TestSkewReport:
    def test_hand_computed(self, spark):
        rows = [("a", 1)] * 3 + [("a", 2)] + [("b", 1)] * 2
        df = spark.createDataFrame(rows, ["grp", "key"])
        out = {
            r.grp: r
            for r in skew_report(df, "key", group_cols=("grp",)).collect()
        }
        assert out["a"].n_rows == 4
        assert out["a"].n_keys == 2
        assert out["a"].max_key_rows == 3
        assert out["a"].self_join_rows == 9 + 1
        assert out["b"].self_join_rows == 4


class TestSeasonalAnomaly:
    def test_hand_computed(self, spark):
        # same weekly slot (Mon 10:00) on two dates: 1 vs 5 events;
        # 5*2*100 > 150*6 -> anomaly; 1*2*100 < 900 -> not
        t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)  # Monday
        t1 = datetime.datetime(2024, 1, 8, 10, 0, 0)  # next Monday
        rows = [Row(ts=t0, event_type="x")] + [
            Row(ts=t1 + datetime.timedelta(minutes=i), event_type="x")
            for i in range(5)
        ]
        df = spark.createDataFrame(rows)
        out = {
            (str(r.date), r.cnt): r.is_anomaly
            for r in seasonal_anomaly(df, factor_pct=150).collect()
        }
        assert out == {("2024-01-01", 1): False, ("2024-01-08", 5): True}


class TestWinsorizeBounds:
    def test_hand_computed(self, spark):
        vals = [float(v) for v in range(1, 101)]  # 1..100
        df = spark.createDataFrame(
            [("g", v) for v in vals], ["grp", "value"]
        )
        row = winsorize_bounds(
            df, group_col="grp", value_col="value", lo=0.05, hi=0.95
        ).collect()[0]
        # percentile(0.05) over 1..100 = 1 + 0.05*99 = 5.95
        assert abs(row.p_lo - 5.95) < 1e-12
        assert abs(row.p_hi - 95.05) < 1e-12
        assert row.n_rows == 100
        assert row.n_below == 5  # 1..5 < 5.95
        assert row.n_above == 5  # 96..100 > 95.05


class TestRollingDistinctUsers:
    def test_hand_computed_wau(self, spark):
        from sfdata_wrangler_spark.operators.windows import (
            rolling_distinct_users,
        )

        t = datetime.datetime(2024, 1, 1, 12, 0)
        day = datetime.timedelta(days=1)
        rows = [
            Row(user_id=1, ts=t),               # day 1
            Row(user_id=1, ts=t + day * 0),     # dup same day
            Row(user_id=2, ts=t + day * 2),     # day 3
            Row(user_id=1, ts=t + day * 8),     # day 9
        ]
        out = {
            str(r.win_day): (r.wau, r.dau, r.stickiness_bp)
            for r in rolling_distinct_users(
                spark.createDataFrame(rows), window_days=7
            ).collect()
        }
        # window ending Jan 3 sees users {1 (Jan 1), 2 (Jan 3)}
        assert out["2024-01-03"] == (2, 1, 5000)
        # Jan 1's own window: only user 1; dau == wau -> 10000 bp
        assert out["2024-01-01"] == (1, 1, 10000)
        # Jan 8: user 1's Jan-1 activity aged out; user 2 still in
        assert out["2024-01-08"] == (1, 0, 0)
        # Jan 9 window = [Jan 3, Jan 9]: user 2's Jan-3 activity is
        # still in (boundary day), plus user 1's Jan-9 row
        assert out["2024-01-09"] == (2, 1, 5000)
        # no row for windows before the first activity
        assert "2023-12-31" not in out


class TestRollingDistinctUsersHll:
    def test_tracks_exact_within_hll_error(self, spark):
        from sfdata_wrangler_spark.operators.windows import (
            rolling_distinct_users,
            rolling_distinct_users_hll,
        )

        t = datetime.datetime(2024, 3, 1, 9, 0)
        # raw HLL (no linear-counting small-range correction — same
        # estimator as operators/hll.hll_estimate) is only unbiased
        # for n >~ 2.5m; with m=256 keep every window's cardinality
        # in the thousands
        rows = [
            Row(
                user_id=(day * 1037 + i * 13) % 3000,
                ts=t + datetime.timedelta(days=day, minutes=i),
            )
            for day in range(14)
            for i in range(700)
        ]
        df = spark.createDataFrame(rows)
        exact = {
            str(r.win_day): r.wau
            for r in rolling_distinct_users(df).collect()
        }
        approx = {
            str(r.win_day): r.hll_est
            for r in rolling_distinct_users_hll(df).collect()
        }
        assert set(approx) == set(exact)
        # m = 256 registers -> ~6.5% stddev; allow a 3-sigma envelope
        for day, wau in exact.items():
            assert abs(approx[day] - wau) / wau < 0.20, (day, wau, approx[day])


class TestTargetEncodeLoo:
    def test_hand_computed(self, spark):
        from sfdata_wrangler_spark.operators.encode import target_encode_loo

        df = spark.createDataFrame(
            [
                (1, "a", 1.0),
                (2, "a", 2.0),
                (3, "a", 6.0),
                (4, "b", 10.0),        # singleton group
                (5, "a", None),        # null target
            ],
            "id bigint, k string, y double",
        )
        out = {
            r.id: (r.enc_loo, r.enc_prior)
            for r in target_encode_loo(df, "k", "y").collect()
        }
        # group a sum=9e6 over n=3 (null excluded)
        assert out[1] == ((9_000_000 - 1_000_000) // 2, 19_000_000 // 4)
        assert out[2] == (3_500_000, 4_750_000)
        assert out[3] == (1_500_000, 4_750_000)
        # singleton: no LOO mean, prior still present
        assert out[4] == (None, 4_750_000)
        # null target: no encoding
        assert out[5] == (None, 4_750_000)

    def test_no_self_leakage(self, spark):
        from sfdata_wrangler_spark.operators.encode import target_encode_loo

        # two rows, same key, different targets: each row's encoding
        # must equal the OTHER row's target exactly
        df = spark.createDataFrame(
            [(1, "k", 3.0), (2, "k", 7.0)], "id bigint, k string, y double"
        )
        out = {r.id: r.enc_loo for r in target_encode_loo(df, "k", "y").collect()}
        assert out == {1: 7_000_000, 2: 3_000_000}

    def test_null_keys_survive(self, spark):
        from sfdata_wrangler_spark.operators.encode import target_encode_loo

        # NULL keys form their own group (null-safe join) — a feature
        # transform must never drop rows
        df = spark.createDataFrame(
            [(1, None, 2.0), (2, None, 4.0), (3, "a", 5.0)],
            "id bigint, k string, y double",
        )
        rows = target_encode_loo(df, "k", "y").collect()
        assert len(rows) == 3
        out = {r.id: (r.enc_loo, r.enc_prior) for r in rows}
        # the two NULL-key rows leave-one-out against each other
        assert out[1] == (4_000_000, 11_000_000 // 3)
        assert out[2] == (2_000_000, 11_000_000 // 3)
        assert out[3] == (None, 11_000_000 // 3)  # singleton


class TestFkIntegrity:
    def test_orphans_and_null_keys(self, spark):
        from sfdata_wrangler_spark.operators.quality import fk_integrity

        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)],
            "id bigint, fk bigint",
        )
        parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
        out = {
            r.orphan_key: r.n_rows
            for r in fk_integrity(child, parent, "fk", "pk").collect()
        }
        # 99 is orphaned (1 row); NULL keys reported; 10/20 are fine
        assert out == {99: 1, None: 1}

    def test_clean_fk_is_empty(self, spark):
        from sfdata_wrangler_spark.operators.quality import fk_integrity

        child = spark.createDataFrame([(1, 10), (2, 20)], "id bigint, fk bigint")
        parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
        assert fk_integrity(child, parent, "fk", "pk").count() == 0


class TestTimeWeightedAverage:
    def test_hand_computed(self, spark):
        from sfdata_wrangler_spark.operators.windows import (
            time_weighted_average,
        )

        t = datetime.datetime(2024, 5, 1, 0, 0, 0)

        def ev(i, minutes, v):
            return Row(
                user_id=1,
                event_id=i,
                ts=t + datetime.timedelta(minutes=minutes),
                value=v,
            )

        # value 10 holds 60 min, value 20 holds 30 min, last drops
        df = spark.createDataFrame([ev(1, 0, 10.0), ev(2, 60, 20.0), ev(3, 90, 99.0)])
        row = time_weighted_average(df).collect()[0]
        assert row.n_obs == 3
        assert row.dur_us == 90 * 60 * 1_000_000
        # twa = (1000*60 + 2000*30) / 90 = 1333 (scaled cents, floor)
        assert row.twa_scaled == (1000 * 60 + 2000 * 30) * 60_000_000 // row.dur_us

    def test_single_observation_day_is_null(self, spark):
        from sfdata_wrangler_spark.operators.windows import (
            time_weighted_average,
        )

        df = spark.createDataFrame(
            [Row(user_id=7, event_id=1,
                 ts=datetime.datetime(2024, 5, 2, 12, 0), value=5.0)]
        )
        row = time_weighted_average(df).collect()[0]
        assert (row.n_obs, row.dur_us, row.twa_scaled) == (1, 0, None)

    def test_chatty_period_not_overweighted(self, spark):
        from sfdata_wrangler_spark.operators.windows import (
            time_weighted_average,
        )

        t = datetime.datetime(2024, 5, 3, 0, 0, 0)
        rows = [
            # 10 rapid-fire readings of 100 within one minute...
            Row(user_id=1, event_id=i,
                ts=t + datetime.timedelta(seconds=6 * i), value=100.0)
            for i in range(10)
        ] + [
            # ...then one reading of 0 that holds ten hours
            Row(user_id=1, event_id=99,
                ts=t + datetime.timedelta(minutes=1), value=0.0),
            Row(user_id=1, event_id=100,
                ts=t + datetime.timedelta(hours=10, minutes=1), value=0.0),
        ]
        row = time_weighted_average(spark.createDataFrame(rows)).collect()[0]
        # plain row-mean would be ~83; the TWA must be ~0.17 (cents
        # scale: 100.0 -> 10000; 1 min of 100 vs 600 min of 0)
        assert row.twa_scaled == 10000 * 60 // (601 * 60)


class TestCusumChangepoints:
    def test_shift_detected_after_accumulation(self, spark):
        from sfdata_wrangler_spark.operators.drift import cusum_changepoints

        t = datetime.datetime(2024, 6, 1, 0, 0)
        vals = [10.0, 10.5, 9.5, 10.0, 10.0, 14.0, 14.0, 14.0, 14.0]
        df = spark.createDataFrame(
            [
                Row(g="m", ts=t + datetime.timedelta(minutes=i),
                    event_id=i, value=v)
                for i, v in enumerate(vals)
            ]
        )
        out = cusum_changepoints(
            df, "g", "ts", "event_id", "value",
            reference=10.0, slack=1.0, threshold=6.0,
        ).orderBy("event_id").collect()
        # pre-shift deviations are <= 0 (after slack): S pinned at ~0
        assert all(r.cusum_scaled <= 0 or r.event_id >= 5 for r in out)
        assert not any(r.alarm for r in out[:5])
        # post-shift: d=+3 per step -> S = 300, 600, 900 (cents)
        assert [r.cusum_scaled for r in out[5:]] == [300, 600, 900, 1200]
        # alarm (S > 600) first fires on the third post-shift point
        assert [r.alarm for r in out[5:]] == [False, False, True, True]

    def test_clip_at_zero_prevents_negative_credit(self, spark):
        from sfdata_wrangler_spark.operators.drift import cusum_changepoints

        t = datetime.datetime(2024, 6, 2, 0, 0)
        # a long low stretch must NOT bank negative credit that
        # delays detection of a later shift (the clip in max(0, .))
        vals = [5.0] * 10 + [14.0, 14.0, 14.0]
        df = spark.createDataFrame(
            [
                Row(g="m", ts=t + datetime.timedelta(minutes=i),
                    event_id=i, value=v)
                for i, v in enumerate(vals)
            ]
        )
        out = cusum_changepoints(
            df, "g", "ts", "event_id", "value",
            reference=10.0, slack=1.0, threshold=6.0,
        ).orderBy("event_id").collect()
        assert [r.cusum_scaled for r in out[10:]] == [300, 600, 900]
        assert out[12].alarm


class TestAbTestReport:
    def test_hand_computed_z(self, spark):
        import math

        from sfdata_wrangler_spark.operators.drift import ab_test_report

        rows = (
            [("e1", "control", 1)] * 40 + [("e1", "control", 0)] * 60
            + [("e1", "treat", 1)] * 55 + [("e1", "treat", 0)] * 45
        )
        df = spark.createDataFrame(rows, "exp string, variant string, ok int")
        r = ab_test_report(df, "exp", "variant", F.col("ok") == 1).collect()[0]
        assert (r.variant_a, r.n_a, r.conv_a) == ("control", 100, 40)
        assert (r.variant_b, r.n_b, r.conv_b) == ("treat", 100, 55)
        p1, p2, pp = 0.40, 0.55, 0.475
        want = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
        assert r.z == pytest.approx(want, rel=1e-12)

    def test_degenerate_and_wrong_arity(self, spark):
        from sfdata_wrangler_spark.operators.drift import ab_test_report

        rows = (
            # all-success experiment: zero pooled variance -> NULL z
            [("zero_var", "a", 1)] * 5 + [("zero_var", "b", 1)] * 5
            # three-variant experiment: rejected, not silently folded
            + [("three", "a", 1), ("three", "b", 0), ("three", "c", 1)]
            # single-variant experiment: rejected
            + [("solo", "a", 1)] * 3
        )
        df = spark.createDataFrame(rows, "exp string, variant string, ok int")
        out = {r.exp: r for r in ab_test_report(
            df, "exp", "variant", F.col("ok") == 1
        ).collect()}
        # every experiment gets a row; the n_variants guard column
        # flags arity violations and their z is NULL (never a silent
        # fold of a third variant into the statistic)
        assert set(out) == {"zero_var", "three", "solo"}
        assert out["zero_var"].z is None
        assert out["zero_var"].n_variants == 2
        assert out["three"].n_variants == 3
        assert out["three"].z is None
        assert (out["three"].variant_a, out["three"].variant_b) == ("a", "b")
        assert out["solo"].n_variants == 1
        assert out["solo"].z is None
        assert out["solo"].variant_b is None


class TestPairwiseCorrelation:
    def test_perfect_and_inverse_and_none(self, spark):
        from sfdata_wrangler_spark.operators.drift import (
            pairwise_correlation,
        )

        rows = (
            [("pos", float(i), 2.0 * i + 1) for i in range(10)]
            + [("neg", float(i), -3.0 * i) for i in range(10)]
            + [("flat", float(i), 5.0) for i in range(10)]
        )
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {
            r.g: r.r for r in pairwise_correlation(df, ["g"], "x", "y").collect()
        }
        assert out["pos"] == pytest.approx(1.0, abs=1e-12)
        assert out["neg"] == pytest.approx(-1.0, abs=1e-12)
        assert out["flat"] is None  # zero variance -> NULL, not NaN

    def test_matches_numpy(self, spark):
        import numpy as np

        from sfdata_wrangler_spark.operators.drift import (
            pairwise_correlation,
        )

        rng = np.random.RandomState(5)
        # two-decimal values so the cent fixed-point is lossless
        x = np.round(rng.uniform(0, 100, 200), 2)
        y = np.round(x * 0.5 + rng.uniform(0, 30, 200), 2)
        df = spark.createDataFrame(
            [("g", float(a), float(b)) for a, b in zip(x, y)],
            "g string, x double, y double",
        )
        got = pairwise_correlation(df, ["g"], "x", "y").collect()[0].r
        want = np.corrcoef(x, y)[0, 1]
        assert got == pytest.approx(want, abs=1e-9)


class TestJoinSizeEstimate:
    def test_exact_against_real_join(self, spark):
        from sfdata_wrangler_spark.operators.skew import join_size_estimate

        a = spark.createDataFrame(
            [(1,)] * 3 + [(2,)] * 2 + [(9,)], "k bigint"
        )
        b = spark.createDataFrame([(1,)] * 4 + [(2,)] + [(7,)], "k bigint")
        est = join_size_estimate(a, b, ["k"]).collect()[0]
        real = a.join(b, "k").count()
        assert est.join_rows == real == 3 * 4 + 2 * 1
        assert est.n_matching_keys == 2
        assert est.max_key_rows == 12

    def test_disjoint_keys(self, spark):
        from sfdata_wrangler_spark.operators.skew import join_size_estimate

        a = spark.createDataFrame([(1,)], "k bigint")
        b = spark.createDataFrame([(2,)], "k bigint")
        est = join_size_estimate(a, b, ["k"]).collect()[0]
        assert (est.join_rows, est.n_matching_keys, est.max_key_rows) == (
            0, 0, 0,
        )


class TestValidateIntervals:
    def test_overlap_gap_degenerate(self, spark):
        import datetime as dt

        from sfdata_wrangler_spark.operators.scd2 import validate_intervals

        d = lambda day: dt.date(2024, 1, day)  # noqa: E731
        rows = [
            # key 1: clean contiguous timeline
            (1, d(1), d(10)), (1, d(10), d(20)),
            # key 2: overlap (second starts before first ends)
            (2, d(1), d(10)), (2, d(5), d(20)),
            # key 3: gap
            (3, d(1), d(10)), (3, d(15), d(20)),
            # key 4: degenerate (end == start)
            (4, d(5), d(5)),
        ]
        df = spark.createDataFrame(rows, "k bigint, s date, e date")
        out = {r.k: r for r in validate_intervals(df, "k", "s", "e").collect()}
        assert 1 not in out  # clean key produces NO row
        assert (out[2].n_overlaps, out[2].n_gaps) == (1, 0)
        assert (out[3].n_overlaps, out[3].n_gaps) == (0, 1)
        assert out[4].n_degenerate == 1


class TestDebounceEvents:
    def test_bursts_keep_first(self, spark):
        from sfdata_wrangler_spark.operators.windows import debounce_events

        t = datetime.datetime(2024, 10, 1, 9, 0, 0)

        def ev(i, sec, u=1):
            return Row(
                user_id=u, event_id=i,
                ts=t + datetime.timedelta(seconds=sec), value=float(i),
            )

        # burst of 3 (0s, 2s, 4s), then a lone event at 60s, then a
        # burst of 2 (100s, 104.9s); second user independent
        df = spark.createDataFrame(
            [ev(1, 0), ev(2, 2), ev(3, 4), ev(4, 60),
             ev(5, 100), ev(6, 104.9), ev(7, 0, u=2)]
        )
        out = {
            r.event_id: r.burst_size
            for r in debounce_events(
                df, ["user_id"], tolerance_seconds=5
            ).collect()
        }
        assert out == {1: 3, 4: 1, 5: 2, 7: 1}

    def test_chained_burst_spans_beyond_tolerance(self, spark):
        from sfdata_wrangler_spark.operators.windows import debounce_events

        t = datetime.datetime(2024, 10, 2, 9, 0, 0)
        # 0s, 4s, 8s, 12s: each gap <= 5s chains into ONE burst even
        # though 12s > tolerance from the first event
        df = spark.createDataFrame(
            [
                Row(user_id=1, event_id=i,
                    ts=t + datetime.timedelta(seconds=4 * i), value=0.0)
                for i in range(4)
            ]
        )
        out = debounce_events(df, ["user_id"], tolerance_seconds=5).collect()
        assert len(out) == 1 and out[0].burst_size == 4
