"""Fact-scale as-of join (operators/asof.py): hand-computed
semantics, tolerance nulling, tie determinism, partition invariance,
and the single-shuffle plan guarantee."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # before any right → null
            (2, 10, _ts("2024-01-01 12:00:00")),  # exactly at right @12 → match
            (3, 10, _ts("2024-01-01 15:00:00")),  # between 12 and 18 → 12
            (4, 10, _ts("2024-01-02 09:00:00")),  # after 18 → 18
            (5, 20, _ts("2024-01-01 12:00:00")),  # other key, no right → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 12:00:00"), 100.0),
            (10, _ts("2024-01-01 18:00:00"), 200.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_hand_computed(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, on=["user_id"], ts="ts", value_cols=["value"])
    got = {r["event_id"]: r["value_asof"] for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 100.0, 4: 200.0, 5: None}


def test_asof_tolerance_nulls_stale(spark):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, on=["user_id"], ts="ts", value_cols=["value"],
        tolerance=4 * 3600.0,
    )
    got = {r["event_id"]: r["value_asof"] for r in out.collect()}
    # event 4 is 15h after the @18:00 purchase → stale; 3 is 3h after 12 → kept
    assert got == {1: None, 2: 100.0, 3: 100.0, 4: None, 5: None}
    ts_got = {r["event_id"]: r["ts_asof"] for r in out.collect()}
    assert ts_got[4] is None  # the matched ts nulls out with the values


def test_asof_tie_takes_max_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 13:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 12:00:00"), 1.0),
            (10, _ts("2024-01-01 12:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on=["user_id"], ts="ts", value_cols=["value"])
    assert out.collect()[0]["value_asof"] == 9.0


def test_asof_partition_invariance(spark):
    left, right = _fixture(spark)
    base = asof_join(left, right, on=["user_id"], ts="ts", value_cols=["value"])
    shuffled = asof_join(
        left.repartition(7), right.repartition(3),
        on=["user_id"], ts="ts", value_cols=["value"],
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_asof_single_shuffle_plan(spark):
    """The whole join must cost ONE hash exchange on the key (that's
    the point vs a range join); no BroadcastNestedLoop, no cartesian."""
    left, right = _fixture(spark)
    out = asof_join(left, right, on=["user_id"], ts="ts", value_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, pfx):
        import datetime as dt

        t0 = dt.datetime(2024, 7, 1, 0, 0)
        return spark.createDataFrame(
            [
                (
                    i,
                    t0 + dt.timedelta(minutes=s),
                    t0 + dt.timedelta(minutes=e),
                )
                for i, (s, e) in enumerate(rows)
            ],
            f"{pfx}_id bigint, {pfx}_s timestamp, {pfx}_e timestamp",
        )

    def test_differential_vs_brute_force(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        import random

        rng = random.Random(11)
        a_rows = [
            (s, s + rng.randint(1, 200))
            for s in (rng.randint(0, 2000) for _ in range(40))
        ]
        b_rows = [
            (s, s + rng.randint(1, 200))
            for s in (rng.randint(0, 2000) for _ in range(40))
        ]
        a = self._mk(spark, a_rows, "a")
        b = self._mk(spark, b_rows, "b")
        got = {
            (r.a_id, r.b_id, r.overlap_us)
            for r in interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bucket="1 hour"
            ).collect()
        }
        want = set()
        for i, (as_, ae) in enumerate(a_rows):
            for j, (bs, be) in enumerate(b_rows):
                ov = min(ae, be) - max(as_, bs)
                if ov > 0:
                    want.add((i, j, ov * 60 * 1_000_000))
        assert got == want

    def test_boundary_touch_is_not_overlap(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(0, 60)], "a")
        b = self._mk(spark, [(60, 120)], "b")  # half-open: no overlap
        assert (
            interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bucket="30 minutes"
            ).count()
            == 0
        )

    def test_cross_bucket_pair_found_once(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        # both intervals span several 15-min cells; the pair must
        # appear exactly once despite sharing many cells
        a = self._mk(spark, [(0, 100)], "a")
        b = self._mk(spark, [(50, 160)], "b")
        out = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket="15 minutes"
        ).collect()
        assert len(out) == 1
        assert out[0].overlap_us == 50 * 60 * 1_000_000

    def test_keyed_join_restricts_pairs(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        import datetime as dt

        t0 = dt.datetime(2024, 7, 1, 0, 0)

        def mk(rows, pfx):
            return spark.createDataFrame(
                [
                    (
                        i,
                        k,
                        t0 + dt.timedelta(minutes=s),
                        t0 + dt.timedelta(minutes=e),
                    )
                    for i, (k, s, e) in enumerate(rows)
                ],
                f"{pfx}_id bigint, key string, "
                f"{pfx}_s timestamp, {pfx}_e timestamp",
            )

        a = mk([("x", 0, 60), ("y", 0, 60)], "a")
        b = mk([("x", 30, 90), ("y", 200, 260)], "b")
        out = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e",
            bucket="30 minutes", keys=("key",),
        ).collect()
        # only the x/x pair overlaps AND agrees on the key; the
        # overlapping x-interval of a row keyed y must not match
        assert [(r.a_id, r.b_id, r.key) for r in out] == [(0, 0, "x")]
        assert out[0].overlap_us == 30 * 60 * 1_000_000

    def test_degenerate_intervals_dropped_not_crashed(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        import datetime as dt

        # a zero-length interval starting EXACTLY on a bucket
        # boundary used to hand F.sequence a stop < start and crash;
        # empty intervals must simply match nothing
        t0 = dt.datetime(2024, 7, 1, 10, 0)  # on the hour
        a = spark.createDataFrame(
            [(1, t0, t0), (2, t0, t0 + dt.timedelta(minutes=30))],
            "a_id bigint, a_s timestamp, a_e timestamp",
        )
        b = spark.createDataFrame(
            [(1, t0, t0 + dt.timedelta(minutes=60))],
            "b_id bigint, b_s timestamp, b_e timestamp",
        )
        out = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket="1 hour"
        ).collect()
        assert [(r.a_id, r.b_id) for r in out] == [(2, 1)]

    def test_duplicate_input_rows_pair_independently(self, spark):
        from sfdata_wrangler_spark.operators.interval_lookup import (
            interval_overlap_join,
        )

        # two IDENTICAL a-rows overlapping one b-row must yield two
        # pairs (the old full-column dropDuplicates collapsed them)
        a = self._mk(spark, [(0, 60), (0, 60)], "a").drop("a_id")
        b = self._mk(spark, [(30, 90)], "b")
        out = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket="30 minutes"
        ).collect()
        assert len(out) == 2
