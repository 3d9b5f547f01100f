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
