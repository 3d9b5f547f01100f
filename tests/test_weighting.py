"""Expansion-weighting invariants (W7, SFMuniDataExpander.py:122-166)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.weighting import calc_weights, seed_trip_weight


def test_weight_invariant(spark):
    """Within every cell with ≥1 observation:
    Σ(weight·trip_stops) == Σ(trip_stops); unobserved cells → null."""
    rows = []
    # cell A: 2 of 4 trips observed
    for i, obs in enumerate([1, 1, 0, 0]):
        rows.append(Row(cell="A", trip=i, OBSERVED=obs, TRIP_STOPS=1.0))
    # cell B: nothing observed
    for i in range(3):
        rows.append(Row(cell="B", trip=i, OBSERVED=0, TRIP_STOPS=1.0))
    df = seed_trip_weight(spark.createDataFrame(rows))
    w = calc_weights(df, ["cell"], "TRIP_WEIGHT", "TRIP_STOPS", "WEIGHT")

    chk = (
        w.groupBy("cell")
        .agg(
            F.sum(F.col("WEIGHT") * F.col("TRIP_STOPS")).alias("wsum"),
            F.sum("TRIP_STOPS").alias("tsum"),
        )
        .collect()
    )
    got = {r.cell: (r.wsum, r.tsum) for r in chk}
    assert math.isclose(got["A"][0], got["A"][1])  # 2 observed ×2.0 = 4
    assert got["B"][0] is None  # nothing observed → no weights

    # observed rows in A each carry weight 2.0; unobserved rows null
    per_row = {(r.cell, r.trip): r.WEIGHT for r in w.collect()}
    assert per_row[("A", 0)] == 2.0
    assert per_row[("A", 2)] is None


def test_agg_strategy_equivalence(spark):
    """strategy="agg" (skew-immune groupBy+broadcast form) must match
    strategy="window" row-for-row, including NULL cell keys (window
    partitionBy groups nulls together, so the join-back must be
    null-safe) and fully-unobserved cells (factor undefined → null)."""
    rows = []
    for cell, pattern in [("A", [1, 1, 0, 0]), ("B", [0, 0]), (None, [1, 0, 0])]:
        for i, obs in enumerate(pattern):
            rows.append(
                Row(cell=cell, trip=i, OBSERVED=obs, TRIP_STOPS=1.0 + i)
            )
    df = seed_trip_weight(
        spark.createDataFrame(rows, "cell string, trip int, "
                                    "OBSERVED int, TRIP_STOPS double")
    )
    win = calc_weights(df, ["cell"], "TRIP_WEIGHT", "TRIP_STOPS", "WEIGHT")
    agg = calc_weights(
        df, ["cell"], "TRIP_WEIGHT", "TRIP_STOPS", "WEIGHT", strategy="agg"
    )
    assert win.columns == agg.columns
    key = lambda r: (r.cell or "", r.trip)  # noqa: E731
    for a, b in zip(
        sorted(win.collect(), key=key), sorted(agg.collect(), key=key)
    ):
        assert a == b, (a, b)


def test_agg_strategy_plan_has_no_window(spark):
    """The point of strategy="agg" is that no full-width shuffle into
    cell partitions happens: the plan must contain no Window operator,
    and the factor join-back must be a broadcast hash join (cells are
    dimension-sized by construction)."""
    df = seed_trip_weight(
        spark.range(1000)
        .withColumn("cell", (F.col("id") % 3).cast("string"))
        .withColumn("OBSERVED", (F.col("id") % 2).cast("int"))
        .withColumn("TRIP_STOPS", F.lit(1.0))
    )
    agg = calc_weights(
        df, ["cell"], "TRIP_WEIGHT", "TRIP_STOPS", "WEIGHT", strategy="agg"
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_two_stage_weight_chaining(spark):
    """The reference chains weights (TRIP_WEIGHT within TOD cells,
    then TOD_WEIGHT across the day, SFMuniDataExpander.py:600-619):
    calc_weights composes — stage 2 takes stage 1's output as its
    old weight, and the invariant holds at the coarser cell."""
    rows = []
    # day cell with two TOD cells; observation rates differ
    for tod, obs_pattern in [("AM", [1, 0]), ("PM", [1, 1, 0, 0])]:
        for i, obs in enumerate(obs_pattern):
            rows.append(
                Row(day="d1", tod=tod, trip=f"{tod}{i}",
                    OBSERVED=obs, TRIP_STOPS=1.0)
            )
    df = seed_trip_weight(spark.createDataFrame(rows))
    s1 = calc_weights(df, ["day", "tod"], "TRIP_WEIGHT", "TRIP_STOPS", "W1")
    s2 = calc_weights(s1, ["day"], "W1", "TRIP_STOPS", "W2")
    out = s2.collect()
    # stage 1: AM observed trip weight 2.0, PM observed trips 2.0 each
    w1 = {r.trip: r.W1 for r in out}
    assert w1["AM0"] == 2.0 and w1["PM0"] == 2.0
    # stage 2 re-normalizes over the day: sum(W2*stops) == total stops
    import math

    tot = sum((r.W2 or 0.0) * r.TRIP_STOPS for r in out)
    assert math.isclose(tot, 6.0)
