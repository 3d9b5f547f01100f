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
