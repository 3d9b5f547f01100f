"""Expansion weighting (SURVEY.md W7, ``SFMuniDataExpander.py:122-166``).

The APC sampling premise: only a fraction of scheduled trips carry
counters, so observed trips are weighted up to represent the full
schedule within an expansion cell (DATE × TOD × route × direction).

    factor    = Σ(TRIP_STOPS) / Σ(oldWeight · TRIP_STOPS)   per cell
    newWeight = oldWeight · factor          (NaN if nothing observed)

In the reference this is a ``groupby().apply`` over pandas groups; on
Spark it is two window sums over the cell partition — one shuffle, no
UDF, and the invariant Σ(newWeight·TRIP_STOPS) = Σ(TRIP_STOPS) holds
per cell whenever the cell has ≥1 observation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calc_weights(
    df: DataFrame,
    group: Sequence[str],
    old_weight: str,
    trip_stops: str = "TRIP_STOPS",
    out: str = "WEIGHT",
) -> DataFrame:
    w = Window.partitionBy(*group)
    total = F.sum(F.col(trip_stops)).over(w)
    observed = F.sum(
        F.when(
            F.col(old_weight).isNotNull(), F.col(old_weight) * F.col(trip_stops)
        )
    ).over(w)
    factor = F.when(observed > 0, total / observed)
    return df.withColumn(out, F.col(old_weight) * factor)


def seed_trip_weight(df: DataFrame, observed_col: str = "OBSERVED") -> DataFrame:
    """TRIP_WEIGHT seed: 1.0 where observed, null where not
    (``SFMuniDataExpander.py:600-606``)."""
    return df.withColumn(
        "TRIP_WEIGHT",
        F.when(F.col(observed_col) == 1, F.lit(1.0)).otherwise(
            F.lit(None).cast("double")
        ),
    )
