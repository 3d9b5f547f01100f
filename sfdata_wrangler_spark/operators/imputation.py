"""Prior-month imputation (SURVEY.md J4/W12,
``SFMuniDataAggregator.py:371-464``).

Cells (route-stop × DOW × TOD) with zero observed trip-stops in a
month inherit the prior month's values, with provenance counters. The
reference loops months sequentially because imputed values chain
month-to-month; the Spark formulation replaces the chain with ONE
window pass: for each cell ordered by month, every value column
becomes "last month's value where the month actually had
observations" — i.e. a gap of k unobserved months all inherit from
the most recent observed month, which is exactly what the sequential
chain converges to.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_from_prior_month(
    df: DataFrame,
    cell_keys: Sequence[str],
    month_col: str,
    value_cols: Sequence[str],
    observed_count_col: str = "OBS_TRIP_STOPS",
    provenance_col: str = "IMP_TRIP_STOPS",
) -> DataFrame:
    w = (
        Window.partitionBy(*cell_keys)
        .orderBy(month_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    observed = F.col(observed_count_col) > 0
    out = df
    for c in value_cols:
        donor = F.last(F.when(observed, F.col(c)), ignorenulls=True).over(w)
        out = out.withColumn(c, F.when(observed, F.col(c)).otherwise(donor))
    # provenance: how many trip-stops were imputed rather than observed
    donor_counts = F.last(
        F.when(observed, F.col(observed_count_col)), ignorenulls=True
    ).over(w)
    out = out.withColumn(
        provenance_col,
        F.when(observed, F.lit(0)).otherwise(F.coalesce(donor_counts, F.lit(0))),
    )
    return out
