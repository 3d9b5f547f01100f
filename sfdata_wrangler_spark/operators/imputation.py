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
    strict_chain: bool = False,
) -> DataFrame:
    """``strict_chain=False`` (default): the converged carry-forward —
    every unobserved month inherits the most recent observed month's
    values. ``strict_chain=True`` reproduces the reference's sequential
    month loop EXACTLY (``SFMuniDataAggregator.py:371-464``), including
    its two edge cases: (1) the chain breaks when the cell key has no
    row in an intermediate present month (the per-month left merge
    finds nothing → imputed NULL, which then propagates), and (2) the
    first present month is written through unimputed, so an unobserved
    first-month row donates its RAW values downstream with provenance
    0. Implemented as gaps-and-islands: global month index (tiny
    broadcast dim) minus per-cell row_number defines contiguous runs;
    one window per run replaces the whole sequential loop."""
    if strict_chain:
        return _impute_strict_chain(
            df,
            cell_keys,
            month_col,
            value_cols,
            observed_count_col,
            provenance_col,
        )
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


def _impute_strict_chain(
    df: DataFrame,
    cell_keys: Sequence[str],
    month_col: str,
    value_cols: Sequence[str],
    observed_count_col: str,
    provenance_col: str,
) -> DataFrame:
    # global index over the months PRESENT in the data (the reference
    # iterates exactly these). The distinct set is tiny (one row per
    # month), so the unpartitioned row_number window is a few rows on
    # one task, then broadcast back.
    months = df.select(month_col).distinct()
    mdim = months.withColumn(
        "__gidx", F.row_number().over(Window.orderBy(month_col))
    )
    d = df.join(F.broadcast(mdim), month_col)

    # gaps-and-islands: a cell's run of consecutively-present months
    wk = Window.partitionBy(*cell_keys).orderBy(month_col)
    d = d.withColumn("__island", F.col("__gidx") - F.row_number().over(wk))
    wi = (
        Window.partitionBy(*cell_keys, "__island")
        .orderBy(month_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    observed = F.col(observed_count_col) > 0
    # a row's post-imputation values are its OWN values if it is
    # observed OR it is the first present month (written through
    # unimputed); otherwise the latest such "donor" row in the island.
    donor_row = observed | (F.col("__gidx") == 1)
    out = d
    for c in value_cols:
        # struct-wrap so a donor whose value is genuinely NULL still
        # shadows earlier donors (ignorenulls must skip NON-donor rows
        # only, not donor rows with null values)
        donor_val = F.last(
            F.when(donor_row, F.struct(F.col(c).alias("v"))),
            ignorenulls=True,
        ).over(wi)["v"]
        out = out.withColumn(
            c, F.when(donor_row, F.col(c)).otherwise(donor_val)
        )
    donor_counts = F.last(
        F.when(donor_row, F.col(observed_count_col)), ignorenulls=True
    ).over(wi)
    out = out.withColumn(
        provenance_col,
        F.when(observed | (F.col("__gidx") == 1), F.lit(0)).otherwise(
            donor_counts  # NULL when the chain is broken, like the merge
        ),
    )
    return out.drop("__gidx", "__island")
