"""Slowly-changing-dimension (SCD2) interval collapse.

The reference keeps dimension history as dated snapshots — GTFS
schedules valid over [start, end] date ranges (sfdata_wrangler
gtfs_utils usage), monthly system panels, fare tables — and every
join against them is an interval lookup (operators/interval_lookup).
This operator builds those validity intervals FROM raw snapshot/event
streams: collapse each key's consecutive runs of identical attributes
into one row per run with its [valid_from, valid_until) range — the
classic gaps-and-islands shape.

Scale: one shuffle on the key (window partitionBy), the change-flag
prefix sum and the interval lead both run inside that partitioning;
the collapsed output is run-count-sized, not snapshot-count-sized.
Attribute comparison is null-safe (``IS DISTINCT FROM`` semantics),
so NULL→NULL is "unchanged" and NULL→value opens a new interval.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_to_intervals(
    df: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One row per (key, run of identical ``attrs``): the attrs plus
    ``valid_from`` (first order value of the run), ``valid_until``
    (next run's valid_from, NULL for the current run — the half-open
    SCD2 convention), and ``n_snapshots``.

    ``order_cols`` must be a total order within each key (include a
    unique tie-breaker) or run boundaries are nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # lag of the first row is NULL for every attr -> eqNullSafe is
    # False there only if the attr is non-null; force the first row to
    # open an island explicitly instead
    first = F.row_number().over(w) == 1
    flagged = df.withColumn(
        "__new_island", (first | changed).cast("int")
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(*keys, "__island", *attrs).agg(
        F.min(F.struct(*[F.col(c) for c in order_cols])).alias("__start"),
        F.count(F.lit(1)).cast("bigint").alias("n_snapshots"),
    )
    w2 = Window.partitionBy(*keys).orderBy("__island")
    return runs.select(
        *keys,
        *attrs,
        F.col(f"__start.{order_cols[0]}").alias("valid_from"),
        F.lead(f"__start.{order_cols[0]}").over(w2).alias("valid_until"),
        "n_snapshots",
    )


def validate_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """SCD2 invariant check: per key, count OVERLAPS (an interval
    starting before its predecessor ends) and GAPS (starting after it
    ends) in the validity timeline, plus degenerate rows
    (end ≤ start). An all-zero report is the dimension-health proof
    every interval-joining pipeline (J2/j13) silently assumes.

    One window pass (lag of ``end_col`` per key in start order —
    the gaps-and-islands idiom) + one combinable rollup; output is
    key-cardinality bounded but typically tiny after the
    ``HAVING``-style filter keeps only offending keys.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_end = F.lag(end_col).over(w)
    flags = df.select(
        F.col(key_col),
        F.when(F.col(end_col) <= F.col(start_col), 1)
        .otherwise(0)
        .alias("__degenerate"),
        F.when(
            prev_end.isNotNull() & (F.col(start_col) < prev_end), 1
        )
        .otherwise(0)
        .alias("__overlap"),
        F.when(
            prev_end.isNotNull() & (F.col(start_col) > prev_end), 1
        )
        .otherwise(0)
        .alias("__gap"),
    )
    return (
        flags.groupBy(key_col)
        .agg(
            F.sum("__degenerate").cast("bigint").alias("n_degenerate"),
            F.sum("__overlap").cast("bigint").alias("n_overlaps"),
            F.sum("__gap").cast("bigint").alias("n_gaps"),
        )
        .where(
            (F.col("n_degenerate") > 0)
            | (F.col("n_overlaps") > 0)
            | (F.col("n_gaps") > 0)
        )
    )
