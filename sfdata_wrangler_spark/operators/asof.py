"""As-of (most-recent-match) join at fact scale.

The reference's only temporal lookup is the route-equivalency
date-interval join (SFMuniDataHelper.py:587,603-605), which this
engine covers with a broadcast range join
(operators/interval_lookup.py) — correct when the right side is a
dimension. This module is the scale path for the OTHER case: both
sides fact-sized (e.g. 100 TB of telemetry as-of-joined to 10 TB of
state snapshots), where a broadcast nested-loop is impossible and a
naive range join is O(n·m).

Formulation: tag and union the two inputs, ONE window pass per key
ordered by (ts, side, tiebreak) carrying the right side's values
forward with ``last(..., ignorenulls=True)``, then keep only left
rows. Cost = one hash shuffle on the key + one in-partition sort —
exactly a sort-merge join's cost, with no join explosion on
duplicate timestamps and no driver-side anything. Skewed keys get
AQE's skew splitting since the shuffle is a plain hash exchange.

Semantics (backward direction): for each left row, the right row
with the greatest ``right_ts <= left_ts`` in the same key group;
ties on ``right_ts`` resolve to the greatest ``tiebreak`` value —
an EXPLICIT total order, because distributed execution has no
ambient row order. ``tolerance`` (seconds) nulls out matches older
than ``left_ts - tolerance`` (pandas ``merge_asof(tolerance=...)``
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left enriched with the most recent right
    values at or before each left row's ``ts``, per ``on`` key.

    ``left`` and ``right`` must both carry ``on + [ts]``;
    ``value_cols`` name the right columns to carry (emitted as
    ``<col><suffix>``, plus ``<ts><suffix>`` = the matched right
    timestamp). ``tiebreak`` orders right rows that share a
    timestamp (defaults to the first value col). One shuffle, no
    broadcast: safe when both sides are fact-sized.
    """
    if tiebreak is None:
        tiebreak = value_cols[0]

    carry = [c for c in value_cols] + [ts]
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so a
    # right row exactly at the left timestamp is visible to it.
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tie"),
        *[F.col(c).alias(f"__v_{c}") for c in carry],
    )
    l = left.select(
        "*",
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        *[F.lit(None).cast(r.schema[f"__v_{c}"].dataType).alias(f"__v_{c}") for c in carry],
    )
    # unionByName needs identical column sets: project right to the
    # left's shape with nulls for left-only columns.
    left_only = [c for c in l.columns if c not in r.columns]
    r_full = r.select(
        "*",
        *[F.lit(None).cast(dict(l.dtypes)[c]).alias(c) for c in left_only],
    )
    u = l.unionByName(r_full)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in carry
    ]
    out = u.select("*", *carried).where(F.col("__side") == 1)

    if tolerance is not None:
        stale = (
            F.col("__ts").cast("double")
            - F.col(f"{ts}{suffix}").cast("double")
        ) > F.lit(float(tolerance))
        for c in carry:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )

    drop = ["__ts", "__side", "__tie"] + [f"__v_{c}" for c in carry]
    return out.drop(*drop)
