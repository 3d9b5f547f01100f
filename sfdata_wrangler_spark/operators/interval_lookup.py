"""Date-interval dimension lookup (J2, the route-equivalency pattern:
``SFMuniDataHelper.py:368-383,587-615``).

The reference filters the dimension per date inside a Python loop and
``Series.map``s three name columns. Spark-first: ONE broadcast range
join across all dates — equi key + validity-interval predicate — plus
an anti-join missing-key report (the reference prints missing route
ids; here they're a DataFrame you can sink anywhere).

At 100 TB the fact side streams; the dimension (route renames over a
decade ≈ thousands of rows) broadcasts, so the range predicate is
evaluated map-side with no shuffle of the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_lookup(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    date_col: str,
    start_col: str = "START_DATE",
    end_col: str = "END_DATE",
    carry_cols: Sequence[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """fact LEFT JOIN dim ON fact.key = dim.key AND
    dim.start < fact.date < dim.end, carrying ``carry_cols``.

    Assumes non-overlapping validity intervals per key (the
    reference's invariant) — at most one dim row matches."""
    carry = list(carry_cols) if carry_cols else [
        c for c in dim.columns if c not in (key, start_col, end_col)
    ]
    d = dim.select(
        F.col(key).alias("__k"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        *carry,
    )
    cond = (
        (fact[key] == F.col("__k"))
        & (fact[date_col] > F.col("__s"))
        & (fact[date_col] < F.col("__e"))
    )
    return fact.join(F.broadcast(d), cond, how).drop("__k", "__s", "__e")


def missing_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    date_col: str,
    start_col: str = "START_DATE",
    end_col: str = "END_DATE",
) -> DataFrame:
    """Fact keys with NO valid dim interval on their date — the
    reference's missing-route report (``SFMuniDataHelper.py:593-615``)
    as a left_anti range join: (key, n_rows, first_date, last_date)."""
    d = dim.select(
        F.col(key).alias("__k"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    )
    cond = (
        (fact[key] == F.col("__k"))
        & (fact[date_col] > F.col("__s"))
        & (fact[date_col] < F.col("__e"))
    )
    return (
        fact.join(F.broadcast(d), cond, "left_anti")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(date_col).alias("first_date"),
            F.max(date_col).alias("last_date"),
        )
    )
