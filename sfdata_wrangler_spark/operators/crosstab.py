"""Crosstab with margins (SURVEY.md A6, ``Utils.py:23-46``).

``cleanCrosstab(rows, cols, values, aggfunc)`` with row/column totals
and the reference's zero-vs-NaN distinction (empty cells are 0, not
null). Spark-first: ``groupBy().pivot()`` with an EXPLICIT pivot-value
list — discovering pivot values at plan time is a full extra scan and
an unbounded-width schema at 100 TB, so callers pass the column
domain (dimension tables are small and known).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crosstab_with_margins(
    df: DataFrame,
    row_key: str,
    col_key: str,
    value_col: str,
    pivot_values: Sequence[str],
    agg: str = "sum",
    total_label: str = "Total",
) -> DataFrame:
    aggfn = getattr(F, agg)
    body = (
        df.groupBy(row_key)
        .pivot(col_key, list(pivot_values))
        .agg(aggfn(value_col))
        .na.fill(0.0, list(pivot_values))
    )
    row_total = None
    for v in pivot_values:
        row_total = F.col(v) if row_total is None else row_total + F.col(v)
    body = body.withColumn(total_label, row_total)
    # grand-total row via a rollup-free union (one extra tiny agg)
    totals = body.agg(
        *[F.sum(v).alias(v) for v in pivot_values],
        F.sum(total_label).alias(total_label),
    ).withColumn(row_key, F.lit(total_label))
    return body.unionByName(totals)
