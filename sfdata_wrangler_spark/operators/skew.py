"""Skew-handling utilities (SURVEY.md §4: trunk routes / hot users).

AQE's skew-join splitting covers joins; for AGGREGATIONS over skewed
keys (a hot route with 100× the rows of the median), the classic fix
is two-phase salted aggregation: shuffle once on (key, salt) so the
hot key spreads over N reducers, then combine the N partials. Only
algebraic aggregates (sum/count/min/max) compose; avg is derived
sum/count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    counts: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) combine. Returns sum_<c> per requested column and
    n_rows. Equivalent to a direct groupBy (tested), but the first
    shuffle spreads each hot key over ``salt_buckets`` reducers."""
    salt = (F.rand(seed=7) * salt_buckets).cast("int").alias("__salt")
    partial_aggs = [F.sum(c).alias(f"sum_{c}") for c in sums]
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("n_rows"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *partial_aggs
    )
    final_aggs = [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        final_aggs.append(F.sum("n_rows").alias("n_rows"))
    return partial.groupBy(*keys).agg(*final_aggs)
