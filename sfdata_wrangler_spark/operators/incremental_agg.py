"""Incremental (delta) aggregate maintenance.

The reference's whole pipeline is APPEND-shaped: monthly extracts
land one at a time and every level of the cascade is appended per
month into HDF5 keys (SFMuniDataHelper.py:535 store.append;
SFMuniDataAggregator.py:261,363,459) — history is never recomputed.
This operator gives that idiom its engine form: maintain a running
aggregate by MERGING the previous aggregate state with the new
batch's partial aggregate, touching history once (aggregate-grain,
not fact-grain) and the new facts once.

Only ALGEBRAIC aggregates merge this way — the state carries
(sum, count, min, max) per group and every derived value (mean)
recomputes from merged state at read time. countDistinct does NOT
merge from counts (state would need the value sets or an HLL
sketch — operators/profile.py carries exactly that sketch for its
distinct column).

At 100 TB the point is the read/write asymmetry: the nightly batch
is fact-sized but the merge join is aggregate-grain × batch-grain —
a full-outer equi join on the group key, usually orders of magnitude
smaller than re-aggregating the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_aggregate", "merge_aggregates"]

_STATE_COLS = ("cnt", "sum_v", "min_v", "max_v")


def partial_aggregate(
    facts: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Algebraic aggregate state for one batch: ``keys + (cnt, sum_v,
    min_v, max_v)``. ``sum_v`` accumulates exact integer
    ten-thousandths so merge order can never perturb it."""
    return facts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.floor(F.col(value_col) * 10000 + 0.5).cast("long"))
        .cast("bigint")
        .alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_aggregates(
    prev: DataFrame, batch: DataFrame, keys: list[str]
) -> DataFrame:
    """Merged aggregate state: full-outer join on the group keys,
    state columns combined algebraically. ``merge(partial(A),
    partial(B)) == partial(A ∪ B)`` exactly — the property the test
    suite pins — so the maintenance loop can fold batches in any
    order."""
    p = prev.select(
        *keys, *[F.col(c).alias(f"p_{c}") for c in _STATE_COLS]
    )
    b = batch.select(
        *keys, *[F.col(c).alias(f"b_{c}") for c in _STATE_COLS]
    )
    j = p.join(b, keys, "full_outer")
    zero = F.lit(0).cast("bigint")
    return j.select(
        *keys,
        (F.coalesce("p_cnt", zero) + F.coalesce("b_cnt", zero)).alias("cnt"),
        (F.coalesce("p_sum_v", zero) + F.coalesce("b_sum_v", zero)).alias(
            "sum_v"
        ),
        F.least(
            F.coalesce("p_min_v", F.col("b_min_v")),
            F.coalesce("b_min_v", F.col("p_min_v")),
        ).alias("min_v"),
        F.greatest(
            F.coalesce("p_max_v", F.col("b_max_v")),
            F.coalesce("b_max_v", F.col("p_max_v")),
        ).alias("max_v"),
    )
