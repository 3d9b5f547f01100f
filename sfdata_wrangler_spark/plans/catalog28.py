"""Catalog wave 28 (round 4): deterministic quantile sketch queries.

The log-histogram sketch (operators/qsketch.py) gives the engine a
mergeable, deterministic percentile path for volumes where exact
per-group sorting is off the table — the DDSketch idea with the log
replaced by integer bit-length, so both engines replay the identical
arithmetic and even the sketch itself hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.qsketch import (
    _bucket_expr,
    _lower_bound_expr,
    qsketch_build,
    qsketch_quantiles,
)
from .catalog import _register, _t

_V = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_SK_SQL = f"""
    sk AS (
      SELECT l_returnflag, {_bucket_expr(_V, 6)} AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
      GROUP BY 1, 2
    )
"""


@_register(
    "sk_qsketch_buckets",
    f"WITH {_SK_SQL} SELECT * FROM sk",
)
def sk_qsketch_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag log-histogram sketch of extended price: one
    map-side-combinable groupBy, ≤ ~64·2^6 buckets per group whatever
    the row count. The oracle replays the bit-length bucket id — the
    sketch STATE is hash-checked, not just its readout (the zone-map
    / HLL-register discipline)."""
    li = _t(spark, sf_dir, "lineitem")
    return qsketch_build(
        li, ["l_returnflag"], "l_extendedprice", scale=100, sub_bits=6
    )


def _thresh(numq: int) -> str:
    return f"(total * {numq} + 9999) // 10000"


@_register(
    "sk_qsketch_quantiles",
    f"""
    WITH {_SK_SQL},
    c AS (
      SELECT l_returnflag, bucket, n,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total,
             CASE WHEN bucket = -1 THEN CAST(0 AS BIGINT)
                  ELSE {_lower_bound_expr("bucket", 6, intdiv="//")} END AS lb
      FROM sk
    )
    SELECT l_returnflag, CAST(max(total) AS BIGINT) AS n_total,
           CAST(min(CASE WHEN cum >= {_thresh(5000)} THEN lb END) AS BIGINT)
             AS q50_scaled,
           CAST(min(CASE WHEN cum >= {_thresh(9500)} THEN lb END) AS BIGINT)
             AS q95_scaled,
           CAST(min(CASE WHEN cum >= {_thresh(9900)} THEN lb END) AS BIGINT)
             AS q99_scaled
    FROM c GROUP BY l_returnflag
    """,
    bench=True,
)
def sk_qsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of extended price per returnflag from the sketch:
    integer ceil-rank thresholds over the cumulative bucket walk —
    deterministic to the bucket boundary (relative error ≤ 1/64),
    with the window pass running on the SKETCH table, not the data."""
    li = _t(spark, sf_dir, "lineitem")
    sk = qsketch_build(
        li, ["l_returnflag"], "l_extendedprice", scale=100, sub_bits=6
    )
    return qsketch_quantiles(
        sk, ["l_returnflag"], [0.5, 0.95, 0.99], sub_bits=6
    )
