"""Deterministic mergeable quantile sketch (log-histogram / DDSketch
family, integer-exact).

The 100 TB quantile problem: exact percentiles need a global sort (or
a per-group full materialization — see A1's taxi p95, fine at link
grain, impossible at event grain), and the standard sketches (KLL,
t-digest, GK) are either randomized or merge-order dependent — both
fatal to this engine's reproducibility contract. The DDSketch insight
(Masson et al., VLDB 2019) is that RELATIVE-error quantiles only need
a log-spaced histogram, and the log-spaced bucket of a positive
integer is PURE INTEGER arithmetic: bucket index = (exponent,
next-``sub_bits`` bits of the mantissa), i.e.

    e   = floor(log2(v))   —  length(bin(v)) - 1, no libm
    sub = (v >> (e - k)) - 2^k          (0 for v < 2^k)
    id  = e * 2^k + sub

Properties, all deterministic and engine-reproducible:

- **mergeable**: sketches are (bucket, count) tables; merge = count
  sum. Fold-equals-batch, so per-partition / per-day / streaming
  sketches combine exactly (same law as HLL registers, CMS counters,
  zone maps).
- **bounded relative error**: values in one bucket agree on their
  top ``sub_bits``+1 bits, so the bucket's lower bound is within a
  factor (1 + 2^-sub_bits) of every member — ±1.5% at k=6, ±0.4% at
  k=8. Bucket count is ~64·2^k whatever the data volume.
- **rank-exact quantile rule**: the q-quantile estimate is the lower
  bound of the first bucket whose cumulative count reaches
  ``ceil(q·n)`` — integer thresholds, no float rank arithmetic, so
  any engine walking the same counts returns the same bucket.

Values are fixed-point scaled (``scale`` units); zero/negative values
go to bucket -1 (exact zero-class, the sketch covers v ≥ 1 unit).
One map-side-combinable groupBy builds the sketch; quantile
extraction is a window walk over the bucket-count table (sketch-
sized, not data-sized).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(v: str, sub_bits: int) -> str:
    """SQL (valid in BOTH Spark SQL and DuckDB — bin/shift/% agree)
    mapping a positive BIGINT ``v`` to its log-histogram bucket id;
    -1 for v <= 0."""
    k = sub_bits
    e = f"(length(bin({v})) - 1)"
    return (
        f"CASE WHEN {v} <= 0 THEN CAST(-1 AS BIGINT) "
        f"WHEN {v} < {1 << k} THEN CAST({v} AS BIGINT) "
        f"ELSE CAST({e} * {1 << k} "
        f"+ ((CAST({v} AS BIGINT) >> ({e} - {k})) - {1 << k}) AS BIGINT) "
        f"END"
    )


def _lower_bound_expr(bucket: str, sub_bits: int, intdiv: str = "div") -> str:
    """SQL inverse: the smallest fixed-point value in ``bucket``.
    Buckets below 2^k hold exactly one value (small values exact).
    ``intdiv``: the engine's integer-division operator — ``div``
    (Spark) or ``//`` (DuckDB); everything else is shared syntax."""
    k = sub_bits
    e = f"({bucket} {intdiv} {1 << k})"
    sub = f"({bucket} % {1 << k})"
    return (
        f"CASE WHEN {bucket} < {1 << k} THEN CAST({bucket} AS BIGINT) "
        f"ELSE CAST((CAST({1 << k} AS BIGINT) + {sub}) << ({e} - {k}) "
        f"AS BIGINT) END"
    )


def qsketch_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
    sub_bits: int = 6,
    weight_col: str | None = None,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Build the per-group sketch: ``group_cols + (bucket, n)``.

    One map-side-combinable aggregation; at most ~64·2^sub_bits rows
    per group regardless of input volume. ``scale`` sets the
    fixed-point unit (pennies by default).

    With ``weight_col``, bucket counts are exact integer WEIGHT sums
    (micro-units of ``weight_scale``) instead of row counts — the
    survey-statistics variant: quantiles of the EXPANDED population
    (Horvitz-Thompson style, the reference's TRIP_WEIGHT/TOD_WEIGHT
    semantics) from the observed sample, still mergeable and still
    deterministic (the ceil-rank rule just runs on weight units).
    Rows with NULL or non-positive weight contribute nothing.

    Rows with a NULL or NaN ``value_col`` are EXCLUDED (matching
    percentile/median semantics in both engines): left in, NULLs
    would land in a NULL bucket that inflates ``n_total`` and shifts
    the cumulative rank walk (and the NULL bucket sorts differently
    cross-engine — Spark windows NULLS FIRST, DuckDB NULLS LAST);
    NaNs are worse — Spark casts floor(NaN·scale) to 0 (silently
    counted in the zero-class bucket) while DuckDB errors on
    CAST(NaN AS BIGINT) — ADVICE r4 + r5 review."""
    df = df.where(
        F.expr(
            f"({value_col}) IS NOT NULL"
            f" AND NOT isnan(CAST(({value_col}) AS DOUBLE))"
        )
    )
    v = f"CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)"
    if weight_col is None:
        n = F.count(F.lit(1)).cast("bigint")
    else:
        w = F.floor(F.col(weight_col) * weight_scale + 0.5).cast("bigint")
        n = F.sum(F.when(w > 0, w).otherwise(F.lit(0))).cast("bigint")
    return (
        df.withColumn("__b", F.expr(_bucket_expr(v, sub_bits)))
        .groupBy(*group_cols, F.col("__b").alias("bucket"))
        .agg(n.alias("n"))
    )


def qsketch_merge(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge two sketches: counts add per (group, bucket) — the whole
    merge law, which is what makes per-shard sketches combinable."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def qsketch_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    sub_bits: int = 6,
) -> DataFrame:
    """Per group, for each q in ``qs``: the sketch quantile estimate
    (fixed-point lower bound of the first bucket whose cumulative
    count reaches ceil(q·n)) plus ``n_total``. Columns are named
    ``q<percent>_scaled`` (``q95_scaled``), with sub-percent
    precision as a zero-padded basis-point remainder
    (``q99_50_scaled`` for 0.995); values are in the sketch's
    fixed-point units (the build's ``scale``).

    Pure window walk over the sketch table. The zero-class bucket
    (-1) participates with lower bound 0, so distributions with mass
    at/below zero report 0 for low quantiles."""
    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lb = F.expr(
        f"CASE WHEN bucket = -1 THEN CAST(0 AS BIGINT) ELSE "
        + _lower_bound_expr("bucket", sub_bits)
        + " END"
    )
    cum = (
        sketch.withColumn("cum", F.sum("n").over(w))
        .withColumn(
            "total", F.sum("n").over(Window.partitionBy(*gc))
        )
        .withColumn("lb", lb)
    )
    aggs = [F.max("total").cast("bigint").alias("n_total")]
    names = set()
    for q in qs:
        # ceil(q * n) with q a plan-time rational: (n * num + den - 1)
        # div den keeps the threshold integer-exact (no float rank)
        num = int(round(q * 10_000))
        thresh = F.expr(f"(total * {num} + 9999) div 10000")
        # sub-percent quantiles carry their basis-point remainder,
        # zero-padded so q99_05 (99.05%) ≠ q99_50 (99.5%)
        label = (
            f"q{num // 100}" if num % 100 == 0
            else f"q{num // 100}_{num % 100:02d}"
        )
        if label in names:
            raise ValueError(f"duplicate quantile label {label!r} from {q}")
        names.add(label)
        aggs.append(
            F.min(F.when(F.col("cum") >= thresh, F.col("lb")))
            .cast("bigint")
            .alias(f"{label}_scaled")
        )
    return cum.groupBy(*gc).agg(*aggs)
