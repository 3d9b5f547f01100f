"""Zone-map file skipping (lakehouse planning surface).

Parquet footers carry per-file column min/max; engines use them to
skip whole files before any scan. These operators materialize that
machinery as DATA, which is what a 100 TB table needs for planning
jobs (how much will this predicate scan? is the layout clustered
enough?) without touching the files:

- :func:`zonemap_stats` — per-file min/max/null zone maps from one
  aggregation pass (built once per compaction, amortized over every
  query that plans against it).
- :func:`prune_files` — which files MAY contain rows matching a
  conjunctive predicate. The guarantee is one-sided, like real
  zone-map pruning: a pruned file provably contains no match; a
  surviving file may still contain none.

The skip RATE is a property of the physical layout: files written in
key order (operators/zorder.zorder_layout, lake sort keys) give tight
non-overlapping [min, max] spans and high skip rates; a round-robin
shuffle gives every file the full value range and zero skips. The
differential test demonstrates exactly that contrast.

Reference parity: the indexed scan S6 (`sfdata_wrangler.py`'s
where-clause HDF reads) is the runtime half; this is the planning
half at lake scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = ("<", "<=", ">", ">=", "=", "between")


def zonemap_stats(
    df: DataFrame, file_col: str, cols: Sequence[str]
) -> DataFrame:
    """Per-``file_col`` zone maps for ``cols``: n_rows plus
    min_<c> / max_<c> / nulls_<c> per column. One map-side-combinable
    aggregation; output is file-count-sized (the manifest scale, not
    the data scale)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nulls_{c}")
        )
    return df.groupBy(file_col).agg(*aggs)


def _may_match(zm_cols: dict, col: str, op: str, lo, hi=None) -> Column:
    """Interval-overlap test for one predicate against a file's
    [min, max] span. NULL spans (all-null file) cannot match any
    value predicate."""
    mn, mx = zm_cols[f"min_{col}"], zm_cols[f"max_{col}"]
    if op == "<":
        cond = mn < F.lit(lo)
    elif op == "<=":
        cond = mn <= F.lit(lo)
    elif op == ">":
        cond = mx > F.lit(lo)
    elif op == ">=":
        cond = mx >= F.lit(lo)
    elif op == "=":
        cond = (mn <= F.lit(lo)) & (mx >= F.lit(lo))
    elif op == "between":
        cond = (mn <= F.lit(hi)) & (mx >= F.lit(lo))
    else:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    return F.coalesce(cond, F.lit(False))


def prune_files(
    zonemap: DataFrame,
    predicates: Sequence[tuple],
) -> DataFrame:
    """Annotate a :func:`zonemap_stats` manifest with ``may_match``
    for a CONJUNCTION of predicates ``(col, op, value)`` (or
    ``(col, 'between', lo, hi)``).

    ``may_match = False`` is a proof: no row in that file satisfies
    the conjunction (each predicate's interval misses the file's
    span). ``True`` only means the spans overlap — the one-sided
    contract of real zone maps. Pure column expressions over the
    file-sized manifest; nothing scans data."""
    zm_cols = {c: F.col(c) for c in zonemap.columns}
    cond = F.lit(True)
    for p in predicates:
        if len(p) == 4:
            col, op, lo, hi = p
        else:
            col, op, lo = p
            hi = None
        cond = cond & _may_match(zm_cols, col, op, lo, hi)
    return zonemap.withColumn("may_match", cond)


def skip_rate(pruned: DataFrame) -> DataFrame:
    """One-row summary of a :func:`prune_files` result: files and
    rows total vs skippable — the layout-quality metric a compaction
    or z-order job is judged by."""
    return pruned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(~F.col("may_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("files_skipped"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(~F.col("may_match"), F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
    )
