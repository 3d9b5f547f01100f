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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket: str = "1 hour",
    keys: Sequence[str] = (),
) -> DataFrame:
    """All (a, b) row pairs whose HALF-OPEN intervals
    ``[a_start, a_end)`` and ``[b_start, b_end)`` overlap — the
    interval×interval join (trips × service alerts, sessions ×
    incidents) that :func:`interval_lookup` (point-in-interval,
    broadcast dim) cannot express when BOTH sides are fact-scale.

    Shape: explode each interval into the coarse time-grid cells it
    touches (``sequence`` over ``bucket``-truncated endpoints — a
    bounded ×(duration/bucket) multiplication), equi-join on the
    cell (+ optional ``keys``), verify the exact overlap predicate.
    Any overlapping pair shares the cell containing the LATER of the
    two starts, so keeping only the candidate whose join cell is that
    one cell yields each pair exactly once with no dedup shuffle —
    genuinely duplicate input rows still produce one pair each. The
    grid is a LOSSLESS candidate generator — the temporal twin of the
    spatial grid join (operators/spatial.py) and the same trade:
    bucket ≈ typical interval length bounds both blow-up and bucket
    population.

    ``keys`` restricts pairs to rows agreeing on those columns
    (present on both sides; emitted once, from a).

    Returns a's columns + b's non-key columns plus ``overlap_us``.
    Intervals longer than ~10k buckets should use a coarser grid
    (explode cost is linear in cells per interval).
    """
    cell = lambda c: F.window(c, bucket).start  # noqa: E731

    def cells(df, s, e, tag):
        # empty/degenerate intervals (end <= start) match nothing
        # under the half-open semantics — and must be dropped BEFORE
        # the grid explode: a zero-length interval starting exactly
        # on a bucket boundary would otherwise hand F.sequence a
        # stop < start and crash the job
        return df.where(F.col(e) > F.col(s)).withColumn(
            f"__cell_{tag}",
            F.explode(
                F.sequence(
                    cell(F.col(s)),
                    # end is exclusive: the last touched cell is the
                    # one containing end - 1us
                    cell(F.col(e) - F.expr("INTERVAL 1 MICROSECOND")),
                    F.expr(f"INTERVAL {bucket}"),
                )
            ),
        )

    ac = cells(a, a_start, a_end, "a")
    # rename b's key columns so the equi-join can reference both sides
    # (joining against bc.drop(keys) would leave nothing to equate)
    b_renamed = b
    for k in keys:
        b_renamed = b_renamed.withColumnRenamed(k, f"__bk_{k}")
    bc = cells(b_renamed, b_start, b_end, "b")
    on = [ac["__cell_a"] == bc["__cell_b"]] + [
        ac[k] == bc[f"__bk_{k}"] for k in keys
    ]
    joined = ac.join(bc, on)
    # exactly-once emission: of the cells a pair shares, keep the one
    # containing the later start (both sides touch it by overlap)
    later_start_cell = cell(
        F.greatest(F.col(a_start), F.col(b_start))
    )
    overlap = (
        F.least(F.unix_micros(F.col(a_end)), F.unix_micros(F.col(b_end)))
        - F.greatest(
            F.unix_micros(F.col(a_start)), F.unix_micros(F.col(b_start))
        )
    ).alias("overlap_us")
    return (
        joined.where(F.col("__cell_a") == later_start_cell)
        .drop("__cell_a", "__cell_b", *[f"__bk_{k}" for k in keys])
        .withColumn("overlap_us", overlap)
        .where(F.col("overlap_us") > 0)
    )
