"""Expansion weighting (SURVEY.md W7, ``SFMuniDataExpander.py:122-166``).

The APC sampling premise: only a fraction of scheduled trips carry
counters, so observed trips are weighted up to represent the full
schedule within an expansion cell (DATE × TOD × route × direction).

    factor    = Σ(TRIP_STOPS) / Σ(oldWeight · TRIP_STOPS)   per cell
    newWeight = oldWeight · factor          (NaN if nothing observed)

In the reference this is a ``groupby().apply`` over pandas groups; on
Spark it is two window sums over the cell partition — one shuffle, no
UDF, and the invariant Σ(newWeight·TRIP_STOPS) = Σ(TRIP_STOPS) holds
per cell whenever the cell has ≥1 observation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calc_weights(
    df: DataFrame,
    group: Sequence[str],
    old_weight: str,
    trip_stops: str = "TRIP_STOPS",
    out: str = "WEIGHT",
    strategy: str = "window",
    knee_rows: int | None = None,
) -> DataFrame:
    """``strategy="window"`` (default) shuffles every row into its cell
    partition — fine when cells are balanced, but a hot cell (SURVEY §4:
    one trunk route with ~40% of all AVL rows) lands on ONE task, and
    AQE cannot split a window partition the way it splits a skewed
    join. ``strategy="agg"`` is the skew-immune form: the two cell sums
    are map-side-combinable aggregations (each input partition emits at
    most one partial per cell, so the hot cell costs the same as any
    other), and the factor table — one row per cell, dimension-sized —
    broadcasts back onto the rows with no second shuffle of the fact.
    Both strategies compute the identical factor; the summation order
    differs, so results are bitwise-equal whenever the addends are
    exactly representable (the 1.0-seeded expansion weighting always
    is) and equal-within-ulps otherwise.

    ``strategy="auto"`` (VERDICT r11 ask #5) runs ONE dimension-sized
    pre-flight aggregation (:func:`..skew.max_partition_rows` — an
    eager extra pass over the cell columns) and picks at the measured
    knee: below ~1M rows in the hottest cell the window form's single
    shuffle wins (agg pays a second dim-broadcast join for nothing);
    above it the window form's wall clock IS the hot cell's one-task
    sort (+65-75% measured at a 40% hot cell, ARCHITECTURE "Flagship
    weight-cell skew") while agg stays flat. Default strategy remains
    "window" — auto's pre-flight job is opt-in."""
    if strategy == "auto":
        strategy = choose_weight_strategy(df, group, knee_rows=knee_rows)
    if strategy == "agg":
        return _calc_weights_agg(df, group, old_weight, trip_stops, out)
    if strategy != "window":
        raise ValueError(
            f"strategy must be 'window', 'agg' or 'auto', got {strategy!r}"
        )
    w = Window.partitionBy(*group)
    total = F.sum(F.col(trip_stops)).over(w)
    observed = F.sum(
        F.when(
            F.col(old_weight).isNotNull(), F.col(old_weight) * F.col(trip_stops)
        )
    ).over(w)
    factor = F.when(observed > 0, total / observed)
    return df.withColumn(out, F.col(old_weight) * factor)


def choose_weight_strategy(
    df: DataFrame, group: Sequence[str], knee_rows: int | None = None
) -> str:
    """The ``strategy="auto"`` pick, exposed for direct use and for
    pinning in tests: "agg" iff the hottest expansion cell exceeds
    ``knee_rows`` (measured knee ~1M rows per cell at local[32] —
    below it the window form's single shuffle wins, above it the hot
    cell's single-task sort dominates and only the map-side-combinable
    agg form stays flat). ``knee_rows=None`` (the default since r13)
    derives the knee from the session via
    :func:`..skew.default_knee_rows` — 125k rows/task x (P // 4)
    tasks, which reproduces the measured 1M at local[32] exactly and
    scales with cluster parallelism (see its docstring for the
    derivation and its assumptions)."""
    from .skew import default_knee_rows, max_partition_rows

    if knee_rows is None:
        knee_rows = default_knee_rows(df.sparkSession)
    return "agg" if max_partition_rows(df, group) > knee_rows else "window"


def _calc_weights_agg(
    df: DataFrame,
    group: Sequence[str],
    old_weight: str,
    trip_stops: str,
    out: str,
) -> DataFrame:
    from ._scratch import reject_scratch_columns

    group = list(group)
    # ADVICE r11 #1: same guard class as sessionize_bucketed's __sb_
    reject_scratch_columns(df, "__cw_", "calc_weights(strategy='agg')")
    cells = df.groupBy(*group).agg(
        F.sum(F.col(trip_stops)).alias("__cw_total"),
        F.sum(
            F.when(
                F.col(old_weight).isNotNull(),
                F.col(old_weight) * F.col(trip_stops),
            )
        ).alias("__cw_observed"),
    )
    factors = cells.select(
        *[F.col(c).alias(f"__cw_{c}") for c in group],
        F.when(
            F.col("__cw_observed") > 0,
            F.col("__cw_total") / F.col("__cw_observed"),
        ).alias("__cw_factor"),
    )
    # null-safe equality so a NULL cell key matches itself, exactly as
    # Window.partitionBy groups nulls together
    cond = None
    for c in group:
        eq = F.col(c).eqNullSafe(F.col(f"__cw_{c}"))
        cond = eq if cond is None else cond & eq
    joined = df.join(F.broadcast(factors), cond, "left")
    return joined.withColumn(
        out, F.col(old_weight) * F.col("__cw_factor")
    ).drop("__cw_factor", *[f"__cw_{c}" for c in group])


def seed_trip_weight(df: DataFrame, observed_col: str = "OBSERVED") -> DataFrame:
    """TRIP_WEIGHT seed: 1.0 where observed, null where not
    (``SFMuniDataExpander.py:600-606``)."""
    return df.withColumn(
        "TRIP_WEIGHT",
        F.when(F.col(observed_col) == 1, F.lit(1.0)).otherwise(
            F.lit(None).cast("double")
        ),
    )
