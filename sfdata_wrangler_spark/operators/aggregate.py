"""Rule-driven aggregation engine (SURVEY.md §2.4).

The reference's centerpiece is ``aggregateTransitRecords(df, groupby,
columnSpecs, level, weight)`` (``SFMuniDataAggregator.py:1018-1214``):
a declarative rule table mapping output columns to (input column,
aggregation method, level gate, dtype). Here each rule compiles to a
native Spark ``Column`` aggregate expression, so an entire cascade
stage is ONE ``groupBy(keys).agg(*exprs)`` — a single shuffle with
map-side partial aggregation, whole-stage codegen, and AQE skew
handling. No UDAFs.

Semantic hardening vs pandas (SURVEY §4 custom-work item 1): pandas
``'first'``/``'last'`` silently depend on a prior ``sort_values``;
here first/last REQUIRE an explicit ``order_by`` and compile to
``min_by``/``max_by`` over a deterministic ordering struct, so results
are reproducible under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregation-level lattice, finest → coarsest
#: (``SFMuniDataAggregator.py:1092-1101``).
LEVELS = ("trip_stop", "trip", "route_stop", "stop", "route", "system")


@dataclass(frozen=True)
class AggRule:
    """One output column of an aggregation stage.

    Mirrors the reference rule rows ``[outfield, infield, aggMethod,
    maxlevel, dtype, stringLength]`` (``SFMuniDataAggregator.py:
    1029-1063``); stringLength is an HDF5 artifact and dropped.
    """

    out: str
    src: str
    method: str  # first|last|sum|mean|min|max|count|countUnique|countNonZero|wgtSum|wgtAvg
    maxlevel: str = "system"
    dtype: str | None = None


def _rule_expr(rule: AggRule, weight: str | None, order_struct: Column | None) -> Column:
    m = rule.method
    c = F.col(rule.src)
    if m == "first":
        if order_struct is None:
            raise ValueError(
                f"rule {rule.out}: 'first' needs order_by (pandas implicit-"
                "sort semantics are not reproducible distributed)"
            )
        expr = F.min_by(c, order_struct)
    elif m == "last":
        if order_struct is None:
            raise ValueError(f"rule {rule.out}: 'last' needs order_by")
        expr = F.max_by(c, order_struct)
    elif m == "sum":
        expr = F.sum(c)
    elif m == "mean":
        expr = F.avg(c)
    elif m == "min":
        expr = F.min(c)
    elif m == "max":
        expr = F.max(c)
    elif m == "count":
        expr = F.count(c)
    elif m == "countUnique":
        # exact distinct (``SFMuniDataAggregator.py:1272-1277``); at
        # extreme scale swap for approx_count_distinct via the
        # ``approx`` method name below.
        expr = F.countDistinct(c)
    elif m == "approxCountUnique":
        expr = F.approx_count_distinct(c)
    elif m == "countNonZero":
        # OBSDAYS semantics (``SFMuniDataAggregator.py:280``)
        expr = F.count(F.when(c != 0, F.lit(1)))
    elif m == "wgtSum":
        if weight is None:
            raise ValueError(f"rule {rule.out}: wgtSum needs a weight column")
        expr = F.sum(c * F.col(weight))
    elif m == "wgtAvg":
        if weight is None:
            raise ValueError(f"rule {rule.out}: wgtAvg needs a weight column")
        # Σ(w·x)/Σ(w) with pandas NaN-skipping: pairs where x is null
        # contribute to neither numerator nor denominator.
        w_eff = F.when(c.isNotNull(), F.col(weight))
        expr = F.sum(c * F.col(weight)) / F.sum(w_eff)
    elif m == "meanTimes":
        # mean of timestamps (``SFMuniDataAggregator.py:1218-1254``)
        expr = F.timestamp_seconds(F.avg(F.unix_timestamp(c)))
    else:
        raise ValueError(f"unknown aggregation method {m!r}")
    if rule.dtype:
        expr = expr.cast(rule.dtype)
    return expr.alias(rule.out)


def aggregate_records(
    df: DataFrame,
    groupby: Sequence[str],
    rules: Sequence[AggRule],
    level: str = "system",
    weight: str | None = None,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """One cascade stage: ``groupBy(groupby).agg(compiled rules)``.

    ``level`` drops rules whose ``maxlevel`` is finer than the target
    (``SFMuniDataAggregator.py:1092-1101``). ``order_by`` pins the
    ordering that 'first'/'last' observe.
    """
    if level not in LEVELS:
        raise ValueError(f"unknown level {level!r}; expected one of {LEVELS}")
    level_rank = LEVELS.index(level)
    order_struct = F.struct(*[F.col(c) for c in order_by]) if order_by else None
    exprs = [
        _rule_expr(r, weight, order_struct)
        for r in rules
        if LEVELS.index(r.maxlevel) >= level_rank
    ]
    return df.groupBy(*groupby).agg(*exprs)


def update_speeds(
    df: DataFrame,
    miles_col: str = "SERVMILES",
    runtime_col: str = "RUNTIME",
    tottime_col: str | None = "TOTTIME",
) -> DataFrame:
    """Post-aggregation speed recompute with the zero/negative-runtime
    guard (``SFMuniDataAggregator.py:1171-1197,1257-1270``)."""

    def _speed(time_col: str) -> Column:
        t = F.col(time_col)
        return (
            F.when(t > 0, F.round(F.col(miles_col) / (t / 60.0), 2))
            .when(t == 0, F.lit(0.0))
            .otherwise(F.lit(None).cast("double"))
        )

    out = df.withColumn("RUNSPEED", _speed(runtime_col))
    if tottime_col and tottime_col in df.columns:
        out = out.withColumn("TOTSPEED", _speed(tottime_col))
    return out
