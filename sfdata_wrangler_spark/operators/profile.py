"""One-pass table profiling (column statistics at scale).

Generalizes the reference's per-column statistics scan (S7 — the
DataFrame ``describe``-style summaries TransitReporter builds) into
an engine operator: for every requested column, count / nulls /
min / max / distinct in ONE aggregation pass over the table — no
per-column jobs, no driver loop.

Distinct counts default to the HyperLogLog++ sketch
(``approx_count_distinct``): mergeable, fixed memory, the only shape
that works at 100 TB where an exact distinct is a full shuffle PER
COLUMN. ``exact=True`` swaps in exact ``count_distinct`` for oracle
parity and small-data use (Spark rewrites multi-column exact
distincts into an expand join — correct, but ~cols× the input).

Output is long-form ``(column, metric, value)`` with values rendered
to strings (a profile is a report, not an arithmetic input — and the
schema stays stable across column types).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float")


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact: bool = False,
    quantiles: Sequence[float] | None = None,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Metrics per column: ``n`` (non-null), ``nulls``, ``min``, ``max``,
    ``distinct`` (HLL++ sketch unless ``exact``); with ``quantiles``,
    numeric columns also get ``p{q}`` rows from the
    ``approx_percentile`` sketch (KLL-family: mergeable, bounded
    memory — the same one-pass contract as the distinct sketch)."""
    dtypes = dict(df.dtypes)
    cols = list(cols) if cols is not None else [c for c, _ in df.dtypes]
    qmetrics: dict[str, list[str]] = {}
    aggs = []
    for c in cols:
        aggs.append(F.count(c).cast("bigint").alias(f"{c}__n"))
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls")
        )
        aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
        distinct = (
            F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        )
        aggs.append(distinct.cast("bigint").alias(f"{c}__distinct"))
        if quantiles and dtypes.get(c, "").startswith(_NUMERIC):
            names = [f"p{int(round(q * 100)):02d}" for q in quantiles]
            qmetrics[c] = names
            for q, nm in zip(quantiles, names):
                aggs.append(
                    F.percentile_approx(F.col(c).cast("double"), F.lit(q))
                    .cast("string")
                    .alias(f"{c}__{nm}")
                )
    wide = df.agg(*aggs)

    entries = []
    for c in cols:
        for m in ("n", "nulls", "min", "max", "distinct") + tuple(
            qmetrics.get(c, ())
        ):
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(m).alias("metric"),
                    F.col(f"{c}__{m}").cast("string").alias("value"),
                )
            )
    return wide.select(
        F.explode(F.array(*entries)).alias("e")
    ).select("e.column", "e.metric", "e.value")
