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

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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


# ln(1+1/d)/ln(10) in parts per million, precomputed once so both
# engines compare against the SAME integers (no cross-engine libm)
BENFORD_MICRO = {
    d: round(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}


def benford_first_digit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the
    classic fabricated-data / unit-mixup screen for financial-style
    columns. Emits per digit 1-9: observed count, observed share and
    the Benford expectation ln(1+1/d)/ln(10), both in integer
    MICRO-UNITS (parts per million) so the comparison is exact across
    engines (libm log differs by ulps between the JVM and DuckDB —
    the expectations are injected as precomputed constants, see
    BENFORD_MICRO).

    Works on positive values >= 1: the first digit is read from the
    integer part's decimal rendering (exact in both engines;
    double-formatting of fractional parts is NOT portable). One
    map-side-combinable digit count (9-row result), then a 9-row
    window for the total — nothing here scales with the input."""
    first = F.substring(
        F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1
    )
    counts = (
        df.where(F.col(value_col) >= 1)
        .groupBy(first.alias("first_digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.create_map(
        *[
            x
            for d, micro in BENFORD_MICRO.items()
            for x in (F.lit(str(d)), F.lit(micro))
        ]
    )
    return counts.select(
        "first_digit",
        "n",
        F.expr("CAST(n AS DECIMAL(38, 0)) * 1000000").alias("__nm"),
        total.alias("__tot"),
        expected[F.col("first_digit")].alias("benford_micro"),
    ).select(
        "first_digit",
        "n",
        # DECIMAL(38,0): n * 1e6 overflows BIGINT past ~9.2e12 rows
        # per digit (digit 1 holds ~30% of a Benford-ish corpus) —
        # same idiom as encode.woe_odds_encode
        F.expr("CAST(CAST(__nm AS DECIMAL(38, 0)) div __tot AS BIGINT)")
        .alias("share_micro"),
        F.col("benford_micro").cast("bigint").alias("benford_micro"),
    )

