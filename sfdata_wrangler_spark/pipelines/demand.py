"""Demand-driver series transforms (SURVEY.md §2 J5/J8/W13/F11-CPI;
``DemandHelper.py:518-1619``).

Monthly county-level socioeconomic series: CPI deflation to constant
dollars, annual→monthly step expansion over a generated month spine,
QCEW↔LODES scaling-factor joins, and census-block→county crosswalk
rollups. All month-spine joins are broadcast (the spine is ≤ a few
thousand rows for decades of months × counties).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import ffill


def cpi_deflate(
    df: DataFrame,
    value_cols: Sequence[str],
    cpi_col: str = "CPI",
    base_cpi: float | None = None,
    suffix: str = "_2010USD",
) -> DataFrame:
    """Deflate nominal dollars to constant dollars:
    ``value · base/CPI`` (``DemandHelper.py:1528-1556``). If
    ``base_cpi`` is None the maximum CPI in the frame is used (the
    reference pins base-year 2010's CPI; pass it explicitly there)."""
    if base_cpi is not None:
        base = F.lit(base_cpi)
    else:
        base = F.max(cpi_col).over(Window.partitionBy())
    out = df.withColumn("__factor", base / F.col(cpi_col))
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(c) * F.col("__factor"))
    return out.drop("__factor")


def annual_to_monthly_step(
    annual: DataFrame,
    spine: DataFrame,
    keys: Sequence[str],
    year_col: str = "YEAR",
    month_col: str = "MONTH",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Annual values replicated to months (W13 step expansion,
    ``MultiModalHelper.py:122-178``): join each spine month to its
    year's value, then forward-fill across years with missing data."""
    value_cols = value_cols or [
        c for c in annual.columns if c not in (*keys, year_col)
    ]
    joined = spine.withColumn(year_col, F.year(month_col)).join(
        F.broadcast(annual), [*keys, year_col], "left"
    )
    out = joined
    for c in value_cols:
        out = ffill(out, c, list(keys), [month_col])
    return out.drop(year_col)


def scaling_factor_join(
    monthly: DataFrame,
    truth: DataFrame,
    keys: Sequence[str],
    monthly_col: str,
    truth_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """QCEW↔WAC pattern (J8, ``DemandHelper.py:1280-1330``): compute a
    per-key scaling factor truth/monthly, then apply it to value
    columns — two broadcast left joins + column arithmetic.

    ``monthly_col`` must be constant within each key (it is a per-key
    control total); the factor frame is built from the DISTINCT
    (keys, monthly_col) projection so callers may pass a frame with
    many rows per key (e.g. county-months keyed by county-year)
    without the apply join fanning out."""
    factors = (
        monthly.select(*keys, monthly_col)
        .distinct()
        .join(F.broadcast(truth), list(keys))
        .select(
            *keys,
            (F.col(truth_col) / F.col(monthly_col)).alias("__factor"),
        )
    )
    out = monthly.join(F.broadcast(factors), list(keys), "left")
    for c in value_cols:
        out = out.withColumn(c, F.col(c) * F.coalesce("__factor", F.lit(1.0)))
    return out.drop("__factor")


def convert_annual_to_monthly(
    annual: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    year_col: str = "YEAR",
    month_col: str = "MONTH",
) -> DataFrame:
    """The reference's annual→monthly interpolation
    (``DemandHelper.py:1559-1619``) as one window composition:

    1. per key, linearly EXTRAPOLATE one anchor year before the first
       (``v₁ − (v₂ − v₁)``) and after the last (``vₙ + (vₙ − vₙ₋₁)``);
    2. anchor every year's value at July 1;
    3. join onto the month spine spanning the extended years and
       linearly interpolate between anchors
       (:func:`..operators.windows.interpolate_monthly`);
    4. trim to January(first real year) … December(last real year) —
       the six months on each end come from the extrapolated anchors,
       exactly the reference's ``YEAR ≥ extraStart+0.5`` cut.

    The spine is generated, not passed in, because its span depends on
    each key's year range (all keys share the global range here, as in
    the reference's county loop). Returns (keys..., MONTH, value_cols)
    with MONTH a first-of-month date."""
    spark = annual.sparkSession
    w_asc = Window.partitionBy(*keys).orderBy(F.col(year_col).asc())
    w_desc = Window.partitionBy(*keys).orderBy(F.col(year_col).desc())

    def edge(wspec, shift_years):
        """First row per key under ``wspec`` with extrapolated values.
        A key with a SINGLE observed year has no trend to extrapolate
        (lead() is null); it falls back to a constant series rather
        than poisoning its 11 non-July months with NULLs."""
        r = annual.withColumn("__rn", F.row_number().over(wspec)).withColumn(
            "__nxt",
            F.struct(
                *[F.lead(c).over(wspec).alias(c) for c in value_cols]
            ),
        )
        r = r.where(F.col("__rn") == 1)
        cols = [F.col(k) for k in keys] + [
            (F.col(year_col) + shift_years).alias(year_col)
        ]
        for c in value_cols:
            cols.append(
                (
                    F.col(c)
                    - (F.coalesce(F.col("__nxt")[c], F.col(c)) - F.col(c))
                ).alias(c)
            )
        return r.select(*cols)

    extended = (
        annual.select(*keys, year_col, *value_cols)
        .unionByName(edge(w_asc, -1))
        .unionByName(edge(w_desc, 1))
    )
    anchors = extended.withColumn(
        month_col,
        F.to_date(F.concat(F.col(year_col).cast("string"), F.lit("-07-01"))),
    ).drop(year_col)

    bounds = annual.agg(
        F.min(year_col).alias("y0"), F.max(year_col).alias("y1")
    ).collect()[0]
    spine = spark.sql(
        f"SELECT explode(sequence(to_date('{bounds['y0'] - 1}-07-01'), "
        f"to_date('{bounds['y1'] + 1}-07-01'), interval 1 month)) "
        f"AS {month_col}"
    ).crossJoin(F.broadcast(annual.select(*keys).distinct()))

    joined = spine.join(F.broadcast(anchors), [*keys, month_col], "left")
    out = joined
    from ..operators.windows import interpolate_monthly

    for c in value_cols:
        out = interpolate_monthly(out, month_col, c, partition=list(keys))
    return out.where(
        (F.col(month_col) >= F.lit(f"{bounds['y0']}-01-01").cast("date"))
        & (F.col(month_col) <= F.lit(f"{bounds['y1']}-12-01").cast("date"))
    )


def crosswalk_rollup(
    blocks: DataFrame,
    xwalk: DataFrame,
    block_col: str,
    xwalk_block_col: str = "tabblk2010",
    group_col: str = "COUNTY_FIPS",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """LODES block→county rollup (J5, ``DemandHelper.py:1201-1224``):
    broadcast the crosswalk, sum value columns per county."""
    value_cols = value_cols or [
        c for c in blocks.columns if c != block_col
    ]
    joined = blocks.join(
        F.broadcast(xwalk.select(xwalk_block_col, group_col)),
        blocks[block_col] == xwalk[xwalk_block_col],
    )
    return joined.groupBy(group_col).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )
