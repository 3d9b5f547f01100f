"""Report-layer queries (SURVEY.md §2.10, ``TransitReporter.py``).

The engine's "SELECT" surface: parameterized views over the cascade
outputs. Results are months × metrics (tiny) — the Excel/Bokeh
rendering stays driver-side, out of engine scope; these produce the
DataFrames those renderers consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import running_sum, trend_diff


def route_profile(
    rs: DataFrame,
    route: str,
    direction: int,
    month: str | None = None,
) -> DataFrame:
    """Route profile (``TransitReporter.py:943-1101``): one row per
    stop SEQ with ridership + running load recomputed from ON/OFF
    telescoping (W8) — the before/after comparison input."""
    sel = rs.where(
        (F.col("ROUTE_SHORT_NAME") == route) & (F.col("DIR") == direction)
    )
    if month is not None:
        sel = sel.where(F.col("MONTH") == month)
    return running_sum(
        sel,
        F.coalesce(F.col("ON"), F.lit(0.0)) - F.coalesce(F.col("OFF"), F.lit(0.0)),
        ["MONTH", "DOW", "ROUTE_SHORT_NAME", "DIR"],
        ["SEQ"],
        out="LOAD_DEP_RECOMPUTED",
    )


def performance_panel(
    system: DataFrame,
    dow: int = 1,
    fare: float = 2.0,
) -> DataFrame:
    """System performance panel (``TransitReporter.py:69-175``):
    monthly series + ~ratio metrics + 12-month trends (W14)."""
    base = system.where(F.col("DOW") == dow)
    panel = base.select(
        "MONTH",
        "ON",
        "TRIPS",
        "SERVMILES",
        "RUNTIME",
        F.when(F.col("SERVMILES") > 0, F.col("ON") / F.col("SERVMILES"))
        .otherwise(0.0)
        .alias("PASS_PER_MILE"),
        (F.col("ON") * fare).alias("FULLFARE_REV"),
        F.when(F.col("RUNTIME") > 0, F.col("SERVMILES") / (F.col("RUNTIME") / 60.0))
        .otherwise(0.0)
        .alias("AVG_SPEED"),
    )
    return trend_diff(panel, "ON", [], ["MONTH"], periods=12)
