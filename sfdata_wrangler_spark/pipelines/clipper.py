"""Clipper smart-card linked-trip inference (SURVEY.md W4/W5,
``ClipperHelper.py:141-265``).

Per card, ordered by tag-on time: a tag within 90 minutes of the
previous one is a TRANSFER; each non-transfer starts a new linked
trip; ``From_*`` attributes carry from the previous leg; per-leg
weights divide the card-day weight by (1 + transfers in the linked
trip). All window functions over (card) — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.datetime_fns import dow_class, service_date_rollover

TRANSFER_MINUTES = 90.0

# static DOW expansion weights (``ClipperHelper.py:45-71``): Clipper
# files are a sample of 2 weekdays / 15, 2 Saturdays / 3, 2 Sundays / 3
DOW_WEIGHTS = {1: 15.0 / 2.0, 2: 3.0 / 2.0, 3: 3.0 / 2.0}


def infer_linked_trips(
    df: DataFrame,
    card_col: str = "ClipperCardID",
    ts_col: str = "TagOnTime",
    seq_col: str = "TripSequenceID",
    carry_cols: tuple[str, ...] = ("AgencyName", "RouteName"),
) -> DataFrame:
    """Returns the input plus SERVICE_DATE, DOW, TIMEDIFF_TAGON,
    TRANSFER, LINKED_TRIP_ID, LINKED_TRANSFERS, WEIGHT, LINKED_WEIGHT,
    and From_<carry> columns."""
    w = Window.partitionBy(card_col).orderBy(seq_col)
    us = F.unix_micros(F.col(ts_col))
    out = (
        df.withColumn("SERVICE_DATE", service_date_rollover(F.col(ts_col)))
        .withColumn("DOW", dow_class(F.col("SERVICE_DATE")))
        .withColumn("TIMEDIFF_TAGON", (us - F.lag(us).over(w)) / 60000000.0)
        .withColumn(
            "TRANSFER",
            F.when(
                F.col("TIMEDIFF_TAGON") < TRANSFER_MINUTES, 1
            ).otherwise(0),
        )
    )
    for c in carry_cols:
        out = out.withColumn(f"From_{c}", F.lag(c).over(w))
    # linked-trip id: cumsum of non-transfers (the sessionization kernel)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = out.withColumn(
        "LINKED_TRIP_ID",
        F.sum(F.when(F.col("TRANSFER") == 0, 1).otherwise(0)).over(wcum),
    )
    # transfers within each linked trip (A2 grouped transform:
    # ``ClipperHelper.py:250-252``)
    wlink = Window.partitionBy(card_col, "LINKED_TRIP_ID")
    out = out.withColumn(
        "LINKED_TRANSFERS", F.sum("TRANSFER").over(wlink)
    )
    # DOW weights + linked weight (``ClipperHelper.py:254-258``)
    weight = (
        F.when(F.col("DOW") == 1, F.lit(DOW_WEIGHTS[1]))
        .when(F.col("DOW") == 2, F.lit(DOW_WEIGHTS[2]))
        .otherwise(F.lit(DOW_WEIGHTS[3]))
    )
    return out.withColumn("WEIGHT", weight).withColumn(
        "LINKED_WEIGHT", weight / (1 + F.col("LINKED_TRANSFERS"))
    )
