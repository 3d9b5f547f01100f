"""Date/time column functions (SURVEY.md §2.8 F5/F6/F14/F15).

The transit domain runs on a 3am–3am *service day*: times at or after
midnight belong to the previous service date. The reference implements
this three separate ways (fixed-width HHMMSS ints ≥ 240000 in
``SFMuniDataHelper.py:622-649``, GTFS ``'25:10:00'`` strings in
``GTFSHelper.py:65-84``, Clipper tag times before 3am in
``ClipperHelper.py:31-42``); here it is one centralized family of
column functions — pure Column expressions, fully codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wraparound_timestamp(date_col: Column, hhmmss_col: Column) -> Column:
    """Service-day HHMMSS int + service date → concrete timestamp.

    Semantics of ``SFMuniDataHelper.py:622-649``: packed times of
    240000 and above (e.g. 253000 = 1:30am after midnight) subtract
    240000 and land on ``date + 1 day``.
    """
    wrapped = hhmmss_col >= 240000
    t = F.when(wrapped, hhmmss_col - 240000).otherwise(hhmmss_col)
    day = F.when(wrapped, F.date_add(date_col, 1)).otherwise(date_col)
    hh = F.floor(t / 10000)
    mm = F.floor((t % 10000) / 100)
    ss = t % 100
    return F.to_timestamp(
        F.concat_ws(
            " ",
            F.date_format(day, "yyyy-MM-dd"),
            F.format_string(
                "%02d:%02d:%02d",
                hh.cast("int"),
                mm.cast("int"),
                ss.cast("int"),
            ),
        )
    )


def gtfs_time_to_timestamp(date_col: Column, gtfs_time: Column) -> Column:
    """GTFS ``'HH:MM:SS'`` string (HH may exceed 23, e.g. '25:10:00')
    + service date → concrete timestamp (``GTFSHelper.py:65-84``)."""
    parts = F.split(gtfs_time, ":")
    secs = (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )
    return F.to_timestamp(date_col) + F.make_interval(secs=secs.cast("double"))


def service_date_rollover(ts_col: Column, cutoff_hour: int = 3) -> Column:
    """Timestamp → service DATE under the 3am rule: times in
    [midnight, cutoff) belong to the previous service day
    (``ClipperHelper.py:31-42``)."""
    return F.to_date(
        F.when(F.hour(ts_col) < cutoff_hour, F.date_sub(F.to_date(ts_col), 1)).otherwise(
            F.to_date(ts_col)
        )
    )


def month_trunc(col: Column) -> Column:
    """First-of-month timestamp → the reference's MONTH convention
    (``to_period('M').to_timestamp()``, ``SFMuniDataHelper.py:582``)."""
    return F.date_trunc("month", col)


def fiscal_year(col: Column) -> Column:
    """July-start fiscal year (``MultiModalHelper.py:31-38``):
    FY(x) = calendar year of (x + 6 months)."""
    return F.year(F.add_months(col, 6))


# The seven TEP time-of-day periods (``GTFSHelper.py:386-402``), keyed
# by the trip's *first departure* hour-minute packed as HHMM.
_TOD_BOUNDS = [
    (300, 559, "0300-0559"),
    (600, 859, "0600-0859"),
    (900, 1359, "0900-1359"),
    (1400, 1559, "1400-1559"),
    (1600, 1859, "1600-1859"),
    (1900, 2159, "1900-2159"),
]


def tod_period(hhmm_col: Column) -> Column:
    """Packed HHMM int → TEP period string. Everything outside the six
    daytime bands (22:00–02:59, wrapping midnight) is '2200-0259'."""
    expr = None
    for lo, hi, label in _TOD_BOUNDS:
        cond = (hhmm_col >= lo) & (hhmm_col <= hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise("2200-0259")


def dow_class(ts_col: Column) -> Column:
    """Timestamp/date → reference DOW class: 1=weekday, 2=Saturday,
    3=Sunday (``GTFSHelper.py:107-122``, ``ClipperHelper.py:176-179``)."""
    dow = F.dayofweek(ts_col)  # 1=Sunday .. 7=Saturday
    return (
        F.when(dow == 1, F.lit(3)).when(dow == 7, F.lit(2)).otherwise(F.lit(1))
    )


def month_spine(spark, start: str, end: str, alias: str = "MONTH"):
    """Generated monthly calendar dimension — the Spark-native
    replacement for the reference's recurring ``resample('M')`` idiom
    (``DemandHelper.py:1594-1598``). First-of-month dates, inclusive."""
    return spark.sql(
        f"""
        SELECT explode(sequence(
            date_trunc('month', to_date('{start}')),
            date_trunc('month', to_date('{end}')),
            interval 1 month)) AS {alias}
        """
    ).select(F.col(alias).cast("date").alias(alias))
