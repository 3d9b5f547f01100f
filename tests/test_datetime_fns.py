"""Unit tests for the service-day / calendar column functions (F5/F6/
F14/F15 — the reference's core domain semantics)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.datetime_fns import (
    dow_class,
    fiscal_year,
    gtfs_time_to_timestamp,
    month_spine,
    service_date_rollover,
    tod_period,
    wraparound_timestamp,
)


def test_wraparound_hhmmss(spark):
    """HHMMSS ints >= 240000 roll to the next calendar day
    (SFMuniDataHelper.py:622-649 semantics)."""
    df = spark.createDataFrame(
        [
            Row(date=datetime.date(2013, 3, 1), t=143015),
            Row(date=datetime.date(2013, 3, 1), t=253000),
            Row(date=datetime.date(2013, 3, 1), t=240000),
        ]
    )
    out = df.select(
        wraparound_timestamp(F.col("date"), F.col("t")).alias("ts")
    ).collect()
    assert out[0].ts == datetime.datetime(2013, 3, 1, 14, 30, 15)
    assert out[1].ts == datetime.datetime(2013, 3, 2, 1, 30, 0)
    assert out[2].ts == datetime.datetime(2013, 3, 2, 0, 0, 0)


def test_gtfs_time_over_24h(spark):
    """GTFS '25:10:00'-style strings land on date+1 (GTFSHelper.py:65-84)."""
    df = spark.createDataFrame([Row(date=datetime.date(2013, 3, 1), t="25:10:00")])
    out = df.select(
        gtfs_time_to_timestamp(F.col("date"), F.col("t")).alias("ts")
    ).collect()
    assert out[0].ts == datetime.datetime(2013, 3, 2, 1, 10, 0)


def test_service_date_rollover(spark):
    """Times in [00:00, 03:00) belong to the previous service day
    (ClipperHelper.py:31-42)."""
    df = spark.createDataFrame(
        [
            Row(ts=datetime.datetime(2013, 3, 2, 2, 59, 0)),
            Row(ts=datetime.datetime(2013, 3, 2, 3, 0, 0)),
        ]
    )
    out = df.select(service_date_rollover(F.col("ts")).alias("d")).collect()
    assert out[0].d == datetime.date(2013, 3, 1)
    assert out[1].d == datetime.date(2013, 3, 2)


def test_tod_periods(spark):
    """TEP period boundaries (GTFSHelper.py:386-402)."""
    cases = {
        300: "0300-0559",
        559: "0300-0559",
        600: "0600-0859",
        1359: "0900-1359",
        1400: "1400-1559",
        1600: "1600-1859",
        1900: "1900-2159",
        2200: "2200-0259",
        259: "2200-0259",
        0: "2200-0259",
    }
    df = spark.createDataFrame([Row(hhmm=k) for k in cases])
    out = {
        r.hhmm: r.tod
        for r in df.select("hhmm", tod_period(F.col("hhmm")).alias("tod")).collect()
    }
    assert out == cases


def test_dow_class(spark):
    """1=weekday, 2=Saturday, 3=Sunday (GTFSHelper.py:107-122)."""
    df = spark.createDataFrame(
        [
            Row(d=datetime.date(2024, 1, 1)),  # Monday
            Row(d=datetime.date(2024, 1, 6)),  # Saturday
            Row(d=datetime.date(2024, 1, 7)),  # Sunday
        ]
    )
    out = [r.c for r in df.select(dow_class(F.col("d")).alias("c")).collect()]
    assert out == [1, 2, 3]


def test_fiscal_year(spark):
    """July-start FY (MultiModalHelper.py:31-38)."""
    df = spark.createDataFrame(
        [Row(d=datetime.date(2013, 6, 30)), Row(d=datetime.date(2013, 7, 1))]
    )
    out = [r.fy for r in df.select(fiscal_year(F.col("d")).alias("fy")).collect()]
    assert out == [2013, 2014]


def test_month_spine(spark):
    """Generated month dimension replaces resample('M')."""
    spine = month_spine(spark, "2013-01-15", "2013-04-02")
    months = sorted(r.MONTH for r in spine.collect())
    assert months == [
        datetime.date(2013, 1, 1),
        datetime.date(2013, 2, 1),
        datetime.date(2013, 3, 1),
        datetime.date(2013, 4, 1),
    ]
