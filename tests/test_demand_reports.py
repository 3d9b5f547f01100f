"""Interval lookup (J2), demand-series transforms, report views."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.datetime_fns import month_spine
from sfdata_wrangler_spark.operators.interval_lookup import (
    interval_lookup,
    missing_keys,
)
from sfdata_wrangler_spark.pipelines.demand import (
    annual_to_monthly_step,
    cpi_deflate,
    crosswalk_rollup,
    scaling_factor_join,
)
from sfdata_wrangler_spark.pipelines.reports import performance_panel, route_profile


def _d(y, m, d):
    return datetime.date(y, m, d)


def test_interval_lookup_and_missing(spark):
    """Route 5 renamed mid-period; route 9 absent from the equiv."""
    fact = spark.createDataFrame(
        [
            Row(ROUTE_AVL=5, DATE=_d(2013, 2, 1), ON=10),
            Row(ROUTE_AVL=5, DATE=_d(2013, 8, 1), ON=20),
            Row(ROUTE_AVL=9, DATE=_d(2013, 2, 1), ON=5),
        ]
    )
    equiv = spark.createDataFrame(
        [
            Row(ROUTE_AVL=5, START_DATE=_d(2013, 1, 1), END_DATE=_d(2013, 6, 30),
                ROUTE_SHORT_NAME="5"),
            Row(ROUTE_AVL=5, START_DATE=_d(2013, 6, 30), END_DATE=_d(2014, 1, 1),
                ROUTE_SHORT_NAME="5R"),
        ]
    )
    out = interval_lookup(fact, equiv, "ROUTE_AVL", "DATE")
    got = {(r.ROUTE_AVL, r.DATE.month): r.ROUTE_SHORT_NAME for r in out.collect()}
    assert got[(5, 2)] == "5"
    assert got[(5, 8)] == "5R"  # post-rename interval
    assert got[(9, 2)] is None  # left join keeps the row

    miss = missing_keys(fact, equiv, "ROUTE_AVL", "DATE").collect()
    assert len(miss) == 1 and miss[0].ROUTE_AVL == 9 and miss[0].n_rows == 1


def test_cpi_deflate(spark):
    df = spark.createDataFrame(
        [Row(MONTH=_d(2010, 1, 1), CPI=100.0, FARE=2.0),
         Row(MONTH=_d(2020, 1, 1), CPI=125.0, FARE=2.5)]
    )
    out = {r.MONTH.year: r.FARE_2010USD
           for r in cpi_deflate(df, ["FARE"], base_cpi=100.0).collect()}
    assert out[2010] == 2.0
    assert out[2020] == 2.0  # 2.5 * 100/125


def test_annual_to_monthly_step(spark):
    annual = spark.createDataFrame(
        [Row(FIPS="075", YEAR=2013, POP=800.0),
         Row(FIPS="075", YEAR=2015, POP=850.0)]  # 2014 missing → ffill
    )
    spine = month_spine(spark, "2013-01-01", "2015-12-01").crossJoin(
        spark.createDataFrame([Row(FIPS="075")])
    )
    out = annual_to_monthly_step(annual, spine, ["FIPS"])
    got = {(r.MONTH.year, r.MONTH.month): r.POP for r in out.collect()}
    assert got[(2013, 1)] == 800.0
    assert got[(2014, 6)] == 800.0  # stepped forward through the gap
    assert got[(2015, 3)] == 850.0
    assert len(got) == 36


def test_scaling_factor_join(spark):
    monthly = spark.createDataFrame(
        [Row(FIPS="075", MONTH=_d(2013, 1, 1), EMP=90.0, NAICS_11=9.0)]
    )
    truth = spark.createDataFrame([Row(FIPS="075", MONTH=_d(2013, 1, 1), QCEW_EMP=100.0)])
    out = scaling_factor_join(
        monthly, truth, ["FIPS", "MONTH"], "EMP", "QCEW_EMP", ["EMP", "NAICS_11"]
    ).collect()[0]
    assert out.EMP == 100.0 and out.NAICS_11 == 10.0


def test_crosswalk_rollup(spark):
    blocks = spark.createDataFrame(
        [Row(h_geocode="b1", RAC=5.0), Row(h_geocode="b2", RAC=7.0),
         Row(h_geocode="b3", RAC=1.0)]
    )
    xwalk = spark.createDataFrame(
        [Row(tabblk2010="b1", COUNTY_FIPS="075"),
         Row(tabblk2010="b2", COUNTY_FIPS="075"),
         Row(tabblk2010="b3", COUNTY_FIPS="081")]
    )
    out = {r.COUNTY_FIPS: r.RAC
           for r in crosswalk_rollup(blocks, xwalk, "h_geocode").collect()}
    assert out == {"075": 12.0, "081": 1.0}


def test_report_views(spark):
    rs = spark.createDataFrame(
        [
            Row(MONTH="2013-03-01", DOW=1, ROUTE_SHORT_NAME="1", DIR=0,
                SEQ=s, ON=float(on), OFF=float(off))
            for s, on, off in [(1, 10, 0), (2, 5, 3), (3, 0, 12)]
        ]
    )
    prof = route_profile(rs, "1", 0).orderBy("SEQ").collect()
    assert [r.LOAD_DEP_RECOMPUTED for r in prof] == [10.0, 12.0, 0.0]

    system = spark.createDataFrame(
        [
            Row(MONTH=f"2013-{m:02d}-01", DOW=1, ON=1000.0 + m, TRIPS=50.0,
                SERVMILES=500.0, RUNTIME=3000.0)
            for m in range(1, 13)
        ] + [Row(MONTH="2014-01-01", DOW=1, ON=1100.0, TRIPS=50.0,
                 SERVMILES=500.0, RUNTIME=3000.0)]
    )
    panel = performance_panel(system)
    row = {r.MONTH: r for r in panel.collect()}
    assert abs(row["2013-01-01"].PASS_PER_MILE - 1001.0 / 500.0) < 1e-9
    assert row["2014-01-01"].ON_DIFF12 == 1100.0 - 1001.0
    assert row["2013-06-01"].ON_DIFF12 is None
