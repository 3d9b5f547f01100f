"""Catalog wave 27 (round 4): dataset-level demand ingest.

``pipe_demand`` (catalog8) proved the OPERATOR composition on
synthetic tables; ``pipe_demand_v2`` upgrades to DATASET fidelity: a
committed fixture set in the reference's real file layouts
(``tests/fixtures/demand/``, see pipelines/demand_fixture.py) is
parsed by actual ingest code — wide census-estimate years, the
post-2010 verbose headers behind a title row, LODES h_geocode/C000,
the block→county crosswalk, QCEW quarterly month{1,2,3}_emplvl, BLS
CPI wide months — and driven through extrapolate→July-anchor→
interpolate (DemandHelper.py:1559-1619), CPI deflation (F11), LODES
crosswalk rollup (J5), and QCEW scaling (J8) to the county-month
panel. The oracle restates the whole composition from the fixture's
closed-form value formulas (integers, so file parsing and formula
agree exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.demand import (
    convert_annual_to_monthly,
    cpi_deflate,
    scaling_factor_join,
)
from ..pipelines.demand_fixture import FIXTURE_DIR
from .catalog import _register

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# interpolation restatement (w11's proven SQL pattern) for one column
_INTERP_COLS = ["pop", "hh", "hhinc", "jtw_da", "jtw_tr", "jtw_wk"]


def _interp_brackets_sql() -> str:
    parts = []
    for c in _INTERP_COLS:
        parts.append(
            f"last_value({c} IGNORE NULLS) OVER wb AS {c}_pv,\n"
            f"last_value(CASE WHEN {c} IS NOT NULL THEN midx END "
            f"IGNORE NULLS) OVER wb AS {c}_pi,\n"
            f"first_value({c} IGNORE NULLS) OVER wf AS {c}_nv,\n"
            f"first_value(CASE WHEN {c} IS NOT NULL THEN midx END "
            f"IGNORE NULLS) OVER wf AS {c}_ni"
        )
    return ",\n".join(parts)


def _interp_value_sql() -> str:
    parts = []
    for c in _INTERP_COLS:
        parts.append(
            f"CASE WHEN {c} IS NOT NULL THEN {c} "
            f"WHEN {c}_pi IS NOT NULL AND {c}_ni IS NOT NULL "
            f"THEN {c}_pv + ({c}_nv - {c}_pv) "
            f"* ((midx - {c}_pi) / ({c}_ni - {c}_pi)) END AS {c}"
        )
    return ",\n".join(parts)


_DEMAND_V2_ORACLE = f"""
WITH counties(fips, c) AS (VALUES ('06001', 0), ('06075', 1)),
-- extrapolated anchor years 2007/2013 equal the (linear) formulas
-- evaluated there, because v1 - (v2 - v1) is exact on integers
years AS (SELECT unnest(range(2007, 2014)) AS y),
ann AS (
  SELECT fips, c, y,
         CAST(900000 + 600000*c + (y-2008)*(8000 + 2000*c) AS DOUBLE) AS pop,
         CAST(330000 + 150000*c + (y-2008)*2500 AS DOUBLE) AS hh,
         CAST(60000 + 15000*c + (y-2008)*1200 AS DOUBLE) AS hhinc,
         CAST(6000 - 200*(y-2008) - 1000*c AS DOUBLE) AS jtw_da,
         CAST(2500 + 100*(y-2008) + 800*c AS DOUBLE) AS jtw_tr,
         CAST(1500 + 100*(y-2008) + 200*c AS DOUBLE) AS jtw_wk
  FROM counties CROSS JOIN years
),
mi AS (
  SELECT unnest(generate_series(DATE '2007-07-01', DATE '2013-07-01',
                                INTERVAL 1 MONTH)) AS month
),
sp AS (
  SELECT fips, c, month, year(month)*12 + month(month) AS midx
  FROM counties CROSS JOIN mi
),
anch AS (
  SELECT fips, y*12 + 7 AS midx, pop, hh, hhinc, jtw_da, jtw_tr, jtw_wk
  FROM ann
),
j AS (
  SELECT sp.fips, sp.c, sp.month, sp.midx,
         a.pop, a.hh, a.hhinc, a.jtw_da, a.jtw_tr, a.jtw_wk
  FROM sp LEFT JOIN anch a ON sp.fips = a.fips AND sp.midx = a.midx
),
b AS (
  SELECT *,
{_interp_brackets_sql()}
  FROM j
  WINDOW wb AS (PARTITION BY fips ORDER BY midx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY fips ORDER BY midx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
interp AS (
  SELECT fips, c, month, midx,
{_interp_value_sql()}
  FROM b
),
blocks AS (SELECT unnest(range(0, 20)) AS bk),
ryears AS (SELECT unnest(range(2008, 2013)) AS y),
lodes AS (
  SELECT fips, c, y,
         CAST(sum(50 + 3*bk + 7*(y-2008) + 11*c) AS DOUBLE) AS jobs
  FROM counties CROSS JOIN ryears CROSS JOIN blocks
  GROUP BY fips, c, y
),
qcew AS (
  SELECT fips, c, y, m,
         CAST(500000 + 200000*c + (y-2008)*3000 + (m-1)*100 AS DOUBLE) AS emp
  FROM counties CROSS JOIN ryears
  CROSS JOIN (SELECT unnest(range(1, 13)) AS m)
),
annavg AS (SELECT fips, y, avg(emp) AS avg_emp FROM qcew GROUP BY fips, y)
SELECT i.fips,
       strftime(i.month, '%Y-%m-%d') AS month,
       i.pop, i.hh,
       i.hhinc * (220.5 / CAST(205 + (year(i.month)-2007)*4
                               + month(i.month) AS DOUBLE))
         AS median_hhinc_2010usd,
       i.jtw_tr / ((i.jtw_da + i.jtw_tr) + i.jtw_wk) AS jtw_transit_share,
       q.emp * (l.jobs / a.avg_emp) AS totemp
FROM interp i
JOIN qcew q ON q.fips = i.fips AND q.y = year(i.month)
           AND q.m = month(i.month)
JOIN lodes l ON l.fips = i.fips AND l.y = year(i.month)
JOIN annavg a ON a.fips = i.fips AND a.y = year(i.month)
WHERE i.month BETWEEN DATE '2008-01-01' AND DATE '2012-12-01'
"""


@_register("pipe_demand_v2", _DEMAND_V2_ORACLE)
def pipe_demand_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end demand ingest from committed reference-layout files
    (DemandHelper.py:518-700, 1001-1330, 1528-1619): census estimate
    wide years (pre/post 2010 layouts) → July-anchored interpolation;
    ACS county-year table → interpolation + CPI deflation + mode
    shares; LODES blocks → crosswalk rollup (J5); QCEW quarterly
    month columns → monthly, scaled to LODES truth (J8). Every file
    is parsed by real ingest code; the values are closed-form so the
    oracle restates the composition without file access."""
    fx = FIXTURE_DIR

    # --- population: two census layouts → county-year annual table
    pre = spark.read.csv(
        os.path.join(fx, "pop_pre2010.csv"), header=True, inferSchema=True
    )
    pre_long = pre.select(
        F.concat(
            F.lpad(F.col("STATE").cast("string"), 2, "0"),
            F.lpad(F.col("COUNTY").cast("string"), 3, "0"),
        ).alias("FIPS"),
        F.expr(
            "stack(2, 2008, POPESTIMATE2008, 2009, POPESTIMATE2009)"
            " AS (YEAR, POP)"
        ),
    )
    # post-2010 file hides its header behind a title row and uses
    # verbose per-year column names — a dimension-sized file, parsed
    # driver-side exactly like the reference's read_csv(skiprows=1)
    import csv as _csv

    with open(os.path.join(fx, "pop_post2010.csv")) as fh:
        rows = list(_csv.reader(fh))[1:]  # drop the title row
    hdr = rows[0]
    year_cols = {
        int(h.rsplit(" - ", 1)[1]): i
        for i, h in enumerate(hdr)
        if h.startswith("Population Estimate")
    }
    post_rows = [
        (f"{int(r[1]):05d}", y, int(r[i]))
        for r in rows[1:]
        for y, i in sorted(year_cols.items())
    ]
    post_long = spark.createDataFrame(post_rows, "FIPS string, YEAR int, POP int")
    pop_annual = pre_long.unionByName(post_long)

    # --- ACS county-year table
    acs = spark.read.csv(
        os.path.join(fx, "acs.csv"), header=True, inferSchema=True
    ).withColumn("FIPS", F.lpad(F.col("FIPS").cast("string"), 5, "0"))

    annual = pop_annual.join(acs, ["FIPS", "YEAR"])

    # --- annual → monthly: extrapolate, July-anchor, interpolate
    monthly = convert_annual_to_monthly(
        annual,
        ["FIPS"],
        ["POP", "HH", "MEDIAN_HHINC", "JTW_DA", "JTW_TRANSIT", "JTW_WALK"],
    )

    # --- CPI: BLS wide layout → monthly factors to 2010 dollars
    cpi = spark.read.csv(
        os.path.join(fx, "cpi.csv"), header=True, inferSchema=True
    )
    stack_args = ", ".join(
        f"{i + 1}, {m}" for i, m in enumerate(_MONTHS)
    )
    cpi_long = cpi.select(
        "Year", F.expr(f"stack(12, {stack_args}) AS (M, CPI)")
    ).withColumn(
        "MONTH",
        F.to_date(
            F.concat_ws("-", F.col("Year"), F.lpad(F.col("M").cast("string"), 2, "0"), F.lit("01"))
        ),
    )
    base = cpi.where(F.col("Year") == 2010).select("HALF1").collect()[0][0]
    monthly = monthly.join(
        F.broadcast(cpi_long.select("MONTH", "CPI")), "MONTH"
    )
    monthly = cpi_deflate(monthly, ["MEDIAN_HHINC"], base_cpi=float(base))
    share_total = (
        F.col("JTW_DA") + F.col("JTW_TRANSIT")
    ) + F.col("JTW_WALK")
    monthly = monthly.withColumn(
        "JTW_TRANSIT_SHARE", F.col("JTW_TRANSIT") / share_total
    )

    # --- LODES blocks → county-year truth via the crosswalk (J5)
    lodes = spark.read.csv(
        os.path.join(fx, "lodes_rac.csv"), header=True, inferSchema=True
    ).withColumn("h_geocode", F.col("h_geocode").cast("string"))
    xwalk = spark.read.csv(
        os.path.join(fx, "crosswalk.csv"), header=True, inferSchema=True
    ).select(
        F.col("tabblk2010").cast("string").alias("tabblk2010"),
        F.lpad(F.col("cty").cast("string"), 5, "0").alias("FIPS"),
    )
    # J5 shape with a (county, year) grain: broadcast the crosswalk,
    # sum block jobs per county-year (crosswalk_rollup is the
    # single-group-column variant of the same join)
    jobs = (
        lodes.join(F.broadcast(xwalk), lodes.h_geocode == xwalk.tabblk2010)
        .groupBy("FIPS", "YEAR")
        .agg(F.sum(F.col("C000").cast("double")).alias("JOBS"))
    )

    # --- QCEW quarterly month columns → county-month employment (W13)
    qcew = spark.read.csv(
        os.path.join(fx, "qcew.csv"), header=True, inferSchema=True
    )
    qcew_m = qcew.select(
        F.lpad(F.col("area_fips").cast("string"), 5, "0").alias("FIPS"),
        F.col("year").alias("YEAR"),
        "qtr",
        F.expr(
            "stack(3, 1, month1_emplvl, 2, month2_emplvl, 3, month3_emplvl)"
            " AS (mi, EMP)"
        ),
    ).select(
        "FIPS",
        "YEAR",
        ((F.col("qtr") - 1) * 3 + F.col("mi")).alias("M"),
        F.col("EMP").cast("double").alias("EMP"),
    )
    ann_avg = qcew_m.groupBy("FIPS", "YEAR").agg(
        F.avg("EMP").alias("ANN_AVG_EMP")
    )
    qcew_scaled = scaling_factor_join(
        qcew_m.join(F.broadcast(ann_avg), ["FIPS", "YEAR"]),
        jobs,
        ["FIPS", "YEAR"],
        "ANN_AVG_EMP",
        "JOBS",
        ["EMP"],
    )

    # --- panel assembly
    panel = monthly.withColumn("YEAR", F.year("MONTH")).withColumn(
        "M", F.month("MONTH")
    ).join(
        qcew_scaled.select("FIPS", "YEAR", "M", F.col("EMP").alias("TOTEMP")),
        ["FIPS", "YEAR", "M"],
    )
    return panel.where(
        (F.col("MONTH") >= F.lit("2008-01-01").cast("date"))
        & (F.col("MONTH") <= F.lit("2012-12-01").cast("date"))
    ).select(
        F.col("FIPS").alias("fips"),
        F.date_format("MONTH", "yyyy-MM-dd").alias("month"),
        F.col("POP").cast("double").alias("pop"),
        F.col("HH").cast("double").alias("hh"),
        F.col("MEDIAN_HHINC_2010USD").alias("median_hhinc_2010usd"),
        F.col("JTW_TRANSIT_SHARE").alias("jtw_transit_share"),
        F.col("TOTEMP").alias("totemp"),
    )
