"""Dataset-level demand ingest (catalog27 / pipelines/demand_fixture):
the committed reference-layout CSVs must match their generating
formulas byte-for-byte, and the annual→monthly conversion must
reproduce the reference's extrapolate/anchor/interpolate semantics
(DemandHelper.py:1559-1619) on a hand-checked series."""

import filecmp
import os

from pyspark.sql import functions as F


def test_committed_fixtures_match_formulas(tmp_path):
    from sfdata_wrangler_spark.pipelines.demand_fixture import (
        FIXTURE_DIR,
        write_fixtures,
    )

    regen = str(tmp_path / "demand")
    write_fixtures(regen)
    names = sorted(os.listdir(FIXTURE_DIR))
    assert names == sorted(os.listdir(regen))
    for n in names:
        assert filecmp.cmp(
            os.path.join(FIXTURE_DIR, n), os.path.join(regen, n), shallow=False
        ), f"committed fixture {n} drifted from its formula"


def test_convert_annual_to_monthly_hand_checked(spark):
    from sfdata_wrangler_spark.pipelines.demand import (
        convert_annual_to_monthly,
    )

    # one county, v(y) = 100, 130, 160: linear, so every month is on
    # the line through the July anchors, including the extrapolated
    # halves of the first and last years
    annual = spark.createDataFrame(
        [("A", 2010, 100.0), ("A", 2011, 130.0), ("A", 2012, 160.0)],
        "K string, YEAR int, V double",
    )
    out = convert_annual_to_monthly(annual, ["K"], ["V"])
    rows = {
        r["MONTH"].strftime("%Y-%m"): r["V"]
        for r in out.orderBy("MONTH").collect()
    }
    # trimmed span: Jan 2010 .. Dec 2012
    assert min(rows) == "2010-01" and max(rows) == "2012-12"
    assert len(rows) == 36
    # anchors hit exactly
    assert rows["2010-07"] == 100.0
    assert rows["2011-07"] == 130.0
    assert rows["2012-07"] == 160.0
    # interpolated midpoint and extrapolated edges on the line
    assert rows["2011-01"] == 100.0 + 30.0 * (6 / 12)
    assert rows["2010-01"] == 100.0 - 30.0 * (6 / 12)  # from 2009 anchor 70
    assert rows["2012-12"] == 160.0 + 30.0 * (5 / 12)


def test_pipe_demand_v2_panel_shape(spark):
    from sfdata_wrangler_spark.plans.catalog27 import pipe_demand_v2

    out = pipe_demand_v2(spark, "/root/testdata/sf0.001").cache()
    assert out.count() == 120  # 60 months x 2 counties
    # shares in (0, 1); population strictly increasing per county
    bad = out.where(
        (F.col("jtw_transit_share") <= 0) | (F.col("jtw_transit_share") >= 1)
    ).count()
    assert bad == 0
    pops = [
        r["pop"]
        for r in out.where(F.col("fips") == "06001")
        .orderBy("month")
        .collect()
    ]
    assert all(a < b for a, b in zip(pops, pops[1:]))


def test_single_year_key_constant_series(spark):
    # one observed year has no trend to extrapolate: the key gets a
    # CONSTANT monthly series, not 11 NULL months
    from sfdata_wrangler_spark.pipelines.demand import (
        convert_annual_to_monthly,
    )

    annual = spark.createDataFrame(
        [("A", 2010, 100.0)], "K string, YEAR int, V double"
    )
    rows = convert_annual_to_monthly(annual, ["K"], ["V"]).collect()
    assert len(rows) == 12
    assert {r["V"] for r in rows} == {100.0}
