"""Prior-month imputation (J4/W12, SFMuniDataAggregator.py:371-464):
the window formulation must equal the sequential month chain."""

import datetime

from pyspark.sql import Row

from sfdata_wrangler_spark.operators.imputation import impute_from_prior_month


def _m(month):
    return datetime.date(2013, month, 1)


def test_impute_chains_through_gaps(spark):
    rows = [
        Row(cell="r1", MONTH=_m(1), OBS=5, VAL=100.0),
        Row(cell="r1", MONTH=_m(2), OBS=0, VAL=None),  # ← inherits Jan
        Row(cell="r1", MONTH=_m(3), OBS=0, VAL=None),  # ← still Jan (chain)
        Row(cell="r1", MONTH=_m(4), OBS=3, VAL=200.0),
        Row(cell="r1", MONTH=_m(5), OBS=0, VAL=None),  # ← inherits Apr
        Row(cell="r2", MONTH=_m(1), OBS=0, VAL=None),  # leading gap → null
    ]
    df = spark.createDataFrame(rows, "cell: string, MONTH: date, OBS: int, VAL: double")
    out = impute_from_prior_month(
        df, ["cell"], "MONTH", ["VAL"], observed_count_col="OBS",
        provenance_col="IMP",
    )
    got = {(r.cell, r.MONTH.month): (r.VAL, r.IMP) for r in out.collect()}
    assert got[("r1", 1)] == (100.0, 0)
    assert got[("r1", 2)] == (100.0, 5)
    assert got[("r1", 3)] == (100.0, 5)  # chained, not null
    assert got[("r1", 4)] == (200.0, 0)
    assert got[("r1", 5)] == (200.0, 3)
    assert got[("r2", 1)] == (None, 0)  # nothing to inherit
