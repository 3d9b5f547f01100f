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


def test_window_impute_equals_sequential_loop(spark):
    """The one-pass window formulation must equal the reference's
    sequential month-by-month chain on an arbitrary pattern."""
    import random

    rng = random.Random(42)
    months = [datetime.date(2013, m, 1) for m in range(1, 13)]
    rows, naive = [], {}
    for cell in ("a", "b", "c"):
        carry = None
        carry_obs = 0
        for mo in months:
            obs = rng.randint(0, 3)
            val = round(rng.uniform(10, 99), 2) if obs else None
            rows.append(Row(cell=cell, MONTH=mo, OBS=obs, VAL=val))
            if obs:
                carry, carry_obs = val, obs
                naive[(cell, mo)] = (val, 0)
            else:
                naive[(cell, mo)] = (carry, carry_obs if carry is not None else 0)
    df = spark.createDataFrame(
        rows, "cell: string, MONTH: date, OBS: int, VAL: double"
    )
    out = impute_from_prior_month(
        df, ["cell"], "MONTH", ["VAL"], observed_count_col="OBS",
        provenance_col="IMP",
    )
    got = {(r.cell, r.MONTH): (r.VAL, r.IMP) for r in out.collect()}
    assert got == naive
