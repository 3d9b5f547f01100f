"""Runtime QC checks + monthly-incremental cascade invariant."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.quality import (
    Check,
    assert_checks,
    avl_checks,
    run_checks,
)
from sfdata_wrangler_spark.pipelines.cascade import run_cascade
from tests.test_pipelines import _avl_fixture, _gtfs_fixture
from sfdata_wrangler_spark.pipelines.expansion import expand_and_weight


def test_run_checks_single_pass(spark):
    df = spark.createDataFrame(
        [
            Row(DIR=0, QC201=0, ROUTE_AVL=1, SERVMILES=1.0, LOAD_ARR=5,
                LOAD_DEP=5, ON=2, OFF=2),
            Row(DIR=6, QC201=99, ROUTE_AVL=1, SERVMILES=1.0, LOAD_ARR=0,
                LOAD_DEP=5, ON=2, OFF=2),  # violates dir, qc, identity
        ]
    )
    got = {r.check: r.n_violations for r in run_checks(df, avl_checks()).collect()}
    assert got["revenue_service_dir"] == 1
    assert got["qc_count_bound"] == 1
    assert got["load_identity"] == 1
    assert got["route_positive"] == 0


def test_run_checks_is_lazy(spark):
    """run_checks must not trigger a job at construction time: a
    predicate over a column that raises on evaluation constructs fine,
    and only fails when the caller actually executes the summary."""
    df = spark.range(3).withColumn(
        "boom", F.expr("CASE WHEN id >= 0 THEN raise_error('evaluated') END")
    )
    summary = run_checks(df, [Check("no_nulls", F.col("boom").isNull())])
    summary.explain()  # plan construction + explain: still no job
    with pytest.raises(Exception, match="evaluated"):
        summary.collect()


def test_assert_checks_raises(spark):
    df = spark.createDataFrame([Row(x=-1.0)])
    with pytest.raises(AssertionError, match="nonneg"):
        assert_checks(df, [Check("nonneg", F.col("x") >= 0)])
    assert_checks(df, [Check("nonneg_warn", F.col("x") >= 0, severity="warn")])


def test_monthly_increments_equal_full_run(spark):
    """Cascade levels keyed by month are independently computable:
    processing months as separate increments must equal one full run
    (the partition-parallel design claim, ARCHITECTURE.md)."""
    # two months of the expansion fixture, shifted
    g1, a1 = _gtfs_fixture(spark), _avl_fixture(spark)
    g2 = g1.withColumn("DATE", F.add_months("DATE", 1))
    a2 = a1.withColumn("DATE", F.add_months("DATE", 1)).withColumn(
        "ARRIVAL_TIME", F.col("ARRIVAL_TIME") + F.expr("INTERVAL 31 DAYS")
    ).withColumn(
        "DEPARTURE_TIME", F.col("DEPARTURE_TIME") + F.expr("INTERVAL 31 DAYS")
    )
    full = run_cascade(
        expand_and_weight(g1.unionByName(g2), a1.unionByName(a2))
    )["system_day"]
    inc1 = run_cascade(expand_and_weight(g1, a1))["system_day"]
    inc2 = run_cascade(expand_and_weight(g2, a2))["system_day"]
    incremental = inc1.unionByName(inc2)

    key = ["MONTH", "DOW", "AGENCY_ID"]
    f = {tuple(str(r[k]) for k in key): (r.ON, r.TRIPS) for r in full.collect()}
    i = {
        tuple(str(r[k]) for k in key): (r.ON, r.TRIPS)
        for r in incremental.collect()
    }
    assert f == i and len(f) == 2
