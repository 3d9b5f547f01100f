"""Parquet-lake idempotency (S8) + master-route folding."""

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.pipelines.cascade import fold_master_routes
from sfdata_wrangler_spark.sources.lake import with_year_month, write_partitioned


def test_dynamic_partition_overwrite_idempotent(spark, tmp_path):
    """Re-running a month's load replaces that month only (the
    reference's append+dedup dance, made idempotent)."""
    path = os.path.join(tmp_path, "lake")
    jan = spark.createDataFrame(
        [Row(DATE=datetime.date(2013, 1, 15), v=1.0),
         Row(DATE=datetime.date(2013, 1, 16), v=2.0)]
    )
    feb = spark.createDataFrame([Row(DATE=datetime.date(2013, 2, 10), v=3.0)])
    write_partitioned(with_year_month(jan, "DATE"), path)
    write_partitioned(with_year_month(feb, "DATE"), path)
    assert spark.read.parquet(path).count() == 3
    # re-run January with corrected data: February must survive
    jan_fixed = spark.createDataFrame(
        [Row(DATE=datetime.date(2013, 1, 15), v=9.0)]
    )
    write_partitioned(with_year_month(jan_fixed, "DATE"), path)
    out = spark.read.parquet(path)
    assert out.count() == 2
    assert out.agg(F.sum("v")).collect()[0][0] == 12.0


def test_fold_master_routes(spark):
    """Route '5' renamed to '5R': both series fold into MASTER '5'."""
    route_level = spark.createDataFrame(
        [
            Row(MONTH="2013-01-01", DOW=1, AGENCY_ID="SFMTA",
                ROUTE_SHORT_NAME="5", TRIPS=10.0, TRIP_STOPS=100.0,
                ON=500.0, OFF=500.0, SERVMILES=50.0, RUNTIME=300.0),
            Row(MONTH="2013-01-01", DOW=1, AGENCY_ID="SFMTA",
                ROUTE_SHORT_NAME="5R", TRIPS=2.0, TRIP_STOPS=20.0,
                ON=100.0, OFF=100.0, SERVMILES=10.0, RUNTIME=60.0),
            Row(MONTH="2013-01-01", DOW=1, AGENCY_ID="SFMTA",
                ROUTE_SHORT_NAME="7", TRIPS=5.0, TRIP_STOPS=50.0,
                ON=250.0, OFF=250.0, SERVMILES=25.0, RUNTIME=150.0),
        ]
    )
    equiv = spark.createDataFrame(
        [Row(ROUTE_SHORT_NAME="5", MASTER_ROUTE_NAME="5"),
         Row(ROUTE_SHORT_NAME="5R", MASTER_ROUTE_NAME="5")]
    )
    out = {r.MASTER_ROUTE_NAME: r for r in
           fold_master_routes(route_level, equiv).collect()}
    assert out["5"].ON == 600.0  # both eras folded
    assert out["7"].ON == 250.0  # unmapped routes pass through


def test_compact_partitions_reduces_files_preserves_data(spark, tmp_path):
    from sfdata_wrangler_spark.sources.lake import (
        compact_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "frag")
    df = spark.range(4000).select(
        (F.col("id") % 2 + 2024).cast("int").alias("YEAR"),
        (F.col("id") % 4 + 1).cast("int").alias("MONTH"),
        F.col("id").alias("v"),
    )
    # fragment: 10 incremental micro-batch appends -> many small files
    for i in range(10):
        df.where(F.col("v") % 10 == i).repartition(6).write.mode(
            "append"
        ).partitionBy("YEAR", "MONTH").parquet(path)

    before_total = spark.read.parquet(path).agg(F.sum("v")).collect()[0][0]
    stats = compact_partitions(path, spark, ("YEAR", "MONTH"))
    assert stats["files_after"] < stats["files_before"] / 4
    after = spark.read.parquet(path)
    assert after.agg(F.sum("v")).collect()[0][0] == before_total
    assert after.count() == 4000
    # partition layout intact (pruning still works)
    assert after.where(
        (F.col("YEAR") == 2024) & (F.col("MONTH") == 1)
    ).count() == spark.read.parquet(path).where(
        (F.col("YEAR") == 2024) & (F.col("MONTH") == 1)
    ).count()


def test_scratch_sweep_spares_live_owner(spark, monkeypatch):
    """ADVICE r9 #1: the 6h stale sweep must not rmtree a LIVE
    sibling session's scratch — liveness is the recorded owner PID,
    not directory age alone. A dead-PID dir of the same age is
    still swept."""
    import shutil
    import subprocess
    import time

    from sfdata_wrangler_spark.sources import lake

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(lake.__file__)))
    )
    scratch = os.path.join(repo_root, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    live = os.path.join(scratch, "pytest-fake-live-app")
    dead = os.path.join(scratch, "pytest-fake-dead-app")
    reaped = subprocess.Popen(["true"])
    reaped.wait()
    old = time.time() - 7 * 3600
    try:
        for p, pid in ((live, os.getpid()), (dead, reaped.pid)):
            os.makedirs(p, exist_ok=True)
            with open(os.path.join(p, ".owner_pid"), "w") as fh:
                fh.write(str(pid))
            os.utime(p, (old, old))
        # force re-registration so the sweep runs for this app dir
        monkeypatch.setattr(lake, "_SCRATCH_CLEANUP_REGISTERED", set())
        lake.session_scratch(spark, "probe")
        assert os.path.isdir(live), "live sibling swept despite alive PID"
        assert not os.path.exists(dead), "dead sibling survived the sweep"
        # the caller's own app dir records its PID for future sweeps
        app_dir = os.path.join(
            scratch, spark.sparkContext.applicationId
        )
        with open(os.path.join(app_dir, ".owner_pid")) as fh:
            assert int(fh.read()) == os.getpid()
    finally:
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(dead, ignore_errors=True)
