"""cut_lineage knob (round-7 verdict ask #4): local vs reliable
checkpoint must be result-identical; reliable mode sets a checkpoint
dir when none exists; both stay lazy (no job at plan time)."""

import os

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.checkpointing import cut_lineage


def test_modes_are_result_identical(spark):
    df = (
        spark.range(1000)
        .withColumn("g", (F.col("id") % 7).cast("int"))
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
    )
    a = sorted(map(tuple, cut_lineage(df, reliable=False).collect()))
    b = sorted(map(tuple, cut_lineage(df, reliable=True).collect()))
    assert a == b and len(a) == 7


def test_env_knob_routes_to_reliable(spark, monkeypatch):
    monkeypatch.setenv("SFDW_RELIABLE_CHECKPOINT", "1")
    out = cut_lineage(spark.range(10))
    assert out.count() == 10
    # reliable mode must have installed a checkpoint dir
    assert not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()


def test_lazy_no_job_at_plan_time(spark):
    # a lazy cut of a would-fail plan must not raise until an action
    df = spark.range(10).select(
        (F.lit(1) / F.col("id")).alias("x")  # fine; laziness smoke
    )
    cut = cut_lineage(df, reliable=False)
    _ = cut.schema  # plan-only access
