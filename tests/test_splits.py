"""Deterministic split assignment: proportions, growth stability,
and the randomSplit contrast (id-function vs partition-layout)."""

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.splits import assign_split


def test_proportions_approximate(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    got = {
        r["split"]: r["count"]
        for r in assign_split(df).groupBy("split").count().collect()
    }
    n = 20000
    assert got["train"] / n == pytest.approx(0.8, abs=0.02)
    assert got["val"] / n == pytest.approx(0.1, abs=0.01)
    assert got["test"] / n == pytest.approx(0.1, abs=0.01)


def test_assignment_stable_under_corpus_growth(spark):
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(10000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in assign_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_assignment_stable_under_repartitioning(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in assign_split(df.repartition(1)).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(df.repartition(17)).collect()}
    assert a == b


def test_two_way_and_validation(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    got = {
        r["split"]
        for r in assign_split(
            df, names=("fit", "holdout"), fractions=(0.9, 0.1)
        ).select("split").distinct().collect()
    }
    assert got == {"fit", "holdout"}
    with pytest.raises(ValueError):
        assign_split(df, names=("a", "b"), fractions=(0.5, 0.4))


def test_split_independent_of_sampling_draw(spark):
    """Regression: temperature_sample keeps low-md5(id) rows; the
    split draw must be domain-separated (salted) or the survivors all
    land in the lowest-threshold split."""
    from sfdata_wrangler_spark.operators.sampling import temperature_sample

    df = spark.range(20000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("lang")
    )
    kept = temperature_sample(df, "lang", 30.0)  # keep rate ~0.37
    got = {
        r["split"]: r["count"]
        for r in assign_split(kept).groupBy("split").count().collect()
    }
    n = sum(got.values())
    assert got.get("val", 0) / n == pytest.approx(0.1, abs=0.03)
    assert got.get("test", 0) / n == pytest.approx(0.1, abs=0.03)
