"""HyperLogLog sketch and Bloom-join pruning."""

import pyspark.sql.functions as F
import pytest

from sfdata_wrangler_spark.operators.bloomjoin import (
    bloom_build,
    bloom_fp_rate,
    bloom_prune,
)
from sfdata_wrangler_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


@pytest.fixture(scope="module")
def values(spark):
    # 5000 distinct ids, each appearing 1-3 times, across 2 groups
    return spark.range(0, 5000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.col("id").alias("v"),
    ).unionAll(
        spark.range(0, 2500).select(
            (F.col("id") % 2).cast("string").alias("grp"),
            F.col("id").alias("v"),
        )
    )


def test_hll_estimate_within_expected_error(spark, values):
    reg = hll_sketch(values, ["grp"], "v")
    est = {
        r["grp"]: r["hll_est"]
        for r in hll_estimate(reg, ["grp"]).collect()
    }
    # true distinct per group = 2500; 256 registers -> ~6.5% std err
    for grp in ("0", "1"):
        assert est[grp] == pytest.approx(2500, rel=0.2)


def test_hll_duplicates_do_not_move_the_sketch(spark, values):
    reg_all = hll_sketch(values, ["grp"], "v")
    reg_distinct = hll_sketch(values.distinct(), ["grp"], "v")
    assert sorted(map(tuple, reg_all.collect())) == sorted(
        map(tuple, reg_distinct.collect())
    )


def test_hll_merge_equals_whole(spark, values):
    lo = values.where(F.col("v") < 1000)
    hi = values.where(F.col("v") >= 1000)
    merged = hll_merge(
        hll_sketch(lo, ["grp"], "v"),
        hll_sketch(hi, ["grp"], "v"),
        ["grp"],
    )
    whole = hll_sketch(values, ["grp"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_register_table_is_bounded(spark, values):
    reg = hll_sketch(values, ["grp"], "v", p_hex=2)
    assert reg.count() <= 2 * 256


def test_bloom_no_false_negatives(spark):
    dim = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    words = bloom_build(dim, "k")
    fact = spark.range(0, 3000).select(F.col("id").alias("k"))
    kept = set(r["k"] for r in bloom_prune(fact, "k", words).collect())
    true_keys = set(range(0, 2100, 7))
    assert true_keys <= kept  # every real match survives


def test_bloom_prunes_most_non_members(spark):
    dim = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    words = bloom_build(dim, "k")
    fact = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    # no overlap with dim at all -> survivors are pure false positives
    survivors = bloom_prune(fact, "k", words).count()
    assert survivors / 10_000 < 10 * bloom_fp_rate(300) + 0.01


def test_bloom_prune_is_map_only(spark):
    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k")
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = bloom_prune(fact, "k", words)._jdf.queryExecution().toString()
    assert "Exchange" not in plan and "BroadcastHashJoin" not in plan


def test_hll_intersection_inclusion_exclusion(spark):
    from sfdata_wrangler_spark.operators.hll import (
        hll_intersect_estimate,
        hll_sketch,
    )

    # |A| = 3000 (0..2999), |B| = 3000 (2000..4999), overlap = 1000
    a = spark.range(0, 3000).select(
        F.lit("g").alias("g"), F.col("id").alias("u")
    )
    b = spark.range(2000, 5000).select(
        F.lit("g").alias("g"), F.col("id").alias("u")
    )
    ra = hll_sketch(a, ["g"], "u")
    rb = hll_sketch(b, ["g"], "u")
    row = hll_intersect_estimate(ra, rb, ["g"]).collect()[0]
    # each estimate carries ~6.5% (m=256); inclusion-exclusion sums
    # three of them over a 5000-element union -> generous envelope
    assert abs(row.est_a - 3000) / 3000 < 0.25
    assert abs(row.est_b - 3000) / 3000 < 0.25
    assert abs(row.est_union - 5000) / 5000 < 0.25
    assert 0 < row.est_intersect < 2500
