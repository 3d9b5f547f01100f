"""Deterministic log-histogram quantile sketch (operators/qsketch):
merge law (fold equals batch), relative-error bound vs exact
quantiles, small-value exactness, and the zero-class bucket."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.qsketch import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)


def _df(spark, vals, g="g"):
    return spark.createDataFrame([(g, float(v)) for v in vals], "g string, v double")


def test_merge_equals_batch(spark):
    a_vals = [1.5, 2.0, 700.25, 19.99, 0.0, -3.0] * 5
    b_vals = [88.0, 0.07, 123456.78, 2.0] * 7
    batch = qsketch_build(_df(spark, a_vals + b_vals), ["g"], "v")
    merged = qsketch_merge(
        qsketch_build(_df(spark, a_vals), ["g"], "v"),
        qsketch_build(_df(spark, b_vals), ["g"], "v"),
        ["g"],
    )
    as_map = lambda df: {  # noqa: E731
        (r["g"], r["bucket"]): r["n"] for r in df.collect()
    }
    assert as_map(batch) == as_map(merged)


def test_relative_error_bound(spark):
    # deterministic spread over 4 decades; k=6 -> bound 1/64
    vals = [round(1.0007**i, 4) for i in range(0, 12000, 7)]
    df = _df(spark, vals)
    sk = qsketch_build(df, ["g"], "v", scale=100, sub_bits=6)
    out = qsketch_quantiles(sk, ["g"], [0.5, 0.95, 0.99], sub_bits=6).collect()[0]
    svals = sorted(int(round(v * 100)) for v in vals)
    for q, col in [(0.5, "q50_scaled"), (0.95, "q95_scaled"), (0.99, "q99_scaled")]:
        import math

        exact = svals[math.ceil(q * len(svals)) - 1]
        est = out[col]
        assert est <= exact, (q, est, exact)  # lower bound by construction
        assert exact <= est * (1 + 1 / 64) + 1, (q, est, exact)


def test_small_values_exact_and_zero_class(spark):
    # fixed-point values below 2^6 = 64 units are their own buckets
    vals = [0.01, 0.02, 0.63, 0.0, -1.0]
    sk = qsketch_build(_df(spark, vals), ["g"], "v", scale=100, sub_bits=6)
    buckets = {r["bucket"]: r["n"] for r in sk.collect()}
    assert buckets == {1: 1, 2: 1, 63: 1, -1: 2}
    out = qsketch_quantiles(sk, ["g"], [0.2, 0.9], sub_bits=6).collect()[0]
    assert out["n_total"] == 5
    assert out["q20_scaled"] == 0  # zero-class dominates the low tail
    assert out["q90_scaled"] == 63


def test_quantile_thresholds_are_integer_exact(spark):
    # 10 equal values: every quantile lands on the single bucket
    sk = qsketch_build(_df(spark, [5.0] * 10), ["g"], "v")
    out = qsketch_quantiles(sk, ["g"], [0.01, 0.5, 1.0]).collect()[0]
    assert out["q1_scaled"] == out["q50_scaled"] == out["q100_scaled"]


def test_subpercent_quantile_labels_distinct(spark):
    sk = qsketch_build(_df(spark, [float(i) for i in range(1, 200)]), ["g"], "v")
    out = qsketch_quantiles(sk, ["g"], [0.99, 0.995, 0.999])
    assert out.columns == [
        "g", "n_total", "q99_scaled", "q99_50_scaled", "q99_90_scaled"
    ]
    import pytest

    with pytest.raises(ValueError):
        # 0.99 and 0.99004 both round to 9900 basis points
        qsketch_quantiles(sk, ["g"], [0.99, 0.99004])


def test_weighted_quantiles_match_exact_weighted(spark):
    """Weight-summed sketch counts: the q-quantile must track the
    exact weighted quantile (first value whose cumulative weight
    reaches q of the total) within the bucket bound."""
    rows = [("g", 10.0, 1.0), ("g", 20.0, 1.0), ("g", 30.0, 8.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    sk = qsketch_build(df, ["g"], "v", weight_col="w")
    out = qsketch_quantiles(sk, ["g"], [0.5, 0.9]).collect()[0]
    # exact weighted: cum weights 1, 2, 10 of total 10; q=0.5 -> the
    # value at cum >= 5 = 30.0; q=0.9 -> 30.0
    for col in ("q50_scaled", "q90_scaled"):
        est = out[col]
        assert est <= 3000
        assert 3000 <= est * (1 + 1 / 64) + 1
    # unweighted for contrast: q50 lands on the middle value 20.0
    sku = qsketch_build(df, ["g"], "v")
    u = qsketch_quantiles(sku, ["g"], [0.5]).collect()[0]
    assert u["q50_scaled"] <= 2000 <= u["q50_scaled"] * (1 + 1 / 64) + 1


def test_weighted_merge_equals_batch(spark):
    rows = [("g", float(i % 40), 0.5 + (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    a = df.where("v < 20")
    b = df.where("v >= 20")
    batch = qsketch_build(df, ["g"], "v", weight_col="w")
    merged = qsketch_merge(
        qsketch_build(a, ["g"], "v", weight_col="w"),
        qsketch_build(b, ["g"], "v", weight_col="w"),
        ["g"],
    )
    as_map = lambda d: {  # noqa: E731
        (r["g"], r["bucket"]): r["n"] for r in d.collect()
    }
    assert as_map(batch) == as_map(merged)


def test_null_values_excluded(spark):
    """ADVICE r4: NULL values must not land in a NULL bucket — they'd
    inflate n_total and shift the rank walk (3 values + 3 NULLs
    reported median 10.00 instead of 20.00), and NULL bucket ordering
    differs cross-engine (Spark NULLS FIRST vs DuckDB NULLS LAST)."""
    df = spark.createDataFrame(
        [("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", None), ("g", None), ("g", None)],
        "g string, v double",
    )
    sk = qsketch_build(df, ["g"], "v", scale=100, sub_bits=6)
    out = qsketch_quantiles(sk, ["g"], [0.5], sub_bits=6).collect()[0]
    assert out["n_total"] == 3
    assert out["q50_scaled"] == 2000  # median 20.00, not 10.00


def test_nan_values_excluded(spark):
    """r5 review: NaN must be excluded like NULL — Spark would cast
    floor(NaN*scale) to 0 (silently counted in the zero-class
    bucket) while DuckDB errors on CAST(NaN AS BIGINT)."""
    df = spark.createDataFrame(
        [("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", float("nan"))],
        "g string, v double",
    )
    sk = qsketch_build(df, ["g"], "v", scale=100, sub_bits=6)
    out = qsketch_quantiles(sk, ["g"], [0.5], sub_bits=6).collect()[0]
    assert out["n_total"] == 3
    assert out["q50_scaled"] == 2000


def test_merge_law_with_nulls_and_nans(spark):
    """r5: the merge law must hold with NULL/NaN pollution split
    arbitrarily across shards — exclusion happens at BUILD time, so
    folded shards and the batch sketch see the same clean values."""
    import math

    a_vals = [1.5, None, 700.25, float("nan"), 0.0, -3.0, 19.99]
    b_vals = [88.0, float("nan"), None, 0.07, 123456.78, 2.0]

    def df(vals):
        return spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )

    clean = [
        v
        for v in a_vals + b_vals
        if v is not None and not (isinstance(v, float) and math.isnan(v))
    ]
    batch = qsketch_build(df(clean), ["g"], "v")
    merged = qsketch_merge(
        qsketch_build(df(a_vals), ["g"], "v"),
        qsketch_build(df(b_vals), ["g"], "v"),
        ["g"],
    )
    as_map = lambda d: {  # noqa: E731
        (r["g"], r["bucket"]): r["n"] for r in d.collect()
    }
    assert as_map(batch) == as_map(merged)
    out = qsketch_quantiles(merged, ["g"], [0.5], sub_bits=6).collect()[0]
    assert out["n_total"] == len(clean)
