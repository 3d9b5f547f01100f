"""VERDICT r11 asks #3/#5: the AQE skew-threshold finding codified as
an engine helper (``scale_skew_conf`` / ``skew_conf_scope``), and the
auto-pick of skew-immune forms for ``calc_weights`` / ``sessionize``.

The measured footgun (ARCHITECTURE "Hot JOIN key"): AQE's skew-join
split is gated on ``skewedPartitionThresholdInBytes`` = 256 MB, so a
mid-scale hot key (tens of MB) silently never splits — AQE-on measures
identical to AQE-off — while thresholds scaled to the job's shuffle
size recover the serial tail (measured 2.47 s → 1.19 s at 100×)."""

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.skew import (
    max_partition_rows,
    scale_skew_conf,
    skew_conf_scope,
)


def test_scale_skew_conf_recipe():
    # threshold = shuffle_bytes / target_splits, advisory = half of it
    conf = scale_skew_conf(256 << 20, target_splits=16)
    assert conf[
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    ] == str(16 << 20)
    assert conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == str(
        8 << 20
    )
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"
    # the floor: tiny inputs never collapse below 1 MB / 512 KB, where
    # splitting is pure overhead
    tiny = scale_skew_conf(1 << 20)
    assert tiny[
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    ] == str(1 << 20)
    assert tiny["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == str(
        1 << 19
    )


def _skewed_join_plan(spark, fact, dim):
    """Execute the skewed SMJ and return the FINAL adaptive plan text
    (the ``skew=true`` / ``AQEShuffleRead skewed`` markers only appear
    on the executed plan, after AQE re-planning)."""
    out = fact.join(dim, "k").select(
        F.sum(F.length("payload") + F.col("attr")).alias("s")
    )
    out.collect()
    return out._jdf.queryExecution().executedPlan().toString()


def test_scaled_conf_splits_where_defaults_dont(spark):
    """The A/B VERDICT r11 #3 asks for: the same hot-key sort-merge
    join does NOT skew-split under default AQE thresholds (hot
    partition ≈ 15 MB « the 256 MB gate) and DOES under
    ``scale_skew_conf`` scaled to the job (~1 MB threshold)."""
    n = 150_000
    # 80% of rows on one key; incompressible-ish payload so the hot
    # shuffle partition's COMPRESSED bytes stay well above the scaled
    # threshold (md5 hex ≈ 4 bits/char entropy)
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 < 4, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(5000)))
        .alias("k"),
        F.repeat(F.md5(F.col("id").cast("string")), 4).alias("payload"),
    )
    dim = spark.range(5001).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force the sort-merge plan AQE's skew split applies to
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        plan_default = _skewed_join_plan(spark, fact, dim)
        assert "skew=true" not in plan_default  # the 256 MB gate
        with skew_conf_scope(spark, approx_shuffle_bytes=16 << 20):
            plan_scaled = _skewed_join_plan(spark, fact, dim)
        assert "skew=true" in plan_scaled
        assert "AQEShuffleRead skewed" in plan_scaled
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def test_skew_conf_scope_restores_previous_values(spark):
    key = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    before = spark.conf.get(key, None)
    with skew_conf_scope(spark, approx_shuffle_bytes=256 << 20):
        assert spark.conf.get(key) == str(16 << 20)
        assert (
            spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
            == "false"
        )
    assert spark.conf.get(key, None) == before
    # exceptions inside the scope restore too
    with pytest.raises(RuntimeError, match="boom"):
        with skew_conf_scope(spark, approx_shuffle_bytes=256 << 20):
            raise RuntimeError("boom")
    assert spark.conf.get(key, None) == before


def _weight_frame(spark, hot_rows: int, cold_rows: int = 40):
    rows = [("hot", "r1", 1.0 if i % 2 else None, 3) for i in range(hot_rows)]
    rows += [
        (f"c{i % 4}", "r2", 1.0 if i % 3 else None, 2)
        for i in range(cold_rows)
    ]
    return spark.createDataFrame(
        rows, "DATE string, ROUTE string, TRIP_WEIGHT double, TRIP_STOPS int"
    )


def test_choose_weight_strategy_pick_and_auto_equivalence(spark):
    """VERDICT r11 ask #5: the pre-flight pick — window below the knee,
    agg above it — and strategy="auto" matching the window result
    exactly (the two forms are bitwise-equal on 1.0-seeded weights)."""
    from sfdata_wrangler_spark.operators.weighting import (
        calc_weights,
        choose_weight_strategy,
    )

    group = ["DATE", "ROUTE"]
    uniform = _weight_frame(spark, hot_rows=40)
    hot = _weight_frame(spark, hot_rows=400)
    # knee scaled down so the committed-replica shape (hot cell ≫ knee,
    # uniform cells ≪ knee) is reproducible in-suite
    assert choose_weight_strategy(uniform, group, knee_rows=100) == "window"
    assert choose_weight_strategy(hot, group, knee_rows=100) == "agg"
    assert max_partition_rows(hot, group) == 400

    base = calc_weights(hot, group, "TRIP_WEIGHT")
    auto = calc_weights(hot, group, "TRIP_WEIGHT", strategy="auto",
                        knee_rows=100)
    key = ["DATE", "ROUTE", "TRIP_WEIGHT", "TRIP_STOPS", "WEIGHT"]

    def nsort(rows):  # None-tolerant multiset compare
        return sorted(map(tuple, rows), key=repr)

    assert nsort(base.select(key).collect()) == nsort(
        auto.select(key).collect()
    )
    # defaults unchanged: no strategy arg still means window (same
    # plan class — contains a Window node)
    assert "Window" in base._jdf.queryExecution().optimizedPlan().toString()


def test_calc_weights_agg_rejects_scratch_namespace_collision(spark):
    """ADVICE r11 #1: a __cw_-prefixed input column would make the agg
    form's join-back ambiguous or get silently dropped — guard up
    front, mirroring sessionize_bucketed's __sb_ guard."""
    from sfdata_wrangler_spark.operators.weighting import calc_weights

    df = _weight_frame(spark, hot_rows=10).withColumn(
        "__cw_factor", F.lit(1.0)
    )
    with pytest.raises(ValueError, match="__cw_"):
        calc_weights(df, ["DATE", "ROUTE"], "TRIP_WEIGHT", strategy="agg")
    # the window form has no scratch namespace and keeps working
    assert calc_weights(df, ["DATE", "ROUTE"], "TRIP_WEIGHT").count() > 0


def test_choose_sessionize_strategy_pick_and_auto_equivalence(spark):
    from sfdata_wrangler_spark.operators.windows import (
        choose_sessionize_strategy,
        sessionize,
    )

    def frame(hot_events):
        rows = [("hot", i, i * 600.0) for i in range(hot_events)]
        rows += [(f"u{i}", i, i * 600.0) for i in range(30)]
        return spark.createDataFrame(
            rows, "card string, ev long, secs double"
        ).select(
            "card", "ev",
            F.timestamp_seconds(F.col("secs")).alias("ts"),
        )

    uniform, hot = frame(20), frame(300)
    assert choose_sessionize_strategy(uniform, ["card"], knee_rows=100) == "plain"
    assert choose_sessionize_strategy(hot, ["card"], knee_rows=100) == "bucketed"

    kw = dict(gap_minutes=30.0, order_cols=["ts", "ev"])
    plain = sessionize(hot, ["card"], "ts", **kw)
    auto = sessionize(hot, ["card"], "ts", strategy="auto", knee_rows=100,
                      **kw)
    cols = ["card", "ev", "SESSION_ID"]
    assert sorted(map(tuple, plain.select(cols).collect())) == sorted(
        map(tuple, auto.select(cols).collect())
    )
    with pytest.raises(ValueError, match="strategy"):
        sessionize(hot, ["card"], "ts", strategy="nope")

    # code-review r12 #4: auto must accept everything plain accepts —
    # a gap wider than the default bucket widens the bucket instead of
    # raising, and a non-ts-major ordering stays plain instead of
    # tripping bucketed's ts-major precondition
    wide = sessionize(
        hot, ["card"], "ts", gap_minutes=2880.0, strategy="auto",
        knee_rows=100, order_cols=["ts", "ev"],
    )
    wide_plain = sessionize(
        hot, ["card"], "ts", gap_minutes=2880.0, order_cols=["ts", "ev"]
    )
    assert sorted(map(tuple, wide.select(cols).collect())) == sorted(
        map(tuple, wide_plain.select(cols).collect())
    )
    nonmajor = sessionize(
        hot, ["card"], "ts", strategy="auto", knee_rows=100,
        order_cols=["ev", "ts"], gap_minutes=30.0,
    )
    nonmajor_plain = sessionize(
        hot, ["card"], "ts", order_cols=["ev", "ts"], gap_minutes=30.0
    )
    assert sorted(map(tuple, nonmajor.select(cols).collect())) == sorted(
        map(tuple, nonmajor_plain.select(cols).collect())
    )
    # explicit bucketed keeps the loud precondition errors
    from sfdata_wrangler_spark.operators.windows import sessionize_bucketed

    with pytest.raises(ValueError, match="bucket_minutes"):
        sessionize_bucketed(hot, ["card"], "ts", gap_minutes=2880.0)
