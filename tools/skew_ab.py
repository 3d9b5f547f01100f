#!/usr/bin/env python
"""Skew A/B harnesses behind ARCHITECTURE.md's round-11 skew tables.

Two experiments, both against replicas from tools/make_scale_replica.py:

``--mode flagship`` — the hot WINDOW-cell family: flagship
expand+weight on the uniform 10x lake vs the 40%-hot-cell lake
(``--hot-cell-frac 0.4``), window strategy with AQE on/off vs the
skew-immune ``calc_weights(strategy="agg")``. Expected shape: AQE
on/off identical (window partitions are not splittable), agg flat
across lakes.

``--mode join`` — the hot JOIN-key family: sort-merge join of the
hot-user events (``--hot-user-frac 0.4``) against a per-user profile
table with broadcast disabled, AQE skew-join on/off, default vs
data-scaled split thresholds. Expected shape: no split at default
thresholds on bench-scale data (256MB gate), ~2x from the split once
``skewedPartitionThresholdInBytes`` matches the partition sizes.

Usage:
  python tools/skew_ab.py --mode flagship [--uniform DIR] [--skew DIR]
  python tools/skew_ab.py --mode join [--lake DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(fn, runs=3):
    times = []
    for i in range(runs + 1):  # warm-up excluded
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        if i > 0:
            times.append(round(dt, 2))
    return min(times), times


def mode_flagship(uniform: str, skew: str) -> None:
    from sfdata_wrangler_spark.plans.catalog import (
        flagship_expand_weight_cascade,
    )
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark()

    def run(lake, strategy):
        flagship_expand_weight_cascade(
            spark, lake, weight_strategy=strategy
        ).write.format("noop").mode("overwrite").save()

    for lake, label in [(uniform, "uniform"), (skew, "skew40")]:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        b, all_w = _best_of(lambda: run(lake, "window"))
        print(f"{label} window AQE-on : best={b:.2f}s runs={all_w}", flush=True)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b, all_w = _best_of(lambda: run(lake, "window"))
        print(f"{label} window AQE-off: best={b:.2f}s runs={all_w}", flush=True)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        b, all_w = _best_of(lambda: run(lake, "agg"))
        print(f"{label} agg    AQE-on : best={b:.2f}s runs={all_w}", flush=True)


def mode_join(lake: str) -> None:
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.session import get_spark

    base_conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    scaled_conf = dict(
        base_conf,
        **{
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    for label, conf in [("default-thresholds", base_conf),
                        ("scaled-thresholds", scaled_conf)]:
        # fresh session per threshold set: these confs are read at
        # planning time and a shared session would leak them across
        spark = get_spark(app_name=f"skew_ab_{label}", extra_conf=conf)
        ev = spark.read.parquet(f"{lake}/events.parquet")
        prof = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tot"),
        )
        prof_path = f"/tmp/skew_ab_prof_{os.getpid()}"
        prof.write.mode("overwrite").parquet(prof_path)
        prof = spark.read.parquet(prof_path)

        def run():
            (
                ev.join(prof, "user_id")
                .groupBy("event_type")
                .agg(F.sum(F.col("value") * F.col("n")).alias("x"))
                .write.format("noop").mode("overwrite").save()
            )

        for skew_on in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
            b, all_w = _best_of(run)
            print(
                f"{label} skewJoin={skew_on}: best={b:.2f}s runs={all_w}",
                flush=True,
            )
        spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["flagship", "join"], required=True)
    ap.add_argument("--uniform", default="/tmp/sfdata_sf10_flat")
    ap.add_argument("--skew", default="/tmp/sfdata_sf10_skew")
    ap.add_argument("--lake", default="/tmp/sfdata_sf100_hotuser")
    a = ap.parse_args()
    if a.mode == "flagship":
        mode_flagship(a.uniform, a.skew)
    else:
        mode_join(a.lake)
