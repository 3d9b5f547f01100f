#!/usr/bin/env python
"""Measure plain vs bucketed vs auto for the r13 domain-pipeline
twins (VERDICT r12 ask #2's wall-clock evidence): the clipper
linked-trip and taxi trip-segmentation workload adapters, timed on a
given events dir — typically the committed hot-user replica
(`tools/make_scale_replica.py --hot-user-frac 0.4`, where one
card/cab holds ~40% of all rows and straggles every per-entity
window) and the uniform replica of the same size (where plain should
win and auto should pick it).

Per (pipeline, strategy): one warm-up run excluded, then best-of-N
foreground wall via the NOOP SINK (bench.py's honest-full-plan rule:
under count() Catalyst eliminates every window/lag column because
none affects the row count — a first cut of this probe measured the
hot-user clipper plain form at 0.48 s for 10M rows, i.e. nothing).
Prints one JSON line with the bench run-condition stamp.

Usage:
  python tools/pipeline_skew_probe.py [--dir /tmp/sfdata_sf100_hotuser]
                                      [--runs 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _adapters(spark, sf_dir):
    """The bench workload adapters' event->tags / event->pings frames,
    built once so every strategy times the identical input plan."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.plans.catalog import _events

    ev = _events(spark, sf_dir)
    tags = ev.select(
        F.col("user_id").cast("string").alias("ClipperCardID"),
        F.col("ts").alias("TagOnTime"),
        F.col("event_id").alias("TripSequenceID"),
        F.element_at(
            F.array(F.lit("SF Muni"), F.lit("BART"), F.lit("Caltrain")),
            (F.pmod("event_id", 3) + 1).cast("int"),
        ).alias("AgencyName"),
        F.pmod("event_id", 20).cast("string").alias("RouteName"),
    )
    pings = ev.select(
        F.pmod("user_id", 200).alias("cab_id"),
        F.col("ts").alias("time"),
        (F.col("value") * 1000.0).alias("x"),
        (F.col("value") * 250.0).alias("y"),
        F.when(F.col("value") > 0, F.lit("M")).otherwise(F.lit("E"))
        .alias("status"),
    )
    return tags, pings


def main():
    from bench import _run_context, contended_verdict

    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sfdata_sf100_hotuser")
    ap.add_argument("--runs", type=int, default=2)
    a = ap.parse_args()
    ctx_before = _run_context()

    from sfdata_wrangler_spark.pipelines.clipper import infer_linked_trips
    from sfdata_wrangler_spark.pipelines.taxi import identify_gps_trips
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("pipeline_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    tags, pings = _adapters(spark, a.dir)

    out = {"metric": "pipeline_skew_strategies", "dir": a.dir, "results": {}}
    jobs = [
        ("clipper", lambda s: infer_linked_trips(tags, strategy=s)),
        ("taxi", lambda s: identify_gps_trips(pings, strategy=s)),
    ]
    for name, fn in jobs:
        for strat in ("plain", "bucketed", "auto"):
            times = []
            for i in range(a.runs + 1):  # warm-up excluded
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(strat).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                if i > 0:
                    times.append(dt)
            out["results"][f"{name}_{strat}"] = {
                "best_s": round(min(times), 2),
                "all": [round(t, 2) for t in times],
            }
            print(json.dumps({f"{name}_{strat}": out["results"][f"{name}_{strat}"]}),
                  file=sys.stderr)

    ctx_after = _run_context()
    out["run_context"] = {"before": ctx_before, "after": ctx_after}
    out["contended"] = contended_verdict(ctx_before, ctx_after)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
