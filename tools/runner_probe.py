#!/usr/bin/env python
"""Full-DAG scaling probe for the restartable pipeline runner.

VERDICT r11 ask #6: the ten-step DAG had 10x evidence only (1.6x wall,
ARCHITECTURE "Pipeline-runner scaling"); this harness extends the
series to any replica and records what the round-over-round tables
need — per-step wall, total wall, and the skip-pass cost — through
committed, reproducible tooling (the make_scale_replica/scale_probe
pattern).

Method: one warm-up DAG run on a throwaway lake (Spark session +
codegen costs excluded), then ``--runs`` fresh-lake runs (best total
wall reported, per-step walls from the best run), then one re-invoke
on the LAST lake where every step must skip (the nightly-re-run cost:
marker reads + committed-data listings only, no data touched).

Usage:
  python tools/runner_probe.py [--sf-dir /root/testdata/sf0.1]
                               [--parallelism 4] [--runs 2]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_dag(spark, sf_dir, lake, parallelism):
    from sfdata_wrangler_spark.pipelines.runner import (
        run_pipeline,
        transit_steps,
    )

    t0 = time.monotonic()
    rows = run_pipeline(
        spark, sf_dir, lake, transit_steps(), parallelism=parallelism
    )
    total = round(time.monotonic() - t0, 2)
    return total, rows


def main():
    from bench import _run_context, contended_verdict

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--parallelism", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    a = ap.parse_args()
    ctx_before = _run_context()

    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("runner_probe")
    spark.sparkContext.setLogLevel("ERROR")

    lakes = []

    def fresh_lake():
        d = tempfile.mkdtemp(prefix="runner_probe_lake_")
        lakes.append(d)
        return d

    try:
        # warm-up (excluded): pays session/codegen one-time costs
        _run_dag(spark, a.sf_dir, fresh_lake(), a.parallelism)

        best_total, best_rows = None, None
        for _ in range(a.runs):
            spark.catalog.clearCache()
            total, rows = _run_dag(
                spark, a.sf_dir, fresh_lake(), a.parallelism
            )
            print(f"# fresh-lake DAG: {total:.2f}s", file=sys.stderr)
            if best_total is None or total < best_total:
                best_total, best_rows = total, rows

        # skip pass on the last completed lake: every step must skip
        skip_total, skip_rows = _run_dag(
            spark, a.sf_dir, lakes[-1], a.parallelism
        )
        not_skipped = [r["step"] for r in skip_rows if r["status"] != "skipped"]
        out = {
            "sf_dir": a.sf_dir,
            "parallelism": a.parallelism,
            "dag_total_s": best_total,
            "steps": {
                r["step"]: r.get("wall_s")
                for r in best_rows
                if r["status"] == "ran"
            },
            "skip_pass_s": skip_total,
            "skip_pass_all_skipped": not not_skipped,
        }
        ctx_after = _run_context()
        out["run_context"] = {"before": ctx_before, "after": ctx_after}
        out["contended"] = contended_verdict(ctx_before, ctx_after)
        if not_skipped:
            out["not_skipped"] = not_skipped
        print(json.dumps(out, indent=2))
    finally:
        for d in lakes:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
