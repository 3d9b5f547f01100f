#!/usr/bin/env python
"""Low-core cross-check probe (VERDICT r14 ask #9).

The r14 environment record showed four clean-stamped 32-core benches
spanning 23.5-32.2 s while the driver's own 8-core rerun read the SAME
tree at 25.98 s — i.e. the box has a frequency-drift regime the
cpu/load/io/mc stamps all miss, and its signature is "fewer cores run
the suite FASTER". This probe makes that signature measurable inside
one bench invocation: a fresh subprocess (its own JVM — a SparkContext
cannot change master in-process) times the round-2-comparable query
set on ``local[<cpus>]`` and prints ONE JSON line; bench.py compares
the total against its own 32-core comparable_r2 and stamps
``suspect_freq_drift`` when the low-core run wins by >15%.

Methodology matches bench.py's comparable_r2 loop (count() action,
clearCache before every rep, best-of-N) so the two totals are
comparable; 2 reps per query keeps the probe under ~1 min.

Usage: python tools/lowcore_probe.py <sf_dir> <cpus>
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2]
    # must be set BEFORE the session module is imported: both the
    # local[N] master and the shuffle-partition default read it
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import R2_HEADLINE
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark(f"lowcore_probe_c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    timings: dict[str, float] = {}
    for name in R2_HEADLINE:
        fn = QUERIES[name]["fn"]
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "total": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
