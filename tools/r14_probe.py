"""Per-query timing probe for the r14 optimization round.

    python tools/r14_probe.py q1 q2 ...              # time named queries
    python tools/r14_probe.py --conf k=v --conf ...  # with session overrides
    python tools/r14_probe.py --runs 4 --noop q1

Times each named bench query (count() and optionally a noop sink),
best-of-N with clearCache between runs, in ONE fresh session built by
session.get_spark plus any --conf overrides. Prints one JSON line so
A/B variants can be diffed mechanically. Methodology matches bench.py
(same clearCache + best-of-N discipline) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names: list[str] = []
    conf: dict[str, str] = {}
    runs = 3
    do_noop = False
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--conf":
            k, _, v = args[i + 1].partition("=")
            conf[k] = v
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--noop":
            do_noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sfdata_wrangler_spark.pipelines.workloads import BENCH_WORKLOADS
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r14-probe", extra_conf=conf or None)
    spark.sparkContext.setLogLevel("ERROR")

    fns = {n: s["fn"] for n, s in QUERIES.items()}
    fns.update(BENCH_WORKLOADS)

    out: dict = {"conf": conf, "sf_dir": sf_dir, "count": {}, "noop": {}}
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        fn = fns[name]
        best = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            best.append(time.time() - t0)
        out["count"][name] = [round(b, 3) for b in sorted(best)]
        if do_noop:
            nb = []
            for _ in range(max(2, runs - 1)):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                nb.append(time.time() - t0)
            out["noop"][name] = [round(b, 3) for b in sorted(nb)]
        print(
            f"# {name}: count_best={out['count'][name][0]}"
            + (f" noop_best={out['noop'][name][0]}" if do_noop else ""),
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
