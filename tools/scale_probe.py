#!/usr/bin/env python
"""Run registered queries at two scales and report the scaling ratio.

Companion to tools/make_scale_replica.py: the ARCHITECTURE.md
"sf1.0-equivalent probe" tables are produced by this harness instead of
ad-hoc shell, so any round can re-verify the no-knee claims.

Method (matches the round-10 probes): one warm-up run at each scale is
excluded, then best-of-N (default 3) foreground wall-clock per query per
scale, both scales measured back-to-back in the same Spark session so JVM /
codegen warm-up costs cancel.

Usage:
  python tools/scale_probe.py q1 q2 ... [--small /root/testdata/sf0.1]
                                        [--big /tmp/sfdata_sf10_flat]
                                        [--runs 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_query(fn, spark, sf_dir, runs):
    times = []
    for i in range(runs + 1):  # +1 warm-up, excluded
        # Queries whose operators persist() intermediates (dd_dup_spans'
        # gram-md5 table, the curation chains) would otherwise serve the
        # warm-up's cache to every timed run via CacheManager plan
        # matching — measuring cache-hit cost, not plan cost, and
        # accumulating pinned memory across queries in this shared
        # session. Same guard bench.py applies before every timed run.
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if i > 0:
            times.append(dt)
    return min(times), times


def main():
    # the SAME probe + thresholds bench.py stamps, so ARCHITECTURE
    # and BENCH tables classify runs by one rule
    from bench import _run_context, contended_verdict

    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sfdata_sf10_flat")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--ivfpq-split",
        action="store_true",
        help="probe bench._ivfpq_split (one cold train+encode+persist "
        "+ best-of-3 serve) at both scales instead of registered "
        "queries (VERDICT r12 ask #6)",
    )
    a = ap.parse_args()
    if not a.queries and not a.ivfpq_split:
        ap.error("pass query names or --ivfpq-split")
    if a.queries and a.ivfpq_split:
        # the split branch returns before the query loop — refusing
        # beats silently discarding the named queries (code-review r13)
        ap.error("--ivfpq-split and query names are mutually exclusive; "
                 "run two invocations")
    ctx_before = _run_context()

    from sfdata_wrangler_spark.session import get_spark
    from sfdata_wrangler_spark.plans import query_map

    spark = get_spark()
    qm = query_map()
    if a.ivfpq_split:
        # VERDICT r12 ask #6: the build path (train+encode+persist) at
        # two scales, through the SAME lifecycle split bench.py
        # commits — one cold build into a throwaway dir + best-of-3
        # serve, per scale dir.
        from bench import _ivfpq_split

        split = {}
        for d in (a.small, a.big):
            build, query = _ivfpq_split(spark, d)
            split[d] = {"ivfpq_build_s": build, "ivfpq_query_s": query}
            print(json.dumps({d: split[d]}))
        ctx_after = _run_context()
        print(json.dumps({
            "ivfpq_split": split,
            "build_ratio": round(
                split[a.big]["ivfpq_build_s"]
                / split[a.small]["ivfpq_build_s"], 2,
            ),
            "query_ratio": round(
                split[a.big]["ivfpq_query_s"]
                / split[a.small]["ivfpq_query_s"], 2,
            ),
            "run_context": {"before": ctx_before, "after": ctx_after},
            "contended": contended_verdict(ctx_before, ctx_after),
        }, indent=2))
        return
    # per-query results nested under "queries" (ADVICE r11 #4: a
    # registered query named run_context/contended would silently
    # overwrite the reserved top-level keys in a flat dict)
    queries = {}
    for name in a.queries:
        fn = qm[name]
        small_best, small_all = _time_query(fn, spark, a.small, a.runs)
        big_best, big_all = _time_query(fn, spark, a.big, a.runs)
        queries[name] = {
            "small_best_s": round(small_best, 2),
            "big_best_s": round(big_best, 2),
            "ratio": round(big_best / small_best, 2),
            "small_all": [round(t, 2) for t in small_all],
            "big_all": [round(t, 2) for t in big_all],
        }
        print(json.dumps({name: queries[name]}))
    ctx_after = _run_context()
    out = {
        "queries": queries,
        "run_context": {"before": ctx_before, "after": ctx_after},
        "contended": contended_verdict(ctx_before, ctx_after),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
