"""Dump .explain("formatted") for every bench query into plans/r15/.

    python tools/dump_plans_r15.py before [sf_dir]
    python tools/dump_plans_r15.py after  [sf_dir] [name ...]

Writes plans/r15/<query>_<tag>.txt — the optimization-round evidence
files the judge checks plan claims against. With explicit names, only
those queries are dumped (used for the _after side of touched
queries).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    only = set(sys.argv[3:])

    from sfdata_wrangler_spark.pipelines.workloads import BENCH_WORKLOADS
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)

    fns = {n: s["fn"] for n, s in QUERIES.items() if s["bench"]}
    fns.update(BENCH_WORKLOADS)
    # explicitly named non-bench queries are dumpable too (touched
    # operators reach non-headline paths like txt_pack_windows)
    for n in only:
        if n not in fns and n in QUERIES:
            fns[n] = QUERIES[n]["fn"]
    for name, fn in sorted(fns.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - diagnostic path
            txt = f"ERROR: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
