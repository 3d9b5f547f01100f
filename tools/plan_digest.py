"""Compact physical-plan digest for registered queries.

    python tools/plan_digest.py q5_local_supplier_volume [sf_dir]
    python tools/plan_digest.py --all [sf_dir]   # one-line summary each

Prints the scale-relevant skeleton of ``executedPlan`` — scans (with
pushed filters / read schemas), joins, exchanges, windows, aggregates
— the lines EXPLAIN.md documents and tests/test_plan_shapes.py pins.
``--all`` mode prints per-query counts (exchanges, broadcasts,
sort-merge joins, cartesians) for a quick fleet audit: anything with
a CartesianProduct or an unexpected Exchange count stands out in one
screen.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KEEP = (
    "Exchange",
    "Join",
    "FileScan",
    "Window",
    "HashAggregate(keys",
    "WindowGroupLimit",
    "CartesianProduct",
)


def _plan(spark, fn, sf_dir: str) -> str:
    return fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def digest(plan: str, width: int = 200) -> list[str]:
    out = []
    for line in plan.splitlines():
        s = line.strip(" :+-*")
        if any(k in s for k in _KEEP):
            out.append(s[:width])
    return out


def counts(plan: str) -> dict[str, int]:
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "scans": plan.count("FileScan"),
        "windows": plan.count("Window ["),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    all_mode = "--all" in args
    args = [a for a in args if a != "--all"]
    name = None if all_mode else (args[0] if args else None)
    sf_dir = (args[1:] or args if all_mode else args[1:]) or []
    sf_dir = sf_dir[0] if sf_dir else "/root/testdata/sf0.001"
    if not all_mode and not name:
        print(__doc__)
        return

    from sfdata_wrangler_spark.plans.catalog import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("plan-digest")
    spark.sparkContext.setLogLevel("ERROR")

    if all_mode:
        for qname, spec in QUERIES.items():
            try:
                c = counts(_plan(spark, spec["fn"], sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"{qname}: PLAN ERROR {type(e).__name__}")
                continue
            flags = " !CARTESIAN" if c["cartesian"] else ""
            print(
                f"{qname}: x{c['exchanges']} b{c['broadcasts']} "
                f"smj{c['smj']} bnlj{c['bnlj']} scan{c['scans']} "
                f"w{c['windows']}{flags}"
            )
        return

    plan = _plan(spark, QUERIES[name]["fn"], sf_dir)
    for line in digest(plan):
        print(line)


if __name__ == "__main__":
    main()
