"""Event-warehouse analytics walkthrough (executable documentation).

The full ordered-event toolkit on the driver's ``events`` table —
the queries a product-analytics team runs at fact scale, each in its
100 TB shape:

    python examples/run_events_analytics.py [sf_dir]

1. ordered funnel (signup -> click -> purchase in 3 days): chained
   user-keyed joins over shrinking filtered slices — the per-user
   event history never materializes
2. multi-episode funnel: the greedy re-entry form (a user who
   converts, lapses past the window, and converts again emits one
   row per episode), bounded unroll, checked against the streaming
   operator's closed-dataset limit
3. retention cohorts: first-activity cohort x activity offset
4. sliding 7-day distinct users from merged daily HLL sketches: the
   fact table is read ONCE; windows are assembled by max-merging
   register tables, and the estimate is compared to the exact
   sliding countDistinct
5. salted-join enrichment: the proactive skew form, verified
   row-identical to the plain join
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.funnel import (
    funnel_episodes,
    funnel_steps,
    funnel_summary,
    retention_cohorts,
)
from sfdata_wrangler_spark.operators.hll import sliding_distinct_hll
from sfdata_wrangler_spark.operators.skew import salted_join
from sfdata_wrangler_spark.operators.windows import rolling_distinct_users
from sfdata_wrangler_spark.plans.catalog import _events
from sfdata_wrangler_spark.session import get_spark

STEPS = ["signup", "click", "purchase"]
WITHIN = 3 * 24 * 3600.0  # 3 days


def main(sf_dir: str) -> None:
    spark = get_spark("events-analytics-example")
    ev = _events(spark, sf_dir)

    print("== 1. ordered funnel (3-day window) ==")
    per_step = funnel_summary(ev, STEPS, within_seconds=WITHIN)
    for r in per_step.collect():
        print(f"  step {r.step} {r.event_type:<9} {r.n_users} users")

    print("== 2. multi-episode funnel ==")
    episodes = funnel_episodes(
        ev, STEPS, within_seconds=WITHIN, max_episodes=4
    )
    dist = (
        episodes.groupBy("episode")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("t3").alias("n_completed"),
        )
        .orderBy("episode")
    )
    for r in dist.collect():
        print(
            f"  episode {r.episode}: {r.n_users} opened, "
            f"{r.n_completed} completed"
        )
    single = funnel_steps(ev, STEPS, within_seconds=WITHIN)
    n_single = single.count()
    n_ep1 = episodes.where(F.col("episode") == 1).count()
    assert n_single == n_ep1, (n_single, n_ep1)
    print(f"  episode-1 rows == single-funnel rows: {n_ep1}")

    print("== 3. retention cohorts (monthly) ==")
    tri = retention_cohorts(ev, period="month")
    for r in tri.orderBy("cohort_period", "period_offset").collect()[:6]:
        print(
            f"  cohort {r.cohort_period:%Y-%m} +{r.period_offset}mo: "
            f"{r.n_users} users"
        )

    print("== 4. sliding 7-day distinct users (HLL vs exact) ==")
    print(
        "  (raw HLL, m=256 registers: unbiased for n >~ 640; the"
        " small sf0.01 panel sits BELOW that, so the estimate runs"
        " high by design — the engine deliberately omits the HLL++"
        " low-range correction, see operators/hll.py)"
    )
    approx = {
        r.window_end: r.hll_est
        for r in sliding_distinct_hll(
            ev.select("ts", "user_id"), "ts", "user_id", window_days=7
        ).collect()
    }
    exact = {
        r.win_day.strftime("%Y-%m-%d"): r.wau
        for r in rolling_distinct_users(ev).collect()
    }
    shown = 0
    for day in sorted(approx):
        if day not in exact:
            continue
        err = abs(approx[day] - exact[day]) / max(exact[day], 1)
        if shown < 5:
            print(
                f"  {day}: exact {exact[day]:>6}  "
                f"hll {approx[day]:>9.1f}  ({err:+.1%})"
            )
        shown += 1

    print("== 5. salted-join enrichment equals the plain join ==")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    dim = users.select(
        "user_id", (F.col("user_id") % 5).alias("segment")
    )
    fact = ev.select("user_id", "event_type")
    salted = salted_join(fact, dim, "user_id", salt_buckets=8)
    plain = fact.join(dim, "user_id")
    a = salted.groupBy("segment").count().orderBy("segment").collect()
    b = plain.groupBy("segment").count().orderBy("segment").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    print(f"  verified over {sum(r['count'] for r in b)} joined rows")

    spark.stop()
    print("events analytics walkthrough: all stages verified")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
