"""Funnel and retention (operators/funnel.py): hand-computed step
chains, window enforcement, ordering strictness, monotone summary,
daily cohort triangle."""

from __future__ import annotations

from datetime import datetime

from sfdata_wrangler_spark.operators.funnel import (
    funnel_steps,
    funnel_summary,
    retention_cohorts,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark):
    rows = [
        # u1 completes in order within window
        (1, "A", _ts("2024-01-01 00:00:00")),
        (1, "B", _ts("2024-01-01 01:00:00")),
        (1, "C", _ts("2024-01-01 02:00:00")),
        # u2: B happens BEFORE A → chain breaks at step 2
        (2, "B", _ts("2024-01-01 00:00:00")),
        (2, "A", _ts("2024-01-01 01:00:00")),
        (2, "C", _ts("2024-01-01 02:00:00")),
        # u3: completes but C outside the window
        (3, "A", _ts("2024-01-01 00:00:00")),
        (3, "B", _ts("2024-01-01 00:30:00")),
        (3, "C", _ts("2024-01-03 00:00:00")),
        # u4: never starts (no A)
        (4, "B", _ts("2024-01-01 00:00:00")),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_hand_computed(spark):
    out = funnel_steps(
        _events(spark), ["A", "B", "C"], within_seconds=24 * 3600.0
    )
    rows = {r["user_id"]: (r["t1"], r["t2"], r["t3"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3}  # u4 has no step-1 event
    assert rows[1] == (
        _ts("2024-01-01 00:00:00"),
        _ts("2024-01-01 01:00:00"),
        _ts("2024-01-01 02:00:00"),
    )
    assert rows[2][1] is None and rows[2][2] is None  # order violated
    assert rows[3][1] is not None and rows[3][2] is None  # window violated


def test_funnel_earliest_qualifying_event_wins(spark):
    rows = [
        (1, "A", _ts("2024-01-01 00:00:00")),
        (1, "B", _ts("2024-01-01 05:00:00")),
        (1, "B", _ts("2024-01-01 03:00:00")),  # earlier B still after A
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel_steps(ev, ["A", "B"]).collect()[0]
    assert out["t2"] == _ts("2024-01-01 03:00:00")


def test_summary_monotone(spark):
    s = funnel_summary(
        _events(spark), ["A", "B", "C"], within_seconds=24 * 3600.0
    ).collect()
    counts = {r["step"]: r["n_users"] for r in s}
    assert counts == {1: 3, 2: 2, 3: 1}


def test_retention_daily_triangle(spark):
    rows = [
        (1, "A", _ts("2024-01-01 10:00:00")),
        (1, "A", _ts("2024-01-03 10:00:00")),
        (2, "A", _ts("2024-01-03 09:00:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = retention_cohorts(ev, period="day")
    got = {
        (r["cohort_period"].date().isoformat(), r["period_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1, ("2024-01-03", 0): 1}


def test_funnel_plan_is_linear_in_steps(spark):
    """r5 regression: the old inner-join-then-join-back shape
    referenced the running funnel frame twice per step, doubling the
    unshared plan subtree with every step (2^(k-1) copies of the
    step-1 aggregation). The plan must stay LINEAR: at most one scan
    of the events source per funnel step."""
    ev = _events(spark)
    k4 = funnel_steps(ev, ["view", "cart", "buy", "view"])
    plan = k4._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") + plan.count("LocalTableScan") <= 4, plan


def test_funnel_differential_random_events(spark):
    """Property differential for the r5 left-join+conditional-min
    rewrite: on a deterministic pseudo-random event panel, the Spark
    funnel must equal a sequential per-user Python reference of the
    declared semantics (earliest step-i event at/after t_{i-1};
    within_seconds window opened at t1; null after a break)."""
    import random

    rng = random.Random(42)
    types = ["A", "B", "C", "D"]
    rows = []
    for u in range(60):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (
                    u,
                    rng.choice(types),
                    _ts("2024-01-01 00:00:00").replace(
                        hour=rng.randint(0, 23), minute=rng.randint(0, 59)
                    ),
                )
            )
    assert rows  # Random(42) panel is deterministically non-empty
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    steps = ["A", "B", "C"]
    within = 4 * 3600.0

    def reference(rows):
        by_user = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((t, ts))
        out = {}
        for u, evs in by_user.items():
            firsts = [ts for t, ts in evs if t == steps[0]]
            if not firsts:
                continue
            t1 = min(firsts)
            chain = [t1]
            for step in steps[1:]:
                prev = chain[-1]
                if prev is None:
                    chain.append(None)
                    continue
                cand = [
                    ts
                    for t, ts in evs
                    if t == step
                    and ts >= prev
                    and (ts - t1).total_seconds() <= within
                ]
                chain.append(min(cand) if cand else None)
            out[u] = tuple(chain)
        return out

    expected = reference(rows)
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(ev, steps, within_seconds=within).collect()
    }
    assert got == expected


def test_funnel_episodes_plan_growth_is_linear(spark):
    """funnel_episodes references each seed stage once in the next
    stage and once in the final union — plan copies of the step-1
    slice grow LINEARLY in max_episodes (sum over the seed chain),
    never exponentially. Pin the budget: E seed scans for the union
    + E-1 chained re-scans (triangular reuse) + one scan per later
    step, with headroom for Catalyst's local-relation duplication."""
    from sfdata_wrangler_spark.operators.funnel import funnel_episodes

    ev = _events(spark)
    out = funnel_episodes(
        ev, ["view", "cart", "buy"], within_seconds=3600.0, max_episodes=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("ExistingRDD") + plan.count("LocalTableScan")
    # E=4 episodes: seeds contribute at most 4+3+2+1 = 10 copies of
    # the step-1 slice; steps 2..3 add 2 more. Exponential growth
    # (2^E) would blow well past this at E=4 and explode at E=6.
    assert n_scans <= 12, (n_scans, plan)
    out6 = funnel_episodes(
        ev, ["view", "cart", "buy"], within_seconds=3600.0, max_episodes=6
    )
    plan6 = out6._jdf.queryExecution().executedPlan().toString()
    n6 = plan6.count("ExistingRDD") + plan6.count("LocalTableScan")
    assert n6 <= 23, n6  # 6+5+4+3+2+1 + 2; 2^6 shape would be >64


def test_funnel_episodes_differential_random_events(spark):
    """Property differential for the episode semantics: on a
    deterministic pseudo-random panel, funnel_episodes must equal a
    sequential per-user Python reference of the declared greedy rule
    (episode e+1 seeds at the earliest step-1 event strictly beyond
    episode e's window; per-episode chains follow the funnel_steps
    rule). The SAME reference also pins the streaming transition:
    _finalize_and_retain at watermark=infinity must emit the same
    episodes."""
    import random

    from sfdata_wrangler_spark.operators.funnel import funnel_episodes
    from sfdata_wrangler_spark.streaming.funnel_stream import (
        _finalize_and_retain,
    )

    rng = random.Random(1234)
    types = ["A", "B", "C", "D"]
    rows = []
    for u in range(50):
        for _ in range(rng.randint(0, 20)):
            rows.append(
                (
                    u,
                    rng.choice(types),
                    _ts("2024-01-01 00:00:00").replace(
                        day=rng.randint(1, 3),
                        hour=rng.randint(0, 23),
                        minute=rng.randint(0, 59),
                    ),
                )
            )
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    steps = ["A", "B", "C"]
    within = 4 * 3600.0

    def reference(rows):
        by_user = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((t, ts))
        out = set()
        for u, evs in by_user.items():
            firsts = sorted(ts for t, ts in evs if t == steps[0])
            seeds, bound = [], None
            for ts in firsts:
                if bound is None or (ts - bound).total_seconds() > within:
                    seeds.append(ts)
                    bound = ts
            for e, t1 in enumerate(seeds, start=1):
                chain = [t1]
                for step in steps[1:]:
                    prev = chain[-1]
                    if prev is None:
                        chain.append(None)
                        continue
                    cand = [
                        ts
                        for t, ts in evs
                        if t == step
                        and ts >= prev
                        and (ts - t1).total_seconds() <= within
                    ]
                    chain.append(min(cand) if cand else None)
                out.add((u, e, *chain))
        return out

    expected = reference(rows)
    got = {
        (r["user_id"], r["episode"], r["t1"], r["t2"], r["t3"])
        for r in funnel_episodes(
            ev, steps, within_seconds=within, max_episodes=12
        ).collect()
    }
    assert got == expected
    # non-degenerate: the panel must actually contain multi-episode users
    assert any(e >= 2 for _, e, *_ in expected)

    # streaming transition, closed-dataset limit: feed each user's
    # full history, advance the watermark past everything, and the
    # emitted chains must be the same episodes in order
    within_us = int(within * 1_000_000)
    by_user = {}
    for u, t, ts in rows:
        if t in steps:
            by_user.setdefault(u, [[] for _ in steps])[
                steps.index(t)
            ].append(int(ts.timestamp() * 1_000_000))
    stream_out = set()
    for u, lists in by_user.items():
        chains, retained, timeout = _finalize_and_retain(
            lists, wm_us=2**62, within_us=within_us
        )
        assert retained == [[] for _ in steps] and timeout is None
        for e, c in enumerate(chains, start=1):
            stream_out.add((u, e, *c))
    expected_us = {
        (
            u,
            e,
            *[
                None if t is None else int(t.timestamp() * 1_000_000)
                for t in chain
            ],
        )
        for (u, e, *chain) in expected
    }
    assert stream_out == expected_us
