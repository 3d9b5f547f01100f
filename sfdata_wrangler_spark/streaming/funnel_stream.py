"""Streaming funnel completion via ``applyInPandasWithState``.

The batch funnel (operators/funnel.funnel_steps) answers "when did
each user hit step i" over a closed dataset. On a live event stream
the same question needs a FINALIZATION rule, because a user's chain
can keep changing while events may still arrive: a late step-1 event
moves t1 earlier, which re-opens earlier-discarded step-2 candidates,
which cascades down the chain. The rule here is the standard
windowed-funnel one: every step must land within ``within_seconds``
of t1, so once the event-time watermark passes ``t1 + within`` no
admissible event can change the chain and the funnel row is FINAL.

State per user is one int64 time list per step, pruned each batch by
ONE retention rule that bounds state on any input (the watermark
delay is the bound — late events below the watermark are dropped by
the engine, so nothing below it can ever create or join an episode):

- a time is retained iff it is at/above the current watermark (a
  future step-1 event, which must arrive above the watermark, could
  still admit it), OR it is an episode SEED (a greedy step-1 episode
  opener), OR it falls inside a retained seed's admission window
  ``[seed, seed + within]``.

Episodes are greedy over step-1 times: the first seed is the minimum,
the next seed is the first step-1 time beyond the previous seed's
window, and so on — the same rule a batch replay of the full stream
would apply per user. An episode is emitted (append mode) as soon as
the watermark passes its horizon ``seed + within``: at timeout, or
inline while processing a batch that observes the watermark already
past it. Multiple pending episodes retained across triggers emit in
order, so a step-1 event that opens a second episode is never lost to
trigger alignment — the state transition is a pure function of
(retained times, new events, watermark), differential-tested in
tests/test_streaming_funnel.py.

Episode semantics (the one deliberate divergence from batch): the
stream emits ONE ROW PER EPISODE — after an episode's window closes,
a later step-1 event opens a fresh episode and emits its own row. The
batch operator, given the full closed dataset, keys everything off
the single global min t1 and emits one row per user. Consumers
wanting batch parity keep the min-t1 row per user.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)


def _chain(step_times: list[list[int]], within_us: int) -> list[int | None]:
    """The batch-identical greedy chain over retained times."""
    if not step_times[0]:
        return []
    t1 = min(step_times[0])
    out: list[int | None] = [t1]
    prev: int | None = t1
    for times in step_times[1:]:
        if prev is None:
            out.append(None)
            continue
        cand = [t for t in times if t >= prev and t - t1 <= within_us]
        nxt = min(cand) if cand else None
        out.append(nxt)
        prev = nxt
    return out


def _finalize_and_retain(
    lists: list[list[int]], wm_us: int, within_us: int
) -> tuple[list[list[int | None]], list[list[int]], int | None]:
    """Pure per-user state transition, unit-testable without Spark.

    1. EMIT every episode whose horizon the watermark has passed
       (greedy seed = min retained step-1 time; all times at or below
       the horizon are consumed — nothing above the watermark can
       rewrite a passed episode, so the row is final).
    2. RETAIN only times that can still matter: at/above the
       watermark (a future step-1 arrives above it and could admit
       them), greedy episode seeds, or times inside a retained seed's
       ``[seed, seed + within]`` window. This bounds state for EVERY
       input shape — including users that only ever produce step-2+
       events, whose times age out as the watermark advances.
    3. Schedule the next wake-up: the first pending horizon when a
       seed is retained, else ``max(retained) + within`` as the GC
       horizon for seedless users (by then nothing retained can
       qualify under any future seed).

    Returns ``(chains, retained_lists, next_timeout_us | None)``;
    all-empty retained lists mean the state can be removed.
    """
    k = len(lists)
    lists = [sorted(set(lst)) for lst in lists]

    chains: list[list[int | None]] = []
    while lists[0] and lists[0][0] + within_us < wm_us:
        horizon = lists[0][0] + within_us
        chains.append(_chain(lists, within_us))
        lists = [[t for t in lst if t > horizon] for lst in lists]

    if lists[0]:
        seeds: list[int] = []
        window_end = None
        for t in lists[0]:
            if window_end is None or t > window_end:
                seeds.append(t)
                window_end = t + within_us
        lists[0] = sorted({t for t in lists[0] if t >= wm_us} | set(seeds))

        def admissible(t: int) -> bool:
            if t >= wm_us:
                return True
            i = bisect_right(seeds, t)
            return i > 0 and t <= seeds[i - 1] + within_us

        for i in range(1, k):
            lists[i] = [t for t in lists[i] if admissible(t)]
        next_timeout = lists[0][0] + within_us
    else:
        for i in range(1, k):
            lists[i] = [t for t in lists[i] if t >= wm_us]
        retained = [t for lst in lists for t in lst]
        next_timeout = (max(retained) + within_us) if retained else None

    return chains, lists, next_timeout


def stateful_funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming funnel: one FINAL row per funnel episode —
    ``(user, t1_us, ..., tk_us)`` nullable after the chain breaks —
    emitted once the watermark passes ``t1 + within``.

    ``within_seconds`` is required: it is what makes a funnel row
    finalizable on an unbounded stream (without a window, a step
    could complete arbitrarily far in the future and no row could
    ever be emitted)."""
    k = len(steps)
    # round, not int: truncation shifts fractional windows by 1 µs
    within_us = round(within_seconds * 1_000_000)
    # preserve the grouping column's real type (string ids are common)
    out_schema = StructType(
        [StructField(user_col, events.schema[user_col].dataType)]
        + [StructField(f"t{i}_us", LongType()) for i in range(1, k + 1)]
    )
    state_schema = StructType(
        [StructField(f"s{i}", ArrayType(LongType())) for i in range(1, k + 1)]
    )
    step_index = {s: i for i, s in enumerate(steps)}

    def proc(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000

        lists = (
            [list(x) if x is not None else [] for x in state.get]
            if state.exists
            else [[] for _ in range(k)]
        )
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            ts_us = (
                pd.to_datetime(rows[ts_col])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1000
            ).to_list()
            for t, kind in zip(ts_us, rows[type_col].to_list()):
                i = step_index.get(kind)
                if i is not None:
                    lists[i].append(t)

        chains, lists, next_timeout = _finalize_and_retain(
            lists, wm_us, within_us
        )

        if any(lists):
            state.update(tuple(lists))
            # clamp: the computed horizon can sit BELOW the current
            # watermark (other users advanced it while this user
            # received a post-window event) and setTimeoutTimestamp
            # would then throw and kill the query — the classic
            # applyInPandasWithState trap. Clamped to watermark+1 the
            # overdue finalization fires on the next trigger instead.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(next_timeout // 1000 + 1, wm_ms + 1)
            )
        elif state.exists:
            state.remove()

        if chains:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(chains),
                    **{
                        f"t{i + 1}_us": [c[i] for c in chains]
                        for i in range(k)
                    },
                }
            )

    return (
        # filter FIRST, watermark on the filtered stream: the stateful
        # operator only needs the funnel's step types (anything else
        # is shuffle volume and state churn — a user with no step
        # events would otherwise still get state and a timeout), and
        # Catalyst pushes the filter below withWatermark anyway, so
        # declaring it upstream states the real semantics: event time
        # — and therefore funnel finalization — advances on STEP
        # events. (A watermark "fed" by non-step events upstream of a
        # filter would be an illusion: the pushed-down filter means
        # they never reach the watermark node.)
        events.where(F.col(type_col).isin(list(steps)))
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            proc,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
