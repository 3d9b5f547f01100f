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

State per user is one int64 time list per step, pruned to the only
times that can still matter:

- step 1 keeps its minimum only (a later arrival can only replace it
  with an earlier time);
- step i>1 keeps times ≤ t1 + within (t1 only moves EARLIER as data
  arrives, so the admission window's right edge only moves earlier —
  anything beyond it now is beyond it forever).

Users who never produce a step-1 event are garbage-collected by the
same timeout horizon measured from their latest event: every retained
time is then older than any future t1 could admit (a future step-1
event must carry ts above the watermark that fired the GC, and
retained times sit more than ``within`` below it).

Emission is timeout-driven (append mode): one row per user with the
greedy chain times in epoch microseconds, nulls after the break —
computed by the SAME sequential rule the batch operator and its
DuckDB oracle state, differential-tested in
tests/test_streaming_funnel.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
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


def stateful_funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming funnel: one FINAL row per user who produced a step-1
    event — ``(user, t1_us, ..., tk_us)`` nullable after the chain
    breaks — emitted once the watermark passes ``t1 + within``.

    ``within_seconds`` is required: it is what makes a funnel row
    finalizable on an unbounded stream (without a window, a step
    could complete arbitrarily far in the future and no row could
    ever be emitted)."""
    k = len(steps)
    within_us = int(within_seconds * 1_000_000)
    out_schema = StructType(
        [StructField(user_col, LongType())]
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
        if state.hasTimedOut:
            if state.exists:
                lists = [list(x) if x is not None else [] for x in state.get]
                state.remove()
                chain = _chain(lists, within_us)
                if chain:
                    row = {user_col: [user]}
                    for i in range(k):
                        row[f"t{i + 1}_us"] = [
                            chain[i] if i < len(chain) else None
                        ]
                    yield pd.DataFrame(row)
            return

        rows = pd.concat(list(pdfs))
        ts_us = (
            pd.to_datetime(rows[ts_col]).astype("datetime64[ns]").astype("int64")
            // 1000
        ).to_list()
        kinds = rows[type_col].to_list()

        lists = (
            [list(x) if x is not None else [] for x in state.get]
            if state.exists
            else [[] for _ in range(k)]
        )
        latest = 0
        for t, kind in zip(ts_us, kinds):
            latest = max(latest, t)
            i = step_index.get(kind)
            if i is None:
                continue
            if i == 0:
                # min-only retention
                lists[0] = [min(lists[0] + [t])] if lists[0] else [t]
            else:
                lists[i].append(t)

        # prune step>1 retention to the only-admissible window
        if lists[0]:
            t1 = lists[0][0]
            horizon = t1 + within_us
            for i in range(1, k):
                lists[i] = [t for t in lists[i] if t <= horizon]
        else:
            # GC horizon for step-1-less users: once the watermark
            # passes latest + within, no future t1 can admit anything
            # retained here
            horizon = latest + within_us

        state.update(tuple(lists))
        state.setTimeoutTimestamp(horizon // 1000 + 1)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            proc,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
