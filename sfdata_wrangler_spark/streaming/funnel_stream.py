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

Emission is timeout-driven (append mode): one row per finalized
funnel EPISODE with the greedy chain times in epoch microseconds,
nulls after the break — computed by the SAME sequential rule the
batch operator and its DuckDB oracle state, differential-tested in
tests/test_streaming_funnel.py.

Episode semantics (the one deliberate divergence from batch): after
a user's funnel finalizes and its state is dropped, a LATER step-1
event opens a fresh episode and eventually emits a second row. The
batch operator, given the full closed dataset, keys everything off
the single global min t1; an unbounded stream cannot (suppressing
re-emission would need a per-user tombstone retained forever).
Consumers wanting batch parity keep the min-t1 row per user.
"""

from __future__ import annotations

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
        if state.hasTimedOut:
            if state.exists:
                lists = [list(x) if x is not None else [] for x in state.get]
                state.remove()
                chain = _chain(lists, within_us)
                if chain:  # non-empty chain is always length k
                    row = {user_col: [user]}
                    for i in range(k):
                        row[f"t{i + 1}_us"] = [chain[i]]
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
            # GC horizon for step-1-less users, measured from the MAX
            # retained time (not just this batch's latest): a retained
            # step-i time t only ever qualifies under a future t1 <= t,
            # and any future t1 arrives with ts above the watermark —
            # so once the watermark clears max(retained) + within,
            # nothing here can ever chain
            retained = [t for lst in lists for t in lst]
            horizon = max(retained + [latest]) + within_us

        state.update(tuple(lists))
        # clamp: the computed horizon can sit BELOW the current
        # watermark (other users advanced it while this user received
        # a post-window event) and setTimeoutTimestamp would then
        # throw and kill the query — the classic applyInPandasWithState
        # trap. Clamped to watermark+1 the overdue finalization fires
        # on the next trigger instead.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(horizon // 1000 + 1, wm + 1))

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
