"""Custom stateful streaming sessionization via
``applyInPandasWithState`` (SURVEY.md §7.8).

``session_window`` (sessionize_stream.py) covers gap-based sessions;
this operator is the general form for session rules the built-in
cannot express (the taxi kernel's status-flip / position-jump /
stationary-time breaks, Clipper's attribute carry-over). State per
entity = the open session's accumulator; closed sessions are emitted
as their closing event arrives (or on event-time timeout).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# open-session accumulator carried between micro-batches
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value", DoubleType()),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization as a custom stateful operator.

    Emits one row per CLOSED session (closed by a later event beyond
    the gap, or by event-time timeout once the watermark passes).
    Differential-tested against the batch cumsum-of-breaks kernel.
    """
    gap_us = int(gap_minutes * 60_000_000)

    def proc(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start_us": [s],
                        "session_end_us": [e],
                        "n_events": [n],
                        "session_value": [v],
                    }
                )
            return

        rows = pd.concat(list(pdfs)).sort_values([ts_col, "event_id"])
        # normalize to ns first: pandas may deliver datetime64[ns] or
        # [us] depending on the Arrow path, and int64-casting them
        # differs by 1000x
        ts_us = (
            pd.to_datetime(rows[ts_col]).astype("datetime64[ns]").astype("int64")
            // 1000
        ).to_list()
        vals = rows[value_col].to_list()

        cur = list(state.get) if state.exists else None
        closed = []
        for t, v in zip(ts_us, vals):
            if cur is None:
                cur = [t, t, 1, float(v)]
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = [t, t, 1, float(v)]
            else:
                cur[1] = t
                cur[2] += 1
                cur[3] += float(v)
        state.update(tuple(cur))
        # close the open session if the watermark already passed it.
        # No watermark clamp needed HERE (unlike funnel_stream.py):
        # this timestamp derives from cur[1] = the last event of THIS
        # batch, and late-row filtering guarantees every delivered
        # event is at or above the current watermark, so end+gap is
        # always ahead of it. The funnel's horizon, by contrast, is
        # anchored at a possibly ancient t1 and CAN trail the
        # watermark — that one must clamp.
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(entity_col)
        .applyInPandasWithState(
            proc,
            SESSION_OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
