"""Watermarked stream-stream joins (event attribution).

The remaining Structured Streaming join shape this engine's streaming
surface hadn't demonstrated: joining TWO unbounded streams. Spark
buffers both sides as state; the join stays feasible because the
time-range predicate plus both watermarks bound how long a row can
possibly match — state older than (watermark − join window) is
evicted. Without the time bound the state is unbounded and the query
is rejected; the bound is not an optimization, it IS the semantics.

The same function runs on batch DataFrames (no watermark applied), so
tests can assert batch ≡ stream on bounded data — and the batch form
is declared as a hash-exact oracle query (j12_event_attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_events(
    triggers: DataFrame,
    outcomes: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """All (trigger, outcome) pairs for the same user with the outcome
    inside ``(trigger.ts, trigger.ts + max_delay]`` — the attribution
    join. Returns ``(user_id, trigger_id, outcome_id, delay_us)``.

    Streaming: both inputs must already be event streams; watermarks
    are applied here and the interval condition bounds the join state
    on both sides. Batch: identical semantics, no state.
    """
    t = triggers.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("trigger_id"),
        F.col(ts_col).alias("t_ts"),
    )
    o = outcomes.select(
        F.col(user_col).alias("o_user_id"),
        F.col(id_col).alias("outcome_id"),
        F.col(ts_col).alias("o_ts"),
    )
    if triggers.isStreaming:
        t = t.withWatermark("t_ts", watermark)
    if outcomes.isStreaming:
        o = o.withWatermark("o_ts", watermark)
    cond = (
        (t.user_id == o.o_user_id)
        & (o.o_ts > t.t_ts)
        & (o.o_ts <= t.t_ts + F.expr(f"INTERVAL {max_delay}"))
    )
    return t.join(o, cond).select(
        "user_id",
        "trigger_id",
        "outcome_id",
        (F.unix_micros("o_ts") - F.unix_micros("t_ts")).alias("delay_us"),
    )


def unattributed_triggers(
    triggers: DataFrame,
    outcomes: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Stream-stream LEFT OUTER attribution: every trigger, with its
    outcome id where one landed inside ``(t_ts, t_ts + max_delay]``
    and NULL where none did — the abandoned-cart / no-conversion
    detection shape.

    The outer side is what makes this a distinct Structured Streaming
    capability: a null-padded row can only be emitted once BOTH
    watermarks have passed the trigger's join window (before that, a
    matching outcome could still arrive), so unmatched rows surface
    with watermark latency — correctness-mandated, not an
    implementation lag. Matched rows stream out as in the inner join.
    On batch inputs the same function is a plain left join (no
    emission delay); tests assert the stream's matched set equals the
    batch's, and that its null set equals exactly the batch nulls
    whose windows closed before the final watermark.
    """
    t = triggers.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("trigger_id"),
        F.col(ts_col).alias("t_ts"),
    )
    o = outcomes.select(
        F.col(user_col).alias("o_user_id"),
        F.col(id_col).alias("outcome_id"),
        F.col(ts_col).alias("o_ts"),
    )
    if triggers.isStreaming:
        t = t.withWatermark("t_ts", watermark)
    if outcomes.isStreaming:
        o = o.withWatermark("o_ts", watermark)
    cond = (
        (t.user_id == o.o_user_id)
        & (o.o_ts > t.t_ts)
        & (o.o_ts <= t.t_ts + F.expr(f"INTERVAL {max_delay}"))
    )
    return t.join(o, cond, "leftOuter").select(
        "user_id",
        "trigger_id",
        "t_ts",
        "outcome_id",
        (F.unix_micros("o_ts") - F.unix_micros("t_ts")).alias("delay_us"),
    )
