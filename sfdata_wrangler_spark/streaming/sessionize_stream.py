"""Structured Streaming sessionization (SURVEY.md §7.8).

The reference has no streaming operators — but its Clipper/taxi
sessionization logic is the canonical stateful-streaming shape. This
is the Spark-native formulation: ``session_window`` (gap-based) over a
watermarked event stream, producing per-session aggregates that match
the batch cumsum-of-breaks kernel (operators/windows.sessionize) on
the same data.

Semantics note: ``session_window(ts, gap)`` closes a session when the
next event is ≥ gap away; the batch kernel breaks when the gap is
strictly > threshold. Identical except for events at EXACTLY the gap
boundary (measure-zero for real timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_stats(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-(entity, session) aggregates over a (possibly streaming)
    DataFrame. Works identically on batch DataFrames (for differential
    testing) and on ``readStream`` sources with late-data handling via
    the watermark.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("session_value"))
    return (
        events.groupBy(
            F.col(entity_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(*aggs)
        .drop("session_window")
    )
