"""Watermarked tumbling-window aggregation (SURVEY.md §7.8).

The canonical late-data shape for event streams: ``withWatermark`` +
``F.window`` groupBy. In append mode a window is emitted exactly once,
when the watermark passes its end; events arriving later than the
watermark are DROPPED (the documented trade: bounded state vs
completeness). The same function runs on batch DataFrames — where no
watermark applies and every event counts — so tests can show the
batch/stream delta is exactly the dropped-late rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "user_id",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = "value",
    slide: str | None = None,
) -> DataFrame:
    """Per-(key, window) event counts/sums with late-data handling on
    streams. ``slide=None`` gives tumbling windows; a slide shorter
    than ``window`` gives overlapping sliding windows (each event then
    lands in window/slide windows — state grows by the same factor,
    the documented cost of overlap). Output: key, window_start,
    window_end, n_events [, total_value]."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    keys = [F.col(key_col)] if key_col else []
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.groupBy(*keys, win)
        .agg(*aggs)
        .select(
            *([key_col] if key_col else []),
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            *(["total_value"] if value_col else []),
        )
    )
