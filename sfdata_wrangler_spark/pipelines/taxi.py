"""Taxi GPS trip identification + link travel times (SURVEY.md
W6/P6/P7/A1/A8, ``TaxiDataHelper.py:115-541``).

The reference makes three sorted passes per (cab, date) with
``iterrows``; here it is one window pass per cab-day computing deltas,
break flags (status flip / time gap / position jump / long-stationary)
and a cumulative-sum trip id, then trip-level filters via window
aggregates — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# thresholds (``TaxiDataHelper.py:63-88``)
MAX_GAP_SECONDS = 300.0
MAX_JUMP_FEET = 7500.0
MAX_STATIONARY_SECONDS = 180.0
STATIONARY_SPEED_MPH = 2.0
MIN_TRIP_POINTS = 2
MIN_TRIP_FEET = 500.0
FPS_TO_MPH = 0.681818

SF_BBOX = (-122.53, 37.70, -122.35, 37.83)  # lon/lat box (HwyNetwork.py:79-92)


def geofence(df: DataFrame, lon: str = "longitude", lat: str = "latitude") -> DataFrame:
    """P6 point-in-bounding-box filter — pushed to the parquet scan."""
    x0, y0, x1, y1 = SF_BBOX
    return df.where(
        (F.col(lon) > x0) & (F.col(lon) < x1) & (F.col(lat) > y0) & (F.col(lat) < y1)
    )


def identify_gps_trips(
    df: DataFrame,
    cab_col: str = "cab_id",
    ts_col: str = "time",
    x_col: str = "x",
    y_col: str = "y",
    status_col: str = "status",
) -> DataFrame:
    """Segment GPS pings into trips (W6). Expects projected feet
    coordinates (x, y). Returns pings + feet/seconds/speed deltas,
    trip_id, and per-trip num_points / trip_length, with the
    reference's trip filters applied (>1 point, >500 ft)."""
    w = Window.partitionBy(cab_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    pts = (
        df.withColumn("seconds", (us - F.lag(us).over(w)) / 1000000.0)
        .withColumn("feet", F.sqrt(dx * dx + dy * dy))
        .withColumn(
            "speed_mph",
            F.when(
                F.col("seconds") > 0,
                F.col("feet") / F.col("seconds") * FPS_TO_MPH,
            ),
        )
        .withColumn(
            "status_flip",
            F.col(status_col) != F.lag(status_col).over(w),
        )
    )
    # stationary-run accumulation: a run of slow points; time inside
    # the run accumulates until movement resets it
    pts = pts.withColumn(
        "moving",
        F.coalesce(F.col("speed_mph") >= STATIONARY_SPEED_MPH, F.lit(True)),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = pts.withColumn(
        "move_run", F.sum(F.when(F.col("moving"), 1).otherwise(0)).over(wrun)
    )
    wstat = Window.partitionBy(cab_col, "move_run").orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pts = pts.withColumn(
        "stationary_sec",
        F.sum(F.when(~F.col("moving"), F.col("seconds")).otherwise(0.0)).over(wstat),
    )

    is_break = (
        F.col("status_flip")
        | (F.col("seconds") > MAX_GAP_SECONDS)
        | (F.col("feet") > MAX_JUMP_FEET)
        | (F.col("stationary_sec") > MAX_STATIONARY_SECONDS)
    )
    pts = pts.withColumn(
        "trip_id",
        (
            F.lit(1)
            + F.sum(F.when(is_break, 1).otherwise(0)).over(wrun)
        ).cast("bigint"),
    )

    # A8 trip-level annotation broadcast back to rows (window, no join)
    wtrip = Window.partitionBy(cab_col, "trip_id")
    pts = pts.withColumn("num_points", F.count(F.lit(1)).over(wtrip)).withColumn(
        "trip_length",
        F.sum(
            # distance within the trip only (first point's delta
            # belongs to the previous trip)
            F.when(~F.coalesce(is_break, F.lit(False)), F.col("feet"))
        ).over(wtrip),
    )
    return pts.where(
        (F.col("num_points") >= MIN_TRIP_POINTS)
        & (F.col("trip_length") > MIN_TRIP_FEET)
    )


def aggregate_link_times(traversals: DataFrame) -> DataFrame:
    """A1: link travel-time rollup — count / mean / stddev / p95 per
    (link_id, hour), keeping only high-coverage traversals (P7).

    p95 uses Spark's exact ``percentile`` (matches numpy's linear
    interpolation, ``TaxiDataHelper.py:50-54``); swap to
    ``percentile_approx`` at extreme scale.
    """
    return (
        traversals.where(F.col("traversal_ratio") > 0.75)
        .groupBy("link_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("observations"),
            F.avg("travel_time").alias("tt_mean"),
            F.stddev("travel_time").alias("tt_std"),
            F.expr("percentile(travel_time, 0.95)").alias("tt_95"),
        )
    )
