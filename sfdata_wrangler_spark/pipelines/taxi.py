"""Taxi GPS trip identification + link travel times (SURVEY.md
W6/P6/P7/A1/A8, ``TaxiDataHelper.py:115-541``).

The reference makes three sorted passes per (cab, date) with
``iterrows``; here it is one window pass per cab-day computing deltas,
break flags (status flip / time gap / position jump / long-stationary)
and a cumulative-sum trip id, then trip-level filters via window
aggregates — no Python in the loop.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)
from ..operators.skew import join_back_nullsafe

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
    strategy: str = "plain",
    knee_rows: int | None = None,
    bucket_minutes: float = 1440.0,
) -> DataFrame:
    """Segment GPS pings into trips (W6). Expects projected feet
    coordinates (x, y). Returns pings + feet/seconds/speed deltas,
    trip_id, and per-trip num_points / trip_length, with the
    reference's trip filters applied (>1 point, >500 ft).

    ``strategy``: "plain" (default — per-cab windows, one shuffle) /
    "bucketed" (the skew-immune twin, :func:`_identify_gps_trips_bucketed`)
    / "auto" (VERDICT r12 ask #2: one dimension-sized pre-flight —
    ``skew.max_partition_rows`` over the cab column — picks bucketed
    iff the hottest cab exceeds ``knee_rows``, defaulting to
    ``skew.default_knee_rows`` x ``skew.PIPELINE_KNEE_FACTOR`` (the
    full pipeline's measured ~8M-hot-row crossover at local[32] —
    tools/pipeline_skew_probe.py — 8x the bare-operator knee), and
    LOGS the pick).
    Requires non-null timestamps for the bucketed form (a GPS ping
    without a time); trip ids and counts are exact integers in both
    forms, ``stationary_sec``/``trip_length`` are float sums whose
    accumulation ORDER differs between the forms — equal to within
    ulps, bitwise-equal whenever the addends are exactly
    representable (whole-second timestamps)."""
    from ..operators.skew import (
        PIPELINE_KNEE_FACTOR,
        resolve_window_strategy,
    )

    strategy = resolve_window_strategy(
        df, [cab_col], strategy, knee_rows, _log, "identify_gps_trips",
        knee_factor=PIPELINE_KNEE_FACTOR, ts_col=ts_col,
    )
    if strategy == "bucketed":
        return _identify_gps_trips_bucketed(
            df, cab_col, ts_col, x_col, y_col, status_col, bucket_minutes
        )
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


def _identify_gps_trips_bucketed(
    df: DataFrame,
    cab_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    status_col: str,
    bucket_minutes: float,
) -> DataFrame:
    """Skew-immune :func:`identify_gps_trips`: same columns and trip
    semantics, but no window ever partitions on the bare cab — a
    fleet's hot cab (or a feed where one vehicle dominates) otherwise
    lands its whole history on ONE task and AQE cannot split a window
    partition. The sessionize_bucketed construction, generalized to
    the taxi chain's three levels of carried state:

    1. local lags within (cab, time-bucket); each bucket's FIRST row
       repairs its lag from a per-(cab, bucket) last-row summary
       (one row per bucket — timeline-sized, hot-cab-safe) lagged per
       cab;
    2. ``move_run`` = local cumsum of moving flags + per-bucket
       offsets (exact integers);
    3. ``stationary_sec`` = local cumsum within
       (cab, move_run, bucket) + per-(cab, move_run) bucket offsets —
       a run that spans buckets accumulates across them exactly as
       the plain form's (cab, move_run) window does;
    4. ``trip_id`` = 1 + local break cumsum + per-bucket offsets;
    5. trip stats switch from a (cab, trip) window to groupBy +
       join-back — the join is AQE-skew-splittable where a window
       partition never is (the adversarial all-one-trip cab).

    Every id/count is exact; the two float accumulations
    (``stationary_sec``, ``trip_length``) sum in bucket-grouped order
    instead of row order — equal within ulps (see
    :func:`identify_gps_trips`'s docstring for when that matters:
    only if a trip sits within one ulp of the 180 s / 500 ft
    thresholds)."""
    from ..operators._scratch import reject_scratch_columns

    reject_scratch_columns(df, "__tx_", "identify_gps_trips(bucketed)")
    us = F.unix_micros(F.col(ts_col))
    bucket_us = int(bucket_minutes * 60_000_000)
    d = (
        df.withColumn("__tx_us", us)
        .withColumn("__tx_bucket", F.floor(F.col("__tx_us") / bucket_us))
    )

    wloc = Window.partitionBy(cab_col, "__tx_bucket").orderBy(ts_col)
    wcum = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        d.withColumn("__tx_prev_us", F.lag("__tx_us").over(wloc))
        .withColumn("__tx_prev_x", F.lag(x_col).over(wloc))
        .withColumn("__tx_prev_y", F.lag(y_col).over(wloc))
        .withColumn("__tx_prev_st", F.lag(status_col).over(wloc))
        .withColumn("__tx_rn", F.row_number().over(wloc))
    )

    # summary 1: last-row state per (cab, bucket), lagged per cab.
    # ONE max_by over a struct of all four carried fields, not four
    # independent max_bys (code-review r13 #1): under timestamp ties
    # at a bucket's end, independent aggregates could each resolve the
    # tie differently and synthesize a mixed-row carry (x from one
    # ping, status from another) that matches no real ping. A single
    # struct pick is still tie-nondeterministic — exactly like the
    # plain form's ts-only ordering — but always a REAL row.
    wsum = Window.partitionBy(cab_col).orderBy("__tx_bucket")
    s1 = d.groupBy(cab_col, "__tx_bucket").agg(
        F.max_by(
            F.struct(
                F.col("__tx_us").alias("us"),
                F.col(x_col).alias("x"),
                F.col(y_col).alias("y"),
                F.col(status_col).alias("st"),
            ),
            F.col("__tx_us"),
        ).alias("__tx_last")
    )
    s1 = s1.select(
        cab_col,
        "__tx_bucket",
        F.lag("__tx_last.us").over(wsum).alias("__tx_c_us"),
        F.lag("__tx_last.x").over(wsum).alias("__tx_c_x"),
        F.lag("__tx_last.y").over(wsum).alias("__tx_c_y"),
        F.lag("__tx_last.st").over(wsum).alias("__tx_c_st"),
    )
    d = join_back_nullsafe(d, s1, [cab_col, "__tx_bucket"], "__tx_k1_")

    first = F.col("__tx_rn") == 1
    prev_us = F.when(first, F.col("__tx_c_us")).otherwise(F.col("__tx_prev_us"))
    prev_x = F.when(first, F.col("__tx_c_x")).otherwise(F.col("__tx_prev_x"))
    prev_y = F.when(first, F.col("__tx_c_y")).otherwise(F.col("__tx_prev_y"))
    prev_st = F.when(first, F.col("__tx_c_st")).otherwise(F.col("__tx_prev_st"))
    dx = F.col(x_col) - prev_x
    dy = F.col(y_col) - prev_y
    pts = (
        d.withColumn("seconds", (F.col("__tx_us") - prev_us) / 1000000.0)
        .withColumn("feet", F.sqrt(dx * dx + dy * dy))
        .withColumn(
            "speed_mph",
            F.when(
                F.col("seconds") > 0,
                F.col("feet") / F.col("seconds") * FPS_TO_MPH,
            ),
        )
        .withColumn("status_flip", F.col(status_col) != prev_st)
        .withColumn(
            "moving",
            F.coalesce(
                F.col("speed_mph") >= STATIONARY_SPEED_MPH, F.lit(True)
            ),
        )
    )

    # move_run: local cumsum + per-bucket offsets (exact ints)
    mv = F.when(F.col("moving"), 1).otherwise(0)
    pts = pts.withColumn("__tx_mv_loc", F.sum(mv).over(wcum))
    s2 = pts.groupBy(cab_col, "__tx_bucket").agg(
        F.sum(mv).alias("__tx_mv_n")
    )
    s2 = s2.select(
        cab_col,
        "__tx_bucket",
        F.coalesce(
            F.sum("__tx_mv_n").over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__tx_mv_off"),
    )
    pts = join_back_nullsafe(pts, s2, [cab_col, "__tx_bucket"], "__tx_k2_")
    pts = pts.withColumn(
        "move_run", F.col("__tx_mv_loc") + F.col("__tx_mv_off")
    )

    # stationary_sec: local cumsum within (cab, move_run, bucket) +
    # per-(cab, move_run) earlier-bucket offsets — a run spanning
    # buckets keeps accumulating, exactly as the plain (cab, move_run)
    # window does
    stat = F.when(~F.col("moving"), F.col("seconds")).otherwise(0.0)
    wrun_loc = Window.partitionBy(cab_col, "move_run", "__tx_bucket").orderBy(
        ts_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = pts.withColumn("__tx_st_loc", F.sum(stat).over(wrun_loc))
    s3 = pts.groupBy(cab_col, "move_run", "__tx_bucket").agg(
        F.sum(stat).alias("__tx_st_n")
    )
    wrun_sum = Window.partitionBy(cab_col, "move_run").orderBy("__tx_bucket")
    s3 = s3.select(
        cab_col,
        "move_run",
        "__tx_bucket",
        F.coalesce(
            F.sum("__tx_st_n").over(
                wrun_sum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("__tx_st_off"),
    )
    pts = join_back_nullsafe(
        pts, s3, [cab_col, "move_run", "__tx_bucket"], "__tx_k3_"
    )
    pts = pts.withColumn(
        "stationary_sec", F.col("__tx_st_loc") + F.col("__tx_st_off")
    )

    is_break = (
        F.col("status_flip")
        | (F.col("seconds") > MAX_GAP_SECONDS)
        | (F.col("feet") > MAX_JUMP_FEET)
        | (F.col("stationary_sec") > MAX_STATIONARY_SECONDS)
    )
    brk = F.when(is_break, 1).otherwise(0)
    pts = pts.withColumn("__tx_tr_loc", F.sum(brk).over(wcum))
    s4 = pts.groupBy(cab_col, "__tx_bucket").agg(F.sum(brk).alias("__tx_tr_n"))
    s4 = s4.select(
        cab_col,
        "__tx_bucket",
        F.coalesce(
            F.sum("__tx_tr_n").over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__tx_tr_off"),
    )
    pts = join_back_nullsafe(pts, s4, [cab_col, "__tx_bucket"], "__tx_k4_")
    pts = pts.withColumn(
        "trip_id",
        (F.lit(1) + F.col("__tx_tr_loc") + F.col("__tx_tr_off")).cast(
            "bigint"
        ),
    )

    # trip stats: groupBy + join-back (AQE-splittable, unlike a window)
    stats = pts.groupBy(cab_col, "trip_id").agg(
        F.count(F.lit(1)).alias("num_points"),
        F.sum(
            F.when(~F.coalesce(is_break, F.lit(False)), F.col("feet"))
        ).alias("trip_length"),
    )
    pts = join_back_nullsafe(pts, stats, [cab_col, "trip_id"], "__tx_k5_")

    final = list(df.columns) + [
        "seconds", "feet", "speed_mph", "status_flip", "moving",
        "move_run", "stationary_sec", "trip_id", "num_points",
        "trip_length",
    ]
    return pts.select(*final).where(
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
