"""GTFS feed ingest (S5/J7, SURVEY.md §2.1/§2.3).

The reference walks a ``transitfeed`` object graph record-at-a-time
(``GTFSHelper.py:324-527``). Spark-first: read the feed's member files
as CSV DataFrames and reproduce the denormalization with JOINS —
trips⨝routes⨝calendar, stop_times⨝stops, fare_rules⨝fare_attributes —
then compute per-trip fields (TOD from first departure, SOL/EOL,
headways) with window functions. Every join side except stop_times is
dimension-sized → broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.datetime_fns import tod_period

MEMBER_FILES = [
    "agency",
    "routes",
    "trips",
    "stop_times",
    "stops",
    "calendar",
    "fare_attributes",
    "fare_rules",
    "shapes",
]


def read_gtfs_feed(spark: SparkSession, feed_dir: str) -> dict[str, DataFrame]:
    """Read an (unzipped) GTFS feed directory. Missing optional members
    are simply absent from the returned dict."""
    out = {}
    for name in MEMBER_FILES:
        path = os.path.join(feed_dir, f"{name}.txt")
        if os.path.exists(path):
            out[name] = (
                spark.read.option("header", "true")
                .option("inferSchema", "false")
                .csv(path)
            )
    return out


def _service_dow(calendar: DataFrame) -> DataFrame:
    """service_id → DOW class 1/2/3 (GTFSHelper.py:107-122): weekday
    service if monday=1, Saturday if saturday=1 (and not weekday),
    Sunday otherwise."""
    return calendar.select(
        "service_id",
        F.when(F.col("monday") == "1", 1)
        .when(F.col("saturday") == "1", 2)
        .otherwise(3)
        .alias("DOW"),
    )


def _gtfs_seconds(col: F.Column) -> F.Column:
    """'HH:MM:SS' (HH may exceed 23) → seconds since service midnight."""
    p = F.split(col, ":")
    return (
        p.getItem(0).cast("int") * 3600
        + p.getItem(1).cast("int") * 60
        + p.getItem(2).cast("int")
    )


def build_trip_stops(feeds: dict[str, DataFrame]) -> DataFrame:
    """Denormalized trip-stop table — the reference's GTFS dataframe
    (``GTFSHelper.py:375-527``) built from joins + windows:

    one row per (trip, stop-seq) with route/service/fare attributes,
    TOD from the trip's first departure, SOL/EOL flags, scheduled
    DWELL/RUNTIME, and HEADWAY_S per (route, dir, headsign, seq).
    """
    trips = feeds["trips"]
    stop_times = feeds["stop_times"]
    routes = feeds["routes"]
    stops = feeds["stops"]
    calendar = feeds["calendar"]

    st = stop_times.select(
        "trip_id",
        F.col("stop_id"),
        F.col("stop_sequence").cast("int").alias("SEQ"),
        _gtfs_seconds(F.col("arrival_time")).alias("ARRIVAL_SEC"),
        _gtfs_seconds(F.col("departure_time")).alias("DEPARTURE_SEC"),
    )

    trip_dim = (
        trips.join(F.broadcast(routes), "route_id")
        .join(F.broadcast(_service_dow(calendar)), "service_id")
        .select(
            "trip_id",
            "route_id",
            "service_id",
            "DOW",
            F.upper(F.trim(F.col("route_short_name"))).alias(
                "ROUTE_SHORT_NAME"
            ),
            F.col("route_type").cast("int").alias("ROUTE_TYPE"),
            F.col("direction_id").cast("int").alias("DIR"),
            F.coalesce(F.col("trip_headsign"), F.lit("")).alias(
                "TRIP_HEADSIGN"
            ),
        )
    )

    # fares: fare_rules maps route→fare_id; fare_attributes carries price
    if "fare_rules" in feeds and "fare_attributes" in feeds:
        fares = feeds["fare_rules"].join(
            feeds["fare_attributes"], "fare_id"
        ).select("route_id", F.col("price").cast("double").alias("FARE"))
        trip_dim = trip_dim.join(F.broadcast(fares), "route_id", "left")
    else:
        trip_dim = trip_dim.withColumn("FARE", F.lit(None).cast("double"))

    ts = st.join(F.broadcast(trip_dim), "trip_id").join(
        F.broadcast(
            stops.select(
                "stop_id",
                F.upper(F.trim(F.col("stop_name"))).alias("STOPNAME"),
                F.col("stop_lat").cast("double").alias("STOP_LAT"),
                F.col("stop_lon").cast("double").alias("STOP_LON"),
            )
        ),
        "stop_id",
        "left",
    )

    wtrip = Window.partitionBy("trip_id")
    wseq = wtrip.orderBy("SEQ")
    ts = (
        ts.withColumn("SOL", (F.col("SEQ") == F.min("SEQ").over(wtrip)).cast("int"))
        .withColumn("EOL", (F.col("SEQ") == F.max("SEQ").over(wtrip)).cast("int"))
        .withColumn(
            "TOD",
            tod_period(
                (F.floor(F.min("DEPARTURE_SEC").over(wtrip) / 3600) * 100
                 + F.floor((F.min("DEPARTURE_SEC").over(wtrip) % 3600) / 60)
                 ).cast("int")
            ),
        )
        # TRIP id '{firstDepHHMM}_{firstSeq}' (GTFSHelper.py:431,
        # SFMuniDataExpander.py:55-63)
        .withColumn(
            "TRIP",
            F.concat_ws(
                "_",
                F.lpad(
                    (
                        F.floor(F.min("DEPARTURE_SEC").over(wtrip) / 3600) * 100
                        + F.floor(
                            (F.min("DEPARTURE_SEC").over(wtrip) % 3600) / 60
                        )
                    ).cast("int").cast("string"),
                    4,
                    "0",
                ),
                F.min("SEQ").over(wtrip).cast("string"),
            ),
        )
        .withColumn("DWELL_S", (F.col("DEPARTURE_SEC") - F.col("ARRIVAL_SEC")) / 60.0)
        .withColumn(
            "RUNTIME_S",
            F.coalesce(
                (F.col("ARRIVAL_SEC") - F.lag("DEPARTURE_SEC").over(wseq)) / 60.0,
                F.lit(0.0),
            ),
        )
        .withColumn("TRIP_STOPS", F.lit(1))
        .withColumn("OBSERVED", F.lit(0))
    )

    # scheduled headway (W1, GTFSHelper.py:87-104): minutes since the
    # previous trip's departure at the same stop of the same service
    whead = Window.partitionBy(
        "ROUTE_SHORT_NAME", "DIR", "TRIP_HEADSIGN", "SEQ", "DOW"
    ).orderBy("DEPARTURE_SEC", "trip_id")
    ts = ts.withColumn(
        "HEADWAY_S",
        (F.col("DEPARTURE_SEC") - F.lag("DEPARTURE_SEC").over(whead)) / 60.0,
    )
    return ts


def gtfs_system_totals(trip_stops: DataFrame) -> DataFrame:
    """Scheduled system totals per (DOW, ROUTE_TYPE)
    (``GTFSHelper.py:260-321``): trips, trip-stops, service hours."""
    return trip_stops.groupBy("DOW", "ROUTE_TYPE").agg(
        F.countDistinct("trip_id").alias("TRIPS"),
        F.count(F.lit(1)).alias("TRIP_STOPS"),
        F.sum(F.col("RUNTIME_S") + F.col("DWELL_S")).alias("SERVMIN_S"),
    )
