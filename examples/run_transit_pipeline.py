"""End-to-end transit pipeline walkthrough (executable documentation).

Mirrors the reference's ``sfdata_wrangler.py clean→gtfs→expand→
aggregate→report`` flow (SURVEY.md §3.1) on a small synthetic feed:

    python examples/run_transit_pipeline.py

1. read a GTFS feed directory → denormalized trip-stops (joins, not
   object traversal)
2. clean AVL observations (QC filters + deterministic dedup)
3. expand: schedule LEFT JOIN observations, runtimes, expansion
   weights
4. run the aggregation cascade to system_day
5. runtime QC gate
6. report views (route profile with running load, performance panel)
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.quality import Check, assert_checks
from sfdata_wrangler_spark.pipelines.cascade import run_cascade
from sfdata_wrangler_spark.pipelines.expansion import expand_and_weight
from sfdata_wrangler_spark.pipelines.reports import route_profile
from sfdata_wrangler_spark.session import get_spark
from sfdata_wrangler_spark.sources.gtfs import build_trip_stops, read_gtfs_feed

GTFS_MEMBERS = {
    "routes.txt": ["route_id,route_short_name,route_type", "r1,1,3"],
    "trips.txt": [
        "trip_id,route_id,service_id,direction_id,trip_headsign",
        "t1,r1,wk,0,DOWNTOWN",
        "t2,r1,wk,0,DOWNTOWN",
        "t3,r1,wk,0,DOWNTOWN",
    ],
    "calendar.txt": [
        "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday",
        "wk,1,1,1,1,1,0,0",
    ],
    "stop_times.txt": [
        "trip_id,stop_id,stop_sequence,arrival_time,departure_time",
        *[
            f"t{t},s{s},{s},08:{10*(t-1)+2*(s-1):02d}:00,08:{10*(t-1)+2*(s-1):02d}:30"
            for t in (1, 2, 3)
            for s in (1, 2, 3)
        ],
    ],
    "stops.txt": [
        "stop_id,stop_name,stop_lat,stop_lon",
        "s1,Market & 1st,37.79,-122.40",
        "s2,Market & 5th,37.78,-122.41",
        "s3,Market & 9th,37.77,-122.42",
    ],
}


def main() -> None:
    spark = get_spark("transit-example", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    service_date = datetime.date(2013, 3, 4)

    # 1. GTFS feed → trip stops
    feed_dir = tempfile.mkdtemp(prefix="gtfs_")
    for name, lines in GTFS_MEMBERS.items():
        with open(os.path.join(feed_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    trip_stops = build_trip_stops(read_gtfs_feed(spark, feed_dir))
    print(f"[1] GTFS trip-stops: {trip_stops.count()} rows")

    sched = trip_stops.select(
        F.lit(service_date).alias("DATE"),
        "DOW",
        "TOD",
        F.lit("SFMTA").alias("AGENCY_ID"),
        "ROUTE_SHORT_NAME",
        "DIR",
        "TRIP",
        "SEQ",
        F.lit(0.3).alias("SERVMILES_S"),
        F.col("RUNTIME_S"),
        F.lit(1).alias("TRIP_STOPS"),
    )

    # 2. observations: trip 1 carries counters (the APC sample)
    t0 = datetime.datetime.combine(service_date, datetime.time(8, 0))
    avl = spark.createDataFrame(
        [
            Row(
                DATE=service_date,
                AGENCY_ID="SFMTA",
                ROUTE_SHORT_NAME="1",
                DIR=0,
                TRIP="0800_1",
                SEQ=s,
                ARRIVAL_TIME=t0 + datetime.timedelta(minutes=2 * (s - 1)),
                DEPARTURE_TIME=t0
                + datetime.timedelta(minutes=2 * (s - 1), seconds=30),
                ON=8 if s == 1 else (4 if s == 2 else 0),
                OFF=0 if s == 1 else (5 if s == 2 else 7),
                LOAD_DEP=8 if s == 1 else (7 if s == 2 else 0),
                SERVMILES=0.3,
            )
            for s in (1, 2, 3)
        ]
    )

    # 3. expand + weight (1 of 3 trips observed → weight 3.0)
    ts = expand_and_weight(sched, avl)
    print(
        "[3] expanded:",
        ts.count(),
        "rows; observed trip weight =",
        ts.where("TRIP_OBSERVED = 1").select("TOD_WEIGHT").first()[0],
    )

    # 4. cascade
    levels = run_cascade(ts)
    system_day = levels["system_day"]
    print("[4] system_day:")
    system_day.show(truncate=False)

    # 5. QC gate (boardings balance alightings after expansion)
    summary = assert_checks(
        system_day,
        [
            Check("boardings_balance", F.col("ON") == F.col("OFF")),
            Check("speed_positive", F.col("RUNSPEED") > 0),
        ],
    )
    print("[5] QC:")
    summary.show(truncate=False)

    # 6. report view
    profile = route_profile(
        levels["rs_tod"].withColumn(
            "MONTH", F.date_trunc("month", "DATE").cast("date")
        ),
        route="1",
        direction=0,
    )
    print("[6] route profile (running load):")
    profile.select("SEQ", "ON", "OFF", "LOAD_DEP_RECOMPUTED").orderBy(
        "SEQ"
    ).show()


if __name__ == "__main__":
    main()
