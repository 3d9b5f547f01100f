"""Source readers: fixed-width ingest and GTFS denormalization."""

import os

from sfdata_wrangler_spark.sources.fixed_width import (
    ColSpec,
    pack_hhmmss,
    read_fixed_width,
)
from sfdata_wrangler_spark.sources.gtfs import build_trip_stops, read_gtfs_feed

FWF_SPECS = [
    ColSpec("ROUTE", 0, 5, "int"),
    ColSpec("DIR", 5, 7, "int"),
    ColSpec("STOPNAME", 7, 23, "string"),
    ColSpec("ON", 23, 28, "int"),
]


def test_fixed_width_reader(spark, tmp_path):
    """Byte-range parse + type forcing + mid-file-header drop
    (S1, SFMuniDataHelper.py:422-430 semantics)."""
    lines = [
        #0123456789012345678901234567
        "    1 0 MARKET & CASTRO   12",
        "ROUTE D STOPNAME          ON",  # mid-file header → dropped
        "   22 1 24TH & MISSION     7",
    ]
    path = os.path.join(tmp_path, "avl.stp")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    out = read_fixed_width(
        spark, path, FWF_SPECS, required=["ROUTE", "ON"]
    ).collect()
    got = {r.ROUTE: (r.DIR, r.STOPNAME, r.ON) for r in out}
    assert got == {1: (0, "MARKET & CASTRO", 12), 22: (1, "24TH & MISSION", 7)}


def _write_gtfs(tmp_path):
    files = {
        "routes.txt": [
            "route_id,route_short_name,route_type",
            "r1,1,3",
        ],
        "trips.txt": [
            "trip_id,route_id,service_id,direction_id,trip_headsign",
            "t1,r1,wk,0,DOWNTOWN",
            "t2,r1,wk,0,DOWNTOWN",
        ],
        "calendar.txt": [
            "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday",
            "wk,1,1,1,1,1,0,0",
        ],
        "stop_times.txt": [
            "trip_id,stop_id,stop_sequence,arrival_time,departure_time",
            "t1,s1,1,08:00:00,08:01:00",
            "t1,s2,2,08:05:00,08:05:30",
            "t2,s1,1,08:10:00,08:11:00",
            "t2,s2,2,08:15:00,08:15:30",
        ],
        "stops.txt": [
            "stop_id,stop_name,stop_lat,stop_lon",
            "s1,Market & Castro,37.76,-122.43",
            "s2,Market & Church,37.77,-122.42",
        ],
        "fare_attributes.txt": [
            "fare_id,price,currency_type",
            "f1,2.00,USD",
        ],
        "fare_rules.txt": [
            "fare_id,route_id",
            "f1,r1",
        ],
    }
    d = os.path.join(tmp_path, "feed")
    os.makedirs(d)
    for name, rows in files.items():
        with open(os.path.join(d, name), "w") as f:
            f.write("\n".join(rows) + "\n")
    return d


def test_gtfs_trip_stops(spark, tmp_path):
    """Join-based GTFS denormalization (J7) replaces the reference's
    object-graph walk (GTFSHelper.py:324-527)."""
    feeds = read_gtfs_feed(spark, _write_gtfs(tmp_path))
    ts = build_trip_stops(feeds)
    rows = {(r.trip_id, r.SEQ): r for r in ts.collect()}
    assert len(rows) == 4
    r = rows[("t1", 1)]
    assert r.ROUTE_SHORT_NAME == "1" and r.DOW == 1 and r.FARE == 2.0
    assert r.SOL == 1 and r.EOL == 0
    assert rows[("t1", 2)].EOL == 1
    assert r.TOD == "0600-0859"
    assert r.TRIP == "0801_1"
    # headway at s1: t2 departs 10 min after t1
    assert rows[("t2", 1)].HEADWAY_S == 10.0
    assert rows[("t1", 1)].HEADWAY_S is None
    # scheduled runtime: arrival(seq2) − departure(seq1) = 4 min
    assert rows[("t1", 2)].RUNTIME_S == 4.0
    assert rows[("t1", 2)].DWELL_S == 0.5


def test_pack_hhmmss(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(h=14, m=30, s=15)])
    out = df.select(
        pack_hhmmss(F.col("h"), F.col("m"), F.col("s")).alias("p")
    ).collect()
    assert out[0].p == 143015
