"""End-to-end pipeline tests on FIXTURES.md-shaped synthetic data:
expansion weighting invariants, cascade telescoping, Clipper linked
trips, taxi sessionization."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.pipelines.cascade import run_cascade
from sfdata_wrangler_spark.pipelines.clipper import infer_linked_trips
from sfdata_wrangler_spark.pipelines.expansion import clean_avl, expand_and_weight
from sfdata_wrangler_spark.pipelines.taxi import identify_gps_trips


def _gtfs_fixture(spark):
    """2 trips × 3 stops, one date, one route."""
    rows = []
    for trip, dep0 in [("0800_1", 8 * 60), ("0830_1", 8 * 60 + 30)]:
        for seq in (1, 2, 3):
            rows.append(
                Row(
                    DATE=datetime.date(2013, 3, 4),
                    DOW=1,
                    TOD="0600-0859",
                    AGENCY_ID="SFMTA",
                    ROUTE_SHORT_NAME="1",
                    DIR=0,
                    TRIP=trip,
                    SEQ=seq,
                    SERVMILES_S=0.3,
                    RUNTIME_S=2.0,
                    TRIP_STOPS=1,
                )
            )
    return spark.createDataFrame(rows)


def _avl_fixture(spark):
    """Only the first trip observed."""
    t0 = datetime.datetime(2013, 3, 4, 8, 0)
    rows = []
    for seq in (1, 2, 3):
        arr = t0 + datetime.timedelta(minutes=3 * (seq - 1))
        rows.append(
            Row(
                DATE=datetime.date(2013, 3, 4),
                AGENCY_ID="SFMTA",
                ROUTE_SHORT_NAME="1",
                DIR=0,
                TRIP="0800_1",
                SEQ=seq,
                ARRIVAL_TIME=arr,
                DEPARTURE_TIME=arr + datetime.timedelta(seconds=30),
                ON=5 if seq < 3 else 0,
                OFF=0 if seq == 1 else 5,
                LOAD_DEP=5 if seq == 1 else (5 if seq == 2 else 0),
                SERVMILES=0.3,
            )
        )
    return spark.createDataFrame(rows)


def test_expand_and_weight_invariant(spark):
    ts = expand_and_weight(_gtfs_fixture(spark), _avl_fixture(spark))
    rows = ts.collect()
    assert len(rows) == 6  # schedule preserved (left join)
    obs = {r.TRIP: r.OBSERVED for r in rows}
    assert obs["0800_1"] == 1 and obs["0830_1"] == 0
    # 1 of 2 trips observed → observed rows weight 2.0
    w = {(r.TRIP, r.SEQ): r.TOD_WEIGHT for r in rows}
    assert w[("0800_1", 1)] == 2.0
    assert w[("0830_1", 1)] is None
    # weighted trip-stops == scheduled trip-stops within the cell
    tot = ts.agg(
        F.sum(F.col("TOD_WEIGHT") * F.col("TRIP_STOPS")).alias("w"),
        F.sum("TRIP_STOPS").alias("t"),
    ).collect()[0]
    assert tot.w == tot.t == 6.0


def test_cascade_telescoping(spark):
    """ON/OFF totals survive every cascade level (load-telescoping
    invariant, SURVEY.md §5.3): weighted ON at rs_tod == system."""
    ts = expand_and_weight(_gtfs_fixture(spark), _avl_fixture(spark))
    # cascade expects MONTH + observed metric columns named like the
    # expansion output
    levels = run_cascade(ts)
    rs = levels["rs_tod"]
    sys_tod = levels["system_tod"]
    on_rs = rs.agg(F.sum("ON")).collect()[0][0]
    on_sys = sys_tod.agg(F.sum("ON")).collect()[0][0]
    # 10 boardings observed, weighted ×2 = 20 at every level
    assert on_rs == 20.0
    assert on_sys == 20.0
    assert "RUNSPEED" in sys_tod.columns


def test_clean_avl_filters(spark):
    rows = [
        Row(DATE=datetime.date(2013, 3, 4), ROUTE_AVL=1, DIR=0, TRIP=10,
            SEQ=1, STOP_AVL=100, QC201=0, ARRIVAL_TIME=None, VEHNO=1),
        Row(DATE=datetime.date(2013, 3, 4), ROUTE_AVL=1, DIR=6, TRIP=10,
            SEQ=1, STOP_AVL=100, QC201=0, ARRIVAL_TIME=None, VEHNO=1),  # pull-move
        Row(DATE=datetime.date(2013, 3, 4), ROUTE_AVL=1, DIR=0, TRIP=10,
            SEQ=1, STOP_AVL=100, QC201=99, ARRIVAL_TIME=None, VEHNO=2),  # bad QC
        Row(DATE=datetime.date(2013, 3, 4), ROUTE_AVL=1, DIR=0, TRIP=9999,
            SEQ=1, STOP_AVL=100, QC201=0, ARRIVAL_TIME=None, VEHNO=1),  # bad trip
    ]
    df = spark.createDataFrame(
        rows,
        "DATE: date, ROUTE_AVL: int, DIR: int, TRIP: int, SEQ: int, "
        "STOP_AVL: int, QC201: int, ARRIVAL_TIME: timestamp, VEHNO: int",
    )
    out = clean_avl(df).collect()
    assert len(out) == 1
    assert out[0].VEHNO == 1 and out[0].DIR == 0


def test_clipper_linked_trips(spark):
    t0 = datetime.datetime(2024, 1, 3, 8, 0)  # Wednesday

    def tag(card, seq, minutes, agency):
        return Row(
            ClipperCardID=card,
            TripSequenceID=seq,
            TagOnTime=t0 + datetime.timedelta(minutes=minutes),
            AgencyName=agency,
            RouteName="1",
        )

    df = spark.createDataFrame(
        [
            tag("c1", 1, 0, "SF Muni"),
            tag("c1", 2, 30, "BART"),      # transfer (30 < 90)
            tag("c1", 3, 60, "SF Muni"),   # transfer chain
            tag("c1", 4, 300, "SF Muni"),  # new linked trip
            tag("c2", 1, 0, "BART"),
        ]
    )
    out = infer_linked_trips(df)
    rows = {(r.ClipperCardID, r.TripSequenceID): r for r in out.collect()}
    assert rows[("c1", 1)].LINKED_TRIP_ID == 1
    assert rows[("c1", 3)].LINKED_TRIP_ID == 1
    assert rows[("c1", 4)].LINKED_TRIP_ID == 2
    assert rows[("c1", 2)].From_AgencyName == "SF Muni"
    # linked trip 1 has 2 transfers → leg weight = 7.5/3
    assert rows[("c1", 1)].LINKED_TRANSFERS == 2
    assert abs(rows[("c1", 1)].LINKED_WEIGHT - 7.5 / 3) < 1e-9
    # weights: weekday card-day weight 7.5; single-leg trip keeps it
    assert rows[("c1", 4)].LINKED_WEIGHT == 7.5
    assert rows[("c2", 1)].LINKED_WEIGHT == 7.5


def test_taxi_trip_segmentation(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0)

    def ping(i, sec, x, status):
        return Row(
            cab_id=1,
            time=t0 + datetime.timedelta(seconds=sec),
            x=float(x),
            y=0.0,
            status=status,
        )

    df = spark.createDataFrame(
        [
            # trip 1: moving, metered
            ping(1, 0, 0, "M"),
            ping(2, 60, 2000, "M"),
            ping(3, 120, 4000, "M"),
            # status flip → trip 2 (empty), still moving
            ping(4, 180, 6000, "E"),
            ping(5, 240, 8000, "E"),
            # time gap > 300s → trip 3
            ping(6, 900, 10000, "E"),
            ping(7, 960, 12000, "E"),
        ]
    )
    out = identify_gps_trips(df)
    trips = {r.time: r.trip_id for r in out.collect()}
    assert trips[t0] == trips[t0 + datetime.timedelta(seconds=120)]
    t4 = trips[t0 + datetime.timedelta(seconds=180)]
    assert t4 == trips[t0] + 1
    t6 = trips[t0 + datetime.timedelta(seconds=900)]
    assert t6 == t4 + 1
