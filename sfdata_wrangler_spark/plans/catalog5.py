"""Catalog wave 5: the domain pipelines (§3) as driver-visible
queries over deterministic in-query fixtures, with VALUES-based
DuckDB oracles reimplementing the same semantics in SQL — so the
expansion/Clipper/taxi pipelines are hash-checked per round, not only
unit-tested."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.clipper import infer_linked_trips
from ..pipelines.expansion import expand_and_weight
from ..pipelines.taxi import identify_gps_trips
from .catalog import _register
from ..sources.inline import values_df

_D = datetime.date(2013, 3, 4)
_T = datetime.datetime(2013, 3, 4, 8, 0)

_SCHED_SCHEMA = (
    "DATE: date, DOW: bigint, TOD: string, AGENCY_ID: string, "
    "ROUTE_SHORT_NAME: string, DIR: bigint, TRIP: string, SEQ: bigint, "
    "SERVMILES_S: double, RUNTIME_S: double, TRIP_STOPS: bigint"
)

_AVL_SCHEMA = (
    "DATE: date, AGENCY_ID: string, ROUTE_SHORT_NAME: string, "
    "DIR: bigint, TRIP: string, SEQ: bigint, ARRIVAL_TIME: timestamp, "
    "DEPARTURE_TIME: timestamp, ON: bigint, OFF: bigint, "
    "LOAD_DEP: bigint, SERVMILES: double"
)


def _sched_rows():
    return [
        (_D, 1, "0600-0859", "SFMTA", "1", 0, trip, seq, 0.3, 2.0, 1)
        for trip in ("0800_1", "0830_1")
        for seq in (1, 2, 3)
    ]


def _avl_rows():
    rows = []
    for seq in (1, 2, 3):
        arr = _T + datetime.timedelta(minutes=3 * (seq - 1))
        rows.append(
            (_D, "SFMTA", "1", 0, "0800_1", seq, arr,
             arr + datetime.timedelta(seconds=30),
             5 if seq < 3 else 0, 0 if seq == 1 else 5,
             5 if seq < 3 else 0, 0.3)
        )
    return rows


_EXPANSION_ORACLE = """
WITH sched(trip, seq) AS (
  VALUES ('0800_1', 1), ('0800_1', 2), ('0800_1', 3),
         ('0830_1', 1), ('0830_1', 2), ('0830_1', 3)
), avl(trip, seq, arr, dep) AS (
  VALUES ('0800_1', 1, TIMESTAMP '2013-03-04 08:00:00', TIMESTAMP '2013-03-04 08:00:30'),
         ('0800_1', 2, TIMESTAMP '2013-03-04 08:03:00', TIMESTAMP '2013-03-04 08:03:30'),
         ('0800_1', 3, TIMESTAMP '2013-03-04 08:06:00', TIMESTAMP '2013-03-04 08:06:30')
), joined AS (
  SELECT s.trip, s.seq, a.arr, a.dep,
         CASE WHEN a.trip IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM sched s LEFT JOIN avl a ON s.trip = a.trip AND s.seq = a.seq
), rt AS (
  SELECT *,
         coalesce(greatest(0.0, round((epoch_us(arr) - lag(epoch_us(dep))
           OVER (PARTITION BY trip ORDER BY seq)) / 60000000.0, 2)), 0.0)
           AS runtime,
         max(observed) OVER (PARTITION BY trip) AS trip_observed
  FROM joined
), w AS (
  SELECT *,
         (CASE WHEN trip_observed = 1 THEN 1.0 END)
           * (sum(1.0) OVER ()
              / sum(CASE WHEN trip_observed = 1 THEN 1.0 END * 1.0) OVER ())
           AS tod_weight
  FROM rt
)
SELECT trip, CAST(seq AS BIGINT) AS seq, observed, runtime, tod_weight
FROM w
"""


@_register("pipe_expansion", _EXPANSION_ORACLE)
def pipe_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.1 expand→weight pipeline (expand_and_weight) on a
    deterministic fixture, hash-checked against a SQL reimplementation
    of the join/runtime/weight semantics."""
    ts = expand_and_weight(
        values_df(spark, _SCHED_SCHEMA, _sched_rows()),
        values_df(spark, _AVL_SCHEMA, _avl_rows()),
    )
    return ts.select(
        F.col("TRIP").alias("trip"),
        F.col("SEQ").cast("bigint").alias("seq"),
        F.col("OBSERVED").alias("observed"),
        F.col("RUNTIME").alias("runtime"),
        F.col("TOD_WEIGHT").alias("tod_weight"),
    )


_CLIPPER_ORACLE = """
WITH tags(card, seq, tagon, agency) AS (
  VALUES ('c1', 1, TIMESTAMP '2024-01-03 08:00:00', 'SF Muni'),
         ('c1', 2, TIMESTAMP '2024-01-03 08:30:00', 'BART'),
         ('c1', 3, TIMESTAMP '2024-01-03 09:00:00', 'SF Muni'),
         ('c1', 4, TIMESTAMP '2024-01-03 13:00:00', 'SF Muni'),
         ('c2', 1, TIMESTAMP '2024-01-03 08:00:00', 'BART')
), d AS (
  SELECT *,
         (epoch_us(tagon) - lag(epoch_us(tagon))
            OVER (PARTITION BY card ORDER BY seq)) / 60000000.0 AS diff_min,
         lag(agency) OVER (PARTITION BY card ORDER BY seq) AS from_agency
  FROM tags
), t AS (
  SELECT *,
         CASE WHEN diff_min < 90 THEN 1 ELSE 0 END AS transfer
  FROM d
), lt AS (
  SELECT *,
         sum(CASE WHEN transfer = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY card ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS linked_trip_id
  FROM t
)
SELECT card, CAST(seq AS BIGINT) AS seq, transfer,
       CAST(linked_trip_id AS BIGINT) AS linked_trip_id,
       CAST(sum(transfer) OVER (PARTITION BY card, linked_trip_id) AS BIGINT)
         AS linked_transfers,
       7.5 / (1 + sum(transfer) OVER (PARTITION BY card, linked_trip_id))
         AS linked_weight,
       from_agency
FROM lt
"""


@_register("pipe_clipper", _CLIPPER_ORACLE)
def pipe_clipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3 Clipper linked-trip pipeline (infer_linked_trips) on a
    deterministic card-day fixture, hash-checked against the SQL
    reconstruction (90-min transfers, cumsum trip ids, carried
    attributes, weight splitting)."""
    t0 = datetime.datetime(2024, 1, 3, 8, 0)  # Wednesday
    rows = [
        ("c1", 1, t0, "SF Muni", "1"),
        ("c1", 2, t0 + datetime.timedelta(minutes=30), "BART", "1"),
        ("c1", 3, t0 + datetime.timedelta(minutes=60), "SF Muni", "1"),
        ("c1", 4, t0 + datetime.timedelta(minutes=300), "SF Muni", "1"),
        ("c2", 1, t0, "BART", "1"),
    ]
    out = infer_linked_trips(values_df(
        spark,
        "ClipperCardID: string, TripSequenceID: bigint, "
        "TagOnTime: timestamp, AgencyName: string, RouteName: string",
        rows,
    ))
    return out.select(
        F.col("ClipperCardID").alias("card"),
        F.col("TripSequenceID").cast("bigint").alias("seq"),
        F.col("TRANSFER").alias("transfer"),
        F.col("LINKED_TRIP_ID").cast("bigint").alias("linked_trip_id"),
        F.col("LINKED_TRANSFERS").cast("bigint").alias("linked_transfers"),
        F.col("LINKED_WEIGHT").alias("linked_weight"),
        F.col("From_AgencyName").alias("from_agency"),
    )


_TAXI_ORACLE = """
WITH pings(i, t, x, status) AS (
  VALUES (1, TIMESTAMP '2024-01-01 10:00:00', 0.0, 'M'),
         (2, TIMESTAMP '2024-01-01 10:01:00', 2000.0, 'M'),
         (3, TIMESTAMP '2024-01-01 10:02:00', 4000.0, 'M'),
         (4, TIMESTAMP '2024-01-01 10:03:00', 6000.0, 'E'),
         (5, TIMESTAMP '2024-01-01 10:04:00', 8000.0, 'E'),
         (6, TIMESTAMP '2024-01-01 10:15:00', 10000.0, 'E'),
         (7, TIMESTAMP '2024-01-01 10:16:00', 12000.0, 'E')
), d AS (
  SELECT *,
         (epoch_us(t) - lag(epoch_us(t)) OVER w) / 1000000.0 AS seconds,
         abs(x - lag(x) OVER w) AS feet,
         CASE WHEN status <> lag(status) OVER w THEN 1 ELSE 0 END AS flip
  FROM pings WINDOW w AS (ORDER BY t)
), b AS (
  SELECT *,
         CASE WHEN flip = 1 OR seconds > 300 OR feet > 7500
              THEN 1 ELSE 0 END AS brk
  FROM d
), s AS (
  SELECT *,
         1 + sum(brk) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id
  FROM b
)
SELECT CAST(epoch_us(t) AS BIGINT) AS ts_us,
       CAST(trip_id AS BIGINT) AS trip_id,
       CAST(count(*) OVER (PARTITION BY trip_id) AS BIGINT) AS num_points,
       round(sum(CASE WHEN brk = 0 THEN feet END)
             OVER (PARTITION BY trip_id), 1) AS trip_length
FROM s
"""


@_register("pipe_taxi", _TAXI_ORACLE)
def pipe_taxi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.2 taxi trip-identification pipeline (identify_gps_trips)
    on a deterministic ping fixture (status flip + time gap breaks),
    hash-checked against the SQL reconstruction."""
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0 + datetime.timedelta(seconds=s), float(x), 0.0, st)
        for s, x, st in [
            (0, 0, "M"), (60, 2000, "M"), (120, 4000, "M"),
            (180, 6000, "E"), (240, 8000, "E"),
            (900, 10000, "E"), (960, 12000, "E"),
        ]
    ]
    out = identify_gps_trips(values_df(
        spark,
        "cab_id: bigint, time: timestamp, x: double, y: double, "
        "status: string",
        rows,
    ))
    from ..functions.metrics import portable_round

    return out.select(
        F.unix_micros("time").cast("bigint").alias("ts_us"),
        F.col("trip_id").cast("bigint").alias("trip_id"),
        F.col("num_points").cast("bigint").alias("num_points"),
        portable_round(F.col("trip_length"), 1).alias("trip_length"),
    )
