"""Catalog wave 7: driver-visible oracle coverage for previously
test-only SURVEY items — S1 fixed-width ingest, J5 crosswalk rollup,
J8 scaling-factor join, W13 annual→monthly step expansion."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import portable_round as _pr
from .catalog import _register, _t

_FIXED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "avl_fixed.txt",
)


@_register(
    "s1_fixed_width_scan",
    f"""
    SELECT seq, route, on_cnt, off_cnt, load, svc_date
    FROM (
      SELECT TRY_CAST(trim(substring(line, 1, 4)) AS INTEGER) AS seq,
             trim(substring(line, 5, 5)) AS route,
             TRY_CAST(trim(substring(line, 10, 3)) AS INTEGER) AS on_cnt,
             TRY_CAST(trim(substring(line, 13, 3)) AS INTEGER) AS off_cnt,
             TRY_CAST(trim(substring(line, 16, 6)) AS DOUBLE) AS load,
             trim(substring(line, 22, 8)) AS svc_date
      FROM read_csv('{_FIXED_PATH}',
                    delim='|', header=false, quote='', escape='',
                    columns={{'line': 'VARCHAR'}})
    )
    WHERE seq IS NOT NULL
    """,
)
def s1_fixed_width_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 fixed-width AVL ingest (SFMuniDataHelper.py:422-443) as a
    hash-checked query: splittable spark.read.text + substring/
    try_cast projections; the committed fixture includes a mid-file
    header row and a truncated line, both dropped structurally by the
    required-column null filter — the oracle reproduces the byte
    ranges with the same TRY_CAST semantics."""
    from ..sources.fixed_width import ColSpec, read_fixed_width

    specs = [
        ColSpec("seq", 0, 4, "int"),
        ColSpec("route", 4, 9),
        ColSpec("on_cnt", 9, 12, "int"),
        ColSpec("off_cnt", 12, 15, "int"),
        ColSpec("load", 15, 21, "double"),
        ColSpec("svc_date", 21, 29),
    ]
    return read_fixed_width(
        spark, _FIXED_PATH, specs, required=["seq"]
    )


@_register(
    "j5_crosswalk_rollup",
    """
    WITH blocks AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(c_nationkey AS BIGINT) AS region_key,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents
    FROM blocks JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def j5_crosswalk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 crosswalk rollup (DemandHelper.py:1201-1224): fine-grain
    units (per-customer order stats, standing in for census blocks)
    roll up through a broadcast crosswalk dim (customer→nation) to
    coarse regions — the LODES block→county shape on the star
    schema."""
    from ..pipelines.demand import crosswalk_rollup

    orders = _t(spark, sf_dir, "orders")
    blocks = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    xwalk = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("bigint").alias("region_key")
    )
    out = crosswalk_rollup(
        blocks,
        xwalk,
        block_col="o_custkey",
        xwalk_block_col="c_custkey",
        group_col="region_key",
        value_cols=["n_orders", "rev_cents"],
    )
    return out.select(
        "region_key",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("rev_cents").cast("bigint").alias("rev_cents"),
    )


@_register(
    "j8_scaling_factor_join",
    """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ), truth AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
    )
    SELECT m.month, m.n_orders,
           CAST(round(m.rev_cents * (CAST(t.n_lines AS DOUBLE) / m.n_orders),
                      4) AS DOUBLE) AS scaled_rev_cents
    FROM monthly m JOIN truth t ON m.month = t.month
    """,
)
def j8_scaling_factor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 scaling-factor join (DemandHelper.py:1280-1330): per-key
    factor = truth/observed, applied to value columns — the QCEW↔WAC
    employment-control pattern, keyed by month on the star schema."""
    from ..pipelines.demand import scaling_factor_join

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
    monthly = orders.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    truth = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(month.alias("month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )
    out = scaling_factor_join(
        monthly.withColumn(
            "rev_scaled", F.col("rev_cents").cast("double")
        ).drop("rev_cents"),
        truth,
        keys=["month"],
        monthly_col="n_orders",
        truth_col="n_lines",
        value_cols=["rev_scaled"],
    )
    # recompute against the unscaled frame for exact oracle parity
    return out.select(
        "month",
        "n_orders",
        _pr(F.col("rev_scaled"), 4).alias("scaled_rev_cents"),
    )


@_register(
    "w13_annual_to_monthly",
    """
    WITH annual AS (
      SELECT year(o_orderdate) AS yr,
             CAST(count(*) AS BIGINT) AS n
      FROM orders
      WHERE year(o_orderdate) <> 1995
      GROUP BY 1
    ), spine AS (
      SELECT strftime(m, '%Y-%m-%d') AS month, year(m) AS yr
      FROM (
        SELECT unnest(generate_series(DATE '1992-01-01',
                                      DATE '1998-12-01',
                                      INTERVAL 1 MONTH))::DATE AS m
      )
    )
    SELECT month,
           CAST(last_value(a.n IGNORE NULLS) OVER (
             ORDER BY month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n
    FROM spine s LEFT JOIN annual a ON s.yr = a.yr
    """,
)
def w13_annual_to_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 annual→monthly step expansion (MultiModalHelper.py:122-178):
    annual totals replicate to each month of the year over a generated
    spine; a masked year (1995) exercises the forward-fill across the
    gap."""
    from ..pipelines.demand import annual_to_monthly_step

    orders = _t(spark, sf_dir, "orders")
    annual = (
        orders.where(F.year("o_orderdate") != 1995)
        .groupBy(F.year("o_orderdate").alias("YEAR"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spine = spark.sql(
        "SELECT date_format(m, 'yyyy-MM-dd') AS month "
        "FROM (SELECT explode(sequence(DATE'1992-01-01', DATE'1998-12-01', "
        "INTERVAL 1 MONTH)) AS m)"
    )
    out = annual_to_monthly_step(
        annual, spine, keys=[], year_col="YEAR", month_col="month",
        value_cols=["n"],
    )
    return out.select("month", F.col("n").cast("bigint").alias("n"))


_GTFS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "gtfs",
)

_TOD_CASE = (
    "CASE WHEN hhmm >= 300 AND hhmm <= 559 THEN '0300-0559' "
    "WHEN hhmm >= 600 AND hhmm <= 859 THEN '0600-0859' "
    "WHEN hhmm >= 900 AND hhmm <= 1359 THEN '0900-1359' "
    "WHEN hhmm >= 1400 AND hhmm <= 1559 THEN '1400-1559' "
    "WHEN hhmm >= 1600 AND hhmm <= 1859 THEN '1600-1859' "
    "WHEN hhmm >= 1900 AND hhmm <= 2159 THEN '1900-2159' "
    "ELSE '2200-0259' END"
)


def _gtfs_csv(name: str) -> str:
    return (
        f"read_csv('{_GTFS_DIR}/{name}.txt', header=true, "
        "all_varchar=true)"
    )


@_register(
    "j7_gtfs_denormalize",
    f"""
    WITH st AS (
      SELECT trip_id, stop_id,
             CAST(stop_sequence AS INT) AS SEQ,
             CAST(string_split(arrival_time, ':')[1] AS INT) * 3600
               + CAST(string_split(arrival_time, ':')[2] AS INT) * 60
               + CAST(string_split(arrival_time, ':')[3] AS INT)
               AS arrival_sec,
             CAST(string_split(departure_time, ':')[1] AS INT) * 3600
               + CAST(string_split(departure_time, ':')[2] AS INT) * 60
               + CAST(string_split(departure_time, ':')[3] AS INT)
               AS departure_sec
      FROM {_gtfs_csv("stop_times")}
    ), dowm AS (
      SELECT service_id,
             CASE WHEN monday = '1' THEN 1
                  WHEN saturday = '1' THEN 2 ELSE 3 END AS DOW
      FROM {_gtfs_csv("calendar")}
    ), trip_dim AS (
      SELECT t.trip_id, t.route_id, d.DOW,
             upper(trim(r.route_short_name)) AS ROUTE_SHORT_NAME,
             CAST(r.route_type AS INT) AS ROUTE_TYPE,
             CAST(t.direction_id AS INT) AS DIR,
             coalesce(t.trip_headsign, '') AS TRIP_HEADSIGN
      FROM {_gtfs_csv("trips")} t
        JOIN {_gtfs_csv("routes")} r ON t.route_id = r.route_id
        JOIN dowm d ON t.service_id = d.service_id
    ), fares AS (
      SELECT fr.route_id, CAST(fa.price AS DOUBLE) AS FARE
      FROM {_gtfs_csv("fare_rules")} fr
        JOIN {_gtfs_csv("fare_attributes")} fa ON fr.fare_id = fa.fare_id
    ), base AS (
      SELECT st.trip_id, st.SEQ, st.arrival_sec, st.departure_sec,
             td.DOW, td.ROUTE_SHORT_NAME, td.ROUTE_TYPE, td.DIR,
             td.TRIP_HEADSIGN, f.FARE,
             upper(trim(s.stop_name)) AS STOPNAME
      FROM st
        JOIN trip_dim td ON st.trip_id = td.trip_id
        LEFT JOIN fares f ON td.route_id = f.route_id
        LEFT JOIN {_gtfs_csv("stops")} s ON st.stop_id = s.stop_id
    ), w AS (
      SELECT *,
             min(SEQ) OVER wt AS minseq,
             max(SEQ) OVER wt AS maxseq,
             CAST(floor(min(departure_sec) OVER wt / 3600) * 100
                  + floor((min(departure_sec) OVER wt % 3600) / 60)
                  AS INT) AS hhmm,
             lag(departure_sec) OVER (
               PARTITION BY trip_id ORDER BY SEQ
             ) AS prevdep
      FROM base
      WINDOW wt AS (PARTITION BY trip_id)
    )
    SELECT trip_id, SEQ, ROUTE_SHORT_NAME, ROUTE_TYPE, DIR, DOW,
           TRIP_HEADSIGN, FARE, STOPNAME,
           CAST(SEQ = minseq AS INT) AS SOL,
           CAST(SEQ = maxseq AS INT) AS EOL,
           {_TOD_CASE} AS TOD,
           lpad(CAST(hhmm AS VARCHAR), 4, '0') || '_'
             || CAST(minseq AS VARCHAR) AS TRIP,
           (departure_sec - arrival_sec) / 60.0 AS DWELL_S,
           coalesce((arrival_sec - prevdep) / 60.0, 0.0) AS RUNTIME_S,
           (departure_sec - lag(departure_sec) OVER (
              PARTITION BY ROUTE_SHORT_NAME, DIR, TRIP_HEADSIGN, SEQ, DOW
              ORDER BY departure_sec, trip_id)) / 60.0 AS HEADWAY_S
    FROM w
    """,
)
def j7_gtfs_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 GTFS denormalization (GTFSHelper.py:324-527) as a
    hash-checked query over a committed feed fixture: the reference's
    record-at-a-time transitfeed walk re-expressed as broadcast joins
    + windows (service-day wrap times past 24:00, TOD banding, SOL/
    EOL, scheduled dwell/runtime, same-stop headways, fare lookup
    with a fare-less route)."""
    from ..sources.gtfs import build_trip_stops, read_gtfs_feed

    feeds = read_gtfs_feed(spark, _GTFS_DIR)
    ts = build_trip_stops(feeds)
    return ts.select(
        "trip_id",
        F.col("SEQ").cast("int").alias("SEQ"),
        "ROUTE_SHORT_NAME",
        "ROUTE_TYPE",
        "DIR",
        F.col("DOW").cast("int").alias("DOW"),
        "TRIP_HEADSIGN",
        "FARE",
        "STOPNAME",
        "SOL",
        "EOL",
        "TOD",
        "TRIP",
        "DWELL_S",
        "RUNTIME_S",
        "HEADWAY_S",
    )


@_register(
    "f16_json_props_extract",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 1 ELSE 0 END AS INT) AS k_high
    FROM events
    """,
)
def f16_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction over the events
    stream (the raw-log shape every training-data pipeline ingests):
    get_json_object runs JVM-side inside codegen — no parse UDF."""
    from .catalog import _events

    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        k.alias("k"),
        F.when(k >= 50, 1).otherwise(0).cast("int").alias("k_high"),
    )


@_register(
    "p6_geofence_ratio",
    """
    WITH pts AS (
      SELECT CAST(event_id AS BIGINT) AS event_id,
             -122.60 + (event_id * 37 % 3000) / 10000.0 AS lon,
             37.65 + (event_id * 53 % 2500) / 10000.0 AS lat,
             value
      FROM events
    )
    SELECT event_id, lon, lat
    FROM pts
    WHERE lon > -122.53 AND lon < -122.35
      AND lat > 37.70 AND lat < 37.83
      AND value / 10.0 < 2.0
    """,
)
def p6_geofence_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 geofence + P7 ratio filter (HwyNetwork.py:79-92 bbox,
    TaxiDataHelper ratio guard) as one declared query: deterministic
    synthetic coordinates derived from event ids, bounding-box and
    ratio predicates both pushed into the scan filter."""
    from ..pipelines.taxi import geofence
    from .catalog import _events

    ev = _events(spark, sf_dir)
    pts = ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        (
            F.lit(-122.60)
            + (F.col("event_id") * 37 % 3000) / F.lit(10000.0)
        ).alias("lon"),
        (
            F.lit(37.65) + (F.col("event_id") * 53 % 2500) / F.lit(10000.0)
        ).alias("lat"),
        "value",
    )
    fenced = geofence(pts, lon="lon", lat="lat")
    return fenced.where(F.col("value") / 10.0 < 2.0).select(
        "event_id", "lon", "lat"
    )


_TAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "avl_tab.txt",
)


@_register(
    "s2_tab_hhmmss_pack",
    f"""
    SELECT route,
           CAST(dir AS INT) AS dir,
           CAST(hr * 10000 + mn * 100 + sc AS INT) AS hhmmss,
           CAST(on_cnt AS INT) AS on_cnt
    FROM read_csv('{_TAB_PATH}', delim='\\t', header=true,
                  nullstr='NA',
                  columns={{'route': 'VARCHAR', 'dir': 'INTEGER',
                            'hr': 'INTEGER', 'mn': 'INTEGER',
                            'sc': 'INTEGER', 'on_cnt': 'INTEGER'}})
    """,
)
def s2_tab_hhmmss_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 tab-delimited scan + HHMMSS recombination
    (SFMuniDataHelper.py:414-473): schema'd CSV reader with NA
    sentinels + the packed time-int projection, over a committed
    fixture that includes NA cells and a midnight-adjacent time."""
    from ..sources.fixed_width import pack_hhmmss, read_tab_delimited

    df = read_tab_delimited(
        spark,
        _TAB_PATH,
        schema="route string, dir int, hr int, mn int, sc int, on_cnt int",
        header=True,
    )
    return df.select(
        "route",
        "dir",
        pack_hhmmss(F.col("hr"), F.col("mn"), F.col("sc")).alias("hhmmss"),
        F.col("on_cnt"),
    )


def _lcc_sql() -> str:
    from ..functions.geo import (
        _A_M, _BIG_F, _E, _FE_M, _FN_M, _LON0, _M_TO_USFT, _N, _RHO0,
    )

    D = lambda v: f"CAST({v!r} AS DOUBLE)"  # noqa: E731
    tcol = (
        f"tan(pi()/4 - radians(lat)/2) / pow((1 - {D(_E)}*sin(radians(lat)))"
        f" / (1 + {D(_E)}*sin(radians(lat))), {D(_E / 2)})"
    )
    rho = f"{D(_A_M)} * {D(_BIG_F)} * pow({tcol}, {D(_N)})"
    theta = f"{D(_N)} * (radians(lon) - ({D(_LON0)}))"
    return f"""
    WITH pts AS (
      SELECT CAST(event_id AS BIGINT) AS event_id,
             -122.60 + (event_id * 37 % 3000) / 10000.0 AS lon,
             37.65 + (event_id * 53 % 2500) / 10000.0 AS lat
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           CAST(round(({rho} * sin({theta}) + {D(_FE_M)}) * {D(_M_TO_USFT)},
                      3) AS DOUBLE) AS x_ft,
           CAST(round(({D(_RHO0)} - {rho} * cos({theta}) + {D(_FN_M)})
                      * {D(_M_TO_USFT)}, 3) AS DOUBLE) AS y_ft
    FROM pts
    """


@_register("f12_lcc_stateplane", _lcc_sql())
def f12_lcc_stateplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 Lambert-conformal-conic state-plane projection
    (GTFSHelper.py:38-61 / HwyNetwork.py:54-77, pyproj replaced by
    closed-form Snyder eqs as pure codegen'd column trig). JVM and
    DuckDB libm disagree by <=1e-8 ft on this grid; rounding to
    millifeet (verified >=12x boundary margin on the fixed input set)
    makes the check hash-exact."""
    from ..functions.geo import lonlat_to_ca_stateplane
    from .catalog import _events

    ev = _events(spark, sf_dir).where(F.col("event_id") < 500)
    pts = ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        (
            F.lit(-122.60)
            + (F.col("event_id") * 37 % 3000) / F.lit(10000.0)
        ).alias("lon"),
        (
            F.lit(37.65) + (F.col("event_id") * 53 % 2500) / F.lit(10000.0)
        ).alias("lat"),
    )
    x, y = lonlat_to_ca_stateplane(F.col("lon"), F.col("lat"))
    return pts.select(
        "event_id",
        _pr(x, 3).alias("x_ft"),
        _pr(y, 3).alias("y_ft"),
    )


@_register(
    "r2_demand_panel",
    """
    WITH m_orders AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders GROUP BY 1
    ), m_lines AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1
    ), m_urgent AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    )
    SELECT o.month, o.n_orders, o.n_customers,
           coalesce(l.n_lines, 0) AS n_lines,
           coalesce(u.n_urgent, 0) AS n_urgent,
           CAST(round(CAST(coalesce(u.n_urgent, 0) AS DOUBLE) / o.n_orders,
                      6) AS DOUBLE) AS urgent_share,
           CAST(round(CAST(o.rev_cents AS DOUBLE) / o.n_customers, 4)
                AS DOUBLE) AS rev_per_customer_cents
    FROM m_orders o
      LEFT JOIN m_lines l ON o.month = l.month
      LEFT JOIN m_urgent u ON o.month = u.month
    """,
)
def r2_demand_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand panel (TransitReporter.py:1105-1181 shape): several
    independently-aggregated monthly series aligned on the month key
    with outer joins, plus share/ratio fields — each series is one
    combinable aggregation, the alignment joins are on the tiny month
    dim."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
    m_orders = orders.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("bigint")
        .alias("rev_cents"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
    )
    m_lines = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(month.alias("month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )
    m_urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(month.alias("month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urgent"))
    )
    panel = (
        m_orders.join(m_lines, "month", "left")
        .join(m_urgent, "month", "left")
        .select(
            "month",
            "n_orders",
            "n_customers",
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_urgent", F.lit(0)).cast("bigint").alias("n_urgent"),
            _pr(
                F.coalesce("n_urgent", F.lit(0)).cast("double")
                / F.col("n_orders"),
                6,
            ).alias("urgent_share"),
            _pr(
                F.col("rev_cents").cast("double") / F.col("n_customers"), 4
            ).alias("rev_per_customer_cents"),
        )
    )
    return panel


@_register(
    "r3_bart_od_totals",
    """
    SELECT * FROM (VALUES
      ('2013-04-01', CAST(81.0 AS DOUBLE), CAST(3 AS BIGINT)),
      ('2013-05-01', CAST(162.0 AS DOUBLE), CAST(3 AS BIGINT))
    ) AS t(month, system_total, n_stations_sq)
    """,
)
def r3_bart_od_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BART OD system totals (TransitReporter.py:1566-1659:
    FROM='Entries' AND TO='Exits' slice of the monthly matrices):
    drives the full Excel-matrix ingestion path — footer detection,
    stack to long, multi-month concat — on deterministic grids; the
    oracle states the expected Entries/Exits totals in closed form."""
    import datetime as _dt

    import pandas as _pd

    from ..sources.excel import bart_weekday_frame

    def grid(scale: float) -> _pd.DataFrame:
        data = {
            "RM": [10.0 * scale, 20.0 * scale, 30.0 * scale, 60.0 * scale],
            "EN": [1.0 * scale, 2.0 * scale, 3.0 * scale, 6.0 * scale],
            "EP": [4.0 * scale, 5.0 * scale, 6.0 * scale, 15.0 * scale],
            "Exits": [15.0 * scale, 27.0 * scale, 39.0 * scale, 81.0 * scale],
        }
        g = _pd.DataFrame(data, index=["RM", "EN", "EP", "Entries"])
        g.loc["Note: source BART"] = float("nan")
        return g

    frame = bart_weekday_frame(
        spark,
        [
            (grid(1.0), _dt.date(2013, 4, 1)),
            (grid(2.0), _dt.date(2013, 5, 1)),
        ],
    )
    return (
        frame.where((F.col("FROM") == "Entries") & (F.col("TO") == "Exits"))
        .groupBy(F.date_format("MONTH", "yyyy-MM-dd").alias("month"))
        .agg(
            F.sum("RIDERS").alias("system_total"),
            F.max("STATIONS").cast("bigint").alias("n_stations_sq"),
        )
    )


@_register(
    "mm_audio_wav",
    """
    WITH ids AS (
      SELECT CAST(event_id AS BIGINT) AS m
      FROM events WHERE event_id < 200
    ), sized AS (
      SELECT m, 800 + (m % 5) * 80 AS nf FROM ids
    ), s AS (
      SELECT m, nf, unnest(range(0, nf)) AS i FROM sized
    )
    SELECT m AS media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(2 AS BIGINT) AS sample_width,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(nf * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(sum(((m * 7 + i * 13) % 2001 - 1000)
                    * ((m * 7 + i * 13) % 2001 - 1000)) AS BIGINT) AS sum_sq
    FROM s GROUP BY m, nf
    """,
)
def mm_audio_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal audio decode (no fake codec): deterministic
    16-bit PCM is encoded through the stdlib wave writer into genuine
    RIFF/WAVE blobs, then decoded back (header parse + frame unpack +
    exact PCM energy) in an Arrow-batched mapInPandas kernel. The
    oracle states every decoded value in closed form from the PCM
    formula — the full encode/decode round trip is value-checked."""
    from ..multimodal.audio_wav import decode_wav, synth_wav_corpus
    from .catalog import _events

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 200)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    blobs = synth_wav_corpus(ids)
    return decode_wav(blobs)


@_register(
    "w15_tumbling_window_counts",
    """
    SELECT strftime(time_bucket(INTERVAL 10 MINUTE, ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w15_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation via streaming/windowed.py running
    in batch mode (the same function powers the watermarked stream —
    batch≡stream modulo dropped-late rows, proven in
    test_streaming_watermark). 10-minute windows keyed by a user
    bucket."""
    from ..streaming.windowed import windowed_event_counts
    from .catalog import _events

    ev = _events(spark, sf_dir).select(
        "ts", (F.col("user_id") % 10).cast("bigint").alias("user_bucket"),
        "value",
    )
    out = windowed_event_counts(
        ev, ts_col="ts", key_col="user_bucket", window="10 minutes",
        value_col="value",
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "user_bucket",
        "n_events",
        _pr(F.col("total_value"), 2).alias("total_value"),
    )


@_register(
    "a9_grouping_sets",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(strftime(date_trunc('month', o_orderdate), '%Y-%m-%d'),
                    'ALL') AS month,
           CAST(GROUPING(o_orderpriority) * 2
                + GROUPING(date_trunc('month', o_orderdate)) AS INT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, date_trunc('month', o_orderdate)),
                            (o_orderpriority), (date_trunc('month', o_orderdate)),
                            ())
    """,
)
def a9_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in ONE pass via GROUPING SETS — the
    lattice the cascade would use if its levels shared weights
    (SFMuniDataAggregator's levels each reweight, so the cascade
    stays explicit; this covers the shared-weight case): detail,
    two marginals, and the grand total with grouping provenance,
    one shuffle with partial aggregation."""
    return spark.sql(
        f"""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(date_format(date_trunc('month', o_orderdate),
                                    'yyyy-MM-dd'), 'ALL') AS month,
               CAST(GROUPING(o_orderpriority) * 2
                    + GROUPING(date_trunc('month', o_orderdate)) AS INT)
                 AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM parquet.`{sf_dir}/orders.parquet`
        GROUP BY GROUPING SETS (
          (o_orderpriority, date_trunc('month', o_orderdate)),
          (o_orderpriority), (date_trunc('month', o_orderdate)), ())
        """
    )
