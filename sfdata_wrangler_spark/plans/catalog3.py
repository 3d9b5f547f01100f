"""Catalog wave 3: scalar-function families (F1-F8), W3 trip-id
disambiguation, A2 grouped transform, and a rows-only map-matching
query on an in-query toy network."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.metrics import portable_round as _pr
from .catalog import _events, _register, _t
from ..sources.inline import values_df


@_register(
    "f1_string_normalize",
    """
    SELECT p_partkey,
           upper(trim(p_name)) AS name_norm,
           upper(trim(p_brand)) AS brand_norm,
           CAST(length(p_name) - length(replace(p_name, 'o', '')) AS BIGINT)
             AS o_count,
           replace(p_type, ' ', '_') AS type_key
    FROM part
    """,
)
def f1_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 upper/trim normalization (SFMuniDataHelper.py:372-377), F2
    substring occurrence counting (:508), F3 replace (:500)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.trim("p_name")).alias("name_norm"),
        F.upper(F.trim("p_brand")).alias("brand_norm"),
        (
            (F.length("p_name")
             - F.length(F.replace(F.col("p_name"), F.lit("o"), F.lit(""))))
        ).cast("bigint").alias("o_count"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_key"),
    )


@_register(
    "f4_pack_parse_roundtrip",
    """
    SELECT event_id,
           strftime(ts, '%m%d%y') || ' ' ||
             lpad(CAST(hour(ts) * 10000 + minute(ts) * 100
                       + CAST(second(ts) AS INT) AS VARCHAR), 6, '0')
             AS packed,
           strftime(strptime(strftime(ts, '%m%d%y') || ' ' ||
             lpad(CAST(hour(ts) * 10000 + minute(ts) * 100
                       + CAST(second(ts) AS INT) AS VARCHAR), 6, '0'),
             '%m%d%y %H%M%S'), '%Y-%m-%d %H:%M:%S') AS roundtrip
    FROM events
    """,
)
def f4_pack_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 zero-pad + concat + parse (SFMuniDataHelper.py:632-658):
    HHMMSS packing, '%m%d%y %H%M%S' parse, round-trip to the second."""
    ev = _events(spark, sf_dir)
    hhmmss = F.hour("ts") * 10000 + F.minute("ts") * 100 + F.second("ts")
    packed = F.concat_ws(
        " ",
        F.date_format("ts", "MMddyy"),
        F.lpad(hhmmss.cast("int").cast("string"), 6, "0"),
    )
    return ev.select(
        "event_id",
        packed.alias("packed"),
        F.date_format(
            F.to_timestamp(packed, "MMddyy HHmmss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("roundtrip"),
    )


@_register(
    "f8_date_int_packing",
    """
    SELECT o_orderkey,
           CAST(month(o_orderdate) * 10000 + day(o_orderdate) * 100
                + year(o_orderdate) % 100 AS BIGINT) AS date_int
    FROM orders
    """,
)
def f8_date_int_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 integer date packing MMDDYY (SFMuniDataHelper.py:456-471)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (
            F.month("o_orderdate") * 10000
            + F.dayofmonth("o_orderdate") * 100
            + F.year("o_orderdate") % 100
        ).cast("bigint").alias("date_int"),
    )


@_register(
    "w3_trip_id_disambiguation",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey AS VARCHAR) || '_' ||
             CAST(min(l_linenumber) OVER (PARTITION BY l_orderkey) AS VARCHAR)
             AS trip_key
    FROM lineitem
    """,
)
def w3_trip_id_disambiguation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (SFMuniDataExpander.py:55-63): id := id + '_' + min(SEQ)
    over the pattern group — concat with a window min."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(
            "_",
            F.col("l_orderkey").cast("string"),
            F.min("l_linenumber").over(w).cast("string"),
        ).alias("trip_key"),
    )


@_register(
    "a2_grouped_transform",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice
                      / sum(l_extendedprice) OVER (PARTITION BY l_orderkey),
                      8) AS DOUBLE) AS price_share
    FROM lineitem
    """,
)
def a2_grouped_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 grouped transform (ClipperHelper.py:250-252): a group total
    broadcast back to every row — window aggregate, no join."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _pr(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 8)
        .alias("price_share"),
    )


@_register(
    "g5_mapmatch_toy",
    """
    SELECT CAST(c.cab AS BIGINT) AS cab_id,
           CAST(1 AS BIGINT) AS trip_id,
           CAST(l.link AS BIGINT) AS link_id,
           l.st AS start_time,
           CAST(l.tt AS DOUBLE) AS travel_time,
           CAST(1.0 AS DOUBLE) AS traversal_ratio,
           CAST(9 AS BIGINT) AS hour
    FROM (VALUES (1), (2)) c(cab),
         (VALUES (1, '2024-01-01T09:00:00', 32.5),
                 (2, '2024-01-01T09:00:00', 32.5),
                 (2, '2024-01-01T09:01:05', 32.5),
                 (3, '2024-01-01T09:01:05', 32.5),
                 (3, '2024-01-01T09:02:10', 65.0)) l(link, st, tt)
    """,
)
def g5_mapmatch_toy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G6 map-matching on a deterministic in-query toy network.
    The Viterbi/applyInPandas path is not SQL-expressible, but its
    output on this fixture IS closed-form (the g6/mm_image_bmp
    precedent): both cabs traverse links 1→2→3 with dyadic-exact
    split times (32.5 s halves, 65.0 s final link), so the oracle
    states the expected traversal table literally and the check is
    hash-exact. The brute-force path differential in
    tests/test_mapmatch.py remains the algorithmic check."""
    from ..pipelines.mapmatch import Link, Network, match_trips

    links = {
        i + 1: Link(i + 1, i * 1000.0, 0.0, (i + 1) * 1000.0, 0.0, 60.0)
        for i in range(4)
    }
    net = Network(links).build()
    t0 = datetime.datetime(2024, 1, 1, 9, 0)
    pings = values_df(
        spark,
        "cab_id: bigint, trip_id: bigint, time: timestamp, x: double, y: double",
        [
            (cab, 1, t0 + datetime.timedelta(seconds=65 * i), 150.0 + 950.0 * i, 25.0)
            for cab in (1, 2)
            for i in range(4)
        ],
    )
    return match_trips(pings, net)


@_register(
    "g6_time_allocation",
    """
    SELECT CAST(range AS BIGINT) AS trip_id,
           CAST(9 AS BIGINT) AS n_segments,
           CAST(135.0 AS DOUBLE) AS total_sec
    FROM range(6)
    """,
)
def g6_time_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 travel-time allocation invariant as a hash-checked query:
    on a deterministic fixture (6 trips x 10 pings, 15 s apart, on an
    8-link road), every observed inter-ping Δt must be allocated to
    traversed links EXACTLY — so each trip's matched output sums to
    (10-1) x 15 = 135 s over 9 segments, which the oracle states in
    closed form (HwyNetwork.py:569-610 allocation semantics). The
    Viterbi itself is not SQL-expressible, but its conservation law
    is."""
    from ..pipelines.mapmatch import Link, Network, match_trips

    links = {
        i + 1: Link(i + 1, i * 500.0, 0.0, (i + 1) * 500.0, 0.0, 30.0)
        for i in range(8)
    }
    net = Network(links).build()
    t0 = datetime.datetime(2024, 1, 1, 6, 0)
    pings = values_df(
        spark,
        "cab_id: bigint, trip_id: bigint, time: timestamp, x: double, "
        "y: double",
        [
            (
                t,
                t,
                t0 + datetime.timedelta(seconds=3600 * t + 15 * i),
                50.0 + 400.0 * i,
                10.0,
            )
            for t in range(6)
            for i in range(10)
        ],
    )
    matched = match_trips(pings, net)
    return matched.groupBy("trip_id").agg(
        F.countDistinct("start_time").cast("bigint").alias("n_segments"),
        _pr(F.sum("travel_time"), 6).alias("total_sec"),
    )


@_register(
    "r1_estimation_extract",
    """
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, revenue,
           CASE WHEN month >= '1997-01-01' AND month < '1997-07-01'
                THEN 1 ELSE 0 END AS event_dummy,
           CASE WHEN month(CAST(month AS DATE)) = 12 THEN 1 ELSE 0 END
             AS december_dummy,
           (CASE WHEN month >= '1997-01-01' AND month < '1997-07-01'
                 THEN 1 ELSE 0 END) * revenue AS event_x_revenue
    FROM m
    """,
)
def r1_estimation_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimation extract (§2.10, TransitReporter.py:2059-2288):
    monthly panel + event dummies (the BART-strike/casual-carpool
    pattern) + interaction terms, ready for model estimation."""
    from ..functions.metrics import portable_round as _pr2

    orders = _t(spark, sf_dir, "orders")
    month = F.date_format(
        F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd"
    )
    m = orders.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _pr2(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    event = (
        (F.col("month") >= "1997-01-01") & (F.col("month") < "1997-07-01")
    ).cast("int")
    return m.select(
        "month",
        "n_orders",
        "revenue",
        event.alias("event_dummy"),
        (F.month(F.col("month").cast("date")) == 12).cast("int").alias(
            "december_dummy"
        ),
        (event * F.col("revenue")).alias("event_x_revenue"),
    )
