"""Explicit schema registry (SURVEY.md §1).

The reference declares every input schema in code (byte-range colspec
tables, rule tables with dtypes) because misaligned rows break
inference (``SFMuniDataHelper.py:475-485``). Same stance here: never
infer schemas for production sources; these StructTypes are the
single source of truth.

Domain schemas condense FIXTURES.md (which derives them from the
reference's declared specs, file:line cited there).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


# --- driver testdata (TESTDATA.md) ---------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
}

# --- domain tables (FIXTURES.md §1-§6) -----------------------------------

AVL_APC_SCHEMA = _s(
    ("DATE", DateType()),
    ("DOW", IntegerType()),
    ("ROUTE_AVL", IntegerType()),
    ("DIR", IntegerType()),
    ("TRIP", IntegerType()),
    ("SEQ", IntegerType()),
    ("STOP_AVL", IntegerType()),
    ("STOPNAME_AVL", StringType()),
    ("TIMEPOINT", IntegerType()),
    ("LAT", DoubleType()),
    ("LON", DoubleType()),
    ("SERVMILES", DoubleType()),
    ("ON", IntegerType()),
    ("OFF", IntegerType()),
    ("LOAD_DEP", IntegerType()),
    ("RDBRDNGS", IntegerType()),
    ("CAPACITY", IntegerType()),
    ("ARRIVAL_TIME", TimestampType()),
    ("DEPARTURE_TIME", TimestampType()),
    ("DWELL", DoubleType()),
    ("RUNTIME", DoubleType()),
    ("QC201", IntegerType()),
    ("AGENCY_ID", StringType()),
    ("ROUTE_SHORT_NAME", StringType()),
    ("PATTCODE", StringType()),
    ("VEHNO", IntegerType()),
)

ROUTE_EQUIV_SCHEMA = _s(
    ("ROUTE_AVL", IntegerType()),
    ("AGENCY_ID", StringType()),
    ("ROUTE_SHORT_NAME", StringType()),
    ("ROUTE_LONG_NAME", StringType()),
    ("MASTER_ROUTE_NAME", StringType()),
    ("ROUTE_TYPE", IntegerType()),
    ("START_DATE", DateType()),
    ("END_DATE", DateType()),
)

CLIPPER_SCHEMA = _s(
    ("Year", IntegerType()),
    ("Month", IntegerType()),
    ("CircadianDayOfWeek", IntegerType()),
    ("ClipperCardID", StringType()),
    ("TripSequenceID", LongType()),
    ("AgencyID", IntegerType()),
    ("AgencyName", StringType()),
    ("PaymentProductID", IntegerType()),
    ("PaymentProductName", StringType()),
    ("FareAmount", DoubleType()),
    ("TagOnTime", TimestampType()),
    ("TagOnLocationId", IntegerType()),
    ("TagOnLocationName", StringType()),
    ("RouteID", IntegerType()),
    ("RouteName", StringType()),
    ("TagOffTime", TimestampType()),
    ("TagOffLocationId", IntegerType()),
    ("TagOffLocationName", StringType()),
)

TAXI_POINTS_SCHEMA = _s(
    ("cab_id", LongType()),
    ("time", TimestampType()),
    ("latitude", DoubleType()),
    ("longitude", DoubleType()),
    ("status", StringType()),
)

DEMAND_MONTHLY_SCHEMA = _s(
    ("FIPS", StringType()),
    ("MONTH", DateType()),
    ("POP", DoubleType()),
    ("TOTEMP", DoubleType()),
    ("WORKERS", DoubleType()),
    ("HH", DoubleType()),
    ("MEDIAN_HHINC", DoubleType()),
    ("CPI", DoubleType()),
    ("FUEL_PRICE", DoubleType()),
    ("AVG_MONTHLY_EARNINGS", DoubleType()),
)
