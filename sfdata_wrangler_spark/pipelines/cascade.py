"""The aggregation cascade (SURVEY.md §2.4,
``SFMuniDataAggregator.py:110-1015``).

A materialized rollup lattice: trip-stops → trips → daily route-stops
→ monthly route-stops → route → system, each stage ONE
``groupBy().agg()`` with stage-specific rules and weights (deliberate
explicit materialization — each level applies *different* weights, so
``rollup()``/grouping-sets cannot express it). Stages write Parquet
between levels in production; here they compose lazily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregate import AggRule, aggregate_records, update_speeds

# Rules modeled on the reference's tables (``SFMuniDataAggregator.py:
# 119-166`` for trips, ``:198-251`` for rs_tod). Columns here use the
# engine's canonical trip-stop schema (see pipelines/expansion.py).
TRIP_RULES = [
    AggRule("FIRST_SEQ", "SEQ", "min"),
    AggRule("LAST_SEQ", "SEQ", "max"),
    AggRule("NUMSTOPS", "SEQ", "countUnique", dtype="bigint"),
    AggRule("OBSERVED", "OBSERVED", "max"),
    AggRule("ON", "ON", "sum"),
    AggRule("OFF", "OFF", "sum"),
    AggRule("SERVMILES", "SERVMILES_S", "sum"),
    AggRule("RUNTIME", "RUNTIME", "sum"),
    AggRule("TRIP_STOPS", "TRIP_STOPS", "sum"),
]
TRIP_KEYS = ["DATE", "DOW", "TOD", "AGENCY_ID", "ROUTE_SHORT_NAME", "DIR", "TRIP"]

RS_TOD_RULES = [
    AggRule("TRIPS", "TRIP", "countUnique", dtype="bigint"),
    AggRule("OBS_TRIP_STOPS", "OBSERVED", "sum"),
    AggRule("TRIP_STOPS", "TRIP_STOPS", "wgtSum"),
    AggRule("ON", "ON", "wgtSum"),
    AggRule("OFF", "OFF", "wgtSum"),
    AggRule("SERVMILES", "SERVMILES_S", "wgtSum"),
    AggRule("RUNTIME", "RUNTIME", "wgtSum"),
]
RS_TOD_KEYS = ["DATE", "DOW", "TOD", "AGENCY_ID", "ROUTE_SHORT_NAME", "DIR", "SEQ"]

MONTHLY_RULES = [
    AggRule("TRIPS", "TRIPS", "mean"),
    AggRule("NUMDAYS", "DATE", "countUnique", dtype="bigint"),
    AggRule("OBSDAYS", "OBS_TRIP_STOPS", "countNonZero", dtype="bigint"),
    AggRule("OBS_TRIP_STOPS", "OBS_TRIP_STOPS", "sum"),
    AggRule("TRIP_STOPS", "TRIP_STOPS", "mean"),
    AggRule("ON", "ON", "mean"),
    AggRule("OFF", "OFF", "mean"),
    AggRule("SERVMILES", "SERVMILES", "mean"),
    AggRule("RUNTIME", "RUNTIME", "mean"),
]
MONTHLY_KEYS = ["MONTH", "DOW", "TOD", "AGENCY_ID", "ROUTE_SHORT_NAME", "DIR", "SEQ"]

ROUTE_RULES = [
    AggRule("TRIPS", "TRIPS", "mean"),
    AggRule("TRIP_STOPS", "TRIP_STOPS", "sum"),
    AggRule("ON", "ON", "sum"),
    AggRule("OFF", "OFF", "sum"),
    AggRule("SERVMILES", "SERVMILES", "sum"),
    AggRule("RUNTIME", "RUNTIME", "sum"),
]
ROUTE_KEYS = ["MONTH", "DOW", "TOD", "AGENCY_ID", "ROUTE_SHORT_NAME", "DIR"]

SYSTEM_KEYS = ["MONTH", "DOW", "TOD", "AGENCY_ID"]

# ---------------------------------------------------------------------------
# Full-width rule table at reference breadth: every output column of
# the reference's STOP_RULES (``SFMuniDataAggregator.py:198-251``),
# with its level gate mapped onto the LEVELS lattice. The *_S twins
# are schedule-side (unweighted sums/means); the unsuffixed twins are
# observed-side (TOD_WEIGHT-weighted). first/last rules compile to
# min_by/max_by over an explicit order_by (pandas' implicit-sort
# 'first' is not reproducible distributed).
# ---------------------------------------------------------------------------
FULL_STOP_RULES = [
    AggRule("MONTH", "MONTH", "first"),
    AggRule("SCHED_DATES", "SCHED_DATES", "first"),
    AggRule("NUMDAYS", "DATE", "countUnique", dtype="bigint"),
    AggRule("TRIP_STOPS", "TRIP_STOPS", "sum", dtype="bigint"),
    AggRule("OBS_TRIP_STOPS", "OBSERVED", "sum", dtype="bigint"),
    AggRule("WGT_TRIP_STOPS", "TRIP_STOPS", "wgtSum", dtype="double"),
    AggRule("STOP_ID", "STOP_ID", "first", maxlevel="route_stop", dtype="bigint"),
    AggRule("ROUTE_LONG_NAME", "ROUTE_LONG_NAME", "first", maxlevel="route_stop"),
    AggRule("ROUTE_TYPE", "ROUTE_TYPE", "first", maxlevel="route_stop", dtype="bigint"),
    AggRule("TRIP_HEADSIGN", "TRIP_HEADSIGN", "first", maxlevel="route_stop"),
    AggRule("HEADWAY_S", "HEADWAY_S", "mean", dtype="double"),
    AggRule("FARE", "FARE", "mean", dtype="double"),
    AggRule("STOPNAME", "STOPNAME", "first", maxlevel="stop"),
    AggRule("STOPNAME_AVL", "STOPNAME_AVL", "first", maxlevel="stop"),
    AggRule("STOP_LAT", "STOP_LAT", "first", maxlevel="stop", dtype="double"),
    AggRule("STOP_LON", "STOP_LON", "first", maxlevel="stop", dtype="double"),
    AggRule("EOL", "EOL", "first", maxlevel="stop", dtype="bigint"),
    AggRule("SOL", "SOL", "first", maxlevel="stop", dtype="bigint"),
    AggRule("TIMEPOINT", "TIMEPOINT", "first", maxlevel="stop", dtype="bigint"),
    AggRule("ARRIVAL_TIME_DEV", "ARRIVAL_TIME_DEV", "wgtAvg", maxlevel="stop", dtype="double"),
    AggRule("DEPARTURE_TIME_DEV", "DEPARTURE_TIME_DEV", "wgtAvg", maxlevel="stop", dtype="double"),
    AggRule("DWELL_S", "DWELL_S", "sum", dtype="double"),
    AggRule("DWELL", "DWELL", "wgtSum", dtype="double"),
    AggRule("RUNTIME_S", "RUNTIME_S", "sum", dtype="double"),
    AggRule("RUNTIME", "RUNTIME", "wgtSum", dtype="double"),
    AggRule("TOTTIME_S", "TOTTIME_S", "sum", dtype="double"),
    AggRule("TOTTIME", "TOTTIME", "wgtSum", dtype="double"),
    AggRule("SERVMILES_S", "SERVMILES_S", "sum", dtype="double"),
    AggRule("SERVMILES", "SERVMILES", "wgtSum", dtype="double"),
    AggRule("RUNSPEED_S", "RUNSPEED_S", "mean", dtype="double"),
    AggRule("RUNSPEED", "RUNSPEED", "wgtAvg", dtype="double"),
    AggRule("TOTSPEED_S", "TOTSPEED_S", "mean", dtype="double"),
    AggRule("TOTSPEED", "TOTSPEED", "wgtAvg", dtype="double"),
    AggRule("ONTIME5", "ONTIME5", "wgtAvg", dtype="double"),
    AggRule("ON", "ON", "wgtSum", dtype="double"),
    AggRule("OFF", "OFF", "wgtSum", dtype="double"),
    AggRule("LOAD_ARR", "LOAD_ARR", "wgtSum", maxlevel="stop", dtype="double"),
    AggRule("LOAD_DEP", "LOAD_DEP", "wgtSum", maxlevel="stop", dtype="double"),
    AggRule("PASSMILES", "PASSMILES", "wgtSum", dtype="double"),
    AggRule("PASSHOURS", "PASSHOURS", "wgtSum", dtype="double"),
    AggRule("WAITHOURS", "WAITHOURS", "wgtSum", dtype="double"),
    AggRule("FULLFARE_REV", "FULLFARE_REV", "wgtSum", dtype="double"),
    AggRule("PASSDELAY_DEP", "PASSDELAY_DEP", "wgtSum", dtype="double"),
    AggRule("PASSDELAY_ARR", "PASSDELAY_ARR", "wgtSum", dtype="double"),
    AggRule("RDBRDNGS", "RDBRDNGS", "wgtSum", dtype="double"),
    AggRule("DOORCYCLES", "DOORCYCLES", "wgtSum", dtype="double"),
    AggRule("WHEELCHAIR", "WHEELCHAIR", "wgtSum", dtype="double"),
    AggRule("BIKERACK", "BIKERACK", "wgtSum", dtype="double"),
    AggRule("CAPACITY", "CAPACITY", "sum", maxlevel="stop", dtype="double"),
    AggRule("VC", "VC", "wgtAvg", dtype="double"),
    AggRule("CROWDED", "CROWDED", "wgtAvg", dtype="double"),
    AggRule("CROWDHOURS", "CROWDHOURS", "wgtSum", dtype="double"),
]

#: The reference's monthly impute set (``SFMuniDataAggregator.py:
#: 388-417``): columns whose zero-observation months inherit the prior
#: month via operators.imputation.impute_from_prior_month.
IMPUTE_COLS = [
    "TIMEPOINT",
    "ARRIVAL_TIME_DEV",
    "DEPARTURE_TIME_DEV",
    "DWELL",
    "RUNTIME",
    "TOTTIME",
    "SERVMILES",
    "RUNSPEED",
    "TOTSPEED",
    "ONTIME5",
    "ON",
    "OFF",
    "LOAD_ARR",
    "LOAD_DEP",
    "PASSMILES",
    "PASSHOURS",
    "WAITHOURS",
    "FULLFARE_REV",
    "PASSDELAY_DEP",
    "PASSDELAY_ARR",
    "RDBRDNGS",
    "DOORCYCLES",
    "WHEELCHAIR",
    "BIKERACK",
    "CAPACITY",
    "VC",
    "CROWDED",
    "CROWDHOURS",
]


def run_cascade(trip_stops: DataFrame) -> dict[str, DataFrame]:
    """trip-stop fact (expanded + weighted, with MONTH column) →
    every cascade level. Each value is a lazy DataFrame; production
    materializes each to Parquet (partitioned by MONTH) before the
    next consumes it, so a level is computed once, not once per
    downstream level."""
    trips = aggregate_records(trip_stops, TRIP_KEYS, TRIP_RULES)
    rs_tod = aggregate_records(
        trip_stops, RS_TOD_KEYS, RS_TOD_RULES, weight="TOD_WEIGHT"
    )
    monthly = aggregate_records(
        rs_tod.withColumn("MONTH", F.date_trunc("month", "DATE").cast("date")),
        MONTHLY_KEYS,
        MONTHLY_RULES,
    )
    route_tod = aggregate_records(monthly, ROUTE_KEYS, ROUTE_RULES)
    system_tod = update_speeds(
        aggregate_records(route_tod, SYSTEM_KEYS, ROUTE_RULES),
        tottime_col=None,
    )
    # *_day variants: same rules, TOD dropped from the keys
    route_day = aggregate_records(
        monthly, [k for k in ROUTE_KEYS if k != "TOD"], ROUTE_RULES
    )
    system_day = update_speeds(
        aggregate_records(
            route_tod, [k for k in SYSTEM_KEYS if k != "TOD"], ROUTE_RULES
        ),
        tottime_col=None,
    )
    return {
        "trips": trips,
        "rs_tod": rs_tod,
        "monthly_rs_tod": monthly,
        "route_dir_tod": route_tod,
        "route_dir_day": route_day,
        "system_tod": system_tod,
        "system_day": system_day,
    }


def fold_master_routes(
    route_level: DataFrame, equiv: DataFrame
) -> DataFrame:
    """Master-route folding (``SFMuniDataAggregator.py:807-933``):
    routes renamed mid-period are re-keyed to their MASTER_ROUTE_NAME
    via the (broadcast) equivalency dimension, then the route level is
    re-aggregated so both eras of a renamed route roll into one
    series. (The reference's hardcoded 8X/9X Dec-2009 patch is a data
    fix, not an operator — out of scope.)"""
    mapped = route_level.join(
        F.broadcast(
            equiv.select("ROUTE_SHORT_NAME", "MASTER_ROUTE_NAME").distinct()
        ),
        "ROUTE_SHORT_NAME",
        "left",
    ).withColumn(
        "MASTER_ROUTE_NAME",
        F.coalesce("MASTER_ROUTE_NAME", "ROUTE_SHORT_NAME"),
    )
    keys = [
        c
        for c in ("MONTH", "DOW", "TOD", "AGENCY_ID", "MASTER_ROUTE_NAME")
        if c in mapped.columns
    ]
    return aggregate_records(mapped, keys, ROUTE_RULES)
