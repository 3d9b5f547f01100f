"""Catalog wave 19 (round 4): fact-scale as-of join.

``operators/asof.py`` is the union+window as-of join — one hash
shuffle, no broadcast — for when BOTH sides are fact-sized (the
broadcast range join in operators/interval_lookup.py covers the
dim-sized case, ref SFMuniDataHelper.py:587). DuckDB's native
``ASOF LEFT JOIN`` is the oracle, making this one of the few
operators whose cross-engine check exercises a dedicated physical
operator on the oracle side too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from .catalog import _events, _register

_J13_ORACLE = """
SELECT l.event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       epoch_us(l.ts) AS ts_us,
       epoch_us(r.ts) AS purchase_ts_us,
       r.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@_register("j13_asof_join", _J13_ORACLE)
def j13_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's most recent prior (or
    simultaneous) purchase. Spark side: tagged union + one window
    pass per user (operators/asof.asof_join) — one shuffle on
    user_id; DuckDB side: its native ASOF LEFT JOIN. Timestamps
    leave as epoch micros; the carried value is the raw parquet
    double (no arithmetic) — both hash-exact by construction."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="ts",
        value_cols=["value"],
        tiebreak="value",
    )
    return out.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_asof").alias("purchase_ts_us"),
        F.col("value_asof").alias("purchase_value"),
    )


_J14_ORACLE = """
SELECT l.event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       epoch_us(l.ts) AS ts_us,
       CASE WHEN epoch(l.ts) - epoch(r.ts) > 604800.0
            THEN NULL ELSE epoch_us(r.ts) END AS signup_ts_us,
       CASE WHEN epoch(l.ts) - epoch(r.ts) > 604800.0
            THEN NULL ELSE r.value END AS signup_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@_register("j14_asof_tolerance", _J14_ORACLE)
def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof
    semantics): matches older than 7 days null out. Both engines
    compare the identical IEEE epoch-second doubles, so the
    tolerance boundary cannot flip between them."""
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        errors,
        signups,
        on=["user_id"],
        ts="ts",
        value_cols=["value"],
        tiebreak="value",
        tolerance=604800.0,
    )
    return out.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_asof").alias("signup_ts_us"),
        F.col("value_asof").alias("signup_value"),
    )
