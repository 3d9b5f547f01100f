"""Catalog wave 15 (round 3): SCD2 interval collapse + one-pass table
profiling — the dimension-history and data-quality surfaces."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_table
from ..operators.scd2 import collapse_to_intervals
from .catalog import _events, _register, _t

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN row_number() OVER w = 1
                   OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS new_island
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island
  FROM ordered
), runs AS (
  SELECT user_id, event_type, island,
         min(ts ORDER BY ts, event_id) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_snapshots
  FROM islands GROUP BY user_id, event_type, island
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(epoch_us(valid_from) AS BIGINT) AS from_us,
       CAST(epoch_us(lead(valid_from) OVER
            (PARTITION BY user_id ORDER BY island)) AS BIGINT) AS until_us,
       n_snapshots
FROM runs
"""


@_register("scd2_user_event_runs", _SCD2_ORACLE)
def scd2_user_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 gaps-and-islands (operators/scd2.py): collapse each
    user's consecutive runs of identical event_type into validity
    intervals [valid_from, valid_until) — the shape the reference's
    dated GTFS schedules / fare tables are maintained in, built from
    a raw stream with one key-partitioned window pass."""
    ev = _events(spark, sf_dir)
    out = collapse_to_intervals(
        ev, keys=["user_id"], attrs=["event_type"],
        order_cols=["ts", "event_id"],
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        F.unix_micros("valid_from").cast("bigint").alias("from_us"),
        F.unix_micros("valid_until").cast("bigint").alias("until_us"),
        "n_snapshots",
    )


_PROF_COLS = ["l_orderkey", "l_quantity", "l_shipdate", "l_returnflag"]


def _prof_oracle() -> str:
    parts = []
    for c in _PROF_COLS:
        parts += [
            f"SELECT '{c}' AS column, 'n' AS metric,"
            f" CAST(count({c}) AS VARCHAR) AS value FROM lineitem",
            f"SELECT '{c}', 'nulls',"
            f" CAST(count(*) - count({c}) AS VARCHAR) FROM lineitem",
            f"SELECT '{c}', 'min', CAST(min({c}) AS VARCHAR) FROM lineitem",
            f"SELECT '{c}', 'max', CAST(max({c}) AS VARCHAR) FROM lineitem",
            f"SELECT '{c}', 'distinct',"
            f" CAST(count(DISTINCT {c}) AS VARCHAR) FROM lineitem",
        ]
    return " UNION ALL ".join(parts)


@_register("prof_lineitem", _prof_oracle())
def prof_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (operators/profile.py): count / nulls
    / min / max / distinct for four mixed-type columns in a single
    aggregation job (exact distincts here for oracle parity; the
    operator defaults to mergeable HLL++ sketches for the 100 TB
    path — accuracy measured in tests/test_scd2_profile.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return profile_table(li, _PROF_COLS, exact=True)
