"""Catalog wave 25 (round 4): first batch of the built-but-unregistered
operator backlog — zone-map planning, FK integrity, join-size
pre-flight, SCD2 interval validation, survivorship merge,
time-weighted averages, and CUSUM change points. All were unit-tested
in round 3; this wave gives each a driver-checkable oracle query.

Determinism: every window has a total order; money/values go through
fixed-point BIGINT where accumulation order could matter; date/month
outputs are formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import survivorship_merge
from ..operators.drift import cusum_changepoints
from ..operators.quality import fk_integrity
from ..operators.scd2 import validate_intervals
from ..operators.skew import join_size_estimate
from ..operators.windows import time_weighted_average
from ..operators.zonemap import prune_files, skip_rate, zonemap_stats
from .catalog import _events, _register, _t

# ---------------------------------------------------------------------------
# zone maps: the lakehouse planning surface (SURVEY §2.1 S6's planning
# half). Files = year-of-shipdate × writer shard, so the manifest has
# real clustering on the date column (high skip rate) and none on
# quantity (conjunction stays honest).
# ---------------------------------------------------------------------------

_ZM_FILE_SQL = (
    "strftime(l_shipdate, '%Y') || '-f' || CAST(l_orderkey % 4 AS VARCHAR)"
)

_ZM_MANIFEST_SQL = f"""
    zm AS (
      SELECT {_ZM_FILE_SQL} AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(strftime(l_shipdate, '%Y-%m-%d')) AS min_sdate,
             max(strftime(l_shipdate, '%Y-%m-%d')) AS max_sdate,
             CAST(count(*) - count(l_shipdate) AS BIGINT) AS nulls_sdate,
             min(l_quantity) AS min_l_quantity,
             max(l_quantity) AS max_l_quantity,
             CAST(count(*) - count(l_quantity) AS BIGINT)
               AS nulls_l_quantity
      FROM lineitem GROUP BY 1
    ),
    pruned AS (
      SELECT *,
             coalesce(min_sdate <= '1998-12-31'
                      AND max_sdate >= '1997-06-01', FALSE)
             AND coalesce(min_l_quantity <= 40
                          AND max_l_quantity >= 10, FALSE) AS may_match
      FROM zm
    )
"""


def _zonemap_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "file_id",
        F.concat(
            F.date_format("l_shipdate", "yyyy"),
            F.lit("-f"),
            (F.col("l_orderkey") % 4).cast("string"),
        ),
    ).withColumn("sdate", F.date_format("l_shipdate", "yyyy-MM-dd"))
    zm = zonemap_stats(li, "file_id", ["sdate", "l_quantity"])
    return prune_files(
        zm,
        [
            ("sdate", "between", "1997-06-01", "1998-12-31"),
            ("l_quantity", "between", 10, 40),
        ],
    )


@_register(
    "z2_zonemap_prune",
    f"WITH {_ZM_MANIFEST_SQL} SELECT * FROM pruned",
)
def z2_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map manifest + conjunctive pruning (operators/zonemap.py):
    per-file min/max/null spans from ONE combinable aggregation, then
    ``may_match`` as pure interval-overlap column arithmetic over the
    file-sized manifest — nothing rescans data. may_match=False is a
    proof of emptiness (the one-sided zone-map contract)."""
    out = _zonemap_pruned(spark, sf_dir)
    return out.select(
        "file_id",
        "n_rows",
        "min_sdate",
        "max_sdate",
        "nulls_sdate",
        "min_l_quantity",
        "max_l_quantity",
        "nulls_l_quantity",
        "may_match",
    )


@_register(
    "z3_zonemap_skip_rate",
    f"""
    WITH {_ZM_MANIFEST_SQL}
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN NOT may_match THEN 1 ELSE 0 END) AS BIGINT)
             AS files_skipped,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN NOT may_match THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_skipped
    FROM pruned
    """,
)
def z3_zonemap_skip_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-quality rollup of the pruned manifest: how many files /
    rows a date-clustered layout lets the predicate skip — the metric
    a compaction or z-order job is judged by."""
    return skip_rate(_zonemap_pruned(spark, sf_dir))


# ---------------------------------------------------------------------------
# quality / planning pre-flights
# ---------------------------------------------------------------------------


@_register(
    "qc_fk_integrity",
    """
    WITH cc AS (
      SELECT l_partkey AS orphan_key, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    pk AS (
      SELECT DISTINCT p_partkey AS orphan_key FROM part
      WHERE p_partkey % 97 <> 0
    )
    SELECT CAST(cc.orphan_key AS BIGINT) AS orphan_key, cc.n_rows
    FROM cc LEFT JOIN pk ON cc.orphan_key = pk.orphan_key
    WHERE pk.orphan_key IS NULL
    """,
)
def qc_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity report (operators/quality.fk_integrity):
    lineitem part keys against a parent table with every 97th part
    withheld — both sides collapse to key cardinality before the
    anti-join, so a fact table checks at dimension scale."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 97 != 0)
    out = fk_integrity(li, part, "l_partkey", "p_partkey")
    return out.select(
        F.col("orphan_key").cast("bigint").alias("orphan_key"), "n_rows"
    )


@_register(
    "j18_join_size_estimate",
    """
    WITH ca AS (
      SELECT o_custkey % 100 AS k, CAST(count(*) AS BIGINT) AS ca
      FROM orders GROUP BY 1
    ),
    cb AS (
      SELECT c_custkey % 100 AS k, CAST(count(*) AS BIGINT) AS cb
      FROM customer GROUP BY 1
    ),
    pk AS (SELECT ca.k, ca * cb AS rows_k FROM ca JOIN cb ON ca.k = cb.k)
    SELECT CAST(coalesce(sum(rows_k), 0) AS BIGINT) AS join_rows,
           CAST(count(*) AS BIGINT) AS n_matching_keys,
           CAST(coalesce(max(rows_k), 0) AS BIGINT) AS max_key_rows
    FROM pk
    """,
)
def j18_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size pre-flight (operators/skew.join_size_estimate): the
    EXACT output cardinality of a many-to-many join from the two
    count tables — the broadcast/salt/sort-merge decision input,
    computed at key cardinality instead of shuffling the fact."""
    a = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 100).alias("k")
    )
    b = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 100).alias("k")
    )
    return join_size_estimate(a, b, ["k"])


@_register(
    "scd2_interval_validation",
    """
    WITH iv AS (
      SELECT o_custkey % 20 AS key,
             o_orderdate AS s,
             o_orderdate + INTERVAL ((o_orderkey % 5) + 1) DAY AS e,
             o_orderkey
      FROM orders WHERE o_orderkey < 2000
    ),
    flags AS (
      SELECT key,
             CASE WHEN e <= s THEN 1 ELSE 0 END AS dg,
             CASE WHEN lag(e) OVER w IS NOT NULL AND s < lag(e) OVER w
                  THEN 1 ELSE 0 END AS ov,
             CASE WHEN lag(e) OVER w IS NOT NULL AND s > lag(e) OVER w
                  THEN 1 ELSE 0 END AS gp
      FROM iv
      WINDOW w AS (PARTITION BY key ORDER BY s, e)
    )
    SELECT CAST(key AS BIGINT) AS key,
           CAST(sum(dg) AS BIGINT) AS n_degenerate,
           CAST(sum(ov) AS BIGINT) AS n_overlaps,
           CAST(sum(gp) AS BIGINT) AS n_gaps
    FROM flags GROUP BY key
    HAVING sum(dg) > 0 OR sum(ov) > 0 OR sum(gp) > 0
    """,
)
def scd2_interval_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 timeline validation (operators/scd2.validate_intervals):
    per-key overlap/gap/degenerate counts via one lag window — the
    dimension-health proof every interval join silently assumes.
    Synthetic validity windows over orders guarantee real overlaps
    AND gaps at every sf."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    iv = o.select(
        (F.col("o_custkey") % 20).alias("key"),
        F.col("o_orderdate").alias("s"),
        (
            F.col("o_orderdate")
            + ((F.col("o_orderkey") % 5) + 1).cast("int")
            * F.expr("INTERVAL 1 DAY")
        ).alias("e"),
    )
    out = validate_intervals(iv, "key", "s", "e")
    return out.select(
        F.col("key").cast("bigint").alias("key"),
        "n_degenerate",
        "n_overlaps",
        "n_gaps",
    )


# ---------------------------------------------------------------------------
# master-data merge + sequential analytics
# ---------------------------------------------------------------------------


@_register(
    "cdc_survivorship_merge",
    """
    WITH base AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_records,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
      FROM events GROUP BY user_id
    ),
    ck AS (
      SELECT user_id, value AS v_click,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ),
    vw AS (
      SELECT user_id, value AS v_view,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'view' AND value IS NOT NULL
    )
    SELECT b.user_id, b.n_records, b.last_ts, ck.v_click, vw.v_view
    FROM base b
    LEFT JOIN ck ON ck.user_id = b.user_id AND ck.rn = 1
    LEFT JOIN vw ON vw.user_id = b.user_id AND vw.rn = 1
    """,
)
def cdc_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (operators/cdc.survivorship_merge):
    per user, each field independently takes its latest NON-null
    value (a newer record with a null field must not erase older
    data) — one aggregation of per-field ``max_by`` with null-keyed
    ordering, ties broken by (ts, event_id)."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("value")).alias(
            "v_click"
        ),
        F.when(F.col("event_type") == "view", F.col("value")).alias(
            "v_view"
        ),
    )
    out = survivorship_merge(
        ev, "user_id", "ts", "event_id", ["v_click", "v_view"]
    )
    return out.select(
        "user_id",
        "n_records",
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "v_click",
        "v_view",
    )


@_register(
    "w21_time_weighted_average",
    """
    WITH seg AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(coalesce(sum(dur), 0) AS BIGINT) AS dur_us,
           CAST(CASE WHEN sum(dur) > 0
                THEN sum(v * dur) // sum(dur) END AS BIGINT) AS twa_scaled
    FROM seg GROUP BY user_id, day
    """,
)
def w21_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day) time-weighted mean of a piecewise-constant
    signal (operators/windows.time_weighted_average): exact BIGINT
    value·duration sums, one window pass + one combinable
    aggregation — the correct average for irregular samples."""
    ev = _events(spark, sf_dir)
    out = time_weighted_average(ev, "user_id", "ts", "value", "event_id")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_obs",
        "dur_us",
        "twa_scaled",
    )


@_register(
    "qc_cusum_changepoints",
    """
    WITH d AS (
      SELECT user_id, event_id, value, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) - 5500 AS dev
      FROM events WHERE user_id < 20
    ),
    p AS (
      SELECT user_id, event_id, value, ts,
             sum(dev) OVER w AS psum
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    p2 AS (
      SELECT user_id, event_id, value, psum,
             least(min(psum) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 0) AS rmin
      FROM p
    )
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id, value,
           CAST(psum - rmin AS BIGINT) AS cusum_scaled,
           (psum - rmin) > 20000 AS alarm
    FROM p2
    """,
)
def qc_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart (operators/drift.
    cusum_changepoints): the clipped recursion S_t = max(0, S_{t-1} +
    dev) replayed as prefix-sum minus running-prefix-min — two
    frame-identical windows, exact fixed-point BIGINT, no state."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 20)
    out = cusum_changepoints(
        ev,
        "user_id",
        "ts",
        "event_id",
        "value",
        reference=50.0,
        slack=5.0,
        threshold=200.0,
        scale=100,
    )
    return out.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "value",
        "cusum_scaled",
        "alarm",
    )
