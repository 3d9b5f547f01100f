"""Catalog wave 22 (round-3 restart, third batch): multi-touch
attribution, time-series resample + gap fill, containment dedup.

- ``j16_multitouch_attribution``: U-shaped positional credit
  (operators/attribution.py) — the weighted-all-touches complement
  to last-touch as-of (j13) and stream attribution (j12).
- ``w20_resample_ffill``: event stream → regular hourly grid with
  forward fill — the spine-assembly (J6) + ffill (W10) idioms
  composed into the canonical time-series resample.
- ``dd_containment_pairs``: asymmetric doc-in-doc near-dup
  (operators/dedup.containment_pairs) — Broder containment over the
  shingle inverted index; catches quoted/subset duplication that
  Jaccard structurally misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.attribution import multitouch_attribution
from ..operators.dedup import containment_pairs
from .catalog import _events, _register, _t
from .catalog_text import _SHINGLES

_W8 = "CAST(0.4 AS DOUBLE)"
_W2 = "CAST(0.2 AS DOUBLE)"

_MT_WEIGHT = f"""
      CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
           WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
           WHEN position = 1 THEN {_W8}
           WHEN position = n_touches THEN {_W8}
           ELSE {_W2} / (CAST(n_touches AS DOUBLE) - CAST(2.0 AS DOUBLE))
      END
"""


@_register(
    "j16_multitouch_attribution",
    f"""
    WITH t AS (
      SELECT user_id AS u, ts AS t_ts, event_id AS touch_id
      FROM events WHERE event_type = 'click'
    ),
    c AS (
      SELECT user_id AS u, ts AS c_ts, event_id AS conversion_id,
             value AS c_value
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.conversion_id, c.c_value, t.touch_id, t.t_ts
      FROM c JOIN t ON c.u = t.u
       AND t.t_ts < c.c_ts
       AND epoch_us(c.c_ts) - epoch_us(t.t_ts) <= 604800000000
    ),
    ranked AS (
      SELECT conversion_id, c_value, touch_id,
             row_number() OVER (
               PARTITION BY conversion_id ORDER BY t_ts, touch_id
             ) AS position,
             count(*) OVER (PARTITION BY conversion_id) AS n_touches
      FROM j
    )
    SELECT CAST(conversion_id AS BIGINT) AS conversion_id,
           CAST(touch_id AS BIGINT) AS touch_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(position AS BIGINT) AS position,
           {_MT_WEIGHT} AS weight,
           ({_MT_WEIGHT}) * c_value AS credited
    FROM ranked
    """,
)
def j16_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: every purchase splits its
    value 40/20/40 across the user's clicks in a 7-day lookback
    (operators/attribution.py). User-keyed band join + one
    conversation-sized window pass; exact decimal weights through a
    fixed expression tree make even the credited doubles hash-exact."""
    ev = _events(spark, sf_dir)
    touches = ev.where(F.col("event_type") == "click")
    conversions = ev.where(F.col("event_type") == "purchase")
    out = multitouch_attribution(touches, conversions)
    return out.select(
        F.col("conversion_id").cast("bigint").alias("conversion_id"),
        F.col("touch_id").cast("bigint").alias("touch_id"),
        "n_touches",
        "position",
        "weight",
        "credited",
    )


@_register(
    "w20_resample_ffill",
    """
    WITH users AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id FROM events),
    spine AS (
      SELECT u.user_id, h
      FROM users u CROSS JOIN (
        SELECT unnest(generate_series(
          TIMESTAMP '2024-01-01 00:00:00',
          TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS h
      )
    ),
    hourly AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             date_trunc('hour', ts) AS h, value,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    joined AS (
      SELECT s.user_id, s.h, hv.value
      FROM spine s LEFT JOIN (SELECT * FROM hourly WHERE rn = 1) hv
        ON s.user_id = hv.user_id AND s.h = hv.h
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ff
    FROM joined
    """,
)
def w20_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a regular hourly grid (first
    week of January) with per-user forward fill: month-spine assembly
    (J6) composed with ffill (W10) — hours before a user's first
    event stay NULL, every later hour carries the latest observation.
    The spine is generated, never scanned; one window shuffle on the
    user key."""
    ev = _events(spark, sf_dir)
    users = ev.select(
        F.col("user_id").cast("bigint").alias("user_id")
    ).distinct()
    spine = users.crossJoin(
        ev.sparkSession.range(1).select(
            F.explode(
                F.expr(
                    "sequence(timestamp'2024-01-01 00:00:00', "
                    "timestamp'2024-01-07 23:00:00', interval 1 hour)"
                )
            ).alias("h")
        )
    )
    from pyspark.sql.window import Window

    hw = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        ev.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "value",
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(hw))
        .where(F.col("rn") == 1)
        .select("user_id", "h", "value")
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    fw = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm").alias("hour"),
        F.last("value", ignorenulls=True).over(fw).alias("value_ff"),
    )


@_register(
    "dd_containment_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS s FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    tp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sc AS (
      SELECT tp.id_a, tp.id_b, CAST(tp.inter AS BIGINT) AS inter,
             CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
             CAST(greatest((tp.inter * 100) // sa.n,
                           (tp.inter * 100) // sb.n) AS BIGINT)
               AS containment_pct
      FROM tp JOIN sizes sa ON tp.id_a = sa.doc_id
              JOIN sizes sb ON tp.id_b = sb.doc_id
    )
    SELECT * FROM sc WHERE containment_pct >= 50
    """,
)
def dd_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric (doc-in-doc) near-dup pairs: Broder containment
    ``max(inter/|A|, inter/|B|) >= 50%`` over the shingle inverted
    index (operators/dedup.containment_pairs) — integer-percent
    scoring, pairs materialize only where shingles co-occur. The
    quote/subset leak detector Jaccard can't express."""
    docs = _t(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "text", "doc_id", shingle_n=3, min_containment_pct=50
    )
