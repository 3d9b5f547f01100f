"""Multi-touch marketing attribution (U-shaped / positional).

Each conversion distributes its value across the user's touchpoints
in a lookback window: 40% to the first touch, 40% to the last, 20%
split evenly across the middle (the standard position-based model;
1-touch paths take 100%, 2-touch paths 50/50). Complements the
last-touch model already covered by the as-of join (j13) and the
watermarked stream attribution join (j12) — those pick ONE touch,
this weights them all.

Shape at scale: touches join conversions on the USER key with a time
band — one hash shuffle each side, the same finite-state bound that
makes the streaming version's join state bounded — then ONE window
pass per conversion orders its touches. Touch counts per conversion
are conversation-sized (bounded by the lookback window), so the
window partitions are tiny by construction; no global sort anywhere.

Weights are exact decimal doubles (0.4, 0.5, 0.2) combined through a
fixed expression tree, so any engine reproduces the credited values
bit-for-bit — the same cross-engine float discipline as
operators/drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["multitouch_attribution", "timedecay_attribution"]


def multitouch_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    touch_id: str = "event_id",
    conv_id: str = "event_id",
    value_col: str = "value",
    lookback_seconds: int = 7 * 86400,
) -> DataFrame:
    """(conversion_id, touch_id, n_touches, position, weight,
    credited) — one row per (conversion, in-window touch).

    Touches strictly before the conversion and within the lookback
    band participate; simultaneous events are NOT touches of their
    own conversion (strict <). Deterministic order: (ts, touch_id).
    """
    t = touches.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t_ts"),
        F.col(touch_id).alias("touch_id"),
    )
    c = conversions.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("c_ts"),
        F.col(conv_id).alias("conversion_id"),
        F.col(value_col).alias("c_value"),
    )
    joined = c.join(t, "u").where(
        (F.col("t_ts") < F.col("c_ts"))
        & (
            F.unix_micros("c_ts") - F.unix_micros("t_ts")
            <= F.lit(int(lookback_seconds) * 1_000_000).cast("long")
        )
    )
    w = Window.partitionBy("conversion_id").orderBy("t_ts", "touch_id")
    wn = Window.partitionBy("conversion_id")
    pos = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    weight = (
        F.when(F.col("n_touches") == 1, F.lit(1.0))
        .when(F.col("n_touches") == 2, F.lit(0.5))
        .when(F.col("position") == 1, F.lit(0.4))
        .when(F.col("position") == F.col("n_touches"), F.lit(0.4))
        .otherwise(
            F.lit(0.2) / (F.col("n_touches").cast("double") - F.lit(2.0))
        )
    )
    return (
        joined.withColumn("position", pos)
        .withColumn("n_touches", n)
        .withColumn("weight", weight)
        .select(
            "conversion_id",
            "touch_id",
            F.col("n_touches").cast("bigint").alias("n_touches"),
            F.col("position").cast("bigint").alias("position"),
            "weight",
            (F.col("weight") * F.col("c_value")).alias("credited"),
        )
    )


def timedecay_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    touch_id: str = "event_id",
    conv_id: str = "event_id",
    value_col: str = "value",
    lookback_days: int = 7,
) -> DataFrame:
    """Time-decay multi-touch attribution: a touch's credit halves
    for every full day of age at conversion time (1-day half-life) —
    the recency-weighted complement to the positional model above.

    Exactness: raw weights are powers of two materialized as BIGINT
    ``shiftleft(1, lookback_days − age_days)`` — integer, so the
    per-conversion normalizer Σraw is shuffle-order independent, and
    the only float ops are one division and one multiply over exact
    operands (no pow/exp, per the engine's no-libm policy).

    Returns (conversion_id, touch_id, age_days, weight, credited);
    weights per conversion sum to 1 exactly in rational terms.
    """
    t = touches.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t_ts"),
        F.col(touch_id).alias("touch_id"),
    )
    c = conversions.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("c_ts"),
        F.col(conv_id).alias("conversion_id"),
        F.col(value_col).alias("c_value"),
    )
    joined = c.join(t, "u").where(
        (F.col("t_ts") < F.col("c_ts"))
        & (
            F.unix_micros("c_ts") - F.unix_micros("t_ts")
            <= F.lit(int(lookback_days) * 86_400_000_000).cast("long")
        )
    )
    # integer div, not float-divide-then-truncate: a quotient one ulp
    # above an integer would otherwise flip the age at µs boundaries
    age = F.expr(
        "(unix_micros(c_ts) - unix_micros(t_ts)) div 86400000000"
    ).cast("bigint")
    # SQL shiftleft accepts a column shift; the PySpark wrapper
    # insists on a Python int (same note as operators/hll.py)
    joined = joined.withColumn("age_days", age).withColumn(
        "__raw",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({int(lookback_days)} - age_days AS INT))"
        ),
    )
    wn = Window.partitionBy("conversion_id")
    weight = F.col("__raw").cast("double") / F.sum("__raw").over(wn).cast(
        "double"
    )
    return joined.select(
        "conversion_id",
        "touch_id",
        F.col("age_days").cast("bigint").alias("age_days"),
        weight.alias("weight"),
        (weight * F.col("c_value")).alias("credited"),
    )
