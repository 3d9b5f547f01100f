"""Clipper smart-card linked-trip inference (SURVEY.md W4/W5,
``ClipperHelper.py:141-265``).

Per card, ordered by tag-on time: a tag within 90 minutes of the
previous one is a TRANSFER; each non-transfer starts a new linked
trip; ``From_*`` attributes carry from the previous leg; per-leg
weights divide the card-day weight by (1 + transfers in the linked
trip). All window functions over (card) — one shuffle — in the
default form; ``strategy="auto"`` (VERDICT r12 ask #2) swaps in the
time-bucketed skew-immune twin when a pre-flight finds a hot card
past the knee (SURVEY §4: a bot card with a dominant share of all
tags straggles every per-card window on one task, and AQE cannot
split window partitions).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.datetime_fns import dow_class, service_date_rollover
from ..operators.skew import join_back_nullsafe

_log = logging.getLogger(__name__)

TRANSFER_MINUTES = 90.0

# static DOW expansion weights (``ClipperHelper.py:45-71``): Clipper
# files are a sample of 2 weekdays / 15, 2 Saturdays / 3, 2 Sundays / 3
DOW_WEIGHTS = {1: 15.0 / 2.0, 2: 3.0 / 2.0, 3: 3.0 / 2.0}


def infer_linked_trips(
    df: DataFrame,
    card_col: str = "ClipperCardID",
    ts_col: str = "TagOnTime",
    seq_col: str = "TripSequenceID",
    carry_cols: tuple[str, ...] = ("AgencyName", "RouteName"),
    strategy: str = "plain",
    knee_rows: int | None = None,
    bucket_minutes: float = 1440.0,
) -> DataFrame:
    """Returns the input plus SERVICE_DATE, DOW, TIMEDIFF_TAGON,
    TRANSFER, LINKED_TRIP_ID, LINKED_TRANSFERS, WEIGHT, LINKED_WEIGHT,
    and From_<carry> columns.

    ``strategy``: "plain" (default — per-card windows, one shuffle) /
    "bucketed" (the skew-immune twin below) / "auto" (one
    dimension-sized pre-flight, ``skew.max_partition_rows`` over the
    card column, picks bucketed iff the hottest card exceeds
    ``knee_rows`` — defaulting to ``skew.default_knee_rows`` x
    ``skew.PIPELINE_KNEE_FACTOR``: the FULL pipeline's bucketed twin
    pays 3-4 narrow fact passes, so its measured crossover (~8M hot
    rows at local[32], tools/pipeline_skew_probe.py) sits 8x above
    the bare sessionize knee — and LOGS the pick). Identical output by construction
    (equivalence-tested) under the Clipper data contract the bucketed
    decomposition needs: per card, ``seq_col`` order agrees with
    ``ts_col`` order (sequence ids are assigned by tag-on time) and
    tag times are non-null — the plain form tolerates violations by
    simply ordering on ``seq_col``, the bucketed form buckets by time
    and would split an out-of-order card inconsistently."""
    from ..operators.skew import (
        PIPELINE_KNEE_FACTOR,
        resolve_window_strategy,
    )

    strategy = resolve_window_strategy(
        df, [card_col], strategy, knee_rows, _log, "infer_linked_trips",
        knee_factor=PIPELINE_KNEE_FACTOR, ts_col=ts_col,
    )
    if strategy == "bucketed":
        return _infer_linked_trips_bucketed(
            df, card_col, ts_col, seq_col, carry_cols, bucket_minutes
        )
    w = Window.partitionBy(card_col).orderBy(seq_col)
    us = F.unix_micros(F.col(ts_col))
    out = (
        df.withColumn("SERVICE_DATE", service_date_rollover(F.col(ts_col)))
        .withColumn("DOW", dow_class(F.col("SERVICE_DATE")))
        .withColumn("TIMEDIFF_TAGON", (us - F.lag(us).over(w)) / 60000000.0)
        .withColumn(
            "TRANSFER",
            F.when(
                F.col("TIMEDIFF_TAGON") < TRANSFER_MINUTES, 1
            ).otherwise(0),
        )
    )
    for c in carry_cols:
        out = out.withColumn(f"From_{c}", F.lag(c).over(w))
    # linked-trip id: cumsum of non-transfers (the sessionization kernel)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = out.withColumn(
        "LINKED_TRIP_ID",
        F.sum(F.when(F.col("TRANSFER") == 0, 1).otherwise(0)).over(wcum),
    )
    # transfers within each linked trip (A2 grouped transform:
    # ``ClipperHelper.py:250-252``)
    wlink = Window.partitionBy(card_col, "LINKED_TRIP_ID")
    out = out.withColumn(
        "LINKED_TRANSFERS", F.sum("TRANSFER").over(wlink)
    )
    return _clipper_weights(out)


def _clipper_weights(out: DataFrame) -> DataFrame:
    """DOW weights + linked weight (``ClipperHelper.py:254-258``) —
    row-wise, shared by both strategies."""
    weight = (
        F.when(F.col("DOW") == 1, F.lit(DOW_WEIGHTS[1]))
        .when(F.col("DOW") == 2, F.lit(DOW_WEIGHTS[2]))
        .otherwise(F.lit(DOW_WEIGHTS[3]))
    )
    return out.withColumn("WEIGHT", weight).withColumn(
        "LINKED_WEIGHT", weight / (1 + F.col("LINKED_TRANSFERS"))
    )


def _infer_linked_trips_bucketed(
    df: DataFrame,
    card_col: str,
    ts_col: str,
    seq_col: str,
    carry_cols: tuple[str, ...],
    bucket_minutes: float,
) -> DataFrame:
    """Skew-immune :func:`infer_linked_trips`: identical columns, but
    no window ever partitions on the bare card (the same construction
    as ``operators.windows.sessionize_bucketed``, generalized to carry
    LAG STATE — previous tag time and ``From_*`` attributes — across
    bucket boundaries):

    1. per-(card, time-bucket) windows compute the local lags; the
       heaviest task holds one card's one DAY (default bucket), not
       its lifetime;
    2. ONE per-(card, bucket) summary row (last tag time / carry
       values by max seq) feeds a card-level lag over summaries —
       timeline-length-sized, tiny even for the hot card — which
       repairs each bucket's FIRST row; TIMEDIFF/TRANSFER/From_* are
       then row-wise;
    3. LINKED_TRIP_ID = local cumsum of non-transfers + per-bucket
       offsets from a second summary window;
    4. LINKED_TRANSFERS switches from a card-session window to
       groupBy + join-back — the join IS AQE-skew-splittable where a
       window partition never is, covering the adversarial
       one-giant-linked-trip card.

    ``bucket_minutes`` must be >= TRANSFER_MINUTES only for
    EFFICIENCY symmetry with sessionize_bucketed's merge rule — here
    correctness does not depend on it because the cross-boundary lag
    is carried explicitly, not reconstructed from emptiness; the
    default (1 day) spreads a 40%-of-feed bot card over ~30 tasks per
    month of data.

    All arithmetic that decides ids is exact (integer cumsum,
    microsecond longs), so plain and bucketed are bitwise-equal on
    any input satisfying the seq/ts-consistency contract in
    :func:`infer_linked_trips`'s docstring."""
    from ..operators._scratch import reject_scratch_columns

    reject_scratch_columns(df, "__lt_", "infer_linked_trips(bucketed)")
    us = F.unix_micros(F.col(ts_col))
    bucket_us = int(bucket_minutes * 60_000_000)
    d = (
        df.withColumn("__lt_us", us)
        .withColumn("__lt_bucket", F.floor(F.col("__lt_us") / bucket_us))
    )

    # phase 1: local lags within (card, bucket), ordered by seq —
    # identical ordering to the plain form under the data contract
    wloc = Window.partitionBy(card_col, "__lt_bucket").orderBy(seq_col)
    d = d.withColumn("__lt_prev_us", F.lag("__lt_us").over(wloc)).withColumn(
        "__lt_rn", F.row_number().over(wloc)
    )
    for c in carry_cols:
        d = d.withColumn(f"__lt_prev_{c}", F.lag(c).over(wloc))

    # phase 2: per-bucket last-row state, lagged per card — the carry
    # each bucket's first row needs. max_by(..., seq) = the bucket's
    # last row in plain order.
    # ONE max_by over a struct of every carried field (code-review r13
    # #1, taxi's lesson applied here too): even if seq ever tied
    # within a card, the carry is always a REAL row, never a mixture
    # of independently tie-broken aggregates.
    summ = d.groupBy(card_col, "__lt_bucket").agg(
        F.max_by(
            F.struct(
                F.col("__lt_us").alias("us"),
                *[F.col(c).alias(f"c{i}") for i, c in enumerate(carry_cols)],
            ),
            F.col(seq_col),
        ).alias("__lt_last")
    )
    wsum = Window.partitionBy(card_col).orderBy("__lt_bucket")
    summ = summ.select(
        card_col,
        "__lt_bucket",
        F.lag("__lt_last.us").over(wsum).alias("__lt_carry_us"),
        *[
            F.lag(f"__lt_last.c{i}").over(wsum).alias(f"__lt_carry_{c}")
            for i, c in enumerate(carry_cols)
        ],
    )
    d = join_back_nullsafe(d, summ, [card_col, "__lt_bucket"], "__lt_k_")

    first = F.col("__lt_rn") == 1
    prev_us = F.when(first, F.col("__lt_carry_us")).otherwise(
        F.col("__lt_prev_us")
    )
    out = (
        d.withColumn("SERVICE_DATE", service_date_rollover(F.col(ts_col)))
        .withColumn("DOW", dow_class(F.col("SERVICE_DATE")))
        .withColumn(
            "TIMEDIFF_TAGON", (F.col("__lt_us") - prev_us) / 60000000.0
        )
        .withColumn(
            "TRANSFER",
            F.when(
                F.col("TIMEDIFF_TAGON") < TRANSFER_MINUTES, 1
            ).otherwise(0),
        )
    )
    for c in carry_cols:
        out = out.withColumn(
            f"From_{c}",
            F.when(first, F.col(f"__lt_carry_{c}")).otherwise(
                F.col(f"__lt_prev_{c}")
            ),
        )

    # phase 3: linked-trip id = local cumsum + earlier-bucket offsets
    brk = F.when(F.col("TRANSFER") == 0, 1).otherwise(0)
    out = out.withColumn(
        "__lt_local",
        F.sum(brk).over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    off = out.groupBy(card_col, "__lt_bucket").agg(
        F.sum(brk).alias("__lt_nbrk")
    )
    off = off.select(
        card_col,
        "__lt_bucket",
        F.coalesce(
            F.sum("__lt_nbrk").over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__lt_offset"),
    )
    out = join_back_nullsafe(out, off, [card_col, "__lt_bucket"], "__lt_o_")
    out = out.withColumn(
        "LINKED_TRIP_ID", F.col("__lt_local") + F.col("__lt_offset")
    )

    # phase 4: transfers per linked trip — groupBy + join-back, the
    # AQE-splittable form of the plain card-session window
    per_trip = out.groupBy(card_col, "LINKED_TRIP_ID").agg(
        F.sum("TRANSFER").alias("__lt_ltrans")
    )
    out = join_back_nullsafe(
        out,
        per_trip.select(
            card_col, "LINKED_TRIP_ID",
            F.col("__lt_ltrans").alias("LINKED_TRANSFERS"),
        ),
        [card_col, "LINKED_TRIP_ID"],
        "__lt_t_",
    )
    out = _clipper_weights(out)

    final = list(df.columns) + [
        "SERVICE_DATE", "DOW", "TIMEDIFF_TAGON", "TRANSFER",
        *[f"From_{c}" for c in carry_cols],
        "LINKED_TRIP_ID", "LINKED_TRANSFERS", "WEIGHT", "LINKED_WEIGHT",
    ]
    return out.select(*final)

