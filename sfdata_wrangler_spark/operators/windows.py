"""Window-operator library (SURVEY.md §2.5 W1–W14).

Every sorted-``iterrows`` / ``groupby().apply()`` sequential pass in
the reference becomes a Spark window function here. Windows shuffle
once on their partition keys and then run sorted within partitions —
the scale-correct shape for per-entity sequential logic (per card, per
cab, per route-direction), since entity counts are huge but per-entity
sequences are short.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _w(partition: Sequence[str], order: Sequence[str | Column]) -> WindowSpec:
    return Window.partitionBy(*partition).orderBy(*order)


def lag_delta_minutes(
    ts_col: str, partition: Sequence[str], order: Sequence[str]
) -> Column:
    """Minutes since the previous row's ``ts_col`` within the
    partition; null on the first row. The kernel under headways (W1)
    and Clipper tag-time diffs (W4). Microsecond-exact (integer epoch
    micros), so the comparison against a gap threshold is
    deterministic across engines."""
    w = _w(partition, order)
    us = F.unix_micros(F.col(ts_col))
    return (us - F.lag(us).over(w)) / 60000000.0


def headway_minutes(
    df: DataFrame,
    departure_col: str,
    partition: Sequence[str],
    out: str = "HEADWAY_S",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Scheduled headway (W1, ``GTFSHelper.py:87-104``): gap in minutes
    to the previous departure within (route, dir, headsign, stop).
    Pass a unique ``tiebreak`` column (trip id) — simultaneous
    departures are real in dense schedules."""
    return df.withColumn(
        out,
        lag_delta_minutes(
            departure_col, partition, [departure_col, *tiebreak]
        ),
    )


def observed_runtime(
    df: DataFrame,
    arrival_col: str,
    departure_col: str,
    partition: Sequence[str],
    order: Sequence[str],
    out: str = "RUNTIME",
) -> DataFrame:
    """Observed runtime (W2, ``SFMuniDataExpander.py:35-53``):
    max(0, arrival − previous stop's departure) minutes; 0 at the
    first stop."""
    from ..functions.metrics import portable_round

    w = _w(partition, order)
    prev_dep = F.lag(F.unix_micros(F.col(departure_col))).over(w)
    delta = (F.unix_micros(F.col(arrival_col)) - prev_dep) / 60000000.0
    return df.withColumn(
        out,
        F.coalesce(F.greatest(F.lit(0.0), portable_round(delta, 2)), F.lit(0.0)),
    )


def sessionize(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap_minutes: float = 90.0,
    extra_break: Column | None = None,
    session_col: str = "SESSION_ID",
    order_cols: Sequence[str] | None = None,
    strategy: str = "plain",
    knee_rows: int | None = None,
    bucket_minutes: float = 1440.0,
) -> DataFrame:
    """Cumsum-of-breaks sessionization — the shared kernel of Clipper
    linked trips (W4, ``ClipperHelper.py:204-246``) and taxi trip
    segmentation (W6, ``TaxiDataHelper.py:205-309``).

    A new session starts when the gap since the previous event exceeds
    ``gap_minutes`` OR ``extra_break`` (an arbitrary boolean Column,
    e.g. meter-status flip / position jump) is true. Session ids are
    1-based and contiguous per entity: the canonical
    ``1 + sum(is_break) over (unbounded preceding → current)``.

    ``order_cols`` should include a unique tie-breaker (event id) —
    timestamp ties would otherwise make the lag nondeterministic.

    ``strategy``: "plain" (default, this kernel) / "bucketed"
    (delegate to :func:`sessionize_bucketed`) / "auto" (VERDICT r11
    ask #5: one dimension-sized eager pre-flight agg —
    :func:`..skew.max_partition_rows` over ``entity_cols`` — picks
    bucketed iff the hottest entity exceeds ``knee_rows``; the
    measured knee is ~1M rows per entity at local[32], below which
    plain's single window shuffle beats bucketed's summary-merge
    overhead and above which plain's wall clock is the hot entity's
    single-task sort). ``knee_rows``/``bucket_minutes`` apply only to
    auto/bucketed. Auto never raises on inputs the plain form accepts
    (code-review r12 #4): with a non-``ts_col``-major ``order_cols``
    it stays plain (bucketing by time is only consistent with a
    time-major ordering), and when it picks bucketed it widens
    ``bucket_minutes`` to at least ``gap_minutes`` — an explicit
    ``strategy="bucketed"`` keeps the loud ValueError instead."""
    if strategy == "auto":
        if (list(order_cols) if order_cols else [ts_col])[0] != ts_col:
            strategy = "plain"
        else:
            strategy = choose_sessionize_strategy(
                df, entity_cols, knee_rows
            )
            bucket_minutes = max(bucket_minutes, gap_minutes)
    if strategy == "bucketed":
        return sessionize_bucketed(
            df, entity_cols, ts_col, gap_minutes, extra_break,
            session_col, order_cols, bucket_minutes,
        )
    if strategy != "plain":
        raise ValueError(
            f"strategy must be 'plain', 'bucketed' or 'auto', got {strategy!r}"
        )
    order = list(order_cols) if order_cols else [ts_col]
    gap = lag_delta_minutes(ts_col, entity_cols, order)
    is_break = gap > gap_minutes
    if extra_break is not None:
        is_break = is_break | extra_break
    wcum = _w(entity_cols, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col,
        (F.lit(1) + F.sum(F.when(is_break, 1).otherwise(0)).over(wcum)).cast("bigint"),
    )


def choose_sessionize_strategy(
    df: DataFrame, entity_cols: Sequence[str], knee_rows: int | None = None
) -> str:
    """The ``sessionize(strategy="auto")`` pick, exposed for direct use
    and for pinning in tests: "bucketed" iff the hottest entity
    exceeds ``knee_rows`` (measured: a 4M-row hot user costs plain
    5.2× vs bucketed 2.7× growth, while below ~1M hot rows plain wins
    0.78-0.94s vs 1.33-1.40s — ARCHITECTURE round-11 skew tables).
    ``knee_rows=None`` (the default since r13) derives the knee from
    the session via :func:`..skew.default_knee_rows` — 125k rows/task
    × (P // 4) tasks, reproducing the measured 1M at local[32] and
    scaling with cluster parallelism (derivation + assumptions in its
    docstring)."""
    from .skew import default_knee_rows, max_partition_rows

    if knee_rows is None:
        knee_rows = default_knee_rows(df.sparkSession)
    return (
        "bucketed"
        if max_partition_rows(df, entity_cols) > knee_rows
        else "plain"
    )


def sessionize_bucketed(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap_minutes: float = 90.0,
    extra_break: Column | None = None,
    session_col: str = "SESSION_ID",
    order_cols: Sequence[str] | None = None,
    bucket_minutes: float = 1440.0,
) -> DataFrame:
    """Skew-immune :func:`sessionize`: identical session ids, but the
    per-entity window is split by a coarse time bucket so a hot entity
    (SURVEY §4 "hot users" — a bot card with 40% of all events) never
    lands on one task. Same class of fix as
    ``calc_weights(strategy="agg")``: AQE can split skewed JOINS but
    never window partitions, so the only scale-safe form is a plan
    whose window partitions are bounded by construction.

    Two phases:

    1. sessionize locally within ``(entity, floor(ts / bucket))`` —
       the fact shuffles ONCE on that compound key, and the heaviest
       task is one entity's one bucket, not its lifetime;
    2. an entity-level window over per-BUCKET summaries (first/last
       event time, local session count, first-row break flag) decides
       which bucket-boundary sessions merge and assigns each bucket a
       session-number offset. The summary table has one row per
       (entity, non-empty bucket) — timeline-length-sized, not
       event-sized — so even the hot entity's summary partition is
       tiny. The offsets join back on the compound key, which reuses
       phase 1's partitioning (no second fact shuffle).

    Correctness of the merge rule: ``bucket_minutes`` must be >=
    ``gap_minutes``, so any pair of events separated by an EMPTY
    bucket is more than ``gap_minutes`` apart and the cross-boundary
    gap test alone decides the merge — no adjacency bookkeeping.
    ``order_cols`` must be ``ts_col``-major (the default is) —
    bucketing by time is only consistent with a time-major ordering.

    Cost shape: the summary branch recomputes its lineage rather than
    persisting the phase-1 output — Catalyst prunes that second pass
    to (entity, bucket, ts-micros, row-number, break-flag) regardless
    of the fact's width (verified in EXPLAIN.md round 11), and two
    NARROW scan+shuffle passes beat materializing the full-width fact
    to disk per call. Use the plain :func:`sessionize` below the knee
    (measured ~1M rows per hot entity at local[32]); above it the
    plain form's wall clock IS the hot entity's single-task sort.
    """
    if bucket_minutes < gap_minutes:
        raise ValueError(
            f"bucket_minutes ({bucket_minutes}) must be >= gap_minutes "
            f"({gap_minutes}) — an empty bucket must imply a session break"
        )
    order = list(order_cols) if order_cols else [ts_col]
    if order[0] != ts_col:
        raise ValueError(
            f"order_cols must be {ts_col!r}-major for time-bucketed "
            f"sessionization, got {order!r}"
        )
    from ._scratch import reject_scratch_columns

    entity = list(entity_cols)
    reject_scratch_columns(df, "__sb_", "sessionize_bucketed")
    us = F.unix_micros(F.col(ts_col))
    bucket_us = int(bucket_minutes * 60_000_000)
    d = df.withColumn("__sb_us", us).withColumn(
        "__sb_bucket", F.floor(F.col("__sb_us") / bucket_us)
    )
    # coalesce to False: a NULL extra flag never breaks in the plain
    # form either ((gap>thr) | NULL counts a break only when the gap
    # side is already True), but a NULL surviving into the phase-2
    # delta (True & ~NULL = NULL) would silently DROP a gap break on a
    # bucket's first row (code-review r11 #6, confirmed by repro)
    d = d.withColumn(
        "__sb_extra",
        F.coalesce(
            (extra_break if extra_break is not None else F.lit(False)).cast(
                "boolean"
            ),
            F.lit(False),
        ),
    )

    # phase 1: local sessionize within (entity, bucket). The first row
    # of a bucket has no local lag; its cross-bucket gap-break is
    # reconstructed in phase 2 (its extra_break still counts here,
    # exactly as in the plain form).
    wloc = _w(entity + ["__sb_bucket"], order)
    gap_loc = (F.col("__sb_us") - F.lag("__sb_us").over(wloc)) / 60000000.0
    is_break_loc = F.coalesce(gap_loc > gap_minutes, F.lit(False)) | F.col(
        "__sb_extra"
    )
    d = d.withColumn(
        "__sb_local",
        (
            F.lit(1)
            + F.sum(F.when(is_break_loc, 1).otherwise(0)).over(
                wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).cast("bigint"),
    ).withColumn("__sb_rn", F.row_number().over(wloc))

    # phase 2: per-bucket summaries, then an entity-level window over
    # them. delta_b = 1 iff the bucket's first row starts a session in
    # the PLAIN form but not locally: cross-bucket gap > threshold and
    # the row's extra flag did not already break it locally.
    summ = d.groupBy(*entity, "__sb_bucket").agg(
        F.max("__sb_local").alias("__sb_nloc"),
        F.min("__sb_us").alias("__sb_first_us"),
        F.max("__sb_us").alias("__sb_last_us"),
        F.max(
            F.when(F.col("__sb_rn") == 1, F.col("__sb_extra"))
        ).alias("__sb_first_extra"),
    )
    wsum = _w(entity, ["__sb_bucket"])
    cross_gap = (
        F.col("__sb_first_us") - F.lag("__sb_last_us").over(wsum)
    ) / 60000000.0
    delta = F.when(
        F.coalesce(cross_gap > gap_minutes, F.lit(False))
        & ~F.col("__sb_first_extra"),
        F.lit(1),
    ).otherwise(F.lit(0))
    summ = summ.withColumn("__sb_delta", delta).withColumn(
        "__sb_offset",
        F.coalesce(
            F.sum(F.col("__sb_nloc") - 1 + F.col("__sb_delta")).over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    # null-safe join-back: plain sessionize KEEPS rows with NULL
    # entity keys or NULL timestamps (windows group nulls together; a
    # NULL gap is simply no break), so a plain equi-join here would
    # silently drop them (code-review r11). The summary window's
    # nulls-first bucket ordering matches the plain form's nulls-first
    # timestamp ordering, so the merge algebra already agrees — only
    # the join needed null safety (the shared skew.join_back_nullsafe
    # construction since r13).
    from .skew import join_back_nullsafe

    join_keys = entity + ["__sb_bucket"]
    out = join_back_nullsafe(
        d,
        summ.select(*join_keys, "__sb_delta", "__sb_offset"),
        join_keys,
        "__sb_k_",
    ).withColumn(
        session_col,
        (
            F.col("__sb_local") + F.col("__sb_offset") + F.col("__sb_delta")
        ).cast("bigint"),
    )
    # preserve the plain form's column contract: replace-in-place when
    # session_col already existed, append otherwise (and undo the
    # join's column reordering for positional consumers)
    final = list(df.columns)
    if session_col not in final:
        final.append(session_col)
    return out.select(*final)


def running_sum(
    df: DataFrame,
    col: Column,
    partition: Sequence[str],
    order: Sequence[str],
    out: str,
) -> DataFrame:
    """Running cumulative sum (W8 running load,
    ``TransitReporter.py:993-1008``), null-skipping like pandas."""
    w = _w(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(col).over(w))


def ffill(
    df: DataFrame, col: str, partition: Sequence[str], order: Sequence[str], out: str | None = None
) -> DataFrame:
    """Forward-fill (W10, ``MultiModalHelper.py:151-156``):
    last non-null value at or before the current row."""
    w = _w(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out or col, F.last(col, ignorenulls=True).over(w))


def bfill(
    df: DataFrame, col: str, partition: Sequence[str], order: Sequence[str], out: str | None = None
) -> DataFrame:
    """Backward-fill: first non-null value at or after the current row."""
    w = _w(partition, order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return df.withColumn(out or col, F.first(col, ignorenulls=True).over(w))


def dedup_by_order(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str]
) -> DataFrame:
    """Deterministic ``drop_duplicates`` (P5): keep the first row per
    key under an EXPLICIT ordering. The reference's pandas dedup keeps
    whatever the prior sort left first (``SFMuniDataHelper.py:524``);
    distributed execution has no ambient order, so the ordering is part
    of the operator's signature here."""
    w = _w(keys, order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def trend_diff(
    df: DataFrame,
    col: str,
    partition: Sequence[str],
    order: Sequence[str],
    periods: int = 12,
) -> DataFrame:
    """12-period difference / ratio trends (W14,
    ``TransitReporter.py:637-941`` Excel formulas brought into the
    engine): ``<col>_DIFF{p}`` and ``<col>_PCT{p}``."""
    w = _w(partition, order)
    prev = F.lag(col, periods).over(w)
    return df.withColumn(f"{col}_DIFF{periods}", F.col(col) - prev).withColumn(
        f"{col}_PCT{periods}",
        F.when(prev != 0, F.col(col) / prev - 1.0),
    )


def interpolate_monthly(
    df: DataFrame,
    month_col: str,
    value_col: str,
    partition: Sequence[str] = (),
    out: str | None = None,
) -> DataFrame:
    """Linear interpolation over an (already joined) month spine (W11,
    ``DemandHelper.py:1559-1619``): for null months between two
    observed values, interpolate linearly on month index; endpoints
    are left as-is (the reference's trend extrapolation is a separate,
    explicit step).

    Pure window composition: bracketing values via
    ``last(ignorenulls)`` looking back and ``first(ignorenulls)``
    looking forward — one shuffle on ``partition``.
    """
    out = out or value_col
    idx = F.year(month_col) * 12 + F.month(month_col)
    back = _w(partition, [month_col]).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = _w(partition, [month_col]).rowsBetween(Window.currentRow, Window.unboundedFollowing)

    with_idx = df.withColumn("__midx", idx)
    prev_val = F.last(value_col, ignorenulls=True).over(back)
    next_val = F.first(value_col, ignorenulls=True).over(fwd)
    prev_idx = F.last(
        F.when(F.col(value_col).isNotNull(), F.col("__midx")), ignorenulls=True
    ).over(back)
    next_idx = F.first(
        F.when(F.col(value_col).isNotNull(), F.col("__midx")), ignorenulls=True
    ).over(fwd)

    frac = (F.col("__midx") - prev_idx) / (next_idx - prev_idx)
    interp = prev_val + (next_val - prev_val) * frac
    return with_idx.withColumn(
        out,
        F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
            F.when(prev_idx.isNotNull() & next_idx.isNotNull(), interp)
        ),
    ).drop("__midx")


def ewma_bounded(
    df,
    partition: Sequence[str],
    order: Sequence[str],
    value_col: str,
    depth: int = 8,
    out: str = "ewma",
):
    """Bounded exponential moving average with dyadic weights
    ``2^-1, 2^-2, ..., 2^-depth`` over the last ``depth`` rows.

    The truncated-EWMA form (rather than the recursive one) for two
    deliberate reasons: the recursion ``e_t = a*x_t + (1-a)*e_{t-1}``
    is not expressible as a SQL window (it needs per-row state), and
    dyadic weights make every product EXACT in IEEE doubles (scaling
    by a power of two only touches the exponent), so a fixed
    left-to-right sum of the ``depth`` lag terms is reproduced
    bit-for-bit by any engine evaluating the same expression tree —
    the property that lets an oracle hash-check a float column.
    Missing lags (the first rows of each partition) contribute 0.0,
    matching a zero-history prior. One window shuffle on
    ``partition``; depth lags all ride the same sorted frame.
    """
    w = _w(partition, list(order))
    terms = [
        F.coalesce(F.lag(F.col(value_col), k).over(w), F.lit(0.0))
        / F.lit(float(2 ** (k + 1)))
        for k in range(depth)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return df.withColumn(out, acc)


def rolling_distinct_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Exact rolling-window distinct-user counts (the DAU/WAU panel):
    per day, how many distinct users were active in the trailing
    ``window_days`` window ending that day, plus that day's own DAU
    and an integer-basis-point stickiness ratio.

    Distinct counts are NOT additive, so no range-frame window can
    compute this. The scalable exact construction: reduce to (user,
    day) activity first (the big shuffle, map-side combinable), then
    explode each activity day into the ``window_days`` window-ends it
    contributes to and dedup (user, window_end) — a bounded ×W
    row multiplication of the already-day-granular frame, NOT of the
    raw events. At 100 TB the (user, day) reduction is ~1e9 rows and
    the ×7 explode stays executor-sized; the approximate alternative
    (per-day HLL registers merged over the window — operators/hll.py)
    drops the explode when W is large.

    Windows with no activity produce no row (mirrored by the oracle).
    Returns (win_day DATE, wau, dau, stickiness_bp) with
    ``stickiness_bp = dau·10000 div wau``.
    """
    per_day = df.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    contrib = per_day.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"),
                F.date_add(F.col("d"), window_days - 1),
            )
        ).alias("win_day"),
    ).distinct()
    wau = contrib.groupBy("win_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    dau = per_day.groupBy(F.col("d").alias("win_day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    return (
        wau.join(dau, "win_day", "left")
        .withColumn("dau", F.coalesce("dau", F.lit(0).cast("bigint")))
        .select(
            "win_day",
            "wau",
            "dau",
            F.expr("(dau * 10000) div wau").cast("bigint").alias(
                "stickiness_bp"
            ),
        )
    )


def rolling_distinct_users_hll(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
    p_hex: int = 2,
    tail_hex: int = 12,
) -> DataFrame:
    """Approximate rolling-window distinct users — the large-W swap
    :func:`rolling_distinct_users` documents.

    The exact construction explodes the (user, day) frame ×W; here
    each DAY is first collapsed to an HLL register table (≤ 16^p_hex
    rows — corpus-independent), the ×W explode multiplies only those
    bounded tables, and window merge is register-max
    (operators/hll.py). Cost per window-end is O(W · 16^p_hex)
    regardless of user cardinality, so a 365-day window over billions
    of users is the same shuffle as a 7-day one over thousands.
    Returns (win_day, hll_est) with the raw-HLL estimator's
    ~1.04/√m relative error.
    """
    from .hll import hll_estimate, hll_sketch

    daily = hll_sketch(
        df.select(
            F.to_date(F.col(ts_col)).alias("d"), F.col(user_col)
        ),
        ["d"],
        user_col,
        p_hex=p_hex,
        tail_hex=tail_hex,
    )
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("win_day"),
        "bucket",
        "max_rank",
    )
    regs = contrib.groupBy("win_day", "bucket").agg(
        F.max("max_rank").cast("int").alias("max_rank")
    )
    return hll_estimate(regs, ["win_day"], p_hex=p_hex, tail_hex=tail_hex)


def time_weighted_average(
    df: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    scale: int = 100,
) -> DataFrame:
    """Per (group, day) time-weighted mean of a piecewise-constant
    signal — the correct average for irregularly-sampled state
    (prices, sensor readings, occupancy): each observation holds
    until the next one that day; a plain row-mean over-weights
    chatty periods.

    The day's LAST observation carries zero duration (its value
    holds past the day boundary, which this day cannot see — the
    no-lookahead convention; resample+ffill, w20, is the spine-based
    alternative when boundary carry matters). Groups whose day has a
    single observation therefore report NULL twa.

    Exactness: values go to fixed-point (``scale`` units), durations
    to epoch microseconds; Σ(value·duration) and Σduration are
    BIGINT (order-independent), one integer div at the end. One
    window pass + one combinable aggregation, both keyed by
    (group, day).
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    w = Window.partitionBy(group_col, F.to_date(F.col(ts_col))).orderBy(
        ts_col, id_col
    )
    vq = F.floor(F.col(value_col) * scale + 0.5).cast("bigint")
    dur = (
        F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    ).cast("bigint")
    seg = df.select(
        F.col(group_col),
        day,
        vq.alias("__v"),
        dur.alias("__dur"),
    )
    return seg.groupBy(group_col, "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.coalesce(F.sum("__dur"), F.lit(0)).cast("bigint").alias("dur_us"),
        F.expr(
            "CASE WHEN sum(__dur) > 0 "
            "THEN sum(__v * __dur) div sum(__dur) END"
        )
        .cast("bigint")
        .alias("twa_scaled"),
    )


def debounce_events(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_seconds: int = 5,
) -> DataFrame:
    """Burst deduplication ("debounce"): within each key, events
    closer than ``tolerance_seconds`` to their predecessor belong to
    the same burst; keep the burst's FIRST event, annotated with the
    burst size — the double-click / retry-storm / sensor-chatter
    cleaner that exact dedup (identical payloads) cannot express.

    Gaps-and-islands in one window pass: a burst starts where the
    gap to the previous event exceeds the tolerance; the burst id is
    the running count of starts (same idiom as sessionize, but
    keep-first semantics rather than aggregate). All comparisons in
    integer epoch microseconds.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    is_start = F.when(
        gap_us.isNull()
        | (gap_us > F.lit(int(tolerance_seconds) * 1_000_000)),
        1,
    ).otherwise(0)
    with_burst = df.withColumn("__start", is_start).withColumn(
        "__burst",
        F.sum("__start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wb = Window.partitionBy(*keys, "__burst")
    annotated = with_burst.withColumn(
        "__first_id",
        F.min_by(F.col(id_col), F.struct(ts_col, id_col)).over(wb),
    ).withColumn("burst_size", F.count(F.lit(1)).over(wb).cast("bigint"))
    return annotated.where(F.col(id_col) == F.col("__first_id")).drop(
        "__start", "__burst", "__first_id"
    )
