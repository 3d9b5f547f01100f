"""Distribution-drift and robust-outlier QC.

Data-quality monitors for a long-lived pipeline: did this month's
feed change shape against the reference cohort, and which rows are
wild? Both are one-or-two-aggregation jobs whose outputs are
category- or group-sized — nothing here scales with row count except
the scans.

- ``chisq_drift``: per-category chi-square contributions between two
  cohorts of the same stream. Deliberately chi-square and not
  PSI/KL: those need a logarithm, which is libm- (not IEEE-)
  defined and therefore unverifiable bit-for-bit across engines —
  the same no-``ln`` policy as operators/lm.py. The statistic is
  emitted PER CATEGORY (not summed) so every output value is a
  fixed-order arithmetic tree over exact integer counts — summing
  k float terms across categories would be shuffle-order-dependent.
  Callers wanting the scalar statistic sum client-side over the
  (tiny, category-sized) result.
- ``mad_outliers``: per-group robust outlier counts via median /
  median-absolute-deviation. Medians use exact ``percentile`` —
  bit-identical to DuckDB's ``quantile_cont`` (proved by
  prof_quantiles) — and the 3-sigma-equivalent fence ``|x - med| >
  k * MAD`` is pure comparison, so the whole check is hash-exact
  cross-engine. Two passes by necessity (the fence depends on the
  group median); both are the same hash shuffle on the group key, so
  the second pass co-locates for free under AQE.

Reference parity: QC filters P2-P4 (SURVEY §2.2) are static
predicates; these are their statistical upgrades for feeds where the
failure mode is distributional, not row-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chisq_drift", "mad_outliers"]


def chisq_drift(
    df: DataFrame, category_col: str, in_ref: Column
) -> DataFrame:
    """Per-category drift contributions between the reference cohort
    (``in_ref`` true) and the current cohort (false).

    Output: (category, n_ref, n_cur, exp_ref, exp_cur, chisq_term)
    where expectations scale the category total by the cohort share
    and ``chisq_term = (n_ref-exp_ref)^2/exp_ref +
    (n_cur-exp_cur)^2/exp_cur`` — all from BIGINT counts through a
    fixed-shape expression, so any engine reproduces the doubles
    exactly.
    """
    per_cat = df.groupBy(F.col(category_col).alias("category")).agg(
        F.sum(F.when(in_ref, 1).otherwise(0)).cast("bigint").alias("n_ref"),
        F.sum(F.when(in_ref, 0).otherwise(1)).cast("bigint").alias("n_cur"),
    )
    totals = per_cat.agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    j = per_cat.crossJoin(F.broadcast(totals))
    cat_total = (F.col("n_ref") + F.col("n_cur")).cast("double")
    grand = (F.col("t_ref") + F.col("t_cur")).cast("double")
    exp_ref = cat_total * F.col("t_ref").cast("double") / grand
    exp_cur = cat_total * F.col("t_cur").cast("double") / grand
    d_ref = F.col("n_ref").cast("double") - exp_ref
    d_cur = F.col("n_cur").cast("double") - exp_cur
    return j.select(
        "category",
        "n_ref",
        "n_cur",
        exp_ref.alias("exp_ref"),
        exp_cur.alias("exp_cur"),
        (d_ref * d_ref / exp_ref + d_cur * d_cur / exp_cur).alias(
            "chisq_term"
        ),
    )


def mad_outliers(
    df: DataFrame, group_col: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Per-group (median, MAD, n_outliers) with the fence
    ``|x - median| > k * MAD``. Degenerate groups (MAD = 0) report
    outliers against the strict fence, i.e. any x != median."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_dev = df.join(F.broadcast(med), group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    stats = with_dev.groupBy(group_col, "med").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    outliers = (
        with_dev.join(
            F.broadcast(stats.select(group_col, "mad")), group_col
        )
        .where(F.col("absdev") > F.lit(k) * F.col("mad"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    return stats.join(outliers, group_col, "left").withColumn(
        "n_outliers", F.coalesce("n_outliers", F.lit(0).cast("bigint"))
    )


def seasonal_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str | None = "event_type",
    factor_pct: int = 200,
) -> DataFrame:
    """Seasonal-baseline volume anomaly detection over an event
    stream: flag (day, hour) buckets whose event count exceeds
    ``factor_pct``% of the average count for that same
    (day-of-week, hour-of-day) slot.

    The baseline is the full-period mean per seasonal slot — the
    hour-of-week profile every ops dashboard draws. Comparing
    ``cnt · n_slot_days · 100 > factor_pct · slot_total`` keeps the
    whole test in exact integer cross-multiplication (no float
    division, no knife edges): ``slot_total`` is the total events
    ever seen in that weekly slot and ``n_slot_days`` how many
    distinct dates contributed to it.

    Two aggregations, both keyed by (group, slot) — the second is a
    slot-sized broadcastable dimension joined back to the first.
    Scale: the bucket table grows with observed (group, date, hour)
    combinations, the baseline with (group, dow, hour) — 168·groups
    rows, broadcast-sized at any corpus scale.
    """
    gcols = [group_col] if group_col else []
    bucket = df.groupBy(
        *gcols,
        F.to_date(F.col(ts_col)).alias("date"),
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.hour(F.col(ts_col)).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # The baseline is an aggregate OF the bucket table joined back to
    # it — stated as a groupBy + join, Catalyst replays the full
    # events scan + bucket aggregation for each side (measured: the
    # anomaly family cost 0.96 s noop vs 0.32 s for one events scan).
    # Window functions over the same keys compute identical values in
    # ONE pass over the slot-partitioned bucket table (guide §2.4
    # "window functions partitioned by the same key as a preceding
    # aggregation") — the bucket table is (group, date, hour)-grain,
    # tiny at any corpus scale, so the window exchange is negligible
    # next to the second corpus scan it removes. The not-null filter
    # reproduces the inner join's NULL-key semantics exactly (NULL
    # never equals NULL in a join; a window partition WOULD group
    # them). Exact integer arithmetic throughout — bit-identical
    # (qc_seasonal_anomaly stays OK-exact).
    slot = Window.partitionBy(*gcols, "dow", "hour")
    joined = bucket.where(
        F.lit(True)
        & F.col("dow").isNotNull()
        & F.col("hour").isNotNull()
        & (
            F.col(gcols[0]).isNotNull() if gcols else F.lit(True)
        )
    ).select(
        *gcols,
        "date",
        "dow",
        "hour",
        "cnt",
        F.sum("cnt").over(slot).cast("bigint").alias("slot_total"),
        F.count(F.lit(1)).over(slot).cast("bigint").alias("n_slot_days"),
    )
    return joined.select(
        *gcols,
        "date",
        "dow",
        "hour",
        "cnt",
        "slot_total",
        "n_slot_days",
        (
            F.col("cnt") * F.col("n_slot_days") * 100
            > F.lit(factor_pct) * F.col("slot_total")
        ).alias("is_anomaly"),
    )


def winsorize_bounds(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization audit: exact percentile fences plus
    how many rows each fence would clamp.

    ``percentile`` is Spark's EXACT sort-and-interpolate quantile —
    bit-identical to DuckDB's ``quantile_cont`` (the parity
    prof_quantiles proves), so the float fences themselves are
    hash-exact cross-engine. The clamp counts are pure comparisons
    against those fences. At 100 TB swap ``percentile`` for
    ``percentile_approx`` (KLL sketch, mergeable, bounded memory)
    and the fences become approximate while the operator shape —
    one group pass for fences, one broadcast-join pass for counts —
    is unchanged.
    """
    fences = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo!r})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi!r})").alias("p_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    joined = df.join(F.broadcast(fences), group_col)
    return joined.groupBy(group_col, "p_lo", "p_hi", "n_rows").agg(
        F.sum(F.when(F.col(value_col) < F.col("p_lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
        F.sum(F.when(F.col(value_col) > F.col("p_hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
    )


def cusum_changepoints(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    reference: float,
    slack: float,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """One-sided CUSUM control chart per group — the sequential
    change-point detector (did the process mean shift UP from its
    reference?) that complements the batch drift tests (chi-square
    cohorts, MAD fences) with a per-observation alarm time.

    CUSUM's textbook recursion ``S_t = max(0, S_{t-1} + x_t − ref −
    slack)`` looks inherently sequential, but the clipped recursion
    has a closed form: with ``P_t`` the prefix sum of deviations,
    ``S_t = P_t − min(0, min_{j≤t} P_j)`` — a prefix SUM and a
    prefix MIN, i.e. two frame-identical window functions, fully
    distributed and exact in fixed-point BIGINT (deviations, sums
    and the threshold all in ``scale`` units; no recursion, no UDF,
    no state).

    Returns every observation with its CUSUM statistic and
    ``alarm`` flag (S > threshold). The first alarm per group is
    the detected change point; downstream that is one min-per-group
    aggregation.
    """
    q = lambda c: F.floor(c * scale + 0.5).cast("bigint")  # noqa: E731
    dev = (
        q(F.col(value_col)) - F.lit(int(round(reference * scale)))
        - F.lit(int(round(slack * scale)))
    )
    w = Window.partitionBy(group_col).orderBy(ts_col, id_col)
    p = F.sum(dev).over(w)
    run_min = F.least(F.min(p).over(w), F.lit(0).cast("bigint"))
    s = (p - run_min).alias("cusum_scaled")
    return df.select(
        group_col,
        ts_col,
        id_col,
        value_col,
        s,
    ).withColumn(
        "alarm",
        F.col("cusum_scaled") > F.lit(int(round(threshold * scale))),
    )


def ab_test_report(
    df: DataFrame,
    experiment_col: str,
    variant_col: str,
    success: Column,
) -> DataFrame:
    """Two-proportion z-test per experiment: conversion counts for
    the two variants plus the pooled z statistic — the readout every
    experimentation pipeline ends in.

    Exactly one aggregation (counts are BIGINT) and a fixed scalar
    expression tree per experiment row. The z-score uses only +,−,×,
    ÷ and sqrt — all IEEE-correctly-rounded, so even the float
    statistic is engine-reproducible (the same policy that admits
    sqrt in temperature_sample but bans ln/exp). Experiments whose
    pooled variance is zero (all-success or all-failure) report NULL
    z. Exactly two variants per experiment are expected; an
    experiment with any other variant count still gets a row — its
    ``n_variants`` guard column flags the violation and its z is
    NULL (variants beyond the first two names, lexicographic, are
    never folded into the statistic).

    Returns (experiment, variant_a, n_a, conv_a, variant_b, n_b,
    conv_b, n_variants, z).
    """
    per_variant = df.groupBy(experiment_col, variant_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(success, 1).otherwise(0)).cast("bigint").alias("conv"),
    )
    w = Window.partitionBy(experiment_col).orderBy(variant_col)
    ranked = per_variant.withColumn("__r", F.row_number().over(w))
    wide = (
        ranked.groupBy(experiment_col)
        .agg(
            F.max(F.when(F.col("__r") == 1, F.col(variant_col))).alias(
                "variant_a"
            ),
            F.max(F.when(F.col("__r") == 1, F.col("n"))).alias("n_a"),
            F.max(F.when(F.col("__r") == 1, F.col("conv"))).alias("conv_a"),
            F.max(F.when(F.col("__r") == 2, F.col(variant_col))).alias(
                "variant_b"
            ),
            F.max(F.when(F.col("__r") == 2, F.col("n"))).alias("n_b"),
            F.max(F.when(F.col("__r") == 2, F.col("conv"))).alias("conv_b"),
            F.max(F.col("__r")).alias("__n_variants"),
        )
    )
    p1 = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p2 = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when((F.col("__n_variants") == 2) & (se > 0), (p1 - p2) / se)
    return wide.select(
        experiment_col,
        "variant_a",
        "n_a",
        "conv_a",
        "variant_b",
        "n_b",
        "conv_b",
        F.col("__n_variants").cast("bigint").alias("n_variants"),
        z.alias("z"),
    )


def pairwise_correlation(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group Pearson correlation of two metrics with
    engine-reproducible output: both variables go to fixed-point
    BIGINT first, the five sufficient statistics (n, Σx, Σy, Σxy,
    Σx², Σy²) are exact integer sums (shuffle-order independent),
    and the final r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    is a fixed tree of correctly-rounded IEEE ops (sqrt allowed,
    same policy as ab_test_report). Zero-variance groups report
    NULL. One map-side-combinable aggregation; group-sized output.

    Overflow bound: |x_scaled| ≤ 3·10⁶ supports ~10⁹ rows per group
    in Σx² before BIGINT overflow — size ``scale`` to the data.
    """
    q = lambda c: F.floor(F.col(c) * scale + 0.5).cast("bigint")  # noqa: E731
    w = df.select(*group_cols, q(x_col).alias("__x"), q(y_col).alias("__y"))
    agg = w.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("sx"),
        F.sum("__y").cast("bigint").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("bigint").alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    r = F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy)))
    return agg.select(*group_cols, "n", r.alias("r"))


def rolling_zscore(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_n: int = 20,
    threshold: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Trailing-window z-score per observation — the point-anomaly
    detector for slowly-drifting series where a GLOBAL fence
    (mad_outliers) mislabels the drift itself and CUSUM watches for
    sustained shifts rather than spikes.

    Each observation is scored against the ``window_n`` observations
    STRICTLY BEFORE it (self-exclusion — a spike must not dilute its
    own baseline): z = (x − mean) / sd with the sample-variance
    sufficient statistics Σv and Σv² kept as exact fixed-point BIGINTs
    over the rows frame (shuffle-order independent), and the final
    z a fixed tree of +,−,×,÷,sqrt over those exact operands — the
    ab_test/pairwise_correlation float policy, so even the score
    hash-checks. Observations with fewer than 2 predecessors or a
    zero-variance baseline report NULL z and never alarm.

    Overflow: |v_scaled| ≤ ~3·10⁶ keeps Σv² in BIGINT for any
    realistic window_n; size ``scale`` to the data.
    """
    q = F.floor(F.col(value_col) * scale + 0.5).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-window_n, -1)
    )
    with_stats = (
        df.withColumn("__v", q)
        .withColumn("__n", F.count("__v").over(w).cast("bigint"))
        .withColumn("__s", F.sum("__v").over(w).cast("bigint"))
        .withColumn(
            "__ss", F.sum(F.col("__v") * F.col("__v")).over(w).cast("bigint")
        )
    )
    n = F.col("__n").cast("double")
    # n·Σv² − (Σv)² = n·(n−1)·sample_variance · scale² (exact BIGINT)
    var_num = (F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")).cast(
        "double"
    )
    mean_num = (
        F.col("__n") * F.col("__v") - F.col("__s")
    ).cast("double")  # n·(x − mean) · scale, exact
    z = F.when(
        (F.col("__n") >= 2) & (var_num > 0),
        mean_num / F.sqrt(var_num * n / (n - F.lit(1.0))),
    )
    return (
        with_stats.withColumn("z", z)
        .withColumn(
            "alarm",
            F.when(F.col("z").isNotNull(), F.abs("z") > F.lit(threshold)).otherwise(
                F.lit(False)
            ),
        )
        .drop("__v", "__n", "__s", "__ss")
    )
