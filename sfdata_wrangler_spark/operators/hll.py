"""HyperLogLog distinct-count sketch (Flajolet et al. 2007).

The mergeable cardinality primitive for corpora where an exact
``COUNT(DISTINCT ...)`` shuffle is too wide: every value hashes to one
of ``m = 16^p_hex`` registers, each register keeps the MAX rank
(leading-zero run of the hash tail, 1-based) ever seen, and the
harmonic-mean estimator reads cardinality off the register table.
``max`` makes the sketch MERGEABLE — register tables from any
partitioning of the data combine cell-wise — so the build is one scan
plus a shuffle of at most ``m`` rows per group regardless of corpus
size, exactly the CMS contract in operators/sketch.py.

Portability policy (the repo-wide oracle discipline):

- Hashing is ``md5`` hex — identical in Spark and DuckDB — split into
  a ``p_hex``-char register prefix and a ``tail_hex``-char tail.
- The rank is derived from the tail with ``TRIM(LEADING '0' ...)``
  plus a 16-way CASE on the first surviving hex digit — exact integer
  arithmetic in both engines, no bit intrinsics needed.
- The estimator never sums IEEE ``2^-rank`` terms (mixing rank ~50
  dyadics with rank-0 ones overflows the 53-bit mantissa and makes
  the sum order-dependent): it sums exact BIGINT terms
  ``2^(max_rank - rank)`` and divides once at the end, so both
  engines evaluate the identical operand pair. No ``ln`` anywhere —
  the small-range linear-counting correction of HLL++ is deliberately
  left out of the ORACLE-CHECKED estimator (it needs a logarithm,
  which is libm- not IEEE-defined); production callers that want it
  can apply it to the same register table.

At 100 TB: the register table is ``groups x m`` rows whatever the
corpus size; per-partition partial aggregation collapses duplicates
before the shuffle, and downstream estimation is arithmetic over that
tiny table. Reference parity: the reference counts distincts with
pandas ``nunique`` inside aggregations (SURVEY §2.4 countUnique);
this is the at-scale replacement when exact distinct is unaffordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "hll_intersect_estimate",
    "sliding_distinct_hll",
    "HLL_ALPHA_BY_PHEX",
]

# alpha_m for m = 16^p_hex registers (Flajolet's bias constant for
# m >= 128). Computed once here; the SAME double is embedded as a
# literal in oracle SQL via repr() so both engines multiply by the
# identical IEEE value.
HLL_ALPHA_BY_PHEX = {
    2: 0.7213 / (1.0 + 1.079 / 256.0),
    3: 0.7213 / (1.0 + 1.079 / 4096.0),
}


def _rank_expr(tail_col: str, tail_hex: int) -> str:
    """SQL snippet (valid in BOTH Spark SQL and DuckDB) computing the
    1-based rank from a hex-tail column name."""
    t = f"trim(LEADING '0' FROM {tail_col})"
    first = f"substring({t}, 1, 1)"
    extra = (
        f"(CASE {first} "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END)"
    )
    return (
        f"CASE WHEN length({t}) = 0 THEN {4 * tail_hex + 1} "
        f"ELSE ({4 * tail_hex} - 4 * length({t})) + {extra} + 1 END"
    )


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    p_hex: int = 2,
    tail_hex: int = 12,
) -> DataFrame:
    """One-pass register build: ``group_cols + (bucket, max_rank)``
    with at most ``16^p_hex`` rows per group. Duplicate values hash
    identically, so duplicates collapse in the partial agg — the
    sketch counts DISTINCT values by construction."""
    h = F.md5(F.col(col).cast("string"))
    hashed = df.select(
        *group_cols,
        F.substring(h, 1, p_hex).alias("bucket"),
        F.substring(h, p_hex + 1, tail_hex).alias("_tail"),
    ).withColumn("_rank", F.expr(_rank_expr("_tail", tail_hex)))
    return hashed.groupBy(*group_cols, "bucket").agg(
        F.max("_rank").cast("int").alias("max_rank")
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cell-wise merge of two register tables (register max is the
    whole merge law — what makes per-partition / per-day sketches
    combinable without re-reading data)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("max_rank").cast("int").alias("max_rank"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p_hex: int = 2,
    tail_hex: int = 12,
) -> DataFrame:
    """Raw HLL estimator per group: ``alpha_m * m^2 / sum(2^-rank)``,
    with absent registers contributing ``2^0``. All summation is
    exact BIGINT in units of ``2^-max_possible_rank``; the single
    IEEE division happens once over identical operands in any engine.
    """
    m = 16 ** p_hex
    max_rank = 4 * tail_hex + 1
    alpha = HLL_ALPHA_BY_PHEX[p_hex]
    # BIGINT term per present register: 2^(max_rank - rank)
    # (the SQL shiftleft accepts a column shift amount; the PySpark
    # wrapper insists on a Python int, hence expr())
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rank} - max_rank)")
        ).alias("_present_sum"),
        F.count(F.lit(1)).alias("_present_cnt"),
    )
    # absent registers each add 2^(max_rank - 0)... rank 0 never
    # occurs for a PRESENT register (ranks are 1-based); an absent
    # register means "no value landed here" and contributes 2^-0 = 1,
    # i.e. 2^max_rank integer units.
    total = per_group.withColumn(
        "_sum_units",
        F.col("_present_sum")
        + (F.lit(m) - F.col("_present_cnt")) * F.lit(2 ** max_rank).cast("bigint"),
    )
    numer = alpha * float(m) * float(m) * float(2 ** max_rank)
    return total.select(
        *group_cols,
        (F.lit(numer) / F.col("_sum_units").cast("double")).alias("hll_est"),
    )


def hll_intersect_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    p_hex: int = 2,
    tail_hex: int = 12,
) -> DataFrame:
    """Audience-overlap estimate |A ∩ B| per group by
    inclusion-exclusion over sketches: est(A) + est(B) − est(A ∪ B),
    where the union sketch is the cell-wise register max
    (:func:`hll_merge` — exact for the union, which is what makes
    inclusion-exclusion usable without ever joining the raw sets).

    Everything stays register-table-sized: two estimates + one merge
    per group, no row-level join anywhere — the standard way two
    100 TB event streams compare audiences. Error compounds the two
    sketch errors, so overlaps much smaller than either set drown in
    noise (the known inclusion-exclusion caveat; the output keeps
    est_a/est_b alongside for exactly that judgment).
    """
    ea = hll_estimate(a, group_cols, p_hex, tail_hex).withColumnRenamed(
        "hll_est", "est_a"
    )
    eb = hll_estimate(b, group_cols, p_hex, tail_hex).withColumnRenamed(
        "hll_est", "est_b"
    )
    eu = hll_estimate(
        hll_merge(a, b, group_cols), group_cols, p_hex, tail_hex
    ).withColumnRenamed("hll_est", "est_union")
    out = ea.join(eb, group_cols).join(eu, group_cols)
    return out.withColumn(
        "est_intersect",
        F.greatest(
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
            F.lit(0.0),
        ),
    )


def sliding_distinct_hll(
    df: DataFrame,
    ts_col: str,
    col: str,
    window_days: int = 7,
    p_hex: int = 2,
    tail_hex: int = 12,
) -> DataFrame:
    """Trailing-window distinct counts from MERGED DAILY SKETCHES:
    ``(window_end, hll_est)`` where each day's estimate covers the
    ``window_days`` days ending on it. This is THE pattern that makes
    sliding distinct-counts affordable at 100 TB: the raw data is
    read once into per-day register tables (<= 16^p_hex rows per
    day), and the sliding windows are assembled by replicating and
    max-merging SKETCHES, never re-scanning events. An exact sliding
    countDistinct would re-shuffle the fact table once per window.

    One implementation serves both public surfaces: this is
    windows.rolling_distinct_users_hll (the single register
    pipeline — daily sketch -> xW explode -> register max-merge ->
    estimate) with the series CAPPED at the last observed day. The
    uncapped form emits window ends up to last_day + W - 1 ("what the
    trailing count will be if nothing else arrives" — mirroring the
    exact rolling_distinct_users family); this form ends where the
    data ends. Interior days with no events of their own ARE emitted
    as long as their window covers SOME activity (gaps shorter than
    ``window_days``); a gap of ``window_days`` or more produces no
    registers and therefore no rows — the same "no activity in
    window, no row" rule as rolling_distinct_users, so a consumer
    plotting by calendar day should left-join a date spine. The cap
    is derived from the estimate
    frame itself (max window end minus W-1 = last observed day), so
    the whole query stays ONE consumer chain over ONE fact scan
    (plan-pinned)."""
    from .windows import rolling_distinct_users_hll

    est = rolling_distinct_users_hll(
        df,
        ts_col=ts_col,
        user_col=col,
        window_days=window_days,
        p_hex=p_hex,
        tail_hex=tail_hex,
    )
    last_obs = F.date_sub(
        F.max("win_day").over(Window.partitionBy()), window_days - 1
    )
    return (
        est.withColumn("__last", last_obs)
        .where(F.col("win_day") <= F.col("__last"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("window_end"),
            "hll_est",
        )
    )
