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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
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
    extra_aggs: dict[str, "F.Column"] | None = None,
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
    extra = dict(extra_aggs or {})
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rank} - max_rank)")
        ).alias("_present_sum"),
        F.count(F.lit(1)).alias("_present_cnt"),
        *[c.alias(name) for name, c in extra.items()],
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
        *extra.keys(),
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

    Only window ends that are observed days are emitted (trailing
    partial windows past the last day would otherwise dangle)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = hll_sketch(
        df.withColumn("__day", day), ["__day"], col, p_hex, tail_hex
    )
    spread = daily.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.lit(window_days - 1)))
    ).withColumn("window_end", F.date_add(F.col("__day"), F.col("__i")))
    merged = spread.groupBy("window_end", "bucket").agg(
        F.max("max_rank").cast("int").alias("max_rank"),
        # did this window end's OWN day contribute (offset 0)? that is
        # exactly "window_end is an observed day" — carrying the flag
        # through the estimate aggregation keeps the whole query ONE
        # consumer chain over ONE events scan (a separate observed-day
        # frame would re-scan the fact table; pinned in
        # tests/test_round6_ops.py)
        F.max(F.when(F.col("__i") == 0, 1).otherwise(0)).alias("__own"),
    )
    est = hll_estimate(
        merged,
        ["window_end"],
        p_hex,
        tail_hex,
        extra_aggs={"__obs": F.max("__own")},
    )
    return est.where(F.col("__obs") == 1).select(
        F.date_format("window_end", "yyyy-MM-dd").alias("window_end"),
        "hll_est",
    )
