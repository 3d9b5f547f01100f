"""Leave-one-out target encoding (feature-engineering surface).

Target encoding replaces a categorical key with the mean of a target
variable over that key — but the naive version leaks each row's own
target into its feature. The leave-one-out form excludes the row
itself: ``enc(row) = (sum(group) - target(row)) / (n(group) - 1)``,
the standard leakage guard for tree/linear models trained on the
encoded column.

Scale shape: one map-side-combinable aggregation to the key grain,
then a broadcast join back over the fact (keys are a dimension).
No window functions — the per-row arithmetic needs only the group
totals, so the fact table is touched exactly once.

Exactness: targets are fixed-point-scaled to integers first
(``scale`` units), sums are BIGINT (shuffle-order independent), and
the division is integer ``div`` — the encoded feature is
bit-reproducible across engines/partitionings, same policy as
operators/lm.py / pagerank_micro. Singleton groups (n = 1) have no
leave-one-out mean; they get NULL plus the global prior column the
caller can coalesce onto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    key_col: str,
    target_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Append ``enc_loo`` (scaled-integer leave-one-out mean of
    ``target_col`` per ``key_col``), plus ``enc_prior`` (the global
    mean in the same units — the smoothing/fallback term).

    NULL targets are excluded from sums and counts and receive a
    NULL encoding. NULL keys form their own group (null-safe join),
    so every input row survives — a feature transform must not drop
    data. Returns all input columns + (enc_loo, enc_prior).
    """
    t = F.floor(F.col(target_col) * scale + 0.5).cast("bigint")
    with_t = df.withColumn("__t", t)
    grp = with_t.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum("__t").alias("__gsum"),
        F.count("__t").cast("bigint").alias("__gn"),
    )
    glob = with_t.agg(
        F.sum("__t").alias("__asum"),
        F.count("__t").cast("bigint").alias("__an"),
    )
    out = (
        with_t.join(
            F.broadcast(grp), F.col(key_col).eqNullSafe(F.col("__k")), "left"
        )
        .drop("__k")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "enc_loo",
            F.when(
                F.col("__t").isNotNull() & (F.col("__gn") > 1),
                F.expr("(__gsum - __t) div (__gn - 1)"),
            ).cast("bigint"),
        )
        .withColumn(
            "enc_prior",
            F.when(
                F.col("__an") > 0, F.expr("__asum div __an")
            ).cast("bigint"),
        )
    )
    return out.drop("__t", "__gsum", "__gn", "__asum", "__an")


def woe_odds_encode(
    df: DataFrame,
    key_col: str,
    target_col: str,
    smoothing: int = 1,
) -> DataFrame:
    """Weight-of-evidence-style categorical encoding, in EXACT
    integer arithmetic: per category, the odds ratio

        odds(key) = (good_k / good_total) / (bad_k / bad_total)

    rendered in micro-units (``odds_micro = exp(WOE) · 10^6``; the
    logarithm is deliberately NOT taken — libm log differs by ulps
    between engines, and any monotone transform of the feature is
    equivalent to a tree model anyway). ``smoothing`` is added to
    each cell (Laplace) so empty cells never divide by zero.

    ``target_col`` must be 0/1 (1 = "good"). One map-side-combinable
    aggregation to the key grain plus a key-grain window for totals —
    the fact table is touched once; output is dimension-sized."""
    per_key = df.groupBy(key_col).agg(
        F.sum(F.col(target_col).cast("bigint")).alias("__g"),
        F.sum(
            (F.lit(1) - F.col(target_col).cast("bigint"))
        ).alias("__b"),
    )
    w = Window.partitionBy()
    s = int(smoothing)
    enriched = per_key.select(
        key_col,
        "__g",
        "__b",
        F.sum(F.col("__g") + F.lit(s)).over(w).alias("__gt"),
        F.sum(F.col("__b") + F.lit(s)).over(w).alias("__bt"),
    )
    return enriched.select(
        key_col,
        (F.col("__g") + F.col("__b")).cast("bigint").alias("n"),
        F.col("__g").cast("bigint").alias("n_good"),
        # (g·bt·1e6) div (b·gt) computed in DECIMAL(38,0)
        # (HUGEINT on the oracle side): the BIGINT form overflows at
        # g·bt > ~9.2e12 — a ~20M-row corpus — wrapping silently with
        # ANSI off. Exact for products < 1e38 (corpora to ~1e15 rows).
        F.expr(
            f"CAST((CAST(__g + {s} AS DECIMAL(38, 0)) * __bt * 1000000)"
            f" div (CAST(__b + {s} AS DECIMAL(38, 0)) * __gt) AS BIGINT)"
        ).alias("odds_micro"),
    )
