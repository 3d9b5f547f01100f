"""Count-min sketch and CMS-backed heavy hitters.

The streaming-agg primitive for frequency estimation over corpora too
large (or too unbounded) for an exact groupBy: a depth×width counter
matrix where every item increments one bucket per hash row, and a
point estimate reads the MIN of its buckets (Cormode & Muthukrishnan
2005). The sketch is MERGEABLE — counters from any partitioning of
the data add cell-wise — which is what makes it a one-pass,
map-side-combinable aggregation in Spark: the shuffle moves at most
depth×width rows per partition regardless of corpus size.

Hashing: bucket = first ``width_hex`` hex chars of
``md5(seed || '|' || item)`` — a string bucket id, deliberately,
because both Spark and DuckDB compute identical md5 hex and
substrings (the same trick operators/sampling.py uses for
deterministic thresholds), so the whole sketch is reproducible by an
external SQL oracle with no integer-conversion gymnastics.

At 100 TB: cms_build is one scan + one tiny shuffle (≤ depth·16^w
cells); estimates/heavy-hitters join candidates against the
BROADCAST counter table (a few thousand rows at any corpus scale).
The candidate set for heavy hitters is the distinct-token table —
Zipf-small relative to the corpus — so no stage ever shuffles corpus
text more than once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_heavy_hitters"]


def _bucket(item: Column, seed: int, width_hex: int) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), item)), 1, width_hex
    )


def cms_build(
    items: DataFrame, col: str, depth: int = 4, width_hex: int = 2
) -> DataFrame:
    """One-pass sketch build: ``(seed, bucket, cnt)`` with
    depth·16^width_hex cells max. One row per item OCCURRENCE in
    ``items``; the explode emits ``depth`` cells per row but the
    partial aggregation collapses them before the (tiny) shuffle."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col(col), s, width_hex).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.seed", "c.bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = 4,
    width_hex: int = 2,
) -> DataFrame:
    """Point estimates for every candidate row: min over the sketch's
    depth rows. The sketch side broadcasts (bounded cell count); the
    candidate side never shuffles at all — the min folds per row."""
    probes = candidates.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("p_seed"),
                        _bucket(F.col(col), s, width_hex).alias("p_bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
    ).select("*", "p.p_seed", "p.p_bucket").drop("p")
    joined = probes.join(
        F.broadcast(cms),
        (F.col("p_seed") == cms.seed) & (F.col("p_bucket") == cms.bucket),
        "left",
    )
    group_cols = [c for c in candidates.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    col: str,
    threshold: int,
    depth: int = 4,
    width_hex: int = 2,
) -> DataFrame:
    """Items whose CMS estimate reaches ``threshold``. CMS never
    underestimates, so this has NO false negatives (every true heavy
    hitter survives); collisions can admit false positives — the
    standard one-sided guarantee, and the reason a cheap exact
    re-count of the (small) surviving set is sound when needed."""
    cms = cms_build(items, col, depth=depth, width_hex=width_hex)
    cands = items.select(col).distinct()
    est = cms_estimate(cms, cands, col, depth=depth, width_hex=width_hex)
    return est.where(F.col("cms_est") >= threshold)
