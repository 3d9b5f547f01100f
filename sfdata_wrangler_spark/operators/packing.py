"""Token-budget packing (beyond-reference training-data surface).

The pretraining "concat-and-chunk" primitive: documents are laid out
in a deterministic order, token counts accumulate, and the stream is
cut into fixed-budget context windows — each doc is assigned the
window its FIRST token lands in (window_id = prefix_tokens_before //
budget), plus its offset inside that window.

Scale shape: a naive global ``Window.orderBy(...)`` prefix sum is a
single-partition sort — the one shape that cannot survive a 100 TB
corpus. Instead the classic two-level scan: docs fall into coarse
ORDERED buckets (contiguous id ranges of ``bucket_width``), per-bucket
token subtotals form a tiny cumulative-offset dim (broadcast), and the
per-doc prefix sum runs in a window PARTITIONED BY bucket — parallel
across buckets — plus the broadcast bucket offset. Equivalent to the
global scan, executes as one shuffle keyed by bucket, and stays fully
lazy (no driver action at construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_context_windows(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_width: int | None = 100_000,
    n_buckets: int | None = None,
) -> DataFrame:
    """(id, n_tokens) -> (id, n_tokens, window_id, window_offset).

    Layout order is ascending ``id_col`` (deterministic — rerunning on
    the same corpus reproduces identical windows). ``budget`` is the
    context length in tokens.

    Bucketing (any non-decreasing function of id keeps the two-level
    scan ≡ the global scan):

    - ``bucket_width`` (dense integer ids): bucket = id // width. Pick
      it so corpus_id_span / width stays in the thousands (the offset
      dim must broadcast) while each bucket holds enough docs to
      parallelize.
    - ``n_buckets`` (sparse / skewed id spaces — UUID-hash ids span
      2^63, so a fixed width degenerates to one doc per bucket):
      bucket = ``width_bucket(id, min, max, n_buckets)`` with the
      min/max bounds computed as a 1-row broadcast dim, so the plan
      stays fully lazy (no driver action). Hash-derived ids are
      uniform over their span, so equal-width range buckets balance.
    """
    if n_buckets is not None:
        bounds = F.broadcast(
            df.agg(
                F.min(id_col).cast("double").alias("__lo"),
                (F.max(id_col) + 1).cast("double").alias("__hi"),
            )
        )
        docs = df.crossJoin(bounds).select(
            F.col(id_col),
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.width_bucket(F.col(id_col), "__lo", "__hi", F.lit(n_buckets))
            .cast("bigint")
            .alias("__bkt"),
        )
    else:
        docs = df.select(
            F.col(id_col),
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.floor(F.col(id_col) / bucket_width).cast("bigint").alias("__bkt"),
        )

    # The window branch gets an explicit column repartition instead of
    # the planner's ENSURE_REQUIREMENTS exchange (r15). A fully-shared
    # exchange (repartition feeding BOTH levels) cannot actually be
    # reused: column pruning drops id_col from the level-1 aggregate's
    # branch, so the two exchanges never canonicalize equal — and
    # restructuring level 1 to consume the repartition would lose its
    # map-side partial aggregation (guide §2.3 "aggregate before you
    # shuffle", the property that keeps the offsets pass cheap at
    # corpus scale). Repartitioning only the window input keeps that
    # combine AND lets AQE size the post-shuffle partitions of the
    # heavy branch (REPARTITION_BY_COL is coalescible). Interleaved
    # A/B, sf0.1, 6 reps, outputs bit-identical: noop best 0.63 →
    # 0.52 s standalone; inside pipe_curation_v3 count 3.11 → 3.01 s.
    docs_win = docs.repartition("__bkt")

    # level 1: per-bucket subtotals -> exclusive cumulative offsets.
    # The unpartitioned window is safe here: it runs over one row per
    # bucket (thousands), not one row per doc.
    wb = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        docs.groupBy("__bkt")
        .agg(F.sum(tokens_col).alias("__sub"))
        .withColumn("__cum", F.sum("__sub").over(wb))
        .select("__bkt", (F.col("__cum") - F.col("__sub")).alias("__offset"))
    )

    # level 2: per-doc prefix inside its bucket, parallel across buckets
    wd = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (
        F.col("__offset") + F.sum(tokens_col).over(wd) - F.col(tokens_col)
    )
    return docs_win.join(F.broadcast(offsets), "__bkt").select(
        id_col,
        tokens_col,
        F.floor(before / budget).cast("bigint").alias("window_id"),
        (before % budget).cast("bigint").alias("window_offset"),
    )


def pack_by_length(
    df: DataFrame,
    budget: int,
    length_bounds: tuple = (16, 32, 64, 128),
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_width: int = 100_000,
) -> DataFrame:
    """Length-grouped context packing: documents are first grouped
    into padded-length buckets (smallest bound >= n_tokens; the
    training-efficiency trick that keeps short docs from being padded
    to the longest sequence in the batch), then packed into
    ``budget``-token windows WITHIN each bucket.

    Output: ``(id_col, tokens_col, len_bucket, window_id,
    window_offset)`` with window ids scoped per bucket. The bucket
    bounds are a CASE chain (exact integer comparisons — no log2,
    whose last-ulp rounding differs across engines); the per-bucket
    prefix sum reuses the two-level scan with (len_bucket, coarse id
    range) keys, so no bucket ever becomes a single-partition sort.
    """
    bound = F.lit(int(length_bounds[-1]))
    for b in reversed(length_bounds[:-1]):
        bound = F.when(
            F.col(tokens_col) <= int(b), F.lit(int(b))
        ).otherwise(bound)
    docs = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        bound.cast("bigint").alias("len_bucket"),
        F.floor(F.col(id_col) / bucket_width).cast("bigint").alias("__coarse"),
    )
    # explicit coalescible repartition for the window branch only —
    # same rationale as pack_context_windows above
    docs_win = docs.repartition("len_bucket", "__coarse")

    wb = (
        Window.partitionBy("len_bucket")
        .orderBy("__coarse")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        docs.groupBy("len_bucket", "__coarse")
        .agg(F.sum(tokens_col).alias("__sub"))
        .withColumn("__cum", F.sum("__sub").over(wb))
        .select(
            "len_bucket",
            "__coarse",
            (F.col("__cum") - F.col("__sub")).alias("__offset"),
        )
    )
    wd = (
        Window.partitionBy("len_bucket", "__coarse")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (
        F.col("__offset") + F.sum(tokens_col).over(wd) - F.col(tokens_col)
    )
    return docs_win.join(
        F.broadcast(offsets), ["len_bucket", "__coarse"]
    ).select(
        id_col,
        tokens_col,
        "len_bucket",
        F.floor(before / budget).cast("bigint").alias("window_id"),
        (before % budget).cast("bigint").alias("window_offset"),
    )
