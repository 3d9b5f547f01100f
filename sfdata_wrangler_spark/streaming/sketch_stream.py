"""Streaming count-min sketch maintenance.

The ingest-time twin of ``operators.sketch.cms_build``: token
frequencies over an unbounded stream cannot keep exact per-token
state (cardinality-sized), but the CMS counter matrix is FIXED-SIZE
and mergeable — each micro-batch contributes a partial sketch that
folds cell-wise into the running one. That mergeability (pinned in
tests/test_sketch.py) is exactly what makes the sketch the right
streaming frequency state: per-trigger cost is one bounded
aggregation + one <= depth·width cell merge, independent of how much
history the sketch summarizes.

``foreachBatch`` (not a stateful window agg) is the right shape: the
sketch state is a tiny TABLE the caller owns — persisted, inspected,
and merged across restarts — not opaque operator state."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.hll import hll_sketch
from ..operators.sketch import cms_build

__all__ = [
    "stream_cms",
    "stream_hll",
    "stream_zonemap",
    "merge_zonemaps",
    "stream_qsketch",
]


def stream_cms(
    stream_items: DataFrame,
    col: str,
    merge_sink,
    depth: int = 4,
    width_hex: int = 2,
):
    """Maintain a CMS over a streaming item column. ``merge_sink``
    is called per trigger with the BATCH-LOCAL partial sketch
    ``(seed, bucket, cnt)``; the caller folds it into the running
    counter table (cell-wise sum — see
    tests/test_streaming_sketch.py for the canonical fold).
    Returns the writeStream handle (caller starts it)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        partial = cms_build(batch_df, col, depth=depth, width_hex=width_hex)
        merge_sink(partial, batch_id)

    return stream_items.writeStream.foreachBatch(_process)


def stream_hll(
    stream_items: DataFrame,
    group_cols: list[str],
    col: str,
    merge_sink,
    p_hex: int = 2,
    tail_hex: int = 12,
):
    """Maintain HLL registers over a stream: each trigger emits the
    BATCH-LOCAL register table (group, bucket, max_rank) and
    ``merge_sink`` folds it into the running registers with the
    cell-wise MAX merge law (``operators.hll.hll_merge``). Register
    state is groups x 16^p_hex rows whatever the stream has seen —
    the distinct-count analog of the CMS fold above, and the reason
    approximate distinct over an unbounded stream is a bounded-state
    problem at all. Returns the writeStream handle (caller starts)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        partial = hll_sketch(
            batch_df, group_cols, col, p_hex=p_hex, tail_hex=tail_hex
        )
        merge_sink(partial, batch_id)

    return stream_items.writeStream.foreachBatch(_process)


def stream_zonemap(
    stream_rows: DataFrame,
    file_col: str,
    cols: list[str],
    merge_sink,
):
    """Maintain a zone-map manifest over an ingest stream: each
    trigger emits the batch-local per-file min/max/null stats
    (``operators.zonemap.zonemap_stats``) and ``merge_sink`` folds
    them into the running manifest — min of mins, max of maxes, sums
    of counts (all associative+commutative, so batch boundaries are
    invisible, same law as the CMS/HLL folds above). The manifest a
    query planner prunes against is therefore ALWAYS current without
    ever re-scanning written files. Returns the writeStream handle.
    """
    from ..operators.zonemap import zonemap_stats

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_sink(zonemap_stats(batch_df, file_col, cols), batch_id)

    return stream_rows.writeStream.foreachBatch(_process)


def stream_qsketch(
    stream_rows: DataFrame,
    group_cols: list[str],
    value_col: str,
    merge_sink,
    scale: int = 100,
    sub_bits: int = 6,
):
    """Maintain per-group quantile sketches over a stream: each
    trigger emits the batch-local log-histogram
    (``operators.qsketch.qsketch_build``) and ``merge_sink`` folds it
    with the count-sum merge law (``qsketch_merge``) — percentiles
    over an unbounded stream as bounded state (~64·2^sub_bits buckets
    per group), same fold discipline as the CMS/HLL/zone-map
    maintenance above. Returns the writeStream handle (caller
    starts)."""
    from ..operators.qsketch import qsketch_build

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_sink(
            qsketch_build(
                batch_df, group_cols, value_col, scale=scale,
                sub_bits=sub_bits,
            ),
            batch_id,
        )

    return stream_rows.writeStream.foreachBatch(_process)


def merge_zonemaps(a: DataFrame, b: DataFrame, file_col: str) -> DataFrame:
    """Fold two zone-map manifests: per (file, column) min/min,
    max/max, null+null, rows+rows. The merge law that makes
    :func:`stream_zonemap`'s per-batch partials composable."""
    cols = [c for c in a.columns if c != file_col]
    aggs = []
    for c in cols:
        if c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:  # n_rows / nulls_*
            aggs.append(F.sum(c).cast("bigint").alias(c))
    return a.unionByName(b).groupBy(file_col).agg(*aggs)
