"""Streaming exact deduplication (beyond-reference training-data
surface): the ingest-time twin of ``operators.dedup.exact_dedup``.

A 100 TB corpus is not re-deduplicated from scratch per batch — new
documents stream in and duplicates must be dropped AT INGEST against
everything already seen inside the retention horizon. Structured
Streaming's ``dropDuplicates`` keeps the seen-key set as managed state;
the watermark bounds that state (keys older than the horizon are
evicted — the standard state/completeness trade).

Same normalized-md5 key as the batch operator, so batch backfill and
streaming ingest agree on what "duplicate" means (batch ≡ stream is
asserted in tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_key


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact duplicates (normalized-text md5 key) from a
    (possibly streaming) document frame.

    With ``ts_col``, a watermark bounds the dedup state to the
    retention horizon — required for unbounded streams (state would
    otherwise grow with corpus cardinality). Without it, state is
    unbounded (fine for batch or bounded backfills).
    """
    keyed = docs.withColumn("__key", norm_key(F.col(text_col)))
    if ts_col is not None and docs.isStreaming:
        # watermark bounds the seen-key state; within the horizon the
        # semantics match the batch dropDuplicates on the same key
        out = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__key"]
        )
    else:
        out = keyed.dropDuplicates(["__key"])
    return out.drop("__key")
