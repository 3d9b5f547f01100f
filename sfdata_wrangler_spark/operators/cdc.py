"""CDC changelog apply (MERGE-style upsert/delete materialization).

The lakehouse maintenance primitive: given a base snapshot and an
append-only changelog of ``(key, op, seq, payload)`` rows with op in
{I, U, D}, produce the next snapshot — the latest op per key wins,
and a terminal D removes the key. This is Delta/Iceberg ``MERGE``
semantics expressed as one window pass plus one full-outer join, no
engine extension needed:

1. Collapse the changelog per key to its LAST op by the (seq,
   tiebreak) total order — one hash shuffle on the key, exactly the
   dedup_by_order idiom (operators/windows.py).
2. Full-outer join against the base on the key (both sides hash on
   the same key: with a bucketed base table this is the co-located
   join shape from sources/lake.py).
3. Emit: changelog D -> drop; changelog I/U -> changelog payload;
   base-only -> base payload unchanged.

The total order MUST be total (ties in ``seq`` broken by an explicit
unique column) or replays produce different snapshots — the same
determinism discipline as operators/scd2.py.

At 100 TB the snapshot never rewrites wholesale: partition the base
by key-hash buckets and apply per-bucket (the changelog's touched
buckets are the only ones read or written). ``apply_changelog``
returns the full next snapshot; pair with sources/lake bucketing for
the incremental form. Complements operators/scd2.py (which keeps
history; this keeps only the current image) and
operators/incremental_agg.py (which maintains aggregates, not rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["apply_changelog", "survivorship_merge"]


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key: str,
    op: str = "op",
    seq_cols: list[str] | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Next snapshot after applying ``changelog`` to ``base``.

    ``base`` columns: key + payload_cols. ``changelog`` columns:
    key + op + seq_cols + payload_cols. ``seq_cols`` must be a
    TOTAL order within each key.
    """
    seq_cols = seq_cols or ["seq"]
    payload_cols = payload_cols or [
        c for c in base.columns if c != key
    ]
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    last = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            key,
            F.col(op).alias("_op"),
            *[F.col(c).alias(f"_chg_{c}") for c in payload_cols],
        )
    )
    joined = base.alias("b").join(last.alias("c"), key, "full_outer")
    kept = joined.where(
        F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    )
    out_cols = [F.col(key)]
    for c in payload_cols:
        out_cols.append(
            F.when(F.col("_op").isNotNull(), F.col(f"_chg_{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
        )
    return kept.select(*out_cols)


def survivorship_merge(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Golden-record survivorship: one row per entity where each
    payload field independently takes its LATEST NON-NULL value
    across the entity's records — the master-data-management merge
    rule (a newer record with a null phone must not erase the older
    phone).

    One aggregation, one ``max_by`` per field with the ordering key
    nulled-out for rows where the FIELD is null (``max_by`` skips
    null keys, which is exactly the survivorship semantics). The
    (ts, id) struct key is a total order, so ties are deterministic.
    Per-field winners may come from DIFFERENT source rows by design.
    Also emits n_records and last_ts for lineage.
    """
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.max(F.col(ts_col)).alias("last_ts"),
    ]
    for c in payload_cols:
        aggs.append(
            F.expr(
                f"max_by({c}, CASE WHEN {c} IS NOT NULL "
                f"THEN struct({ts_col}, {id_col}) END)"
            ).alias(c)
        )
    return df.groupBy(key_col).agg(*aggs)
