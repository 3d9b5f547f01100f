"""Table diff / reconciliation.

The validation primitive for every migration this engine implies
(HDF5 store → parquet lake, reference pipeline → this one): given
two keyed snapshots, report exactly what was ADDED, REMOVED, or
CHANGED — at fact scale, without ever collecting either side.

Shape: one row-hash projection per side (map-only), one full-outer
equi join on the key. The hash compresses the comparison payload to
32 bytes per row, so the shuffle is key+hash wide no matter how wide
the table is — the same compress-before-shuffle discipline as the
dedup family's md5 keys.

Canonicalization contract: the non-key columns are hashed via
``concat_ws('|', cast(col AS string)...)``. BIGINT/INT/STRING cast
identically in every engine; DOUBLE and TIMESTAMP do NOT (string
formatting differs) — callers wanting a cross-engine-reproducible
diff (e.g. the oracle-checked query) must pre-convert doubles to
integer units and timestamps to epoch integers. ``table_diff``
raises on raw double/timestamp columns rather than hashing them
wrong silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "diff_summary"]

_UNPORTABLE = ("double", "float", "timestamp", "timestamp_ntz", "date")


def _row_hash(df: DataFrame, keys: list[str]) -> DataFrame:
    payload = [c for c in df.columns if c not in keys]
    bad = [c for c, t in df.dtypes if c in payload and t in _UNPORTABLE]
    if bad:
        raise ValueError(
            f"table_diff: columns {bad} have engine-dependent string "
            "forms; pre-convert to integer units (see module docstring)"
        )
    return df.select(
        *keys,
        F.md5(
            F.concat_ws("|", *[F.col(c).cast("string") for c in payload])
        ).alias("__h"),
    )


def table_diff(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """Per-key delta between two snapshots: ``keys + status`` with
    status in {'added', 'removed', 'changed'} ('added' = in right
    only). Unchanged rows are dropped — the output is delta-sized,
    which is the point: at 100 TB the diff of two healthy snapshots
    is tiny, and THAT is what ships to the operator's consumer."""
    l = _row_hash(left, keys).withColumnRenamed("__h", "__hl")
    r = _row_hash(right, keys).withColumnRenamed("__h", "__hr")
    j = l.join(r, keys, "full_outer")
    status = (
        F.when(F.col("__hl").isNull(), F.lit("added"))
        .when(F.col("__hr").isNull(), F.lit("removed"))
        .when(F.col("__hl") != F.col("__hr"), F.lit("changed"))
    )
    return (
        j.select(*keys, status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def diff_summary(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """One row per status with counts (zero-count statuses absent) —
    the reconciliation dashboard number."""
    return (
        table_diff(left, right, keys)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
