"""Deterministic training-shard export (beyond-reference surface).

The last step of a curation pipeline is a *global, reproducible
shuffle* of the corpus into fixed-count shards that trainers stream
independently. Randomized shuffles (``rand()``, ``repartition``'s
round-robin) are non-reproducible across runs and engines; instead
each document's shard is a pure function of its id — the first hex
digits of ``md5(id)`` — so any engine recomputes the same layout,
and within a shard documents are ordered by the same hash for a
deterministic pseudo-random read order.

Scale shape: shard assignment is a stateless column expression;
the write is one hash-partitioned shuffle into ``partitionBy(shard)``
parquet. md5-prefix sharding is uniform, so shards balance to
corpus_size/n_shards regardless of id distribution (sequential ids,
UUIDs, snowflakes alike).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(id_col: F.Column, n_shards: int) -> F.Column:
    """Deterministic shard in [0, n_shards): int value of the first 6
    hex chars of md5(id) mod n_shards. 6 hex digits = 24 bits, so the
    mod bias is < 2^-14 for any n_shards ≤ 4096."""
    hexpfx = F.substring(F.md5(id_col.cast("string")), 1, 6)
    return (F.conv(hexpfx, 16, 10).cast("bigint") % n_shards).cast("int")


def shard_id_sql(id_expr: str, n_shards: int) -> str:
    """Oracle-SQL twin of :func:`shard_id` (same md5 prefix, same
    mod), for differential checks."""
    return (
        f"CAST(CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR)),"
        f" 1, 6)) AS BIGINT) % {n_shards} AS INTEGER)"
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Assign shards and write ``partitionBy("shard")`` parquet, one
    hash-shuffle so each shard's rows land in one task's files."""
    out = df.withColumn("shard", shard_id(F.col(id_col), n_shards))
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", F.md5(F.col(id_col).cast("string")))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(
    spark_df: DataFrame,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest over a shard-partitioned frame: row count,
    id span, and optional token totals — the index a trainer reads to
    plan epochs without scanning the corpus."""
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min(id_col).cast("bigint").alias("min_id"),
        F.max(id_col).cast("bigint").alias("max_id"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("bigint").alias("n_tokens"))
    return spark_df.groupBy("shard").agg(*aggs)
