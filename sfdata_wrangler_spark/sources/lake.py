"""Parquet-lake layout helpers (S8, SURVEY.md §2.1).

The reference's HDF5 stores (one file per year, one table key per
month, ``data_columns`` indexes; ``SFMuniDataHelper.py:28-39,535``)
become a partitioned Parquet lake: ``partitionBy("YEAR","MONTH")``
gives partition pruning, and Parquet min/max stats give the
predicate pushdown its ``store.select(where=...)`` relied on.
Idempotent re-runs use dynamic partition overwrite (the reference's
append+dedup dance)."""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("YEAR", "MONTH"),
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write a table partitioned for pruning. ``dynamic=True`` +
    mode=overwrite replaces only the partitions present in ``df`` —
    the scale-safe idempotent incremental load."""
    writer = df.write.mode(mode)
    if dynamic and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table for co-located joins: two tables
    bucketed the same way join WITHOUT a shuffle (verified in
    tests/test_skew_bucketing.py by plan inspection). This is the
    100 TB answer for repeated fact⨝fact joins on the same key
    (schedule⨝observation on trip-stop keys).

    Idempotent across sessions: a warehouse directory left by a
    previous Spark session (whose in-memory catalog is gone) would
    make ``saveAsTable`` raise LOCATION_ALREADY_EXISTS, so any
    orphaned location is cleared first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    orphan = os.path.join(warehouse, table.lower())
    if os.path.isdir(orphan):
        shutil.rmtree(orphan, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def with_year_month(df: DataFrame, date_col: str) -> DataFrame:
    """Derive the standard partition columns from a date/timestamp."""
    return df.withColumn("YEAR", F.year(date_col)).withColumn(
        "MONTH", F.month(date_col)
    )
