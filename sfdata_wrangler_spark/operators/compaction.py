"""Small-file compaction planning for a partitioned lake.

The operational counterpart to sources/lake.py's writers: long-lived
partitioned tables accumulate small files (streaming commits,
per-batch appends — the reference's monthly HDF5 appends have the
same pathology), and read throughput collapses when a 100 TB scan
opens millions of kilobyte files. A compaction pass rewrites each
partition's files into ~target-sized groups; THIS operator emits the
deterministic plan of which files co-rewrite.

Algorithm: within each partition, order files by a stable key (file
name), take the RUNNING SUM of sizes, and assign
``group = floor(cum_before / target)`` — the streaming bin-packing
that guarantees every group except the partition's last holds at
least ``target`` bytes BEFORE its final file lands (so no group is
pathologically small) while never splitting a file. One window pass,
hash-partitioned by the partition key: the plan is embarrassingly
parallel across partitions and never materializes file contents.

Ordering by name rather than size-descending (first-fit-decreasing
packs marginally tighter) is deliberate: the plan must be a pure
function of the manifest so replays/audits agree — same discipline
as operators/splits.py.

Output grain: one row per file with its assigned
``compaction_group``; group counts/sizes are a trivial rollup the
caller can feed to the rewrite job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["plan_compaction"]


def plan_compaction(
    manifest: DataFrame,
    partition_cols: list[str],
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign every file to a compaction group within its partition.

    ``manifest``: one row per file. Returns the manifest columns plus
    ``compaction_group`` (BIGINT, 0-based per partition).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint")
    return manifest.withColumn(
        "compaction_group",
        F.floor(cum_before / F.lit(target_bytes)).cast("bigint"),
    )
