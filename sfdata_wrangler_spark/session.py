"""SparkSession construction with scale-oriented defaults.

Local testing runs on local[N]; the configuration is chosen so the
same logical plans run unchanged on a large cluster: AQE for runtime
re-planning (coalesce + skew-join), broadcast threshold for
dimension-table joins, Arrow for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sfdata_wrangler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are cluster-portable: at 100 TB only ``shuffle_partitions``
    and memory sizing change; the logical plans do not.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic broadcast conversion. This is the
        # scale story for the mildly-skewed group keys noted in
        # SURVEY.md §4 (trunk routes / hot users).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in the synthetic data are ns-precision; keep
        # behavior deterministic across sessions.
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast dims up to 32 MB (route_equiv, calendar, nation,
        # region, crosswalks are all far below this).
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Read-side partition sizing; at 100 TB this keeps scan tasks
        # at ~128MB regardless of file layout.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Per-file open-cost charge in split packing. Spark's 4 MB
        # default FLOORS the scan split size (maxSplitBytes =
        # max(openCost, bytes/defaultParallelism) capped by
        # maxPartitionBytes), which on MB-scale local inputs collapses
        # every scan — and the map work pipelined into it — to 1-2
        # tasks regardless of core count (measured r15: the six
        # heaviest queries ran 32-core:8-core at 0.8-1.2x on a 10x
        # corpus because of exactly this). 64 KB reflects a local
        # NVMe/page-cache open cost and lets bytes/parallelism set the
        # split size instead; on object storage (real per-open
        # latency) raise it via SPARK_GRAFT_OPEN_COST_BYTES — the
        # split size then derives from data volume and cluster
        # parallelism either way, which is the scale-adaptive shape
        # the 4 MB constant was not.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(64 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Executor python workers need the repo importable for
        # pandas-UDF stages regardless of the driver's cwd.
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        # The driver's synthetic events table uses parquet
        # TIMESTAMP(NANOS); read as int64 nanos and convert (see
        # plans.catalog._events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every parquet table under ``sf_dir`` and register temp views.

    Returns ``{name: DataFrame}``. Mirrors the driver's DuckDB view
    registration so Spark SQL and oracle SQL see identical relations.
    """
    import glob
    import os as _os

    out = {}
    for path in sorted(glob.glob(_os.path.join(sf_dir, "*.parquet"))):
        name = _os.path.splitext(_os.path.basename(path))[0]
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
