"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``sfdata_wrangler_spark/`` (the engine); the
query surface is declared in ``sfdata_wrangler_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the expand→weight→aggregate cascade (the reference's core
    semantic, SFMuniDataExpander + SFMuniDataAggregator) over the
    synthetic star schema.
    """
    from sfdata_wrangler_spark.plans import QUERIES

    return QUERIES["flagship_expand_weight_cascade"]["fn"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sfdata_wrangler_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each (SQL-expressible) query."""
    from sfdata_wrangler_spark.plans import oracle_sql_map

    return oracle_sql_map()
