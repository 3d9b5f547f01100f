"""Catalog wave 9 (round 3): driver-green rows for the last
test-only operators — salted hot-key aggregation (skew.py), the CSV
sink (S9), and bucketed co-located joins (lake.py). Each one's
result is restated by a plain-SQL oracle, so the scale mechanisms
(salt spread, sink round-trip, bucket layout) are hash-checked to be
semantically invisible."""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from ..sources.lake import write_bucketed_table
from .catalog import _msum2, _register, _t


@_register(
    "a10_salted_hot_key_agg",
    """
    SELECT l_suppkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def a10_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py:19) over the
    supplier key: partials on (key, salt) spread a hot key over 16
    reducers, the combine restores exact groupBy semantics — the
    oracle is the direct single-phase GROUP BY, so the hash check
    proves the salt is semantically invisible. Integer quantities keep
    the sum order-independent across the two shuffle orders."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty", F.col("l_quantity").cast("bigint")
    )
    out = salted_agg(li, keys=["l_suppkey"], sums=["qty"], salt_buckets=16)
    return out.select(
        "l_suppkey",
        F.col("sum_qty").cast("bigint").alias("sum_qty"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@_register(
    "s9_csv_roundtrip",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST((floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                 + 50) / 100.0) / 100.0) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def s9_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 CSV sink as a hash-checked round trip: aggregate orders by
    priority, write through the native ``df.write.csv`` sink (header,
    parallel part files), read back with an explicit schema, and
    hash-compare against the oracle's restated aggregate — proving the
    text round trip loses nothing (Java shortest-repr doubles reparse
    to the identical bits)."""
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _msum2(F.col("o_totalprice")).alias("total_price"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "sfdata_csv_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    agg.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.csv(
        path,
        header=True,
        schema="o_orderpriority string, n_orders bigint, total_price double",
    )


@_register(
    "j11_bucketed_colocated_join",
    """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    """,
)
def j11_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 bucketed-table join (sources/lake.py:35): customer and
    orders are written bucketed 8-ways on the customer key, then
    joined bucket-to-bucket — at scale this is the shuffle-free
    repeated fact⨝fact layout (plan asserted shuffle-free in
    tests/test_skew_bucketing.py); the oracle restates the join on the
    raw tables, so the layout is proven semantically invisible."""
    tag = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    write_bucketed_table(cust, f"bt_customer_{tag}", ["c_custkey"],
                         num_buckets=8, sort_cols=["c_custkey"])
    write_bucketed_table(orders, f"bt_orders_{tag}", ["o_custkey"],
                         num_buckets=8, sort_cols=["o_custkey"])
    c = spark.table(f"bt_customer_{tag}")
    o = spark.table(f"bt_orders_{tag}")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
        )
    )
