"""Salted aggregation equivalence + bucketed co-located joins."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.skew import salted_agg
from sfdata_wrangler_spark.sources.lake import write_bucketed_table


def test_salted_agg_equals_direct(spark):
    """Salted two-phase aggregation == direct groupBy on a skewed
    key distribution (one hot key with 50× the rows)."""
    rows = [Row(k="hot", v=float(i)) for i in range(500)] + [
        Row(k=f"cold{i}", v=float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    direct = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.sum_v, r.n_rows)
        for r in salted_agg(df, ["k"], sums=["v"]).collect()
    }
    assert salted == direct


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan contains NO
    exchange — the co-located join the reference's per-key HDF5
    layout was approximating."""
    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    write_bucketed_table(a, "bt_a", ["id"], num_buckets=8, sort_cols=["id"])
    write_bucketed_table(b, "bt_b", ["id"], num_buckets=8, sort_cols=["id"])
    ta, tb = spark.table("bt_a"), spark.table("bt_b")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
