"""Custom stateful streaming sessionization ≡ batch kernel.

Late sentinel events advance each user's stream past the gap so every
real session closes and is emitted in append mode.
"""

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.windows import sessionize
from sfdata_wrangler_spark.streaming.stateful import stateful_sessionize

T0 = datetime.datetime(2024, 1, 1, 10, 0)
SENTINEL_MIN = 10000


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=u,
                ts=T0 + datetime.timedelta(minutes=m),
                value=1.0,
            )
            for i, (u, m) in enumerate(rows)
        ]
    )


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    # two users; sessions (gap 30): u1 {0,10},{60,70}; u2 {5},{90}
    real = _mk(spark, [(1, 0), (1, 10), (1, 60), (1, 70), (2, 5), (2, 90)])
    sentinels = _mk(spark, [(1, SENTINEL_MIN), (2, SENTINEL_MIN)])

    src = os.path.join(tmp_path, "src")
    real.unionByName(sentinels).write.parquet(src)
    stream = spark.readStream.schema(real.schema).parquet(src)
    q = (
        stateful_sessionize(stream, gap_minutes=30.0)
        .writeStream.format("memory")
        .queryName("stateful_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sentinel_us = int(
        (T0 + datetime.timedelta(minutes=SENTINEL_MIN)).timestamp() * 1_000_000
    )
    got = {
        (r.user_id, r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM stateful_sess").collect()
        if r.session_start_us < sentinel_us
    }
    ref = sessionize(
        real, ["user_id"], "ts", 30.0, order_cols=["ts", "event_id"]
    )
    want = {
        (r.user_id, r.n, r.v)
        for r in ref.groupBy("user_id", "SESSION_ID")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == want
