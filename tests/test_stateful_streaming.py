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


def test_stateful_sessionize_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: an OPEN session accumulated in run 1 must
    close correctly when run 2 (resumed from the checkpoint) delivers
    the events that end it. Parquet sink — the memory sink cannot
    recover from a checkpoint."""
    import time

    src = os.path.join(tmp_path, "src2")
    chk = os.path.join(tmp_path, "chk2")
    out = os.path.join(tmp_path, "out2")

    first = _mk(spark, [(1, 0), (1, 10)])            # open session
    second = _mk(spark, [(1, 20), (1, 90)])          # extends, then breaks
    sentinels = _mk(spark, [(1, SENTINEL_MIN)])

    def start():
        stream = spark.readStream.schema(first.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        return (
            stateful_sessionize(stream, gap_minutes=30.0)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )

    first.coalesce(1).write.parquet(src)
    q = start()
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 0      # still open

    time.sleep(0.4)
    second.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.4)
    sentinels.coalesce(1).write.mode("append").parquet(src)
    q = start()
    assert q.awaitTermination(120)

    got = {
        (r.user_id, r.n_events, r.session_value)
        for r in spark.read.parquet(out).collect()
        if r.session_start_us
        < int(
            (T0 + datetime.timedelta(minutes=SENTINEL_MIN)).timestamp()
            * 1_000_000
        )
    }
    # session 1 = minutes {0,10,20} (3 events, crossing the restart);
    # session 2 = minute {90}
    assert got == {(1, 3, 3.0), (1, 1, 1.0)}
