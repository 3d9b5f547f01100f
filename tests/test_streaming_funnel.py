"""Streaming funnel ≡ batch funnel (differential).

The stream is delivered ONE FILE PER TRIGGER so the watermark from
each batch fires the event-time timeouts in the next; late sentinel
events push every user's watermark past t1 + within so all funnel
rows finalize. Includes an out-of-order arrival (the step-1 event
for u4 arrives in a LATER file than its step-2 event) to exercise
the chain-rewrite retention.
"""

import datetime
import os

from pyspark.sql import Row

from sfdata_wrangler_spark.operators.funnel import funnel_steps
from sfdata_wrangler_spark.streaming.funnel_stream import stateful_funnel

T0 = datetime.datetime(2024, 1, 1, 10, 0)
STEPS = ["A", "B", "C"]
WITHIN = 3600.0  # 1 hour
SENTINEL_MIN = 10000


def _rows(spec):
    return [
        Row(
            event_id=i,
            user_id=u,
            event_type=t,
            ts=T0 + datetime.timedelta(minutes=m),
        )
        for i, (u, t, m) in enumerate(spec)
    ]


def test_stateful_funnel_matches_batch(spark, tmp_path):
    early = [
        # u1 completes in window
        (1, "A", 0), (1, "B", 10), (1, "C", 20),
        # u2 breaks at step 2 (B precedes A)
        (2, "B", 0), (2, "A", 5), (2, "C", 15),
        # u3 completes but C lands outside the 60-min window
        (3, "A", 0), (3, "B", 30), (3, "C", 90),
        # u4: B arrives FIRST (its A comes late, in the second file)
        (4, "B", 40),
        # u5 never produces a step-1 event -> no row
        (5, "B", 0), (5, "C", 10),
    ]
    late = [
        (4, "A", 30),  # out-of-order: earlier ts than u4's B, later file
        (4, "C", 50),
    ]
    sentinels = [(u, "Z", SENTINEL_MIN) for u in (1, 2, 3, 4, 5)]

    src = os.path.join(tmp_path, "src")
    df_early = spark.createDataFrame(_rows(early))
    df_late = spark.createDataFrame(_rows(late))
    df_sent = spark.createDataFrame(_rows(sentinels))
    # three files -> three triggers under maxFilesPerTrigger=1; the
    # sentinel file's watermark finalizes every funnel
    df_early.coalesce(1).write.parquet(src)
    df_late.coalesce(1).write.mode("append").parquet(src)
    df_sent.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df_early.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(
            stream, STEPS, within_seconds=WITHIN, watermark="0 seconds"
        )
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql("SELECT * FROM funnel_stream").collect()
    }

    batch = spark.createDataFrame(_rows(early + late))
    ref = set()
    for r in funnel_steps(batch, STEPS, within_seconds=WITHIN).collect():
        def us(x):
            return None if x is None else int(x.timestamp() * 1_000_000)

        ref.add((r["user_id"], us(r["t1"]), us(r["t2"]), us(r["t3"])))

    assert got == ref, (got, ref)
    # spot-check the semantics the fixture encodes
    by_user = {g[0]: g[1:] for g in got}
    assert by_user[1][2] is not None          # completed
    assert by_user[2][1] is None              # broken chain
    assert by_user[3][2] is None              # window exceeded
    assert by_user[4][2] is not None          # out-of-order rewrite
    assert 5 not in by_user                   # no step-1 event
