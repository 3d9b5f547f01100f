"""Streaming funnel ≡ batch funnel (differential).

The stream is delivered ONE FILE PER TRIGGER so the watermark from
each batch fires the event-time timeouts in the next; late sentinel
events push every user's watermark past t1 + within so all funnel
rows finalize. Includes an out-of-order arrival (the step-1 event
for u4 arrives in a LATER file than its step-2 event) to exercise
the chain-rewrite retention — which is why the watermark DELAY is 2
hours, not 0: allowed lateness is exactly what admits u4's A@30min
after the first file already advanced event time to +90min (with a
0-second watermark the engine rightly drops it and u4's funnel
never forms — that is watermark semantics, not a bug).
"""

import datetime
import os

from pyspark.sql import Row

from sfdata_wrangler_spark.operators.funnel import funnel_steps
from sfdata_wrangler_spark.streaming.funnel_stream import (
    _finalize_and_retain,
    stateful_funnel,
)

T0 = datetime.datetime(2024, 1, 1, 10, 0)
STEPS = ["A", "B", "C"]
WITHIN = 3600.0  # 1 hour
SENTINEL_MIN = 10000


def _us(x):
    return None if x is None else int(x.timestamp() * 1_000_000)


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
    # sentinels must be STEP-typed: the operator filters to step
    # types before the watermark (pushed-down filters mean non-step
    # events never advance event time), so fresh far-future users
    # carry the watermark; their own funnels never finalize (the
    # watermark never clears their horizon) and they are excluded
    # from the comparison below
    sentinels = [(991, "A", SENTINEL_MIN)]
    # a FOURTH trigger: u4's timeout is clamped to watermark+1ms
    # during the late-file batch (its horizon equals the watermark —
    # the exact race the clamp exists for), and timeouts in batch N
    # fire against the watermark computed at the END of batch N-1, so
    # the sentinel batch itself can't flush it. On a live stream the
    # next trigger does; here that next trigger is one more file
    # (rows filtered out pre-groupBy — timeout processing runs even
    # for batches that deliver a group no data).
    sentinels2 = [(992, "A", SENTINEL_MIN + 1)]

    src = os.path.join(tmp_path, "src")
    df_early = spark.createDataFrame(_rows(early))
    df_late = spark.createDataFrame(_rows(late))
    df_sent = spark.createDataFrame(_rows(sentinels))
    # three files -> three triggers under maxFilesPerTrigger=1; the
    # sentinel file's watermark finalizes every funnel
    import time

    df_early.coalesce(1).write.parquet(src)
    time.sleep(0.4)  # distinct mtimes: FileStreamSource orders by them
    df_late.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.4)
    df_sent.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows(sentinels2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(df_early.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(
            stream, STEPS, within_seconds=WITHIN, watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not finish in time"

    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql("SELECT * FROM funnel_stream").collect()
        if r.user_id < 900
    }

    batch = spark.createDataFrame(_rows(early + late))
    ref = set()
    for r in funnel_steps(batch, STEPS, within_seconds=WITHIN).collect():
        ref.add((r["user_id"], _us(r["t1"]), _us(r["t2"]), _us(r["t3"])))

    assert got == ref, (got, ref)
    # spot-check the semantics the fixture encodes
    by_user = {g[0]: g[1:] for g in got}
    assert by_user[1][2] is not None          # completed
    assert by_user[2][1] is None              # broken chain
    assert by_user[3][2] is None              # window exceeded
    assert by_user[4][2] is not None          # out-of-order rewrite
    assert 5 not in by_user                   # no step-1 event


def test_stateful_funnel_state_survives_restart(spark, tmp_path):
    """Production concern the single-run differential can't see: the
    per-user retained-time lists must round-trip through the state
    store so a STOPPED query resumed from its checkpoint finalizes
    funnels whose evidence arrived before the stop."""
    import time

    src = os.path.join(tmp_path, "src2")
    chk = os.path.join(tmp_path, "chk2")
    out = os.path.join(tmp_path, "out2")

    first = [(1, "A", 0), (1, "B", 10), (2, "A", 5)]
    second = [(1, "C", 20), (2, "B", 15), (2, "C", 25)]
    sent = [(991, "A", SENTINEL_MIN)]
    sent2 = [(992, "A", SENTINEL_MIN + 1)]

    def start():
        stream = (
            spark.readStream.schema(
                spark.createDataFrame(_rows(first)).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # parquet sink, not memory: the memory sink cannot recover
        # from a checkpoint, and recovery is the point of this test
        return (
            stateful_funnel(
                stream, STEPS, within_seconds=WITHIN, watermark="2 hours"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: only the first file exists; every funnel stays OPEN
    spark.createDataFrame(_rows(first)).coalesce(1).write.parquet(src)
    q = start()
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 0

    # run 2: completions + watermark carriers arrive; the resumed
    # query must combine them with run 1's checkpointed state
    time.sleep(0.4)
    spark.createDataFrame(_rows(second)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows(sent)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows(sent2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    assert q.awaitTermination(120)

    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.read.parquet(out).collect()
        if r.user_id < 900
    }
    batch = spark.createDataFrame(_rows(first + second))
    ref = set()
    for r in funnel_steps(batch, STEPS, within_seconds=WITHIN).collect():
        ref.add((r["user_id"], _us(r["t1"]), _us(r["t2"]), _us(r["t3"])))
    assert got == ref, (got, ref)


def test_stateful_funnel_under_rocksdb_state_store(spark, tmp_path):
    """The state-store provider that scales: default HDFS-backed
    state is executor-heap-bound, RocksDB spills per-partition state
    to local disk — the 100 TB answer for corpus-sized keyspaces.
    The operator must run identically under it (provider is read at
    query start; this test pins the wiring, the differential above
    pins the math)."""
    import time

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = os.path.join(tmp_path, "src3")
        spec = [(1, "A", 0), (1, "B", 10), (1, "C", 20)]
        df = spark.createDataFrame(_rows(spec))
        df.coalesce(1).write.parquet(src)
        time.sleep(0.4)
        spark.createDataFrame(_rows([(991, "A", SENTINEL_MIN)])).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(0.4)
        spark.createDataFrame(
            _rows([(992, "A", SENTINEL_MIN + 1)])
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_funnel(
                stream, STEPS, within_seconds=WITHIN, watermark="2 hours"
            )
            .writeStream.format("memory")
            .queryName("funnel_rocks")
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(tmp_path, "chk3")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = [
            r
            for r in spark.sql("SELECT * FROM funnel_rocks").collect()
            if r.user_id < 900
        ]
        assert len(rows) == 1
        assert rows[0].t3_us is not None
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


# ---------------------------------------------------------------- #
# pure state-transition unit tests (no Spark)                      #
# ---------------------------------------------------------------- #

W = 100  # within_us for the unit tests


def test_transition_prunes_seedless_state_by_watermark():
    """ADVICE r5 (medium): a user with no step-1 event who keeps
    producing step-2+ events must not accumulate state forever — a
    retained time t can only qualify under a future seed s <= t, and
    any future seed arrives above the watermark, so times below the
    watermark are dead."""
    lists = [[], [10, 20, 30, 40], [15]]
    chains, retained, timeout = _finalize_and_retain(lists, wm_us=35, within_us=W)
    assert chains == []
    assert retained == [[], [40], []]          # 10/20/30/15 aged out
    assert timeout == 40 + W                   # GC horizon from max retained
    # watermark past everything -> state fully collapses
    chains, retained, timeout = _finalize_and_retain(lists, wm_us=500, within_us=W)
    assert chains == [] and retained == [[], [], []] and timeout is None


def test_transition_emits_multiple_pending_episodes():
    """Two episodes whose horizons the watermark has both passed emit
    in order from a single transition."""
    lists = [[0, 500], [10, 560], []]
    chains, retained, timeout = _finalize_and_retain(lists, wm_us=1000, within_us=W)
    assert chains == [[0, 10, None], [500, 560, None]]
    assert retained == [[], [], []] and timeout is None


def test_transition_retains_pending_seed_and_its_window():
    """Episode 1 (horizon 100 < wm 200) emits and is consumed; the
    pending seed at 500 survives with exactly the times that can
    still matter: in-window below the watermark, or above it."""
    lists = [[0, 500], [30, 150, 560], []]
    chains, retained, timeout = _finalize_and_retain(lists, wm_us=200, within_us=W)
    assert chains == [[0, 30, None]]
    assert retained[0] == [500]
    assert retained[1] == [560]                # 150: < wm, outside [500,600]
    assert timeout == 500 + W


def test_transition_seed_redundancy_prune_is_watermark_safe():
    """A non-seed step-1 time below the watermark is dropped (greedy
    boundaries at or below the watermark are final); one above the
    watermark is kept even when currently redundant — an earlier
    late seed could still shift episode boundaries under it."""
    lists = [[0, 50, 500, 550], [], []]
    chains, retained, _ = _finalize_and_retain(lists, wm_us=520, within_us=W)
    assert chains == [[0, None, None]]
    # 50 consumed with episode 1; 500 is the pending seed; 550 is
    # redundant today but >= wm, so it must survive
    assert retained[0] == [500, 550]


def test_stateful_funnel_emits_second_episode(spark, tmp_path):
    """ADVICE r5 (low): a step-1 event beyond the current episode's
    window must open a SECOND episode and emit its own row, even when
    it arrives in a batch before the first episode's timeout fires."""
    import time

    src = os.path.join(tmp_path, "src_ep")
    first = [(1, "A", 0), (1, "B", 10)]
    second = [(1, "A", 120), (1, "B", 130)]   # > 60-min window: new episode
    df = spark.createDataFrame(_rows(first))
    df.coalesce(1).write.parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows(second)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows([(991, "A", SENTINEL_MIN)])).coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows([(992, "A", SENTINEL_MIN + 1)])).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(stream, STEPS, within_seconds=WITHIN, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("funnel_episodes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql("SELECT * FROM funnel_episodes").collect()
        if r.user_id < 900
    }
    t = lambda m: _us(T0 + datetime.timedelta(minutes=m))  # noqa: E731
    assert got == {
        (1, t(0), t(10), None),
        (1, t(120), t(130), None),
    }, got


def test_batch_episodes_match_streaming_episodes(spark, tmp_path):
    """funnel_episodes (batch, bounded unroll) and stateful_funnel
    (streaming, watermark-finalized) implement the SAME per-episode
    semantics — on a closed dataset with <= max_episodes episodes per
    user their row sets must agree exactly."""
    import time

    from sfdata_wrangler_spark.operators.funnel import funnel_episodes

    spec = [
        # u1: two complete episodes 2h apart (window is 1h)
        (1, "A", 0), (1, "B", 10), (1, "C", 20),
        (1, "A", 120), (1, "B", 130), (1, "C", 150),
        # u2: episode 1 breaks, episode 2 completes
        (2, "A", 0), (2, "C", 5),
        (2, "A", 200), (2, "B", 210), (2, "C", 220),
        # u3: single episode, window exceeded at step 3
        (3, "A", 0), (3, "B", 30), (3, "C", 90),
    ]
    src = os.path.join(tmp_path, "src_diff")
    df = spark.createDataFrame(_rows(spec))
    df.coalesce(1).write.parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows([(991, "A", SENTINEL_MIN)])).coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(0.4)
    spark.createDataFrame(_rows([(992, "A", SENTINEL_MIN + 1)])).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(stream, STEPS, within_seconds=WITHIN, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("funnel_diff")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql("SELECT * FROM funnel_diff").collect()
        if r.user_id < 900
    }

    ref = {
        (r["user_id"], _us(r["t1"]), _us(r["t2"]), _us(r["t3"]))
        for r in funnel_episodes(
            df, STEPS, within_seconds=WITHIN, max_episodes=4
        ).collect()
    }
    assert got == ref, (got, ref)
    # the fixture really exercises multi-episode rows
    assert len([g for g in got if g[0] == 1]) == 2
    assert len([g for g in got if g[0] == 2]) == 2


def test_stateful_funnel_random_split_matches_batch_episodes(spark, tmp_path):
    """Trigger-alignment independence, randomized: a pseudo-random
    event panel is SHUFFLED and split arbitrarily across five files
    (five micro-batches in arbitrary event-time order); with a
    watermark delay longer than the panel's span nothing is late, so
    the stream must emit EXACTLY the batch funnel_episodes rows —
    whatever landed in whichever trigger."""
    import random
    import time

    from sfdata_wrangler_spark.operators.funnel import funnel_episodes

    rng = random.Random(77)
    spec = []
    for u in range(1, 25):
        for _ in range(rng.randint(0, 14)):
            spec.append(
                (u, rng.choice(["A", "B", "C", "D"]), rng.randint(0, 600))
            )
    rng.shuffle(spec)
    chunks = [spec[i::5] for i in range(5)]

    src = os.path.join(tmp_path, "src_rand")
    first = True
    for chunk in chunks:
        if not chunk:
            continue
        mode = "overwrite" if first else "append"
        spark.createDataFrame(_rows(chunk)).coalesce(1).write.mode(
            mode
        ).parquet(src)
        first = False
        time.sleep(0.4)
    for sentinel in [(991, "A", SENTINEL_MIN), (992, "A", SENTINEL_MIN + 1)]:
        spark.createDataFrame(_rows([sentinel])).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.4)

    stream = (
        spark.readStream.schema(spark.createDataFrame(_rows(spec)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_funnel(
            # 11-hour delay > the 10-hour panel span: nothing is late
            stream, STEPS, within_seconds=WITHIN, watermark="11 hours"
        )
        .writeStream.format("memory")
        .queryName("funnel_rand")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql("SELECT * FROM funnel_rand").collect()
        if r.user_id < 900
    }
    ref = {
        (r["user_id"], _us(r["t1"]), _us(r["t2"]), _us(r["t3"]))
        for r in funnel_episodes(
            spark.createDataFrame(_rows(spec)),
            STEPS,
            within_seconds=WITHIN,
            max_episodes=16,
        ).collect()
    }
    assert got == ref, (got - ref, ref - got)
    # panel must be non-trivial: multi-episode users present
    from collections import Counter

    per_user = Counter(u for u, *_ in got)
    assert any(c >= 2 for c in per_user.values())
