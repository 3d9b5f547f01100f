"""Structured Streaming walkthrough (executable documentation).

The engine's streaming surface on a real ``readStream`` source: the
driver's ``events`` table is re-staged as multiple parquet files and
consumed with ``maxFilesPerTrigger=1`` so every stage processes
several genuine micro-batches:

    python examples/run_streaming_pipeline.py [sf_dir]

1. watermarked tumbling-window counts (append mode: each window
   emitted exactly once, late data dropped by the watermark)
2. gap-based sessionization via ``session_window`` (the Clipper/taxi
   kernel's streaming twin)
3. exact dedup across batches (state = seen-key store)
4. mergeable-state maintenance via foreachBatch folds: per-batch
   quantile sketches merged by the count-sum law — percentiles over
   an unbounded stream as bounded state
5. stateful windowed-funnel completion (applyInPandasWithState):
   signup → click → purchase chains finalized by the watermark,
   compared against the batch funnel on the same events

Every stage's streaming result is compared against the same function
run on the batch frame: fold-equals-batch is the design law that
makes the streaming surface trustworthy (and is pinned by tests/).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.qsketch import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)
from sfdata_wrangler_spark.session import get_spark
from sfdata_wrangler_spark.streaming.sessionize_stream import (
    stream_session_stats,
)
from sfdata_wrangler_spark.streaming.sketch_stream import stream_qsketch
from sfdata_wrangler_spark.streaming.windowed import windowed_event_counts


def _stage_as_files(df, outdir: str, n_files: int = 4) -> None:
    """Re-stage a frame as n separate parquet files (one per future
    micro-batch), split by TIME RANGE so batches arrive in event-time
    order — the realistic ingest shape, and what lets the watermarked
    append-mode results match batch (out-of-order files would be
    legitimately dropped as late, which is the semantics, not a bug,
    but makes a confusing demo)."""
    os.makedirs(outdir)
    bounds = df.select(
        F.ntile(n_files).over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy("ts")
        ).alias("q"),
        "*",
    )
    for i in range(1, n_files + 1):
        part = bounds.where(F.col("q") == i).drop("q").coalesce(1)
        stage = outdir + f"_stage{i}"
        part.write.parquet(stage)
        shutil.copy(
            glob.glob(stage + "/part-*.parquet")[0],
            os.path.join(outdir, f"{i}.parquet"),
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-example")
    spark.sparkContext.setLogLevel("ERROR")
    from sfdata_wrangler_spark.plans.catalog import _events

    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    schema = batch.schema.simpleString()[7:-1].replace(":", " ")

    tmp = tempfile.mkdtemp(prefix="sfdata_stream_example_")
    src = os.path.join(tmp, "src")
    _stage_as_files(batch, src)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def run_to_memory(sdf, name, mode):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(tmp, "chk_" + name))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"stream {name!r} did not finish in 300s — results "
                "would be partial"
            )
        return spark.table(name)

    print("== 1. watermarked tumbling windows ==")
    got = run_to_memory(
        windowed_event_counts(stream(), window="6 hours"), "win", "append"
    )
    want = windowed_event_counts(batch, window="6 hours")
    print(
        f"stream windows: {got.count()}  batch windows: {want.count()} "
        "(the few missing are the newest windows, still OPEN when the "
        "stream ended — append mode only emits watermark-closed "
        "windows; a live stream would emit them on the next trigger)"
    )

    print("== 2. session_window sessionization ==")
    got = run_to_memory(stream_session_stats(stream()), "sess", "append")
    want = stream_session_stats(batch)
    print(f"stream sessions: {got.count()}  batch sessions: {want.count()}")

    print("== 3. exact dedup across batches ==")
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        stream_dedup_exact,
    )

    # synthetic "documents": 500 distinct texts repeated across the
    # stream; the watermark horizon spans the whole stream, so the
    # streamed dedup must keep exactly one row per text
    dup_stream = stream().select(
        (F.col("event_id") % 500).cast("string").alias("text"), "ts"
    )
    got = run_to_memory(
        stream_dedup_exact(dup_stream, "text", ts_col="ts", watermark="90 days"),
        "dedup",
        "append",
    )
    n_expected = (
        batch.select((F.col("event_id") % 500).cast("string"))
        .distinct()
        .count()
    )
    print(
        f"rows surviving streamed dedup: {got.count()} "
        f"(batch distinct texts: {n_expected})"
    )

    print("== 4. streaming quantile sketch fold ==")
    state = {"sk": None}

    def sink(partial, batch_id):
        partial = partial.localCheckpoint(eager=True)
        state["sk"] = (
            partial
            if state["sk"] is None
            else qsketch_merge(state["sk"], partial, ["event_type"])
            .localCheckpoint(eager=True)
        )
        print(f"  batch {batch_id}: sketch rows = {state['sk'].count()}")

    q = (
        stream_qsketch(stream(), ["event_type"], "value", sink)
        .option("checkpointLocation", os.path.join(tmp, "chk_qs"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("sketch-fold stream did not finish in 300s")
    folded = qsketch_quantiles(state["sk"], ["event_type"], [0.5, 0.95])
    batch_sk = qsketch_quantiles(
        qsketch_build(batch, ["event_type"], "value"),
        ["event_type"],
        [0.5, 0.95],
    )
    fold_rows = {tuple(r) for r in folded.collect()}
    batch_rows = {tuple(r) for r in batch_sk.collect()}
    print("fold == batch:", fold_rows == batch_rows)
    folded.orderBy("event_type").show()

    print("== 5. stateful windowed funnel ==")
    from sfdata_wrangler_spark.operators.funnel import funnel_steps
    from sfdata_wrangler_spark.streaming.funnel_stream import stateful_funnel

    steps = ["signup", "click", "purchase"]
    within = 3 * 86400.0  # 3-day completion window
    got = run_to_memory(
        stateful_funnel(
            stream(), steps, within_seconds=within, watermark="1 day"
        ),
        "funnel",
        "append",
    )
    want = funnel_steps(batch, steps, within_seconds=within)
    # finalized rows must match the batch chain exactly, user by user.
    # Stream emission is per-EPISODE (a user whose funnel finalized
    # can re-enter on a later step-1 event); batch parity = keep the
    # min-t1 row per user, exactly as the operator's docstring
    # prescribes for consumers
    per_user = {}
    for r in got.collect():
        row = (r["user_id"], r["t1_us"], r["t2_us"], r["t3_us"])
        best = per_user.get(row[0])
        if best is None or row[1] < best[1]:
            per_user[row[0]] = row
    stream_rows = set(per_user.values())
    us = lambda x: None if x is None else int(x.timestamp() * 1_000_000)  # noqa: E731
    batch_by_user = {
        r["user_id"]: (r["user_id"], us(r["t1"]), us(r["t2"]), us(r["t3"]))
        for r in want.collect()
    }
    agree = all(
        batch_by_user.get(row[0]) == row for row in stream_rows
    )
    print(
        f"stream finalized funnels: {len(stream_rows)}  batch funnels: "
        f"{len(batch_by_user)}  finalized==batch per user: {agree}"
    )
    print(
        "(stream rows short of batch are funnels whose t1+within "
        "horizon the final watermark never cleared — still OPEN when "
        "the stream ended; a live stream finalizes them as event "
        "time advances. Stream rows are per-episode, so the min-t1 "
        "row per user above is what compares against batch)"
    )

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
