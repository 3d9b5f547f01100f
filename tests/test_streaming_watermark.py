"""Watermarked tumbling windows: late data is dropped on the stream
but counted in batch — the delta IS the watermark semantics.

The stream runs as three availableNow passes over a growing file
directory with a SHARED checkpoint: the watermark persists across
restarts, so pass 2 sees a watermark advanced by pass 1's max event
time and must drop the too-late event deterministically.
"""

import datetime
import glob
import os
import shutil

from pyspark.sql import Row

from sfdata_wrangler_spark.streaming.windowed import windowed_event_counts

T0 = datetime.datetime(2024, 1, 1, 10, 0)


def _rows(spark, minutes):
    return spark.createDataFrame(
        [
            Row(user_id=1, ts=T0 + datetime.timedelta(minutes=m), value=1.0)
            for m in minutes
        ]
    )


def _add_file(spark, minutes, src, name, tmp_path):
    """Write one FLAT parquet file into the stream source dir (the
    file source lists plain files, not nested write dirs)."""
    stage = str(tmp_path / f"stage_{name}")
    _rows(spark, minutes).coalesce(1).write.parquet(stage)
    part = glob.glob(stage + "/part-*.parquet")[0]
    shutil.copy(part, os.path.join(src, name))


def _run_pass(spark, src, chk, out):
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(src)
    q = (
        windowed_event_counts(stream, window="10 minutes",
                              watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # pass 1: window [10:00,10:10) gets 2 events; the 11:00 event
    # advances max event time -> watermark becomes 10:30
    _add_file(spark, [0, 5, 60], src, "batch1.parquet", tmp_path)
    _run_pass(spark, src, chk, out)

    # pass 2: minute 3 (10:03) is BEHIND the persisted 10:30 watermark
    # -> dropped; minute 120 (12:00) advances the watermark to 11:30,
    # finalizing the 11:00 window
    _add_file(spark, [3, 120], src, "batch2.parquet", tmp_path)
    _run_pass(spark, src, chk, out)

    # pass 3: minute 180 pushes the watermark past every earlier window
    _add_file(spark, [180], src, "batch3.parquet", tmp_path)
    _run_pass(spark, src, chk, out)

    got = {
        r.window_start.strftime("%H:%M"): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    # late 10:03 event NOT in the 10:00 window
    assert got["10:00"] == 2
    assert got["11:00"] == 1
    assert got["12:00"] == 1

    # batch over the same files has no watermark: all 6 events count —
    # the stream/batch delta is exactly the dropped late row
    batch = {
        r.window_start.strftime("%H:%M"): r.n_events
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }
    assert batch["10:00"] == 3
    assert sum(batch.values()) == sum(got.values()) + 1 + 1  # +late +unflushed 13:00


def test_sliding_stream_equals_batch(spark, tmp_path):
    """Sliding windows (10 min / 5 min slide) through a real
    readStream→writeStream cycle equal the batch run when nothing is
    late — and each event appears in exactly two windows."""
    src = str(tmp_path / "ssrc")
    chk = str(tmp_path / "schk")
    out = str(tmp_path / "sout")
    os.makedirs(src)
    minutes = [0, 3, 7, 12, 14, 26]
    _add_file(spark, minutes, src, "a.parquet", tmp_path)
    # a final far-future row advances the watermark so every real
    # window closes and append mode emits it
    _add_file(spark, [600], src, "z.parquet", tmp_path)

    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(src)
    q = (
        windowed_event_counts(
            stream, window="10 minutes", watermark="1 minute",
            slide="5 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = windowed_event_counts(
        _rows(spark, minutes), window="10 minutes", slide="5 minutes"
    )
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.read.parquet(out).collect()
        if r["window_start"] < T0 + datetime.timedelta(minutes=60)
    }
    want = {(r["window_start"], r["n_events"]) for r in batch.collect()}
    assert got == want
    # overlap factor: 6 events x 2 windows each
    assert sum(n for _, n in want) == 2 * len(minutes)
