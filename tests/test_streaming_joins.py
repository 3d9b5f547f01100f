"""Watermarked stream-stream join: the attribution join through a
real two-source readStream cycle must equal the batch join on the
same bounded data."""

import datetime
import glob
import os
import shutil

from pyspark.sql import Row

from sfdata_wrangler_spark.streaming.join_stream import attributed_events

T0 = datetime.datetime(2024, 1, 1, 10, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                event_id=eid,
                ts=T0 + datetime.timedelta(minutes=m),
            )
            for u, eid, m in rows
        ]
    )


def _write_flat(spark, rows, dest, tmp_path, name):
    stage = str(tmp_path / f"stage_{name}")
    _events(spark, rows).coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(stage + "/part-*.parquet")[0], os.path.join(dest, name)
    )


def test_stream_stream_attribution_equals_batch(spark, tmp_path):
    views = [
        (1, 10, 0), (1, 11, 30),   # user 1: two views
        (2, 20, 5),                # user 2: one view
    ]
    clicks = [
        (1, 100, 4),    # attributes to view 10 (4 min later)
        (1, 101, 35),   # attributes to view 11
        (1, 102, 55),   # too late for both views
        (2, 200, 6),    # attributes to view 20
        (3, 300, 7),    # no matching view user
    ]
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    os.makedirs(vsrc)
    os.makedirs(csrc)
    _write_flat(spark, views, vsrc, tmp_path, "v.parquet")
    _write_flat(spark, clicks, csrc, tmp_path, "c.parquet")

    schema = "user_id bigint, event_id bigint, ts timestamp"
    vstream = spark.readStream.schema(schema).parquet(vsrc)
    cstream = spark.readStream.schema(schema).parquet(csrc)
    out = str(tmp_path / "out")
    q = (
        attributed_events(vstream, cstream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["trigger_id"], r["outcome_id"], r["delay_us"])
        for r in spark.read.parquet(out).collect()
    }
    batch = attributed_events(_events(spark, views), _events(spark, clicks))
    want = {
        (r["trigger_id"], r["outcome_id"], r["delay_us"])
        for r in batch.collect()
    }
    assert got == want
    assert want == {
        (10, 100, 4 * 60_000_000),
        (11, 101, 5 * 60_000_000),
        (20, 200, 1 * 60_000_000),
    }


def test_stream_stream_left_outer_emits_closed_windows(spark, tmp_path):
    from sfdata_wrangler_spark.streaming.join_stream import (
        unattributed_triggers,
    )

    views = [
        (1, 10, 0),     # matched by click 100
        (1, 11, 30),    # matched by click 101
        (4, 40, 12),    # NO click -> must emit a null row
        (999, 900, 600),  # watermark sentinel: window still open at end
    ]
    clicks = [
        (1, 100, 4),
        (1, 101, 35),
        (2, 200, 6),      # click without any view: never emitted
        (999, 901, 600),  # sentinel pushes the outcome-side watermark
    ]
    vsrc, csrc = str(tmp_path / "vo"), str(tmp_path / "co")
    os.makedirs(vsrc)
    os.makedirs(csrc)
    _write_flat(spark, views, vsrc, tmp_path, "vo.parquet")
    _write_flat(spark, clicks, csrc, tmp_path, "co.parquet")

    schema = "user_id bigint, event_id bigint, ts timestamp"
    vstream = spark.readStream.schema(schema).parquet(vsrc)
    cstream = spark.readStream.schema(schema).parquet(csrc)
    out = str(tmp_path / "out_outer")
    q = (
        unattributed_triggers(vstream, cstream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "chk_outer"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["trigger_id"], r["outcome_id"])
        for r in spark.read.parquet(out).collect()
    }

    batch = unattributed_triggers(_events(spark, views), _events(spark, clicks))
    batch_rows = batch.collect()
    matched = {
        (r["trigger_id"], r["outcome_id"])
        for r in batch_rows
        if r["outcome_id"] is not None
    }
    # final watermark = max event time (600) - 30 min = 570; a null
    # row emits iff its join window [t_ts, t_ts+10min] closed before
    # that — true for view 40 (min 22), false for the sentinel (610)
    final_wm_min = 600 - 30
    closed_nulls = {
        (r["trigger_id"], None)
        for r in batch_rows
        if r["outcome_id"] is None
        and (r["t_ts"] - T0).total_seconds() / 60 + 10 < final_wm_min
    }
    assert matched <= got
    assert got == matched | closed_nulls
    assert (40, None) in got
    assert (900, None) not in got  # window still open: held as state
