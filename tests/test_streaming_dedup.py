"""Streaming exact dedup ≡ batch exact dedup (same normalized key),
through a real readStream → writeStream cycle."""

import datetime
import os

from pyspark.sql import Row


def _docs(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        Row(doc_id=1, text="The cat sat.", ts=t0),
        Row(doc_id=2, text="the  CAT sat.", ts=t0 + datetime.timedelta(minutes=1)),  # dup of 1 (normalized)
        Row(doc_id=3, text="Entirely different.", ts=t0 + datetime.timedelta(minutes=2)),
        Row(doc_id=4, text="The cat sat.", ts=t0 + datetime.timedelta(minutes=3)),   # dup of 1
        Row(doc_id=5, text="Another doc.", ts=t0 + datetime.timedelta(minutes=4)),
    ]
    return spark.createDataFrame(rows)


def test_batch_mode_dedup(spark):
    from sfdata_wrangler_spark.streaming.dedup_stream import stream_dedup_exact

    out = stream_dedup_exact(_docs(spark))
    kept = sorted(r.text.lower().strip() for r in out.collect())
    assert len(kept) == 3  # one survivor per normalized key


def test_stream_dedup_matches_batch(spark, tmp_path):
    from sfdata_wrangler_spark.streaming.dedup_stream import stream_dedup_exact

    docs = _docs(spark)
    src = os.path.join(tmp_path, "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_dedup_exact(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test").collect()
    batch = stream_dedup_exact(docs).collect()
    assert len(got) == len(batch) == 3
    # same normalized-key survivors (ids may differ: streaming keeps
    # arrival-order first, batch keeps an arbitrary-but-single row)
    def keys(rows):
        return sorted(" ".join(r.text.lower().split()) for r in rows)

    assert keys(got) == keys(batch)


def test_stream_neardup_matches_batch_incremental(spark, tmp_path):
    """foreachBatch near-dup vs the static band index: the union of
    per-batch accepted docs equals the batch incremental_dedup result
    on the same data."""
    from sfdata_wrangler_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_index,
    )
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        stream_incremental_neardup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "spark shuffles wide joins across the cluster nightly"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog again"),  # dup
            (102, "totally novel payload about glaciers and volcanoes"),
            (103, "spark shuffles wide joins across the cluster nightly"),  # dup
            (104, "another unseen document with fresh content entirely"),
        ],
        ["doc_id", "text"],
    )
    index = minhash_band_index(corpus).localCheckpoint(eager=True)

    src = os.path.join(tmp_path, "ndsrc")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    accepted = []

    def sink(df, batch_id):
        accepted.extend(r["doc_id"] for r in df.collect())

    q = (
        stream_incremental_neardup(stream, index, sink)
        .option("checkpointLocation", os.path.join(tmp_path, "ndckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expected = {
        r["doc_id"]
        for r in incremental_dedup(index, batch).where("is_new").collect()
    }
    assert set(accepted) == expected == {102, 104}
