"""Streaming CMS (streaming/sketch_stream.py): the folded per-batch
sketch over a real readStream equals the batch sketch over the same
data — mergeability doing its streaming job."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.sketch import cms_build
from sfdata_wrangler_spark.streaming.sketch_stream import stream_cms


def _items(spark):
    rows = [(f"tok{i % 7}",) for i in range(200)] + [("hot",)] * 50
    return spark.createDataFrame(rows, "tok string")


def test_stream_cms_equals_batch(spark, tmp_path):
    items = _items(spark)
    src = os.path.join(str(tmp_path), "src")
    # several files → several micro-batches under maxFilesPerTrigger
    items.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(items.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    partials = []

    def sink(partial_df, batch_id):
        partials.append(partial_df.collect())

    q = (
        stream_cms(stream, "tok", sink, depth=4, width_hex=1)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(partials) >= 2  # it actually ran incrementally

    # canonical fold: cell-wise sum of the per-batch partial sketches
    folded: dict[tuple, int] = {}
    for rows in partials:
        for r in rows:
            key = (r["seed"], r["bucket"])
            folded[key] = folded.get(key, 0) + r["cnt"]

    batch = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in cms_build(items, "tok", depth=4, width_hex=1).collect()
    }
    assert folded == batch


def test_stream_hll_equals_batch(spark, tmp_path):
    from sfdata_wrangler_spark.operators.hll import hll_sketch
    from sfdata_wrangler_spark.streaming.sketch_stream import stream_hll

    rows = [("g", i % 400) for i in range(1000)]
    items = spark.createDataFrame(rows, "grp string, v long")
    src = os.path.join(str(tmp_path), "hll_src")
    items.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(items.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    partials = []

    def sink(partial_df, batch_id):
        partials.append(partial_df.collect())

    q = (
        stream_hll(stream, ["grp"], "v", sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(partials) >= 2

    # canonical fold: cell-wise MAX of the per-batch register tables
    folded: dict[tuple, int] = {}
    for rows_ in partials:
        for r in rows_:
            key = (r["grp"], r["bucket"])
            folded[key] = max(folded.get(key, 0), r["max_rank"])

    batch = {
        (r["grp"], r["bucket"]): r["max_rank"]
        for r in hll_sketch(items, ["grp"], "v").collect()
    }
    assert folded == batch


def test_stream_zonemap_fold_equals_batch(spark, tmp_path):
    import glob
    import os
    import shutil

    from sfdata_wrangler_spark.operators.zonemap import zonemap_stats
    from sfdata_wrangler_spark.streaming.sketch_stream import (
        merge_zonemaps,
        stream_zonemap,
    )

    rows = [(f"f{i % 3}", i, float(i) * 1.5 if i % 7 else None)
            for i in range(90)]
    df = spark.createDataFrame(rows, "file string, k bigint, v double")

    src = str(tmp_path / "zm_src")
    os.makedirs(src)
    # two files -> at least one batch each with maxFilesPerTrigger=1
    for half in (0, 1):
        part = df.where((F.col("k") % 2) == half).coalesce(1)
        stage = str(tmp_path / f"zm_stage_{half}")
        part.write.parquet(stage)
        shutil.copy(
            glob.glob(stage + "/part-*.parquet")[0],
            os.path.join(src, f"{half}.parquet"),
        )

    state = {"zm": None}

    def sink(partial, batch_id):
        partial = partial.localCheckpoint(eager=True)
        state["zm"] = (
            partial
            if state["zm"] is None
            else merge_zonemaps(state["zm"], partial, "file")
            .localCheckpoint(eager=True)
        )

    stream = (
        spark.readStream.schema("file string, k bigint, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_zonemap(stream, "file", ["k", "v"], sink)
        .option("checkpointLocation", str(tmp_path / "zm_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = {
        tuple(r) for r in zonemap_stats(df, "file", ["k", "v"]).collect()
    }
    got = {tuple(r) for r in state["zm"].collect()}
    assert got == want


def test_stream_qsketch_fold_equals_batch(spark, tmp_path):
    import glob
    import os
    import shutil

    from sfdata_wrangler_spark.operators.qsketch import (
        qsketch_build,
        qsketch_merge,
    )
    from sfdata_wrangler_spark.streaming.sketch_stream import stream_qsketch

    rows = [
        (f"g{i % 2}", float(i * i) / 7.0 - 3.0) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")

    src = str(tmp_path / "qs_src")
    os.makedirs(src)
    for half in (0, 1):
        part = df.where((F.abs(F.hash("v")) % 2) == half).coalesce(1)
        stage = str(tmp_path / f"qs_stage_{half}")
        part.write.parquet(stage)
        shutil.copy(
            glob.glob(stage + "/part-*.parquet")[0],
            os.path.join(src, f"{half}.parquet"),
        )

    state = {"sk": None}

    def sink(partial, batch_id):
        partial = partial.localCheckpoint(eager=True)
        state["sk"] = (
            partial
            if state["sk"] is None
            else qsketch_merge(state["sk"], partial, ["grp"])
            .localCheckpoint(eager=True)
        )

    stream = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_qsketch(stream, ["grp"], "v", sink)
        .option("checkpointLocation", str(tmp_path / "qs_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = {tuple(r) for r in qsketch_build(df, ["grp"], "v").collect()}
    got = {tuple(r) for r in state["sk"].collect()}
    assert got == want
