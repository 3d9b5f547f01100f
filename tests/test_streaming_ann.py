"""Streaming IVF-PQ ingest (streaming/ann_stream.py): micro-batches
encode against FROZEN quantizers through a real readStream ->
foreachBatch cycle, codes match the batch encode bit-for-bit, and an
end-to-end search over base + streamed appends equals the all-batch
build with the same frozen tables."""

import os

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.pq import (
    ivf_coarse_centroids,
    ivfpq_encode,
    ivfpq_index,
    ivfpq_topk,
)
from sfdata_wrangler_spark.streaming.ann_stream import stream_ivfpq_ingest
from tests.test_ivfpq import _clustered


def test_streamed_codes_match_batch_encode(spark, tmp_path):
    emb = _clustered(spark)
    base = emb.where(F.col("vec_id") % 100 < 6)  # train subset
    inc = emb.where(F.col("vec_id") % 100 >= 6)  # streamed appends

    cents = ivf_coarse_centroids(base, m=2, sub_dim=8)
    cb, enc_base = ivfpq_index(base, cents, n_codes=4, m=2, sub_dim=8)
    cents = cents.localCheckpoint(eager=True)
    cb = cb.localCheckpoint(eager=True)

    src = os.path.join(tmp_path, "vecsrc")
    inc.select("vec_id", "embedding").write.parquet(src)
    stream = spark.readStream.schema(
        inc.select("vec_id", "embedding").schema
    ).parquet(src)

    out_dir = os.path.join(tmp_path, "codes")

    def sink(codes, batch_id):
        codes.write.partitionBy("cid").mode("append").parquet(out_dir)

    q = (
        stream_ivfpq_ingest(stream, cents, cb, sink, m=2, sub_dim=8)
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    streamed = sorted(
        map(tuple, spark.read.parquet(out_dir)
            .select("vec_id", "cid", "subspace", "code").collect())
    )
    batch = sorted(
        map(tuple, ivfpq_encode(inc, cents, cb, m=2, sub_dim=8)
            .select("vec_id", "cid", "subspace", "code").collect())
    )
    assert streamed == batch and len(streamed) > 0

    # end-to-end: search over base + streamed appends == all-batch
    # encode with the SAME frozen tables
    union_codes = enc_base.select(
        "vec_id", "cid", "subspace", "code"
    ).unionByName(spark.read.parquet(out_dir).select(
        "vec_id", "cid", "subspace", "code"
    ))
    all_codes = ivfpq_encode(emb, cents, cb, m=2, sub_dim=8)
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivfpq_topk(queries, union_codes, cents, cb, emb,
                   k=3, n_probe=2, m=2, sub_dim=8)
    b = ivfpq_topk(queries, all_codes, cents, cb, emb,
                   k=3, n_probe=2, m=2, sub_dim=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_streamed_query_serving_matches_batch_search(spark, tmp_path):
    """stream_ivfpq_serve (r9): query micro-batches served against a
    persisted cid-partitioned code lake produce, in union, exactly
    the batch search's results for the same query set — and each
    trigger's partition prune comes from its own batch's probed
    cells."""
    import time

    from sfdata_wrangler_spark.streaming.ann_stream import (
        stream_ivfpq_serve,
    )

    emb = _clustered(spark)
    cents = ivf_coarse_centroids(emb, m=2, sub_dim=8)
    cb, enc = ivfpq_index(emb, cents, n_codes=4, m=2, sub_dim=8)
    cents = cents.localCheckpoint(eager=True)
    cb = cb.localCheckpoint(eager=True)

    codes_path = os.path.join(tmp_path, "servecodes")
    enc.write.partitionBy("cid").parquet(codes_path)

    # two query micro-batches (mtime-ordered files)
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    src = os.path.join(tmp_path, "qsrc")
    os.makedirs(src)
    q1 = queries.where(F.col("query_id") < 100)
    q2 = queries.where(F.col("query_id") >= 100)
    q1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    q2.coalesce(1).write.mode("append").parquet(src)

    results = []

    def sink(df, batch_id):
        results.extend(map(tuple, df.collect()))

    stream = spark.readStream.schema(queries.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_ivfpq_serve(
            stream, codes_path, cents, cb, emb, sink,
            k=3, n_probe=2, m=2, sub_dim=8,
        )
        .option("checkpointLocation", os.path.join(tmp_path, "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    batch = ivfpq_topk(
        queries, enc, cents, cb, emb, k=3, n_probe=2, m=2, sub_dim=8
    )
    assert sorted(results) == sorted(map(tuple, batch.collect()))
    assert len(results) > 0


def test_serve_pruned_idles_when_lake_missing(spark, tmp_path):
    """A serve stream started before its ingest's first commit must
    idle, not die: serve_pruned returns None for a nonexistent code
    lake (code-review r9 pass-4 #3), and stream_ivfpq_serve skips the
    sink for that trigger."""
    from sfdata_wrangler_spark.operators.pq import serve_pruned

    emb = _clustered(spark)
    cents = ivf_coarse_centroids(emb, m=2, sub_dim=8)
    cb, _enc = ivfpq_index(emb, cents, n_codes=4, m=2, sub_dim=8)
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    missing = os.path.join(tmp_path, "never_written")
    out = serve_pruned(
        queries, missing, cents, cb, emb,
        k=3, n_probe=2, m=2, sub_dim=8, missing_ok=True,
    )
    assert out is None

    # an EXISTING dir with no committed data files (concurrent
    # ingest's job setup / aborted first write) must also idle —
    # including the in-flight case where _temporary holds a
    # task-attempt part file with an ordinary LEAF name: committedness
    # is a property of every path COMPONENT, not the leaf
    # (code-review r9 pass-6 #1)
    empty = os.path.join(tmp_path, "created_not_committed")
    attempt = os.path.join(
        empty, "_temporary", "0", "attempt_x", "cid=3"
    )
    os.makedirs(attempt)
    with open(os.path.join(attempt, "part-00000.snappy.parquet"), "wb") as f:
        f.write(b"not a footer yet")
    out = serve_pruned(
        queries, empty, cents, cb, emb,
        k=3, n_probe=2, m=2, sub_dim=8, missing_ok=True,
    )
    assert out is None

    # batch callers fail loudly instead of dereferencing None
    import pytest

    with pytest.raises(FileNotFoundError):
        serve_pruned(queries, missing, cents, cb, emb,
                     k=3, n_probe=2, m=2, sub_dim=8)


def test_stream_tombstones_applies_and_replays(spark, tmp_path):
    """The takedown stream (r13): streamed ids land on the CURRENT
    generation and the next serve excludes them exactly as a batch
    tombstone_ids would; with no active generation the default is
    FAIL-LOUD (checkpoint unadvanced -> the batch replays after a
    generation exists — at-least-once deletion), while
    missing_ok=True idles."""
    from tests.test_ann_refresh import KW, SERVE, _corpus_a, _queries

    from sfdata_wrangler_spark.operators.ann_refresh import (
        generation_tombstones,
        refresh_generation,
        serve_current,
        tombstone_ids,
    )
    from sfdata_wrangler_spark.streaming.ann_stream import stream_tombstones

    root = str(tmp_path / "tsroot")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])
    victims = [6, 7, 8]

    src = os.path.join(tmp_path, "takedowns")
    os.makedirs(src)
    spark.createDataFrame(
        [(v,) for v in victims], "vec_id long"
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("vec_id long").parquet(src)
    ckpt = os.path.join(tmp_path, "ckpt")

    # no active generation yet: the trigger FAILS (not drops) and the
    # checkpoint does not advance
    q = (
        stream_tombstones(stream, root)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    assert q.exception() is not None

    # after a rotation the SAME checkpoint replays the batch
    refresh_generation(spark, root, corpus, **KW)
    stream = spark.readStream.schema("vec_id long").parquet(src)
    q = (
        stream_tombstones(stream, root)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120) and q.exception() is None

    got = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    assert not ({r["vec_id"] for r in got} & set(victims))
    # streamed takedown == batch tombstone_ids (same table contents)
    twin_root = str(tmp_path / "twinroot")
    refresh_generation(spark, twin_root, corpus, **KW)
    tombstone_ids(
        spark, twin_root,
        spark.createDataFrame([(v,) for v in victims], "vec_id long"),
    )
    twin = serve_current(spark, twin_root, qdf, corpus, **SERVE).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, twin))
    gen = __import__(
        "sfdata_wrangler_spark.operators.ann_refresh",
        fromlist=["current_generation"],
    ).current_generation(spark, root)
    tomb = generation_tombstones(spark, root, gen)
    assert sorted(r["vec_id"] for r in tomb.distinct().collect()) == victims

    # missing_ok=True idles on an empty root instead of failing
    root2 = str(tmp_path / "emptyroot")
    stream = spark.readStream.schema("vec_id long").parquet(src)
    q = (
        stream_tombstones(stream, root2, missing_ok=True)
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120) and q.exception() is None
