"""Round-14 tombstone lifecycle hardening (VERDICT r13 asks #2-#4).

- #2: each takedown batch commits atomically (staged dir renamed into
  ``tombstones/batch-<nonce>``) — no reader or fold ever sees a
  PARTIAL batch, upgrading the r13 "re-issue on partial visibility"
  contract to a no-partial-read property.
- #3: the takedown stream auto-re-issues superseded generations'
  tombstones after a rotation — zero resurrections with NO manual
  re-issue.
- #4: ``tombstone_fraction``'s denominator comes from
  ``meta['n_ids']`` + the tiny ``ingest_counts`` table — the
  ``needs_refresh`` poll no longer scans the corpus-scale code table.
"""

import os
import threading

from sfdata_wrangler_spark.operators.ann_refresh import (
    current_generation,
    generation_meta,
    generation_tombstones,
    ingest_batch,
    refresh_generation,
    serve_current,
    tombstone_fraction,
    tombstone_ids,
)
from tests.test_ann_refresh import KW, SERVE, _corpus_a, _queries

SCHEMA = "vec_id long, embedding array<double>"


def test_tombstone_batches_never_partially_visible(spark, tmp_path):
    """Writer commits multi-file batches (4 ids across 4 part files
    each) while a reader polls the tombstone table: every batch is
    observed either complete (all 4 ids) or not at all. Under the r13
    flat parquet append this reader could catch a half-committed
    multi-file batch."""
    root = str(tmp_path / "atomroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)
    gen = current_generation(spark, root)

    n_batches = 12
    done = threading.Event()
    partial: list = []
    polls = {"n": 0, "nonempty": 0}

    def reader():
        while not done.is_set():
            tomb = generation_tombstones(spark, root, gen)
            polls["n"] += 1
            if tomb is None:
                continue
            seen = [r["vec_id"] for r in tomb.collect()]
            polls["nonempty"] += 1
            by_batch: dict = {}
            for v in seen:
                by_batch.setdefault(v // 1000, set()).add(v % 1000)
            for b, members in by_batch.items():
                if members != {0, 1, 2, 3}:
                    partial.append((b, sorted(members)))

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    try:
        for b in range(n_batches):
            ids = spark.createDataFrame(
                [(b * 1000 + j,) for j in range(4)], "vec_id long"
            ).repartition(4)
            tombstone_ids(spark, root, ids)
    finally:
        done.set()
        rt.join(timeout=120)

    assert partial == [], partial
    assert polls["nonempty"] >= 1, polls
    tomb = generation_tombstones(spark, root, gen)
    assert tomb.distinct().count() == n_batches * 4
    # the staging area holds no leftovers after clean commits
    gdir = os.path.join(root, "generations", gen)
    staging = os.path.join(gdir, ".tombstones_staging")
    assert not os.path.exists(staging) or os.listdir(staging) == []


def test_stream_auto_reissues_across_rotation(spark, tmp_path):
    """VERDICT r13 ask #3: a rotation that trained before a takedown
    landed (emulated with fold_tombstones=False) physically contains
    the victims — the takedown stream's NEXT trigger detects the
    generation change and re-applies the superseded generation's
    tombstones itself. Zero resurrections, no manual re-issue."""
    from sfdata_wrangler_spark.streaming.ann_stream import stream_tombstones

    root = str(tmp_path / "reissueroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])
    victims = [6, 7, 8]

    refresh_generation(spark, root, corpus, **KW)

    src = os.path.join(tmp_path, "takedowns")
    os.makedirs(src)
    ckpt = os.path.join(tmp_path, "ckpt")

    def run_trigger():
        stream = spark.readStream.schema("vec_id long").parquet(src)
        q = (
            stream_tombstones(stream, root)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120) and q.exception() is None

    # trigger 1: victims land on gen A; the stream records A
    spark.createDataFrame(
        [(v,) for v in victims], "vec_id long"
    ).write.mode("append").parquet(src)
    run_trigger()
    gen_a = current_generation(spark, root)
    assert sorted(
        r["vec_id"]
        for r in generation_tombstones(spark, root, gen_a).distinct().collect()
    ) == victims

    # the race: rotation ignores A's tombstones (trained "before"
    # them) — gen B resurrects the victims
    refresh_generation(spark, root, corpus, fold_tombstones=False, **KW)
    gen_b = current_generation(spark, root)
    assert gen_b != gen_a
    got = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    assert {r["vec_id"] for r in got} & set(victims), "race not reproduced"

    # trigger 2 carries only an UNRELATED id; the re-issue must bring
    # the victims over from gen A on its own
    spark.createDataFrame([(9,)], "vec_id long").write.mode(
        "append"
    ).parquet(src)
    run_trigger()
    excluded = set(victims) | {9}
    tomb_b = generation_tombstones(spark, root, gen_b)
    assert excluded <= {r["vec_id"] for r in tomb_b.distinct().collect()}
    final = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    assert all(len_ == SERVE["k"] for len_ in _per_query_counts(final))
    assert not ({r["vec_id"] for r in final} & excluded)


def _per_query_counts(rows):
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], 0)
        by_q[r["query_id"]] += 1
    return list(by_q.values())


def test_tombstone_fraction_is_dimension_sized(spark, tmp_path):
    """VERDICT r13 ask #4: the debt denominator reads meta['n_ids'] +
    ingest_counts — exact after a rotation, additively maintained
    across ingest batches, with the pre-r14 corpus-scan fallback when
    meta lacks the count."""
    import json

    from sfdata_wrangler_spark.sources.lake import (
        atomic_write_text,
        read_text,
    )

    root = str(tmp_path / "fracroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)
    gen = current_generation(spark, root)
    meta = generation_meta(spark, root, gen)
    assert meta["n_ids"] == 60  # recorded at write time

    tombstone_ids(
        spark, root, spark.createDataFrame([(1,), (2,)], "vec_id long")
    )
    assert tombstone_fraction(spark, root) == 2 / 60

    batch = spark.createDataFrame(
        [(100 + i, [0.5] * 8) for i in range(6)], SCHEMA
    )
    ingest_batch(spark, root, batch)
    assert tombstone_fraction(spark, root) == 2 / 66

    # legacy generation (meta without n_ids) falls back to the code
    # table scan — same answer, corpus-priced
    mpath = f"{root}/generations/{gen}/meta.json"
    legacy = json.loads(read_text(spark, mpath))
    legacy.pop("n_ids")
    atomic_write_text(spark, mpath, json.dumps(legacy, sort_keys=True))
    assert tombstone_fraction(spark, root) == 2 / 66


def test_reissue_skips_folded_tombstones_so_debt_clears(spark, tmp_path):
    """code-review r14 #1: a FOLDING rotation removes the tombstoned
    vectors from the new generation; the takedown stream's re-issue
    must NOT copy those ids forward (debt would never clear and a
    needs_refresh-driven daemon would rotate forever). Only ids still
    present in the new generation's code table — the genuinely
    in-flight set — are re-applied."""
    from sfdata_wrangler_spark.streaming.ann_stream import stream_tombstones

    root = str(tmp_path / "foldroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)

    src = os.path.join(tmp_path, "takedowns")
    os.makedirs(src)
    ckpt = os.path.join(tmp_path, "ckpt")

    def run_trigger():
        stream = spark.readStream.schema("vec_id long").parquet(src)
        q = (
            stream_tombstones(stream, root)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120) and q.exception() is None

    spark.createDataFrame([(6,), (7,)], "vec_id long").write.mode(
        "append"
    ).parquet(src)
    run_trigger()

    # DEFAULT rotation folds the tombstones away
    refresh_generation(spark, root, corpus, **KW)
    gen_b = current_generation(spark, root)
    assert generation_tombstones(spark, root, gen_b) is None

    # next trigger (unrelated id) must re-apply NOTHING from gen A
    spark.createDataFrame([(9,)], "vec_id long").write.mode(
        "append"
    ).parquet(src)
    run_trigger()
    tomb_b = generation_tombstones(spark, root, gen_b)
    assert sorted(r["vec_id"] for r in tomb_b.distinct().collect()) == [9]
    assert tombstone_fraction(spark, root) < 0.1  # debt cleared


def test_tombstone_commit_fails_loud_on_swept_generation(spark, tmp_path):
    """code-review r14 #2: the staged write + mkdirs RESURRECT a
    gc-swept generation dir, so the rename itself succeeds into a
    zombie no reader resolves. tombstone_ids must detect the missing
    build marker after the rename and raise — a takedown silently
    attached to a dead generation would advance the stream's
    checkpoint past a dropped deletion."""
    import shutil

    import pytest

    root = str(tmp_path / "zombieroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)
    gen = current_generation(spark, root)

    # simulate gc sweeping the generation between resolve and write
    shutil.rmtree(os.path.join(root, "generations", gen))
    ids = spark.createDataFrame([(6,)], "vec_id long")
    with pytest.raises(FileNotFoundError, match="re-issue"):
        tombstone_ids(spark, root, ids, gen=gen)
    # no committed batch in the zombie remnants
    assert generation_tombstones(spark, root, gen) is None


def test_list_imbalance_artifact_matches_scan(spark, tmp_path):
    """r14 extension of the O(1)-poll work: list_imbalance reads the
    cell_sizes histogram + ingest deltas instead of scanning the code
    table; the value must equal the scan path exactly, including
    after an ingest batch, and the fallback must engage when the
    artifact is absent (pre-r14 generation)."""
    import shutil

    from sfdata_wrangler_spark.operators.ann_refresh import list_imbalance

    root = str(tmp_path / "imbroot")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)
    gen = current_generation(spark, root)
    gdir = os.path.join(root, "generations", gen)
    assert os.path.isdir(os.path.join(gdir, "cell_sizes"))

    def scan_value():
        from pyspark.sql import functions as F

        sizes = [
            r["n"]
            for r in spark.read.parquet(os.path.join(gdir, "codes"))
            .groupBy("cid")
            .agg(F.countDistinct("vec_id").alias("n"))
            .collect()
        ]
        return max(sizes) * len(sizes) / sum(sizes)

    assert list_imbalance(spark, root) == scan_value()

    # a hot ingest batch (single cluster) must move BOTH paths the
    # same way
    batch = spark.createDataFrame(
        [(500 + i, [0.3] * 8) for i in range(40)], SCHEMA
    )
    ingest_batch(spark, root, batch)
    after = list_imbalance(spark, root)
    assert after == scan_value()
    assert after > 1.0

    # artifact removed (pre-r14 lake) -> scan fallback, same value
    shutil.rmtree(os.path.join(gdir, "cell_sizes"))
    assert list_imbalance(spark, root) == scan_value()


def test_stream_generation_ingest_keeps_artifacts_current(spark, tmp_path):
    """code-review r14 pass-2 #1: the managed-lifecycle streaming
    ingest routes micro-batches through ingest_batch, so streamed
    vectors land under the current generation AND the drift-trigger
    artifacts stay current — where stream_ivfpq_ingest with a raw
    sink would leave them stale."""
    from sfdata_wrangler_spark.operators.ann_refresh import list_imbalance
    from sfdata_wrangler_spark.streaming.ann_stream import (
        stream_generation_ingest,
    )

    root = str(tmp_path / "gingest")
    corpus = spark.createDataFrame(_corpus_a(), SCHEMA)
    refresh_generation(spark, root, corpus, **KW)
    gen = current_generation(spark, root)
    before = list_imbalance(spark, root)

    src = os.path.join(tmp_path, "vecs")
    os.makedirs(src)
    # a hot single-cluster batch, big enough to move the histogram
    spark.createDataFrame(
        [(1000 + i, [0.3] * 8) for i in range(40)], SCHEMA
    ).write.mode("append").parquet(src)
    q = (
        stream_generation_ingest(
            spark.readStream.schema(SCHEMA).parquet(src), root
        )
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120) and q.exception() is None

    # codes landed under the SAME generation; both artifacts moved
    gdir = os.path.join(root, "generations", gen)
    assert os.path.isdir(os.path.join(gdir, "ingest_counts"))
    n_codes_ids = (
        spark.read.parquet(os.path.join(gdir, "codes"))
        .select("vec_id")
        .distinct()
        .count()
    )
    assert n_codes_ids == 100  # 60 corpus + 40 streamed
    after = list_imbalance(spark, root)
    assert after > before
    # and the debt denominator reflects the streamed ids too
    tombstone_ids(
        spark, root, spark.createDataFrame([(1,)], "vec_id long")
    )
    assert tombstone_fraction(spark, root) == 1 / 100

    # missing_ok=True idles on an empty root instead of failing
    root2 = str(tmp_path / "empty")
    q = (
        stream_generation_ingest(
            spark.readStream.schema(SCHEMA).parquet(src),
            root2,
            missing_ok=True,
        )
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120) and q.exception() is None
