"""ANN index lifecycle walkthrough (executable documentation).

The complete generation lifecycle of the IVF-PQ serving tier on the
driver's ``embeddings`` table, end to end in a throwaway root:

    python examples/run_ann_lifecycle.py [sf_dir]

1. ROTATE IN — ``refresh_generation`` trains coarse centroids +
   residual PQ codebooks, encodes the corpus, writes a generation dir
   (codes partitioned by cell; ``meta.json`` carries the probe
   geometry, the indexed id count, and sits next to the ``cell_sizes``
   histogram — the dimension-sized artifacts the drift trigger polls),
   and atomically swaps the ``_current`` pointer.
2. SERVE — ``serve_current`` resolves the pointer once per call:
   probe → pruned-cell ADC via broadcast LUT → exact rerank of the
   shortlist. Corpus-size-flat by construction.
3. INGEST — ``ingest_batch`` encodes new vectors against the FROZEN
   quantizers and appends, O(batch); per-cell count deltas keep the
   trigger artifacts current without any corpus rescans.
4. DELETE — ``tombstone_ids`` commits a takedown batch atomically
   (staged dir renamed into ``tombstones/batch-<nonce>``); the next
   serve anti-joins the ADC candidates against it BEFORE the
   shortlist, so a deleted id can neither occupy nor displace a slot.
   Cost is O(takedown), never O(corpus).
5. TAKEDOWN STREAM — ``stream_tombstones`` applies a deletion queue
   per trigger (fail-loud: an unapplied deletion replays), and
   auto-re-issues in-flight ids across rotations so a rotation that
   trained before a takedown cannot resurrect it.
6. DRIFT POLL + ROTATE AGAIN — ``needs_refresh`` reads the
   dimension-sized artifacts (hot-cell ratio + deletion debt); the
   next ``refresh_generation`` folds tombstones away (the new
   generation physically lacks them) and ``gc_generations`` bounds
   disk to the retention window.

Every stage's claim is also pinned by tests/ (test_ann_refresh,
test_ann_tombstone_r14, test_ann_tombstone_recall); this script is
the narrative version.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.ann_refresh import (
    current_generation,
    generation_meta,
    ingest_batch,
    list_generations,
    list_imbalance,
    needs_refresh,
    refresh_generation,
    serve_current,
    tombstone_fraction,
    tombstone_ids,
)
from sfdata_wrangler_spark.session import get_spark
from sfdata_wrangler_spark.streaming.ann_stream import stream_tombstones

KW = dict(km_k=8, km_iters=2, n_codes=16, cb_iters=2, m=8, sub_dim=8)
SERVE = dict(k=5, n_probe=2, shortlist=32)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_lifecycle_example")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    root = tempfile.mkdtemp(prefix="ann_lifecycle_")
    work = tempfile.mkdtemp(prefix="ann_lifecycle_stream_")
    try:
        # 1. rotate in
        gen = refresh_generation(spark, root, emb, **KW)
        meta = generation_meta(spark, root, gen)
        print(f"[1] generation {gen}: {meta['n_ids']} ids indexed, "
              f"geometry m={meta['m']} sub_dim={meta['sub_dim']}")

        # 2. serve
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = serve_current(spark, root, queries, emb, **SERVE)
        print(f"[2] served {got.count()} result rows "
              f"({SERVE['k']} per query)")

        # 3. ingest without retraining. From here on the LIVE corpus
        # is original + ingested: the rerank side of every serve and
        # the training corpus of every later rotation must be the
        # union, or the between-rotation ingests silently fall out of
        # the index at the next refresh.
        batch = emb.where(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        ingest_batch(spark, root, batch)
        corpus = emb.select("vec_id", "embedding").unionByName(batch)
        print(f"[3] ingested {batch.count()} new vectors, O(batch); "
              f"imbalance now {list_imbalance(spark, root):.2f} "
              "(from the cell_sizes artifact, no code-table scan)")

        # 4. delete without retraining
        victims = emb.where(F.col("vec_id").between(5, 7)).select("vec_id")
        tombstone_ids(spark, root, victims)
        got = serve_current(spark, root, queries, corpus, **SERVE)
        served_ids = {r["vec_id"] for r in got.collect()}
        assert not served_ids & {5, 6, 7}
        print(f"[4] tombstoned ids 5-7; serve returns full top-k "
              f"({got.count()} rows) with zero victims; "
              f"debt {tombstone_fraction(spark, root):.3f}")

        # 5. takedown stream (one availableNow trigger)
        src = os.path.join(work, "takedowns")
        os.makedirs(src)
        spark.createDataFrame([(8,)], "vec_id long").write.mode(
            "append"
        ).parquet(src)
        q = (
            stream_tombstones(
                spark.readStream.schema("vec_id long").parquet(src), root
            )
            .option(
                "checkpointLocation", os.path.join(work, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120) and q.exception() is None
        print("[5] takedown stream applied id 8 (at-least-once; "
              "re-issues itself across rotations)")

        # 6. drift poll + fold + retention — retrain on the UNION so
        # the step-3 ingests survive the rotation
        print(f"[6] needs_refresh -> {needs_refresh(spark, root)} "
              "(dimension-sized poll)")
        gen2 = refresh_generation(spark, root, corpus, retain=2, **KW)
        got = serve_current(spark, root, queries, corpus, **SERVE)
        got_ids = {r["vec_id"] for r in got.collect()}
        assert not got_ids & {5, 6, 7, 8}
        meta2 = generation_meta(spark, root, gen2)
        assert meta2["n_ids"] == n + 10 - 4  # union minus folded victims
        print(f"[6] rotated to {gen2}: tombstones folded away "
              f"(victims stay gone), retention keeps "
              f"{len(list_generations(spark, root))} generations; "
              f"current={current_generation(spark, root)}")
        print(f"done: full lifecycle over {n} vectors")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
