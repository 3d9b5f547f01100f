#!/usr/bin/env python
"""Measure that ANN deletion cost is independent of corpus size
(VERDICT r12 ask #1, third deliverable).

For each scale dir (default sf0.1's 20k embeddings and the committed
100x replica's 200k — one decade apart), the probe:

1. rotates one generation into a throwaway root (``build_sec`` — the
   corpus-proportional CONTRAST row: this is what a takedown used to
   cost before tombstones);
2. times ``tombstone_ids`` of ``--n-ids`` planted ids (``delete_sec``
   — the claim under test: an ids-sized parquet append, flat across
   corpus scales);
3. times warm ``serve_current`` best-of-N before and after the
   tombstones land (``serve_sec`` / ``serve_tombstoned_sec`` — the
   per-query overhead of the broadcast anti-join, also flat);
4. times the ``needs_refresh`` deletion-debt poll both ways (VERDICT
   r13 ask #4): ``fraction_sec`` reads the r14 meta['n_ids'] +
   ingest_counts denominator (flat across scales), while
   ``fraction_legacy_sec`` strips n_ids from meta and re-times the
   pre-r14 corpus-scale code-table distinct-count for contrast.

Prints one JSON line with the same run-condition stamp bench.py
commits, so ARCHITECTURE tables classify the run by the same rule.

Usage:
  python tools/tombstone_probe.py [--small /root/testdata/sf0.1]
                                  [--big /tmp/sfdata_sf100_flat]
                                  [--n-ids 100] [--runs 3]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_scale(spark, sf_dir: str, n_ids: int, runs: int) -> dict:
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.plans.catalog import _t
    from sfdata_wrangler_spark.plans.catalog35 import (
        _K,
        _KM_ITERS,
        _KM_K,
        _M,
        _N_CODES,
        _N_PROBE,
        _SHORTLIST,
        _SUB_DIM,
    )
    from sfdata_wrangler_spark.operators.ann_refresh import (
        refresh_generation,
        serve_current,
        tombstone_ids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    root = tempfile.mkdtemp(prefix="tombstone_probe_")
    try:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        refresh_generation(
            spark, root, emb,
            km_k=_KM_K, km_iters=_KM_ITERS, n_codes=_N_CODES,
            cb_iters=_KM_ITERS, m=_M, sub_dim=_SUB_DIM,
        )
        build = time.monotonic() - t0

        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        serve_kw = dict(k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST)

        def _serve_best():
            times = []
            for i in range(runs + 1):  # warm-up excluded
                t0 = time.monotonic()
                serve_current(
                    spark, root, queries, emb, **serve_kw
                ).count()
                if i > 0:
                    times.append(time.monotonic() - t0)
            return min(times)

        serve_sec = _serve_best()

        # planted takedown: n_ids spread over the id range, never the
        # query ids
        ids = emb.where(F.col("vec_id") >= 3).limit(n_ids).select("vec_id")
        ids = spark.createDataFrame(ids.collect(), "vec_id long")  # local
        t0 = time.monotonic()
        tombstone_ids(spark, root, ids)
        delete_sec = time.monotonic() - t0

        serve_tombstoned_sec = _serve_best()

        # the debt-trigger poll, both denominators (best-of-runs):
        # r14 path reads meta['n_ids'] (+ tiny ingest_counts); the
        # legacy path distinct-counts the corpus-scale code table
        import json as _json

        from sfdata_wrangler_spark.operators.ann_refresh import (
            current_generation,
            tombstone_fraction,
        )
        from sfdata_wrangler_spark.sources.lake import (
            atomic_write_text,
            read_text,
        )

        def _fraction_best():
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                tombstone_fraction(spark, root)
                times.append(time.monotonic() - t0)
            return min(times)

        fraction_sec = _fraction_best()
        gen = current_generation(spark, root)
        mpath = f"{root}/generations/{gen}/meta.json"
        meta = _json.loads(read_text(spark, mpath))
        n_ids_rec = meta.pop("n_ids")
        atomic_write_text(spark, mpath, _json.dumps(meta, sort_keys=True))
        fraction_legacy_sec = _fraction_best()
        meta["n_ids"] = n_ids_rec
        atomic_write_text(spark, mpath, _json.dumps(meta, sort_keys=True))

        # the imbalance half of the poll, both paths: artifact
        # (cell_sizes + ingest deltas) vs the pre-r14 code-table scan
        # (artifact renamed away for the contrast timing)
        from sfdata_wrangler_spark.operators.ann_refresh import (
            list_imbalance,
        )
        from sfdata_wrangler_spark.sources.lake import hadoop_fs

        def _imbalance_best():
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                list_imbalance(spark, root)
                times.append(time.monotonic() - t0)
            return min(times)

        imbalance_sec = _imbalance_best()
        fs, _, jvm = hadoop_fs(spark, root)
        Path = jvm.org.apache.hadoop.fs.Path
        cs = Path(f"{root}/generations/{gen}/cell_sizes")
        cs_hidden = Path(f"{root}/generations/{gen}/.cell_sizes_probe")
        # rename reports failure as False (Hadoop semantics): a failed
        # hide would time the ARTIFACT path as "legacy" and fabricate
        # the published contrast — skip the legacy row instead
        imbalance_legacy_sec = None
        if fs.rename(cs, cs_hidden):
            try:
                imbalance_legacy_sec = _imbalance_best()
            finally:
                fs.rename(cs_hidden, cs)

        return {
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
            "n_tombstoned": n_ids,
            "build_sec": round(build, 3),
            "delete_sec": round(delete_sec, 3),
            "serve_sec": round(serve_sec, 3),
            "serve_tombstoned_sec": round(serve_tombstoned_sec, 3),
            "fraction_sec": round(fraction_sec, 3),
            "fraction_legacy_sec": round(fraction_legacy_sec, 3),
            "imbalance_sec": round(imbalance_sec, 3),
            "imbalance_legacy_sec": (
                round(imbalance_legacy_sec, 3)
                if imbalance_legacy_sec is not None
                else None
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    from bench import _run_context, contended_verdict

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sfdata_sf100_flat")
    ap.add_argument("--n-ids", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()
    ctx_before = _run_context()

    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("tombstone_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scales = [_probe_scale(spark, d, a.n_ids, a.runs)
              for d in (a.small, a.big) if os.path.isdir(d)]
    ctx_after = _run_context()
    out = {
        "metric": "ann_tombstone_delete_cost",
        "scales": scales,
        "run_context": {"before": ctx_before, "after": ctx_after},
        "contended": contended_verdict(ctx_before, ctx_after),
    }
    if len(scales) == 2 and scales[0]["delete_sec"] > 0:
        out["delete_ratio"] = round(
            scales[1]["delete_sec"] / scales[0]["delete_sec"], 2
        )
        out["build_ratio"] = round(
            scales[1]["build_sec"] / scales[0]["build_sec"], 2
        )
        # membership + nonzero denominator, not truthiness: a
        # sub-millisecond poll rounds to 0.0 exactly when the fast
        # path is at its best (code-review r14 #7)
        if "fraction_sec" in scales[0] and scales[0]["fraction_sec"] > 0:
            out["fraction_ratio"] = round(
                scales[1]["fraction_sec"] / scales[0]["fraction_sec"], 2
            )
        if (
            "fraction_legacy_sec" in scales[0]
            and scales[0]["fraction_legacy_sec"] > 0
        ):
            out["fraction_legacy_ratio"] = round(
                scales[1]["fraction_legacy_sec"]
                / scales[0]["fraction_legacy_sec"],
                2,
            )
        for key in ("imbalance_sec", "imbalance_legacy_sec"):
            small, big = scales[0].get(key), scales[1].get(key)
            if small and big is not None:
                out[key.replace("_sec", "_ratio")] = round(big / small, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
