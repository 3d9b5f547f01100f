"""Interleaved A/B for the r14 ivfpq inline-build persist variants.

Variants of the emb_ivfpq_topk composition (identical results,
asserted before timing):

  A  current _ivfpq_parts: persist(assign) + persist(cb)
  B  A + persist(cents)   — the L*d coarse-centroid dim is referenced
     by dists, the corpus residual stream, the query probe and the
     query residual stream; every broadcast re-runs the corpus-scale
     aggregation when unpersisted
  C  B + persist(res) instead of persist(cb) — the corpus*d residual
     long form feeds both the codebook aggregate and the encoder

Usage: python tools/r14_ab_ivfpq.py [reps]
Prints per-variant noop-sink seconds, interleaved A B C A B C ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir, variant: str):
    from sfdata_wrangler_spark.operators._cache import tracked_persist
    from sfdata_wrangler_spark.operators.pq import (
        _codebooks_from_residuals,
        _coarse_assign,
        _residual_lf,
        ivf_coarse_centroids,
        ivf_coarse_distances,
        ivfpq_topk,
        _encode_from_residuals,
    )
    from sfdata_wrangler_spark.plans.catalog35 import (
        _K,
        _M,
        _N_CODES,
        _N_PROBE,
        _SHORTLIST,
        _SUB_DIM,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
    if variant in ("B", "C"):
        cents = tracked_persist(cents)
    dists = ivf_coarse_distances(emb, cents, _M, _SUB_DIM)
    assign = tracked_persist(_coarse_assign(dists, "vec_id"))
    res = _residual_lf(emb, cents, assign, _M, _SUB_DIM, "vec_id", "embedding")
    if variant == "C":
        res = tracked_persist(res)
        cb = _codebooks_from_residuals(res, _N_CODES, "vec_id")
    else:
        cb = tracked_persist(_codebooks_from_residuals(res, _N_CODES, "vec_id"))
    enc = _encode_from_residuals(res, cb, "vec_id")

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(
        queries, enc, cents, cb, emb,
        k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST, m=_M, sub_dim=_SUB_DIM,
    )
    return out.select(
        F.col("query_id").cast("bigint"),
        F.col("vec_id").cast("bigint"),
        F.col("adc_d2").cast("bigint"),
        F.col("exact_d2").cast("bigint"),
        F.col("rank").cast("int"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sfdata_wrangler_spark.operators._cache import (
        release_operator_caches,
    )
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r14-ab-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # JVM warm

    # outputs identical across variants?
    rows = {}
    for v in ("A", "B", "C"):
        rows[v] = sorted(map(tuple, build(spark, sf_dir, v).collect()))
        release_operator_caches()
        spark.catalog.clearCache()
    assert rows["A"] == rows["B"] == rows["C"], "variant outputs differ!"
    print(f"# outputs identical across variants ({len(rows['A'])} rows)")

    times: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    for r in range(reps):
        for v in ("A", "B", "C"):
            spark.sparkContext.setJobDescription(f"ab-ivfpq {v} rep{r}")
            df = build(spark, sf_dir, v)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            times[v].append(time.monotonic() - t0)
            release_operator_caches()
            spark.catalog.clearCache()
    for v, ts in times.items():
        print(v, " ".join(f"{t:.3f}" for t in ts), f"best={min(ts):.3f}")


if __name__ == "__main__":
    main()
