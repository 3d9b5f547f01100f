"""A/B: additionally persist the micro-unit long form `lf` in the
IVF-PQ build, so the corpus explode runs ONCE (res-persist alone
still explodes twice: coarse-distance pass + residual fill).

A = current ivfpq_index (persist res + cb).
B = persist lf as well; dists and res both read the lf cache.

Usage: python tools/r14_ab_ivfpq_lf.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sfdata_wrangler_spark.operators._cache import tracked_persist
    from sfdata_wrangler_spark.operators.pq import (
        _codebooks_from_residuals,
        _coarse_assign,
        _encode_from_residuals,
        _long_form,
        ivf_coarse_centroids,
        ivfpq_index,
        ivfpq_topk,
    )
    from sfdata_wrangler_spark.plans.catalog35 import (
        _K,
        _M,
        _N_CODES,
        _N_PROBE,
        _SHORTLIST,
        _SUB_DIM,
    )
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r14-ab-ivfpq-lf")
    spark.sparkContext.setLogLevel("ERROR")

    def parts_a():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
        cb, enc = ivfpq_index(emb, cents, n_codes=_N_CODES, m=_M, sub_dim=_SUB_DIM)
        return emb, cents, cb, enc

    def parts_b():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
        lf = tracked_persist(
            _long_form(emb.select("vec_id", "embedding"), "vec_id",
                       "embedding", _M, _SUB_DIM)
        )
        dists = (
            lf.join(F.broadcast(cents), ["subspace", "dim"])
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("x_micro") - F.col("c_micro"))
                    * (F.col("x_micro") - F.col("c_micro"))
                ).alias("d2")
            )
        )
        assign = _coarse_assign(dists, "vec_id")
        res = tracked_persist(
            lf.join(assign, "vec_id")
            .join(F.broadcast(cents), ["cid", "subspace", "dim"])
            .select(
                "vec_id", "cid", "subspace", "dim",
                (F.col("x_micro") - F.col("c_micro")).alias("r_micro"),
            )
        )
        cb = tracked_persist(_codebooks_from_residuals(res, _N_CODES, "vec_id"))
        enc = _encode_from_residuals(res, cb, "vec_id")
        return emb, cents, cb, enc

    def query(parts):
        emb, cents, cb, enc = parts()
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_topk(
            queries, enc, cents, cb, emb,
            k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
            m=_M, sub_dim=_SUB_DIM,
        )

    a_rows = sorted(map(tuple, query(parts_a).collect()))
    spark.catalog.clearCache()
    b_rows = sorted(map(tuple, query(parts_b).collect()))
    spark.catalog.clearCache()
    assert a_rows == b_rows, "variant outputs differ"
    print(f"outputs identical: {len(a_rows)} rows", flush=True)

    times: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(runs):
        for name, p in (("A", parts_a), ("B", parts_b)):
            spark.catalog.clearCache()
            t0 = time.time()
            query(p).count()
            times[name].append(round(time.time() - t0, 3))
    print({k: sorted(v) for k, v in times.items()}, flush=True)


if __name__ == "__main__":
    main()
