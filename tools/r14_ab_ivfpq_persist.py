"""A/B: which intermediate to persist in the inline IVF-PQ build.

Variant A (current): ivfpq_index materialize=True — persist the
id-grain coarse `assign` + the codebook `cb`; the residual long form
(corpus explode ×d + assign join + centroid join) still evaluates
twice (codebook branch, encode branch).

Variant B: persist the residual long form `res` (corpus×d rows)
instead — assign needs no separate persist (it is inside res's
lineage, evaluated once while filling the cache); cb stays persisted
(codebook-sized, referenced by both the encode and the serve LUT).

Runs the full emb_ivfpq_topk-equivalent search on top of each build,
interleaved best-of-N with clearCache between runs, asserts identical
output first. Usage: python tools/r14_ab_ivfpq_persist.py [runs]
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
        _residual_lf,
        ivf_coarse_centroids,
        ivf_coarse_distances,
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

    spark = get_spark("r14-ab-ivfpq-persist")
    spark.sparkContext.setLogLevel("ERROR")

    def parts_a():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
        cb, enc = ivfpq_index(emb, cents, n_codes=_N_CODES, m=_M, sub_dim=_SUB_DIM)
        return emb, cents, cb, enc

    def parts_b():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
        dists = ivf_coarse_distances(emb, cents, _M, _SUB_DIM)
        assign = _coarse_assign(dists, "vec_id")
        res = tracked_persist(
            _residual_lf(emb, cents, assign, _M, _SUB_DIM, "vec_id", "embedding")
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

    # outputs identical?
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
