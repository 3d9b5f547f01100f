"""Stage-level decomposition timings for the r14 heavy bench queries.

    python tools/r14_decomp.py v3|ivfpq|v2|spans|minhash [sf_dir]

Times each cumulative stage of the named pipeline with the noop sink
(guide section 1.4), best-of-2, clearCache between runs, so the
per-stage increments show where the wall time actually goes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _time(spark, label, df, runs=2):
    best = None
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"decomp: {label}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {best:7.3f}s")
    return best


def v3(spark, sf_dir):
    from sfdata_wrangler_spark.functions.text import token_count
    from sfdata_wrangler_spark.operators.checkpointing import cut_lineage
    from sfdata_wrangler_spark.operators.linedup import (
        drop_boilerplate_lines,
        tokens_to_lines,
    )
    from sfdata_wrangler_spark.operators.lm import bigram_lm_score
    from sfdata_wrangler_spark.operators.packing import pack_context_windows
    from sfdata_wrangler_spark.operators.sampling import temperature_sample
    from sfdata_wrangler_spark.plans.catalog16 import (
        _BUDGET,
        _LINE_W,
        _LM_T,
        _MIX_C,
    )
    from sfdata_wrangler_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    ml = docs.select(
        "doc_id", tokens_to_lines(F.col("text"), _LINE_W).alias("text")
    )
    _time(spark, "v3: ml projection", ml)
    cleaned_raw = (
        drop_boilerplate_lines(ml, min_docs=2)
        .where(F.col("n_kept") > 0)
        .select("doc_id", "text")
    )
    _time(spark, "v3: cleaned (no checkpoint)", cleaned_raw)

    def rest(cleaned):
        scores = bigram_lm_score(cleaned)
        lmkept = cleaned.join(
            scores.where(F.col("mean_p_micro") >= _LM_T).select("doc_id"),
            "doc_id",
        )
        langd = lmkept.join(docs.select("doc_id", "lang"), "doc_id")
        sampled = temperature_sample(langd, "lang", _MIX_C)
        t = sampled.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        packed = pack_context_windows(t, budget=_BUDGET, bucket_width=64)
        return packed.groupBy("window_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )

    # full pipeline, checkpoint as shipped (fresh checkpoint per run)
    for run in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        rest(cut_lineage(cleaned_raw)).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"v3: FULL (fresh cut_lineage) run{run}      {time.time()-t0:7.3f}s")
    # scores stage alone over a prebuilt checkpoint
    ck = cut_lineage(cleaned_raw)
    ck.write.format("noop").mode("overwrite").save()  # materialize once
    _time(spark, "v3: bigram_lm_score (ck warm)", bigram_lm_score(ck))
    _time(spark, "v3: rest-of-pipeline (ck warm)", rest(ck))


def ivfpq(spark, sf_dir):
    from sfdata_wrangler_spark.operators.pq import (
        _coarse_assign,
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
    from sfdata_wrangler_spark.plans.catalog import _t

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
    _time(spark, "ivfpq: cents", cents)
    dists = ivf_coarse_distances(emb, cents, _M, _SUB_DIM)
    _time(spark, "ivfpq: coarse dists", dists)
    assign = _coarse_assign(dists, "vec_id")
    _time(spark, "ivfpq: assign", assign)

    def full():
        cents2 = ivf_coarse_centroids(emb, m=_M, sub_dim=_SUB_DIM)
        cb, enc = ivfpq_index(
            emb, cents2, n_codes=_N_CODES, m=_M, sub_dim=_SUB_DIM
        )
        return cents2, cb, enc

    for run in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        _, cb, enc = full()
        enc.write.format("noop").mode("overwrite").save()
        print(f"ivfpq: enc (index build) run{run}          {time.time()-t0:7.3f}s")
    for run in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        cents2, cb, enc = full()
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = ivfpq_topk(
            queries, enc, cents2, cb, emb,
            k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
            m=_M, sub_dim=_SUB_DIM,
        )
        out.write.format("noop").mode("overwrite").save()
        print(f"ivfpq: FULL topk run{run}                  {time.time()-t0:7.3f}s")


def v2(spark, sf_dir):
    from sfdata_wrangler_spark.operators.repetition import (
        domain_cap,
        repetition_stats,
    )
    from sfdata_wrangler_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    _time(spark, "v2: repetition_stats", repetition_stats(docs))
    keep_ids = (
        repetition_stats(docs)
        .where(F.col("keep") == 1)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"))
    )
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "text"
    )
    kept = base.join(keep_ids, "doc_id")
    _time(spark, "v2: kept join", kept)
    capped = domain_cap(kept, max_per_domain=12)
    _time(spark, "v2: domain_cap", capped)
    from sfdata_wrangler_spark.plans import QUERIES

    _time(
        spark,
        "v2: FULL",
        QUERIES["pipe_curation_v2"]["fn"](spark, sf_dir),
    )


def spans(spark, sf_dir):
    from sfdata_wrangler_spark.operators.spandedup import (
        duplicate_spans,
        positional_kgrams,
    )
    from sfdata_wrangler_spark.plans.catalog import _t
    from sfdata_wrangler_spark.plans.catalog19 import _SPAN_K

    docs = _t(spark, sf_dir, "documents")
    _time(spark, "spans: positional_kgrams", positional_kgrams(docs, _SPAN_K))
    _time(
        spark,
        "spans: FULL (materialize=True)",
        duplicate_spans(docs, k=_SPAN_K, min_docs=2),
    )
    _time(
        spark,
        "spans: FULL (materialize=False)",
        duplicate_spans(docs, k=_SPAN_K, min_docs=2, materialize=False),
    )


def minhash(spark, sf_dir):
    from sfdata_wrangler_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from sfdata_wrangler_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    _time(
        spark,
        "minhash: signatures md5w",
        minhash_signatures(docs, num_hashes=16, shingle_n=3, hash_fn="md5w"),
    )
    _time(
        spark,
        "minhash: signatures xxhash64",
        minhash_signatures(docs, num_hashes=16, shingle_n=3),
    )
    _time(
        spark,
        "minhash: FULL pairs md5w",
        minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, shingle_n=3, hash_fn="md5w"
        ),
    )


def main():
    which = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r14-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    globals()[which](spark, sf_dir)


if __name__ == "__main__":
    main()
