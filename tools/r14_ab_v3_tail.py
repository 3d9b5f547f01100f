"""A/B: narrow the pipe_curation_v3 tail before its joins/shuffles.

Current tail carries the checkpointed token ARRAY through the
LM-filter join, the lang join, the sampling broadcast-join and into
the packer, where only token COUNT is ever used. Variant B projects
(doc_id, n_tokens) right after the checkpoint (guide §2.3 "project
before the exchange"), so every tail exchange moves two ints + lang
instead of the array payload.

Asserts identical output, then interleaved best-of-N (noop sink).
Usage: python tools/r14_ab_v3_tail.py [runs]
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

    from sfdata_wrangler_spark.functions.text import (
        normalize_text,
        token_count_from_tokens,
    )
    from sfdata_wrangler_spark.operators.checkpointing import cut_lineage
    from sfdata_wrangler_spark.operators.linedup import (
        drop_boilerplate_lines,
        tokens_to_lines,
    )
    from sfdata_wrangler_spark.operators.lm import bigram_lm_score
    from sfdata_wrangler_spark.operators.packing import pack_context_windows
    from sfdata_wrangler_spark.operators.sampling import temperature_sample
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.plans.catalog16 import _BUDGET, _LINE_W, _LM_T, _MIX_C
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r14-ab-v3-tail")
    spark.sparkContext.setLogLevel("ERROR")

    def v3_a():
        return QUERIES["pipe_curation_v3"]["fn"](spark, sf_dir)

    def v3_b():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ml = docs.select(
            "doc_id", tokens_to_lines(F.col("text"), _LINE_W).alias("text")
        )
        cleaned = cut_lineage(
            drop_boilerplate_lines(ml, min_docs=2)
            .where(F.col("n_kept") > 0)
            .select(
                "doc_id",
                F.split(normalize_text(F.col("text")), " ").alias("toks"),
            )
        )
        scores = bigram_lm_score(cleaned, text_col="toks", pretokenized=True)
        # narrow BEFORE the tail joins: only the count survives
        counts = cleaned.select(
            "doc_id", token_count_from_tokens(F.col("toks")).alias("n_tokens")
        )
        kept = counts.join(
            scores.where(F.col("mean_p_micro") >= _LM_T).select("doc_id"),
            "doc_id",
        )
        langd = kept.join(docs.select("doc_id", "lang"), "doc_id")
        sampled = temperature_sample(langd, "lang", _MIX_C)
        t = sampled.select(
            F.col("doc_id").cast("bigint").alias("doc_id"), "n_tokens"
        )
        packed = pack_context_windows(t, budget=_BUDGET, bucket_width=64)
        return packed.groupBy("window_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )

    a_rows = sorted(map(tuple, v3_a().collect()))
    spark.catalog.clearCache()
    b_rows = sorted(map(tuple, v3_b().collect()))
    spark.catalog.clearCache()
    assert a_rows == b_rows, f"outputs differ: {a_rows[:3]} vs {b_rows[:3]}"
    print(f"outputs identical: {len(a_rows)} rows", flush=True)

    times: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(runs):
        for name, fn in (("A", v3_a), ("B", v3_b)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    print({k: sorted(v) for k, v in times.items()}, flush=True)


if __name__ == "__main__":
    main()
