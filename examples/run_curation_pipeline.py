"""End-to-end corpus-curation walkthrough (executable documentation).

The training-data side of the engine on the synthetic ``documents`` /
``embeddings`` tables:

    python examples/run_curation_pipeline.py [sf_dir]

1. profile the raw corpus (one-pass sketch stats)
2. quality gates: repetition stats + bigram-LM score
3. dedup: exact groups, MinHash-LSH near-dups, line-level boilerplate
4. incremental ingest: dedup a "new batch" against the corpus's
   persisted LSH band index
5. train a BPE tokenizer on word types; tokenize by segmentation join
6. rebalance the language mixture; assign train/val/test splits
7. pack survivors into fixed-token context windows and write
   deterministic shards
8. chunk survivors into overlapping retrieval windows; sketch the
   chunk-length distribution (mergeable log-histogram percentiles)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.text import token_count
from sfdata_wrangler_spark.operators.bpe import bpe_tokenize, bpe_train
from sfdata_wrangler_spark.operators.dedup import (
    exact_dup_groups,
    incremental_dedup,
    minhash_band_index,
    minhash_lsh_pairs,
)
from sfdata_wrangler_spark.operators.linedup import (
    drop_boilerplate_lines,
    tokens_to_lines,
)
from sfdata_wrangler_spark.operators.lm import bigram_lm_score
from sfdata_wrangler_spark.operators.packing import pack_context_windows
from sfdata_wrangler_spark.operators.profile import profile_table
from sfdata_wrangler_spark.operators.repetition import repetition_stats
from sfdata_wrangler_spark.operators.sampling import temperature_sample
from sfdata_wrangler_spark.operators.splits import assign_split
from sfdata_wrangler_spark.session import get_spark
from sfdata_wrangler_spark.sources.shards import write_shards


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    print("== 1. profile ==")
    profile_table(docs, ["doc_id", "text", "lang", "n_chars"]).show(30)

    print("== 2. quality gates ==")
    rep = repetition_stats(docs)
    lm = bigram_lm_score(docs)
    gated = (
        docs.join(rep.where(F.col("keep") == 1).select("doc_id"), "doc_id")
        .join(lm.where(F.col("mean_p_micro") > 0).select("doc_id"), "doc_id")
    )
    print(f"quality survivors: {gated.count()} / {docs.count()}")

    print("== 3. dedup ==")
    print("exact dup groups:", exact_dup_groups(docs).count())
    print("LSH near-dup pairs:", minhash_lsh_pairs(docs).count())
    ml = docs.select("doc_id", tokens_to_lines(F.col("text"), 6).alias("text"))
    cleaned = drop_boilerplate_lines(ml, min_docs=2)
    print(
        "docs emptied by line-dedup:",
        cleaned.where(F.col("n_kept") == 0).count(),
    )

    print("== 4. incremental ingest ==")
    is_new = F.col("source") == "src0"
    index = minhash_band_index(docs.where(~is_new))
    flags = incremental_dedup(index, docs.where(is_new))
    flags.groupBy("is_new").count().show()

    print("== 5. BPE tokenizer ==")
    merges, seg = bpe_train(gated, num_merges=10)
    print("top merges:", [(a, b) for a, b, _ in merges[:5]])
    toks = bpe_tokenize(gated, seg)
    print("corpus BPE tokens:", toks.count())

    print("== 6. mixture + splits ==")
    mixed = temperature_sample(gated, "lang", 6.0)
    mixed.groupBy("lang").count().orderBy("lang").show()
    split = assign_split(mixed)
    split.groupBy("split").count().show()

    print("== 7. pack + shard ==")
    packed = pack_context_windows(
        split.select(
            "doc_id", token_count(F.col("text")).alias("n_tokens")
        ),
        budget=256,
        bucket_width=64,
    )
    print("context windows:", packed.select("window_id").distinct().count())
    with tempfile.TemporaryDirectory() as tmp:
        write_shards(
            split.select("doc_id", "text"), os.path.join(tmp, "shards"),
            n_shards=4,
        )
        back = spark.read.parquet(os.path.join(tmp, "shards"))
        print("shard sizes:")
        back.groupBy("shard").count().orderBy("shard").show()

    print("== 8. retrieval chunks + length sketch ==")
    from sfdata_wrangler_spark.operators.chunking import chunk_token_windows
    from sfdata_wrangler_spark.operators.qsketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    chunks = chunk_token_windows(split, width=64, stride=48)
    print("retrieval chunks:", chunks.count())
    sk = qsketch_build(
        chunks.withColumn("g", F.lit("all")),
        ["g"],
        "n_chunk_tokens",
        scale=1,
    )
    qsketch_quantiles(sk, ["g"], [0.5, 0.95]).show()


if __name__ == "__main__":
    main()
