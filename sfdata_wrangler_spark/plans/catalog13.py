"""Catalog wave 13 (round 3): trained-BPE tokenizer queries.

BPE training is inherently iterative (an argmax chain) — not
SQL-expressible, so both queries take the driver's weaker rows-only
check; correctness is pinned by tests/test_bpe.py's exact differential
against a sequential reference implementation (toy corpus + real
sf0.001 documents, including greedy-overlap semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import bpe_tokenize, bpe_train
from .catalog import _register, _t

_N_MERGES = 20


@_register("txt_bpe_merges", None)
def txt_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators/bpe.py): training runs on
    the distinct-word-type table (Zipf-tiny at any corpus scale), one
    small job per merge under a total tie order — fully deterministic.
    """
    merges, _ = bpe_train(
        _t(spark, sf_dir, "documents"), num_merges=_N_MERGES
    )
    return spark.createDataFrame(
        [
            (rank, left, right, cnt)
            for rank, (left, right, cnt) in enumerate(merges)
        ],
        "merge_rank bigint, left string, right string, weighted_count bigint",
    )


@_register("txt_bpe_vocab", None, bench=True)
def txt_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies under the trained BPE segmentation:
    tokenization is ONE equi-join of corpus words against the
    (broadcast) word→tokens table — merges never re-run at corpus
    scale — then a map-side-combinable count. Top-30 under a total
    order."""
    docs = _t(spark, sf_dir, "documents")
    _, seg = bpe_train(docs, num_merges=_N_MERGES)
    return (
        bpe_tokenize(docs, seg)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(30)
    )
