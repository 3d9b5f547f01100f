"""r14 optimization: bigram_lm_score's pretokenized path must be
bit-identical to the raw-text path — pipe_curation_v3's checkpoint
now stores the split token array and scores through it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.text import (
    normalize_text,
    token_count,
    token_count_from_tokens,
)
from sfdata_wrangler_spark.operators.lm import bigram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat  SAT on\tthe mat"),  # messy whitespace + case
        (3, "one"),  # single token: zero bigrams
        (4, ""),  # empty text: normalizes to ['']
        (5, "the dog sat on the log and the dog barked"),
        (6, "   "),  # whitespace-only: also normalizes to ['']
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_toks(df):
    return df.select(
        "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("toks"),
    )


def test_pretokenized_scores_identical(docs):
    plain = bigram_lm_score(docs).orderBy("doc_id").collect()
    pre = (
        bigram_lm_score(
            _with_toks(docs), text_col="toks", pretokenized=True
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in pre]
    # vocabulary really was shared (same smoothing denominator):
    # a nonzero doc must score nonzero through both paths
    assert plain[0]["mean_p_micro"] > 0


def test_token_count_from_tokens_matches(docs):
    both = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("a"),
        token_count_from_tokens(
            F.split(normalize_text(F.col("text")), " ")
        ).alias("b"),
    ).collect()
    for r in both:
        assert r["a"] == r["b"], r
    # the empty/whitespace docs count 0, not 1 (the [''] trap)
    zero = {r["doc_id"]: r["a"] for r in both}
    assert zero[4] == 0 and zero[6] == 0
