"""Document chunking (operators/chunking.py): hand-computed window
grids, coverage (every token appears in some window), the no-tail-
fragment convention, and the shuffle-free plan."""

import pytest

from sfdata_wrangler_spark.operators.chunking import chunk_token_windows


def _doc(spark, n_tokens):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def test_hand_computed_grid(spark):
    # n=100, width=64, stride=48: starts 0 and 48; second window short
    out = sorted(
        (r.chunk_idx, r.chunk_start, r.n_chunk_tokens)
        for r in chunk_token_windows(_doc(spark, 100), 64, 48).collect()
    )
    assert out == [(0, 0, 64), (1, 48, 52)]


def test_exact_multiple_no_tail_fragment(spark):
    # n=112 = 64 + 48: the second window ends exactly at the last
    # token; a third start at 96 would only re-emit covered text
    out = sorted(
        (r.chunk_start, r.n_chunk_tokens)
        for r in chunk_token_windows(_doc(spark, 112), 64, 48).collect()
    )
    assert out == [(0, 64), (48, 64)]


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   ")], "doc_id bigint, text string"
    )
    rows = chunk_token_windows(df, 64, 48).collect()
    assert [(r.doc_id, r.n_chunk_tokens, r.chunk_text) for r in rows] == [
        (1, 3, "a b c")
    ]


def test_full_coverage_and_overlap(spark):
    n, w, s = 157, 16, 12
    rows = chunk_token_windows(_doc(spark, n), w, s).collect()
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert toks == [f"t{i}" for i in range(r.chunk_start, r.chunk_start + len(toks))]
        covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
    assert covered == set(range(n))
    # all windows full-width except possibly the last
    sizes = [r.n_chunk_tokens for r in sorted(rows, key=lambda r: r.chunk_start)]
    assert all(x == w for x in sizes[:-1])


def test_invalid_stride_rejected(spark):
    with pytest.raises(ValueError):
        chunk_token_windows(_doc(spark, 10), width=8, stride=9)


def test_shuffle_free_plan(spark):
    plan = (
        chunk_token_windows(_doc(spark, 100), 64, 48)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
