"""Substring-level span dedup (operators/spandedup.py): planted
shared passage, maximal-run merging, scrub reconstruction, and the
short-document edge."""

from __future__ import annotations

from sfdata_wrangler_spark.operators.spandedup import (
    duplicate_spans,
    positional_kgrams,
    remove_duplicate_spans,
)


def _docs(spark):
    shared = "alpha beta gamma delta epsilon"  # 5 tokens, k=3 → 3 grams
    return spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"five six seven {shared} eight"),
            (3, "nine ten eleven twelve thirteen fourteen"),
            (4, "tiny doc"),  # shorter than k → zero grams
        ],
        "doc_id long, text string",
    )


def test_planted_span_found_and_maximal(spark):
    spans = duplicate_spans(_docs(spark), k=3, min_docs=2)
    rows = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
            for r in spans.collect()}
    # doc 1: shared tokens at positions 2..6; grams at 2,3,4 merge
    # into ONE maximal span [2, 6]
    assert rows[1] == (2, 6, 3)
    # doc 2: shared tokens at positions 3..7
    assert rows[2] == (3, 7, 3)
    assert 3 not in rows and 4 not in rows


def test_scrub_removes_only_covered_tokens(spark):
    out = remove_duplicate_spans(_docs(spark), k=3, min_docs=2)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got[1] == "one two three four"
    assert got[2] == "five six seven eight"
    assert got[3] == "nine ten eleven twelve thirteen fourteen"
    assert got[4] == "tiny doc"
    assert len(got) == 4  # total over the input


def test_fully_duplicated_doc_becomes_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")],
        "doc_id long, text string",
    )
    out = remove_duplicate_spans(docs, k=4, min_docs=2)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got == {1: "", 2: ""}


def test_short_docs_emit_no_grams(spark):
    grams = positional_kgrams(_docs(spark), k=3)
    assert grams.where("doc_id = 4").count() == 0
    # and a doc exactly at k emits exactly one gram
    one = spark.createDataFrame([(9, "x y z")], "doc_id long, text string")
    assert positional_kgrams(one, k=3).count() == 1


def test_partition_invariance(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, duplicate_spans(docs, k=3).collect()))
    b = sorted(map(tuple, duplicate_spans(docs.repartition(5), k=3).collect()))
    assert a == b
