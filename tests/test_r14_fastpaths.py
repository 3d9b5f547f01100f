"""Focused equivalence tests for the r14 operator-internal
optimizations: the min_docs=2 min/max fast path in the two
distinct-doc-threshold operators, and the tokenize-once branch of the
bigram LM scorer. Each pins the optimized default bit-equal to the
general/plain path on inputs that exercise the edges (single-doc
lines/grams, repeats within ONE doc — which must NOT count as two
distinct docs — and empty/whitespace docs)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "shared line" appears in docs 1 and 2 (boilerplate);
        # "only here" repeats TWICE WITHIN doc 3 only — a
        # min/max-vs-countDistinct trap (2 occurrences, 1 doc)
        (1, "shared line\nunique a"),
        (2, "shared line\nunique b"),
        (3, "only here\nonly here\nunique c"),
        (4, ""),  # empty doc
        (5, "unique d"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_boilerplate_minmax_fastpath_equals_distinct_count(docs):
    from sfdata_wrangler_spark.operators.linedup import (
        drop_boilerplate_lines,
    )

    fast = sorted(
        map(tuple, drop_boilerplate_lines(docs, min_docs=2).collect())
    )
    # the general path is the >2 branch's code shape; min_docs=2
    # through it is reachable only by forcing — compare against a
    # hand-computed expectation instead: "shared line" (2 docs)
    # drops, the doc-3 repeat (1 doc) stays
    by_id = {r[0]: r for r in fast}
    assert by_id[1][1] == "unique a" and by_id[1][3] == 1
    assert by_id[2][1] == "unique b"
    assert by_id[3][1] == "only here\nonly here\nunique c"
    assert by_id[3][2] == 3 and by_id[3][3] == 3  # nothing dropped
    assert by_id[4][1] == "" and by_id[4][2] == 1  # empty line kept? no:
    # empty text = one empty line occurring only in doc 4 -> kept
    assert by_id[4][3] == 1
    # and the fast path agrees with the explicit general path at
    # min_docs=3 semantics boundary: nothing is >=3-doc boilerplate
    gen3 = sorted(
        map(tuple, drop_boilerplate_lines(docs, min_docs=3).collect())
    )
    assert all(r[2] == r[3] for r in gen3)  # n_lines == n_kept


def test_dup_spans_minmax_fastpath(spark):
    from sfdata_wrangler_spark.operators.spandedup import duplicate_spans

    rows = [
        # 3-gram "a b c" shared across docs 1/2; doc 3 repeats its
        # own gram twice (one doc -> NOT a duplicate span)
        (1, "a b c x"),
        (2, "z a b c"),
        (3, "q w e q w e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = sorted(
        map(tuple, duplicate_spans(docs, k=3, min_docs=2).collect())
    )
    ids = {s[0] for s in spans}
    assert ids == {1, 2}, spans  # doc 3's self-repeat must not flag


def test_lm_materialize_tokens_equals_plain(docs):
    from sfdata_wrangler_spark.operators.lm import bigram_lm_score

    a = sorted(
        map(
            tuple,
            bigram_lm_score(docs, materialize_tokens=False).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            bigram_lm_score(docs, materialize_tokens=True).collect(),
        )
    )
    assert a == b
    docs.sparkSession.catalog.clearCache()
