"""Property-based differentials for the wave-23 pair-search
operators: prefix filtering and pigeonhole Hamming blocking are
candidate-PRUNING constructions, so the property that matters is
losslessness — on arbitrary inputs they must return exactly what the
naive all-pairs reference returns."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sfdata_wrangler_spark.operators import (
    prefix_filter_pairs,
    simhash_hamming_pairs,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocab → heavy shingle overlap → many candidate pairs
doc_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=8
)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)

fp_strategy = st.lists(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    min_size=2,
    max_size=30,
    unique=True,
)


def _shingles(toks, n=3):
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
    }


@given(corpus=corpus_strategy)
@settings(**_SETTINGS)
def test_prefix_filter_equals_naive_all_pairs(spark, corpus):
    texts = [" ".join(toks) for toks in corpus]
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b, r.inter, r.union_sz)
        for r in prefix_filter_pairs(df, threshold_pct=50).collect()
    }
    want = set()
    sh = [_shingles(toks) for toks in corpus]
    for a, b in itertools.combinations(range(len(corpus)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter * 100 >= 50 * union:
            want.add((a, b, inter, union))
    assert got == want


@given(fps=fp_strategy, k=st.integers(min_value=0, max_value=4))
@settings(**_SETTINGS)
def test_hamming_pairs_equal_naive_all_pairs(spark, fps, k):
    df = spark.createDataFrame(
        list(enumerate(fps)), ["doc_id", "fp"]
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(
            df, fp_col="fp", id_col="doc_id", bits=16, max_hamming=k
        ).collect()
    }
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in itertools.combinations(range(len(fps)), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= k
    }
    assert got == want
