"""Property-based differentials (hypothesis) for the wave-12+
operators: line dedup and the bigram LM must equal naive sequential
reference implementations on arbitrary inputs."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sfdata_wrangler_spark.operators.linedup import drop_boilerplate_lines
from sfdata_wrangler_spark.operators.lm import bigram_lm_score

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabets force collisions (shared lines / repeated bigrams)
line_strategy = st.lists(
    st.sampled_from(["alpha beta", "gamma", "delta eps", "zeta"]),
    min_size=1,
    max_size=5,
)
docs_strategy = st.lists(line_strategy, min_size=1, max_size=12)

tok_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10
)
corpus_strategy = st.lists(tok_strategy, min_size=1, max_size=10)


def _naive_linedup(texts, min_docs):
    freq = Counter()
    for t in texts:
        for line in set(t.split("\n")):
            freq[line] += 1
    out = {}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if freq[ln] < min_docs]
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


@settings(**_SETTINGS)
@given(docs_strategy, st.integers(min_value=2, max_value=4))
def test_linedup_matches_naive(spark, docs, min_docs):
    texts = ["\n".join(lines) for lines in docs]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in drop_boilerplate_lines(df, min_docs=min_docs).collect()
    }
    assert got == _naive_linedup(texts, min_docs)


def _naive_lm(token_lists):
    c2, c1, vocab = Counter(), Counter(), set()
    for toks in token_lists:
        vocab.update(toks if toks else [""])
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    out = {}
    for i, toks in enumerate(token_lists):
        micros = [
            int((c2[(a, b)] + 1.0) / (c1[a] + float(v)) * 1e6 + 0.5)
            for a, b in zip(toks, toks[1:])
        ]
        n = len(micros)
        out[i] = (n, sum(micros), sum(micros) // n if n else 0)
    return out


@settings(**_SETTINGS)
@given(corpus_strategy)
def test_bigram_lm_matches_naive(spark, corpus):
    texts = [" ".join(toks) for toks in corpus]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p_micro"], r["mean_p_micro"])
        for r in bigram_lm_score(df).collect()
    }
    assert got == _naive_lm(
        [t.split(" ") if t else [""] for t in texts]
    )
