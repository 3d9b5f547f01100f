"""Sentence segmentation + sentence-aware chunking
(operators/sentences.py) — queued for a round-5 oracle registration;
unit-tested now per the backlog-guard workflow."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.sentences import (
    sentence_chunks,
    split_sentences,
)


def _sents(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(
        split_sentences(F.col("t")).alias("s")
    ).collect()[0].s


def test_basic_segmentation(spark):
    assert _sents(spark, "One two. Three four! Five? Six") == [
        "One two.",
        "Three four!",
        "Five?",
        "Six",
    ]


def test_no_split_without_following_space(spark):
    # decimal points and tight punctuation do not split
    assert _sents(spark, "Pi is 3.14 exactly. Yes.") == [
        "Pi is 3.14 exactly.",
        "Yes.",
    ]


def test_empty_and_whitespace(spark):
    assert _sents(spark, "") == []
    assert _sents(spark, "   ") == []


def test_chunks_hold_whole_consecutive_sentences(spark):
    # 6 sentences x 4 tokens; budget 8 -> chunks of 2 sentences
    text = " ".join(f"w{i} x y z." for i in range(6))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        sentence_chunks(df, budget=8).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.n_sentences, r.n_tokens) for r in rows] == [
        (0, 2, 8),
        (1, 2, 8),
        (2, 2, 8),
    ]
    # chunk text is the sentences in order
    assert rows[0].chunk_text == "w0 x y z. w1 x y z."


def test_budget_exceeded_only_by_boundary_sentence(spark):
    # sentences of 5 tokens, budget 8: chunk 0 gets sentences at
    # prefix 0 and 5 (10 tokens - exceeds by the boundary sentence),
    # chunk 1 starts at prefix 10
    text = "a b c d e. f g h i j. k l m n o."
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        sentence_chunks(df, budget=8).collect(), key=lambda r: r.chunk_idx
    )
    assert [(r.chunk_idx, r.n_sentences, r.n_tokens) for r in rows] == [
        (0, 2, 10),
        (1, 1, 5),
    ]


def test_literal_marker_byte_in_input_is_not_a_boundary(spark):
    """ADVICE r4 + r5: a literal 0x1F in crawl text must not create a
    phantom sentence boundary (the operator uses 0x1F internally) AND
    must survive into the emitted sentence unchanged — the r4 strip
    silently mutated document content."""
    from sfdata_wrangler_spark.operators.sentences import split_sentences

    df = spark.createDataFrame(
        [("one\x1ftwo. three.",)], "t string"
    ).select(split_sentences(F.col("t")).alias("s"))
    assert df.collect()[0]["s"] == ["one\x1ftwo.", "three."]


def test_escape_byte_roundtrips_through_the_split(spark):
    """The escape byte 0x1E itself, and adversarial escape-like
    sequences (0x1E'1', 0x1E'0', 0x1F), must all round-trip — the
    escape scheme may not manufacture or drop bytes."""
    from sfdata_wrangler_spark.operators.sentences import split_sentences

    adversarial = "a\x1eb\x1e1c\x1e0d\x1fe. tail."
    df = spark.createDataFrame([(adversarial,)], "t string").select(
        split_sentences(F.col("t")).alias("s")
    )
    assert df.collect()[0]["s"] == ["a\x1eb\x1e1c\x1e0d\x1fe.", "tail."]


def test_sentence_split_preserves_bytes_property(spark):
    """Property (hypothesis): the escape/split/unescape pipeline may
    consume only boundary whitespace — concatenating the emitted
    sentences and deleting spaces must reproduce the normalized input
    with spaces deleted, for ANY input over an adversarial alphabet
    (marker byte, escape byte, escape-like digit sequences,
    terminators, whitespace runs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sfdata_wrangler_spark.functions.text import normalize_text
    from sfdata_wrangler_spark.operators.sentences import split_sentences

    alphabet = st.sampled_from(
        list("ab.!? \t\n01") + ["\x1e", "\x1f"]
    )
    texts = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def run(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "i int, t string"
        ).select(
            "i",
            normalize_text(F.col("t")).alias("norm"),
            split_sentences(normalize_text(F.col("t"))).alias("s"),
        )
        for r in df.collect():
            joined = "".join(r.s).replace(" ", "")
            assert joined == r.norm.replace(" ", ""), (
                batch[r.i],
                r.norm,
                r.s,
            )

    run()
