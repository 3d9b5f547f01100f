"""Differential tests for distributed BPE training: the Spark
word-type-table algorithm must reproduce a straightforward sequential
reference implementation exactly (same total order on ties)."""

from collections import Counter

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.bpe import (
    bpe_tokenize,
    bpe_train,
    word_type_counts,
)


def ref_bpe(word_counts: dict, num_merges: int, min_pair_count: int = 2):
    """Sequential textbook BPE (Sennrich et al.) with the operator's
    deterministic tie-break: count DESC, left ASC, right ASC."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += word_counts[w]
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def _train_both(spark, rows, k):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    wc = {
        r["word"]: r["n"] for r in word_type_counts(docs).collect()
    }
    exp_merges, exp_words = ref_bpe(wc, k)
    got_merges, seg = bpe_train(docs, num_merges=k)
    got_words = {r["word"]: list(r["tokens"]) for r in seg.collect()}
    return exp_merges, exp_words, got_merges, got_words


def test_toy_corpus_matches_reference(spark):
    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "widest wider wide low"),
    ]
    exp_merges, exp_words, got_merges, got_words = _train_both(spark, rows, 8)
    assert got_merges == exp_merges
    assert got_words == exp_words


def test_real_documents_match_reference(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
    )
    wc = {r["word"]: r["n"] for r in word_type_counts(docs).collect()}
    exp_merges, exp_words = ref_bpe(wc, 12)
    got_merges, seg = bpe_train(docs, num_merges=12)
    got_words = {r["word"]: list(r["tokens"]) for r in seg.collect()}
    assert got_merges == exp_merges
    assert got_words == exp_words


def test_overlapping_pairs_merge_greedily(spark):
    # "aaaa" with merge (a,a): greedy non-overlap -> [aa, aa];
    # "aaa" -> [aa, a]
    rows = [(1, "aaaa aaaa aaa")]
    _, _, got_merges, got_words = _train_both(spark, rows, 1)
    assert got_merges[0][:2] == ("a", "a")
    assert got_words["aaaa"] == ["aa", "aa"]
    assert got_words["aaa"] == ["aa", "a"]


def test_tokenization_reconstructs_words(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark shuffle"), (2, "shuffle spark")],
        ["doc_id", "text"],
    )
    _, seg = bpe_train(docs, num_merges=5)
    toks = bpe_tokenize(docs, seg)
    rebuilt = (
        toks.groupBy("doc_id", "wpos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "token"))),
                    lambda x: x["token"],
                ),
                "",
            ).alias("word")
        )
        .collect()
    )
    assert all(r["word"] in ("spark", "shuffle") for r in rebuilt)
    # token stream length per doc is consistent with segmentation
    seg_map = {r["word"]: list(r["tokens"]) for r in seg.collect()}
    assert toks.where(F.col("doc_id") == 1).count() == 2 * len(
        seg_map["spark"]
    ) + len(seg_map["shuffle"])
