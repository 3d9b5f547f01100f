"""Tests for the wave-12 corpus-maintenance operators: bigram LM
scoring, line-level boilerplate removal, incremental LSH dedup."""

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.dedup import (
    incremental_dedup,
    minhash_band_index,
    minhash_lsh_pairs,
)
from sfdata_wrangler_spark.operators.linedup import drop_boilerplate_lines
from sfdata_wrangler_spark.operators.lm import bigram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBigramLM:
    def test_hand_computed_self_train(self, spark):
        # corpus: "a b c" -> bigrams (a,b), (b,c); vocab {a,b,c} V=3
        # p(b|a) = (1+1)/(1+3) = 0.5 -> 500000
        # p(c|b) = (1+1)/(1+3) = 0.5 -> 500000
        out = {
            r["doc_id"]: r.asDict()
            for r in bigram_lm_score(_docs(spark, [(1, "a b c")])).collect()
        }
        assert out[1]["n_bigrams"] == 2
        assert out[1]["sum_p_micro"] == 1_000_000
        assert out[1]["mean_p_micro"] == 500_000

    def test_short_docs_score_zero(self, spark):
        out = {
            r["doc_id"]: r.asDict()
            for r in bigram_lm_score(
                _docs(spark, [(1, "solo"), (2, "a a")])
            ).collect()
        }
        assert out[1]["n_bigrams"] == 0
        assert out[1]["mean_p_micro"] == 0
        assert out[2]["n_bigrams"] == 1

    def test_separate_train_corpus(self, spark):
        # train: "x y" repeated -> c2(x,y)=2, c1(x)=2, V=2
        # score "x y": p = (2+1)/(2+2) = 0.75; unseen "y x":
        # p = (0+1)/(0+2) = 0.5  (c1(y)=0 since y never a context)
        train = _docs(spark, [(10, "x y"), (11, "x y")])
        docs = _docs(spark, [(1, "x y"), (2, "y x")])
        out = {
            r["doc_id"]: r.asDict()
            for r in bigram_lm_score(docs, train=train).collect()
        }
        assert out[1]["mean_p_micro"] == 750_000
        assert out[2]["mean_p_micro"] == 500_000

    def test_in_domain_scores_higher(self, spark):
        # predictable text scores above shuffled noise under its own LM
        rows = [(i, "the cat sat on the mat") for i in range(20)]
        rows.append((99, "mat the on cat the sat"))
        out = {
            r["doc_id"]: r["mean_p_micro"]
            for r in bigram_lm_score(_docs(spark, rows)).collect()
        }
        assert out[0] > out[99]


class TestLineDedup:
    ROWS = [
        (1, "COOKIE BANNER\nreal content one\nFOOTER"),
        (2, "COOKIE BANNER\nreal content two\nFOOTER"),
        (3, "unique doc\nall original lines"),
    ]

    def test_boilerplate_dropped_order_kept(self, spark):
        out = {
            r["doc_id"]: r.asDict()
            for r in drop_boilerplate_lines(
                _docs(spark, self.ROWS), min_docs=2
            ).collect()
        }
        assert out[1]["text"] == "real content one"
        assert out[2]["text"] == "real content two"
        assert out[3]["text"] == "unique doc\nall original lines"
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
        assert out[3]["n_lines"] == 2 and out[3]["n_kept"] == 2

    def test_fully_boilerplate_doc_survives_empty(self, spark):
        rows = [(1, "SAME\nSAME2"), (2, "SAME\nSAME2"), (3, "keep me")]
        out = {
            r["doc_id"]: r.asDict()
            for r in drop_boilerplate_lines(
                _docs(spark, rows), min_docs=2
            ).collect()
        }
        assert out[1]["text"] == "" and out[1]["n_kept"] == 0
        assert out[3]["text"] == "keep me"

    def test_reassembly_preserves_position_not_lexicographic(self, spark):
        rows = [(1, "zebra line\napple line\nmiddle line")]
        out = drop_boilerplate_lines(_docs(spark, rows), min_docs=2).collect()
        assert out[0]["text"] == "zebra line\napple line\nmiddle line"


class TestIncrementalDedup:
    CORPUS = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "spark shuffles wide joins across the cluster every night"),
        (3, "training data pipelines deduplicate documents at corpus scale"),
    ]
    BATCH = [
        # exact clone of doc 1 -> every band collides
        (101, "the quick brown fox jumps over the lazy dog again and again"),
        # genuinely novel
        (102, "completely unrelated sentence about volcanoes and glaciers erupting"),
    ]

    def test_clone_hits_novel_passes(self, spark):
        index = minhash_band_index(_docs(spark, self.CORPUS))
        out = {
            r["doc_id"]: r.asDict()
            for r in incremental_dedup(index, _docs(spark, self.BATCH)).collect()
        }
        assert out[101]["is_new"] is False
        assert out[101]["first_hit_id"] == 1
        assert out[101]["n_index_hits"] >= 1
        assert out[102]["is_new"] is True
        assert out[102]["first_hit_id"] is None

    def test_batch_join_equals_full_corpus_pairs(self, spark):
        # ground truth: pairs from whole-corpus LSH restricted to
        # (corpus, batch) cross pairs == batch hits from the index join
        corpus, batch = _docs(spark, self.CORPUS), _docs(spark, self.BATCH)
        full = corpus.unionByName(batch)
        pairs = minhash_lsh_pairs(full).where(
            (F.col("id_a") <= 3) & (F.col("id_b") >= 101)
        )
        expected_hit_ids = {r["id_b"] for r in pairs.collect()}
        out = incremental_dedup(minhash_band_index(corpus), batch)
        got_hit_ids = {
            r["doc_id"] for r in out.where(~F.col("is_new")).collect()
        }
        assert got_hit_ids == expected_hit_ids

    def test_refactored_lsh_pairs_unchanged(self, spark):
        # minhash_lsh_pairs now routes through minhash_band_index;
        # the md5 twin must still agree with the wave-8 oracle shape
        docs = _docs(spark, self.CORPUS + self.BATCH)
        pairs = minhash_lsh_pairs(docs, hash_fn="md5").collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} >= {(1, 101)}
