"""BM25 retrieval and temperature mixture sampling."""

import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.retrieval import bm25_topk
from sfdata_wrangler_spark.operators.sampling import temperature_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # rare term "zebra" appears only in docs 1 and 2
        (1, "zebra cat dog cat", "en"),
        (2, "zebra zebra zebra zebra zebra zebra", "en"),
        (3, "cat dog cat dog cat dog", "en"),
        (4, "dog dog dog dog", "fr"),
        (5, "cat", "fr"),
        (6, "bird", "de"),
        (7, "cat bird dog bird", "en"),
        (8, "", "en"),
        # same length as doc 3 but tf(cat)=1 (isolates tf saturation
        # from BM25 length normalization)
        (9, "cat dog dog dog dog dog", "fr"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


class TestBm25:
    def test_rare_term_outranks_common(self, docs):
        out = bm25_topk(docs, ["zebra", "cat"], k=8).collect()
        ids = [r["doc_id"] for r in out]
        # zebra docs carry far more idf weight than cat-only docs
        assert set(ids[:2]) == {1, 2}
        # every returned doc contains at least one query term
        assert 8 not in ids and 4 not in ids and 6 not in ids

    def test_total_order_and_k(self, docs):
        out = bm25_topk(docs, ["cat"], k=2).collect()
        assert len(out) == 2
        scores = [r["score_micro"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_tf_saturation(self, docs):
        # docs 3 and 9 have equal length; tf(cat) is 3 vs 1. Higher tf
        # must score higher, but sublinearly (k1 saturates tf)
        out = {r["doc_id"]: r["score_micro"] for r in bm25_topk(docs, ["cat"], k=9).collect()}
        assert out[3] > out[9]
        assert out[3] < 3 * out[9]

    def test_partition_invariance(self, docs):
        a = bm25_topk(docs, ["zebra", "cat", "dog"], k=8).collect()
        b = bm25_topk(docs.repartition(7), ["zebra", "cat", "dog"], k=8).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_empty_terms_raise(self, docs):
        with pytest.raises(ValueError):
            bm25_topk(docs, [])


class TestTemperatureSample:
    def test_rates_monotone_in_stratum_size(self, spark):
        rows = [(i, "big" if i < 400 else "small") for i in range(500)]
        df = spark.createDataFrame(rows, ["doc_id", "src"])
        out = temperature_sample(df, "src", budget_c=5.0)
        rates = {
            r["src"]: r["rate_micro"]
            for r in out.select("src", "rate_micro").distinct().collect()
        }
        assert rates["small"] > rates["big"]
        # C/sqrt(n): 5/sqrt(400)=0.25, 5/sqrt(100)=0.5
        assert rates["big"] == 250000
        assert rates["small"] == 500000

    def test_rate_capped_at_one_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(i, "tiny") for i in range(9)], ["doc_id", "src"]
        )
        out = temperature_sample(df, "src", budget_c=100.0)
        assert out.count() == 9
        assert out.select("rate_micro").first()[0] == 1000000

    def test_deterministic_and_partition_invariant(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "src"])
        kept1 = sorted(
            r["doc_id"]
            for r in temperature_sample(df, "src", 4.0).collect()
        )
        kept2 = sorted(
            r["doc_id"]
            for r in temperature_sample(
                df.repartition(11), "src", 4.0
            ).collect()
        )
        assert kept1 == kept2 and len(kept1) > 0

    def test_sample_size_near_target(self, spark):
        # 1000 rows, C=8 -> rate 8/sqrt(1000) ~ 0.253; hash-uniform
        # keep should land near 253 (binomial sd ~ 13.7)
        df = spark.createDataFrame(
            [(i, "s") for i in range(1000)], ["doc_id", "src"]
        )
        n = temperature_sample(df, "src", 8.0).count()
        assert 185 <= n <= 320


class TestPpsSystematicSample:
    def _df(self, spark, weights):
        return spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weights)],
            "id bigint, wt double",
        )

    def test_exactly_k_draws_with_multiplicity(self, spark):
        from sfdata_wrangler_spark.operators.sampling import (
            pps_systematic_sample,
        )

        df = self._df(spark, [1.0] * 40 + [25.0, 10.0, 3.0])
        for k in (1, 4, 7, 16):
            out = pps_systematic_sample(df, "id", "wt", k)
            assert (
                out.agg(F.sum("n_hits")).collect()[0][0] == k
            ), f"k={k}"

    def test_heavy_row_drawn_multiple_times(self, spark):
        from sfdata_wrangler_spark.operators.sampling import (
            pps_systematic_sample,
        )

        # one row holds ~91% of the mass: with k=10 it must take
        # multiple draws (weight > stride guarantees >= 1 each pass)
        df = self._df(spark, [1.0] * 10 + [100.0])
        out = {
            r["id"]: r["n_hits"]
            for r in pps_systematic_sample(df, "id", "wt", 10).collect()
        }
        assert out[10] >= 8

    def test_deterministic_under_repartition(self, spark):
        from sfdata_wrangler_spark.operators.sampling import (
            pps_systematic_sample,
        )

        df = self._df(spark, [float(1 + i % 7) for i in range(60)])
        a = sorted(
            (r["id"], r["n_hits"])
            for r in pps_systematic_sample(df, "id", "wt", 9).collect()
        )
        b = sorted(
            (r["id"], r["n_hits"])
            for r in pps_systematic_sample(
                df.repartition(13), "id", "wt", 9
            ).collect()
        )
        assert a == b

    def test_zero_weight_rows_excluded(self, spark):
        from sfdata_wrangler_spark.operators.sampling import (
            pps_systematic_sample,
        )

        df = self._df(spark, [0.0, 5.0, 0.0, 5.0])
        out = pps_systematic_sample(df, "id", "wt", 2)
        ids = {r["id"] for r in out.collect()}
        assert ids <= {1, 3}
        assert out.agg(F.sum("n_hits")).collect()[0][0] == 2


class TestTfidfKeywords:
    def test_rare_terms_beat_common_terms(self, spark):
        from sfdata_wrangler_spark.operators.retrieval import tfidf_keywords

        docs = spark.createDataFrame(
            [
                (1, "common common common zebra common"),
                (2, "common words appear everywhere common"),
                (3, "common words appear everywhere again"),
            ],
            "doc_id bigint, text string",
        )
        out = tfidf_keywords(docs, k=1).collect()
        top = {r.doc_id: r.tok for r in out}
        # 'zebra' (df=1) must beat 'common' (df=3) despite tf 1 vs 4
        assert top[1] == "zebra"

    def test_total_order_and_k(self, spark):
        from sfdata_wrangler_spark.operators.retrieval import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")],
            "doc_id bigint, text string",
        )
        out = tfidf_keywords(docs, k=3).collect()
        assert [r.rank for r in out] == [1, 2, 3]
        # all terms have identical tf/df -> rank falls back to the
        # token string: alphabetical prefix of the vocabulary
        assert [r.tok for r in out] == ["alpha", "beta", "delta"]
