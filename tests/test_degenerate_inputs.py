"""Degenerate-input behavior for the wave-12+ operators: empty
corpora, single rows, and single-class labels must degrade cleanly,
not throw — retry storms at 100 TB start with an operator that
crashes on an empty partition range."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sfdata_wrangler_spark.operators.bpe import bpe_train
from sfdata_wrangler_spark.operators.classifier import (
    hashed_token_features,
    logreg_predict,
    logreg_train,
)
from sfdata_wrangler_spark.operators.dedup import (
    incremental_dedup,
    minhash_band_index,
)
from sfdata_wrangler_spark.operators.linedup import drop_boilerplate_lines
from sfdata_wrangler_spark.operators.lm import bigram_lm_score

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _empty(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_lm_empty_corpus(spark):
    assert bigram_lm_score(_empty(spark)).count() == 0


def test_linedup_empty_and_single_doc(spark):
    assert drop_boilerplate_lines(_empty(spark)).count() == 0
    out = drop_boilerplate_lines(
        spark.createDataFrame([(1, "only\ndoc")], DOC_SCHEMA)
    ).collect()
    assert out[0]["text"] == "only\ndoc" and out[0]["n_kept"] == 2


def test_bpe_empty_and_single_char_words(spark):
    merges, seg = bpe_train(_empty(spark), num_merges=5)
    assert merges == [] and seg.count() == 0
    # single-char words have no pairs -> early stop, identity seg
    merges, seg = bpe_train(
        spark.createDataFrame([(1, "a b a b")], DOC_SCHEMA), num_merges=5
    )
    assert merges == []
    assert {r["word"]: list(r["tokens"]) for r in seg.collect()} == {
        "a": ["a"], "b": ["b"],
    }


def test_incremental_dedup_empty_index_or_batch(spark):
    docs = spark.createDataFrame(
        [(1, "some document text here today")], DOC_SCHEMA
    )
    empty_index = minhash_band_index(_empty(spark))
    out = incremental_dedup(empty_index, docs).collect()
    assert out[0]["is_new"] is True
    assert incremental_dedup(minhash_band_index(docs), _empty(spark)).count() == 0


def test_classifier_single_class_labels(spark):
    docs = spark.createDataFrame(
        [(i, "all the same class here") for i in range(8)], DOC_SCHEMA
    ).withColumn("y", F.lit(1))
    w = logreg_train(
        hashed_token_features(docs), docs.select("doc_id", "y"), iterations=3
    )
    scored = logreg_predict(hashed_token_features(docs), w)
    # drifts toward the positive class, never NaN
    rows = scored.collect()
    assert all(r["score"] > 0.5 for r in rows)
    assert all(r["score"] == r["score"] for r in rows)  # no NaN


def test_wave23_empty_inputs(spark):
    from sfdata_wrangler_spark.operators import (
        prefix_filter_pairs,
        seasonal_anomaly,
        simhash_hamming_pairs,
        skew_report,
        winsorize_bounds,
    )
    from sfdata_wrangler_spark.operators.windows import (
        rolling_distinct_users,
    )

    empty_docs = spark.createDataFrame([], DOC_SCHEMA)
    assert prefix_filter_pairs(empty_docs).count() == 0

    fps = spark.createDataFrame([], "doc_id bigint, fp bigint")
    assert (
        simhash_hamming_pairs(fps, fp_col="fp", bits=16, max_hamming=2)
        .count()
        == 0
    )

    ev = spark.createDataFrame(
        [], "user_id bigint, event_type string, ts timestamp, value double"
    )
    assert skew_report(ev, "user_id", ("event_type",)).count() == 0
    assert seasonal_anomaly(ev).count() == 0
    assert winsorize_bounds(ev, "event_type", "value").count() == 0
    assert rolling_distinct_users(ev).count() == 0


def test_wave23_single_row_inputs(spark):
    import datetime

    from sfdata_wrangler_spark.operators import (
        prefix_filter_pairs,
        winsorize_bounds,
    )
    from sfdata_wrangler_spark.operators.windows import (
        rolling_distinct_users,
    )

    one_doc = spark.createDataFrame(
        [(1, "just one single document here")], ["doc_id", "text"]
    )
    assert prefix_filter_pairs(one_doc).count() == 0  # no pair possible

    one_ev = spark.createDataFrame(
        [(1, "x", datetime.datetime(2024, 1, 1, 10, 0), 5.0)],
        "user_id bigint, event_type string, ts timestamp, value double",
    )
    w = winsorize_bounds(one_ev, "event_type", "value").collect()[0]
    assert (w.p_lo, w.p_hi, w.n_below, w.n_above) == (5.0, 5.0, 0, 0)
    r = rolling_distinct_users(one_ev).collect()
    # one activity day feeds 7 window-ends, each wau=1
    assert len(r) == 7
    assert all(row.wau == 1 for row in r)


def test_null_and_empty_text_degrade_cleanly(spark):
    """Real corpora contain NULL and empty text; every text-keyed
    operator must drop or pass them through, never throw."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.functions.text import (
        quality_score,
        token_count,
    )
    from sfdata_wrangler_spark.operators import (
        exact_dup_groups,
        minhash_signatures,
        prefix_filter_pairs,
        simhash,
    )
    from sfdata_wrangler_spark.operators.dedup import exact_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "hello world foo bar"),
            (2, None),
            (3, ""),
            (4, "hello world foo baz"),
        ],
        DOC_SCHEMA,
    )
    # J(1,4) = 1/3 < 0.5 -> no pair; null/empty rows contribute none
    assert prefix_filter_pairs(df).count() == 0
    assert minhash_signatures(df, hash_fn="md5").count() == 2
    assert exact_dup_groups(df).count() == 0
    assert simhash(df).count() == 3
    pairs = exact_jaccard_pairs(df).collect()
    assert [(p.id_a, p.id_b, p.inter, p.union_sz) for p in pairs] == [
        (1, 4, 1, 3)
    ]
    # column functions are total: 4 in, 4 out
    assert df.select(quality_score(F.col("text"))).count() == 4
    assert df.select(token_count(F.col("text"))).count() == 4


def test_newest_ops_degenerate_inputs(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.operators import (
        debounce_events,
        join_size_estimate,
        pairwise_correlation,
        target_encode_loo,
    )

    ev_schema = (
        "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    empty = spark.createDataFrame([], ev_schema)
    assert debounce_events(empty, ["user_id"]).count() == 0
    one = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 5.0)], ev_schema
    )
    out = debounce_events(one, ["user_id"]).collect()
    assert len(out) == 1 and out[0].burst_size == 1

    # single observation: zero variance -> NULL r (not NaN, not crash)
    r = pairwise_correlation(one, ["user_id"], "value", "value").collect()[0]
    assert r.n == 1 and r.r is None

    est = join_size_estimate(empty, one, ["user_id"]).collect()[0]
    assert (est.join_rows, est.n_matching_keys) == (0, 0)

    enc = target_encode_loo(
        spark.createDataFrame([], "id bigint, k string, y double"), "k", "y"
    )
    assert enc.count() == 0
