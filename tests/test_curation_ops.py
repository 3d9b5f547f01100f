"""Round-3 curation operators: repetition filters, domain capping,
PII scrubbing, shard export. Hand-computed expectations on tiny
fixtures; the cross-engine check is tools/check_oracle.py."""

import os
import tempfile

from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    pii_count,
    scrub_pii,
)
from sfdata_wrangler_spark.operators.repetition import (
    domain_cap,
    repetition_stats,
)
from sfdata_wrangler_spark.sources.inline import values_df
from sfdata_wrangler_spark.sources.shards import (
    shard_id,
    shard_manifest,
    write_shards,
)


def _docs(spark, rows):
    return values_df(spark, "doc_id: bigint, text: string", rows)


def test_repetition_stats_hand_computed(spark):
    df = _docs(spark, [
        (1, "a a a b"),          # ttr 0.5, top 0.75, bigrams [aa,aa,ab] dup 1/3
        (2, "x y z w u v"),      # all distinct; top share 1/6 < 0.2
        (3, "solo"),             # single token: no bigrams -> dup 0.0
        (4, "  "),               # blank: dropped entirely
    ])
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 4
    assert out[1]["distinct_token_ratio"] == 0.5
    assert out[1]["top_token_frac"] == 0.75
    assert out[1]["dup_bigram_frac"] == 0.333333
    assert out[1]["keep"] == 0  # top_token_frac 0.75 > 0.2
    assert out[2]["distinct_token_ratio"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["keep"] == 1
    assert out[3]["n_tokens"] == 1 and out[3]["dup_bigram_frac"] == 0.0


def test_repetition_stats_stays_jvm_side(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_default_path_is_shuffle_free(spark):
    df = _docs(spark, [(1, "a b c a")])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: sort+fold per row


def test_repetition_exploded_kernel_matches_mapside(spark):
    # differential: the large-document explode kernel and the default
    # per-row kernel must agree bit-for-bit on awkward shapes
    df = _docs(spark, [
        (1, "a a a a a a"),                  # single repeated token
        (2, "b"),                            # no bigrams
        (3, "x y x y x y x"),                # alternating
        (4, "q w e r t y u i o p"),          # all distinct
        (5, "zz zz yy zz yy aa"),
    ])
    a = sorted(map(tuple, repetition_stats(df).collect()))
    b = sorted(map(tuple, repetition_stats(df, exploded=True).collect()))
    assert a == b


def test_domain_cap_bounds_and_determinism(spark):
    rows = [(i, f"d{i % 3}") for i in range(30)]
    df = values_df(spark, "doc_id: bigint, source: string", rows)
    capped = domain_cap(df, max_per_domain=4, rank_col="rk")
    got = capped.groupBy("source").count().collect()
    assert all(r["count"] == 4 for r in got) and len(got) == 3
    # deterministic: same keep-set on recompute
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in domain_cap(df, 4).collect())
    assert a == b
    # ranks are 1..cap within each domain
    ranks = [r["rk"] for r in capped.collect()]
    assert ranks and set(ranks) <= {1, 2, 3, 4}


def test_scrub_pii_redacts_and_counts(spark):
    df = values_df(spark, "id: bigint, t: string", [
        (1, "write bob.smith+x@mail.example.org or call +1 415-555-0042"),
        (2, "server at 192.168.0.17 responded"),
        (3, "nothing sensitive here"),
    ])
    out = df.select(
        "id",
        scrub_pii(F.col("t")).alias("clean"),
    ).withColumns({
        "e": pii_count(F.col("clean"), EMAIL_TOKEN),
        "p": pii_count(F.col("clean"), PHONE_TOKEN),
        "i": pii_count(F.col("clean"), IP_TOKEN),
    })
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["clean"] == f"write {EMAIL_TOKEN} or call {PHONE_TOKEN}"
    assert (rows[1]["e"], rows[1]["p"], rows[1]["i"]) == (1, 1, 0)
    assert rows[2]["clean"] == f"server at {IP_TOKEN} responded"
    assert rows[3]["clean"] == "nothing sensitive here"


def test_shard_export_roundtrip(spark):
    df = values_df(
        spark, "doc_id: bigint, n_chars: bigint",
        [(i, 10 * i) for i in range(100)],
    )
    path = os.path.join(tempfile.gettempdir(), "sfdata_test_shards")
    write_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    # lossless and shard ∈ [0,4)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(100))
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards <= set(range(4))
    # shard is a pure function of the id: recompute matches the layout
    expected = df.select(
        "doc_id", shard_id(F.col("doc_id"), 4).alias("shard")
    )
    mismatch = (
        back.select("doc_id", "shard")
        .exceptAll(expected)
        .count()
    )
    assert mismatch == 0
    man = {r["shard"]: r for r in shard_manifest(back, token_col="n_chars").collect()}
    assert sum(r["n_docs"] for r in man.values()) == 100
    assert sum(r["n_tokens"] for r in man.values()) == sum(10 * i for i in range(100))


def test_semdedup_prune_edge_rule(spark):
    from sfdata_wrangler_spark.operators.similarity import semdedup_prune

    # cluster 1: v1 ~ v2 ~ v3 (identical) -> keep min id, drop 2 and 3;
    # cluster 2: orthogonal pair -> keep both
    df = values_df(
        spark,
        "vec_id: bigint, label: bigint, embedding: array<double>",
        [
            (1, 1, [1.0, 0.0]),
            (2, 1, [1.0, 0.0]),
            (3, 1, [1.0, 0.0]),
            (4, 2, [0.0, 1.0]),
            (5, 2, [1.0, 0.0]),
        ],
    )
    out = {r["vec_id"]: r["dropped"] for r in semdedup_prune(df).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 0, 5: 0}
