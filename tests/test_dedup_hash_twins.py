"""Hash-family twin equivalence (VERDICT r13 ask #1).

``dd_simhash`` / ``dd_minhash_lsh_pairs_fast`` now run the
oracle-parity md5 families; the xxhash64 production fast paths live on
as ``dd_*_xx``. These tests pin the property that makes the families
interchangeable: on the fixtures, BOTH find exactly the same true
duplicates — any pair-set difference is confined to sub-threshold
random band collisions (LSH false positives, which every downstream
exact-Jaccard verify stage drops by design).
"""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
)

SF = "/root/testdata/sf0.001"

# the 16-hash/8-band S-curve is ~1 at J>=0.7 and ~0 at J<=0.2; any
# pair in between is legitimately family-dependent
J_TRUE = 0.5
J_NOISE = 0.2


def _fixture_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs(df, hash_fn):
    return {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            df, num_hashes=16, bands=8, shingle_n=3, hash_fn=hash_fn
        ).collect()
    }


def test_minhash_twin_pair_sets_on_fixture(spark):
    """md5w and xxhash64 emit the SAME true-duplicate pairs on the
    driver fixture; their symmetric difference is only sub-noise-
    threshold band collisions."""
    docs = _fixture_docs(spark)
    md5w, xx = _pairs(docs, "md5w"), _pairs(docs, "xxhash64")
    union = sorted(md5w | xx)
    assert union, "fixture produced no candidate pairs at all"
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard(
            docs, spark.createDataFrame(union, "id_a long, id_b long")
        ).collect()
    }
    true_md5w = {p for p in md5w if jac[p] >= J_TRUE}
    true_xx = {p for p in xx if jac[p] >= J_TRUE}
    assert true_md5w == true_xx, (
        "families disagree on true duplicates: "
        f"only-md5w={true_md5w - true_xx} only-xx={true_xx - true_md5w}"
    )
    assert true_md5w, "fixture contains no true near-dups — test is vacuous"
    for p in md5w ^ xx:
        assert jac[p] < J_NOISE, (
            f"pair {p} (jaccard={jac[p]:.3f}) found by only one family "
            "but is above the noise band"
        )


def test_minhash_twin_identical_on_clear_dups(spark):
    """On a synthetic corpus with only clear-cut dups (J≈1 and J≈0.7)
    and unrelated filler, the two families' candidate sets are
    IDENTICAL — divergence only ever appears in the J<0.2 noise."""
    doc = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill every single afternoon"
    )
    rows = [
        Row(doc_id=1, text=doc),
        Row(doc_id=2, text="  " + doc.upper() + " "),
        Row(doc_id=3, text=doc.replace("warm", "cold")),
    ] + [
        Row(
            doc_id=10 + i,
            text=f"unrelated filler number {i} about {w} pipelines and "
            f"columnar {w} storage formats for batch {i} analytics",
        )
        for i, w in enumerate(
            ["spark", "flink", "duck", "arrow", "ray", "beam"]
        )
    ]
    docs = spark.createDataFrame(rows)
    md5w, xx = _pairs(docs, "md5w"), _pairs(docs, "xxhash64")
    assert md5w == xx
    assert {(1, 2), (1, 3), (2, 3)} <= md5w


def test_simhash_twin_token_bag_identity(spark):
    """SimHash is a function of the normalized token bag: equal bags
    (case/whitespace changes, token reorderings) get identical
    fingerprints under BOTH hash families."""
    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shuffled = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=doc),
            Row(doc_id=2, text="  " + doc.upper() + "  "),
            Row(doc_id=3, text=shuffled),
        ]
    )
    for kwargs in ({"hash_fn": "md5", "bits": 60}, {"hash_fn": "xxhash64"}):
        fps = {r.doc_id: r.simhash for r in simhash(docs, **kwargs).collect()}
        assert fps[1] == fps[2] == fps[3], kwargs


def test_simhash_twin_separation(spark):
    """Both families separate near-dups from unrelated docs: one-token
    edits land within bits/8 Hamming, unrelated docs beyond bits/4."""
    doc = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill every single afternoon and "
        "the birds sing in the garden near the old stone fountain"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=doc),
            Row(doc_id=2, text=doc.replace("warm", "cold")),
            Row(
                doc_id=3,
                text="completely different content about spark query "
                "engines and distributed columnar storage formats for "
                "large scale analytics workloads in modern lakes",
            ),
        ]
    )
    for kwargs, bits in (
        ({"hash_fn": "md5", "bits": 60}, 60),
        ({"hash_fn": "xxhash64"}, 64),
    ):
        fps = {r.doc_id: r.simhash for r in simhash(docs, **kwargs).collect()}
        near = bin(fps[1] ^ fps[2]).count("1")
        far = bin(fps[1] ^ fps[3]).count("1")
        assert near <= bits // 8, (kwargs, near)
        assert far >= bits // 4, (kwargs, far)


def test_simhash_md5_rejects_wide_fingerprint(spark):
    """bits>60 under md5 would overflow signed 64-bit on the oracle
    side — the operator refuses instead of silently diverging."""
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError, match="60 bits"):
        simhash(docs, bits=64, hash_fn="md5")


def test_registered_twins_same_plan_family(spark):
    """The catalog twins run the documented hash families: the
    oracle-bearing names contain md5 in their physical plans and the
    _xx twins contain xxhash64."""
    from sfdata_wrangler_spark.plans.catalog import QUERIES

    def plan(name):
        return (
            QUERIES[name]["fn"](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "md5" in plan("dd_simhash") and "xxhash64" not in plan("dd_simhash")
    assert "xxhash64" in plan("dd_simhash_xx")
    assert "md5" in plan("dd_minhash_lsh_pairs_fast")
    assert "xxhash64" not in plan("dd_minhash_lsh_pairs_fast")
    assert "xxhash64" in plan("dd_minhash_lsh_pairs_xx")
