"""release_operator_caches: the library-session cleanup handle for
operator-level materialize=True persists (ADVICE r5 — long-lived
sessions otherwise accumulate corpus-scale cache entries with no way
to drop them short of clearCache, which evicts the caller's own
caches too)."""

from pyspark.sql import Row

from sfdata_wrangler_spark.operators import release_operator_caches
from sfdata_wrangler_spark.operators.dedup import prefix_filter_pairs


def _docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy cat today",
        "a completely different document about spark engines",
    ]
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_release_operator_caches_drops_tracked_persists(spark):
    release_operator_caches()  # isolate from other tests' leftovers
    jsm = spark.sparkContext._jsc.sc().getPersistentRDDs()
    before = jsm.size()

    # force materialization of the persisted shingle stream
    prefix_filter_pairs(_docs(spark), threshold_pct=80).collect()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() > before

    assert release_operator_caches() >= 1
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= before
    # idempotent: nothing left to free
    assert release_operator_caches() == 0


def test_release_is_safe_before_any_persist(spark):
    release_operator_caches()
    assert release_operator_caches() == 0
