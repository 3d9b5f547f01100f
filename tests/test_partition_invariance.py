"""Engine-level determinism sweep: a catalog query must return the
SAME ROWS under any shuffle-partition count — the property that makes
results trustworthy across cluster sizes and AQE decisions. Per-op
invariance tests exist for the tricky operators; this meta-test
sweeps a representative sample of whole queries (one per operator
family, biased toward float outputs and window/sampling logic where
partitioning bugs hide)."""

import pytest
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "flagship_expand_weight_cascade",  # weights window + cascade
    "w4_sessionize",                   # cumsum-of-breaks
    "p5_dedup_by_order",               # order-pinned dedup
    "smp_pps_systematic",              # two-level prefix sampling
    "txt_stratified_sample",           # md5-threshold sampling
    "sk_qsketch_quantiles",            # sketch walk
    "dd_minhash_lsh_pairs",            # banded self-join
    "dd_minhash_lsh_pairs_fast",       # r14 md5-wide family (conv lanes)
    "qc_pairwise_correlation",         # float from exact stats
    "txt_bpe_merges",                  # driver-side iterate
    "j19_interval_overlap_join",       # grid exactly-once emission
    "pipe_curation_v4",                # five-stage composition
    "a2_first_last_by_order",          # deterministic first/last
    "w22_thread_assembly",             # ordered struct-array concat
    "mm_image_phash_pairs",            # pigeonhole Hamming join
    "txt_sentence_chunks",             # sentence grid + window
    "qc_rolling_zscore",               # trailing-frame float z
    # r5-touched plans: the materialization/rewrite work must not
    # change results under any partitioning
    "fn_funnel_steps",                 # left-join + conditional-min chain
    "dd_prefix_jaccard",               # persisted shingle stream
    "gr_triangle_count",               # persisted oriented edges
    "lk_blocking_quality",             # single-pass candidate stats
    "txt_lm_score",                    # persisted bigram model
    # r6 additions: per-row salt, bounded seed unroll, sketch windows
    "j20_salted_skew_join",            # salt must be result-invariant
    "fn_funnel_episodes",              # chained seed stages
    "w23_sliding_distinct_hll",        # register merge across windows
    "smp_reservoir_per_group",         # bottom-k hash reservoir
]


def _run(n_partitions: int, name: str):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(n_partitions))
        .appName(f"pinv-{n_partitions}")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    # getOrCreate reuses ONE JVM session across the 3- and
    # 17-partition runs, and CacheManager's plan-matched lookup would
    # serve the first run's persisted intermediates (prefix-jaccard
    # shingles, triangle orientation, linkage entities) to the second
    # — the invariance check would partially compare the cache
    # against itself. Same reasoning as bench.py's clearCache.
    spark.catalog.clearCache()
    from sfdata_wrangler_spark.plans.catalog import QUERIES

    df = QUERIES[name]["fn"](spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_shuffle_partitions(name):
    assert _run(3, name) == _run(17, name), name
