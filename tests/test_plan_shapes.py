"""Physical-plan regression tests — the 100 TB properties SURVEY §4
promises must survive refactors: filter pushdown into the parquet
scan, broadcast joins for dimensions, and no redundant exchange
between the weight window and the cascade aggregation."""

import re

from sfdata_wrangler_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name]["fn"](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown(spark):
    plan = _plan(spark, "a0_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_flagship_single_exchange_before_agg(spark):
    """The weight window and the cascade groupBy share partition keys:
    exactly one Exchange feeds both (Window → HashAggregate reuses the
    hash partitioning)."""
    plan = _plan(spark, "flagship_expand_weight_cascade")
    assert "BroadcastHashJoin" in plan  # orders side broadcasts
    # exchanges: one broadcast + one hash for the window; none between
    # Window and the aggregates
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges == 1, f"expected 1 hash exchange, plan:\n{plan}"


def test_union_distinct_broadcasts_dim(spark):
    plan = _plan(spark, "u1_union_distinct")
    assert "BroadcastHashJoin" in plan


def test_interval_join_pushes_nonnull(spark):
    plan = _plan(spark, "j2_interval_join")
    assert "PushedFilters" in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_q5_fact_first_join_order(spark):
    """q5 must join orders⨝lineitem (fact-fact) BEFORE customer: the
    lineitem join line sits deeper in the printed tree (larger string
    offset) than the customer join line."""

    plan = _plan(spark, "q5_local_supplier_volume")
    join_lines = [
        (m.start(), m.group(0))
        for m in re.finditer(r".*Join .*", plan)
    ]
    fact = [o for o, line in join_lines if "l_orderkey" in line]
    cust = [o for o, line in join_lines if "c_custkey" in line]
    assert fact and cust, plan
    assert min(fact) > min(cust), (
        f"lineitem join should be innermost:\n{plan[:2000]}"
    )


def test_embedding_neardup_is_bucket_equi(spark):
    """The near-dup candidate join must be equi on the LSH bucket —
    an all-pairs CartesianProduct/BroadcastNestedLoopJoin here is the
    one plan shape that cannot survive a 100 TB corpus."""
    plan = _plan(spark, "dd_embedding_neardup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pack_windows_no_global_doc_sort(spark):
    """txt_pack_windows' per-doc prefix sum must run in bucket-
    partitioned windows; the only unpartitioned window is over the
    tiny per-bucket offset dim (one row per bucket), never the docs."""
    plan = _plan(spark, "txt_pack_windows")

    # every Window over doc-level columns must carry a partition spec
    doc_windows = [
        line for line in plan.splitlines()
        if "Window" in line and "n_tokens" in line
    ]
    assert doc_windows, plan
    for line in doc_windows:
        assert "__bkt" in line, f"doc window not bucket-partitioned: {line}"


def test_strict_chain_no_cartesian(spark):
    plan = _plan(spark, "w12b_impute_chain_strict")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lake_roundtrip_partition_pruning(spark):
    """s8_lake_roundtrip's read-back filter on the partition column
    must prune directories (PartitionFilters), not scan-and-filter."""
    plan = _plan(spark, "s8_lake_roundtrip")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert "YEAR" in m.group(1) and "1995" in m.group(1), m.group(0)


def test_minhash_recall_no_cartesian(spark):
    """The exact-Jaccard ground truth must come from the shingle
    inverted index (equi-join on the shingle key), never a cartesian
    doc-pair product."""
    plan = _plan(spark, "dd_minhash_recall")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_only_broadcast_nlj_is_one_row_vocab(spark):
    """The bigram LM's only nested-loop join is the 1-row vocab
    broadcast; bigram scoring joins stay hash joins, and no Python
    eval appears anywhere."""
    plan = _plan(spark, "txt_lm_score")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linedup_no_python_no_cartesian(spark):
    plan = _plan(spark, "ld_boilerplate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_dedup_is_band_equi_join(spark):
    """The new-batch vs index join must be an equi join on the band
    key — never a nested loop over the corpus."""
    plan = _plan(spark, "dd_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_key_reads_only_needed_columns(spark):
    plan = _plan(spark, "z1_zorder_key")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = m.group(1)
    assert "l_comment" not in cols and "l_extendedprice" not in cols


def test_scd2_single_exchange_for_windows_and_runs(spark):
    """The change-flag window, island prefix sum, and run groupBy all
    share the user_id hash partitioning — one exchange on events, not
    three."""
    plan = _plan(spark, "scd2_user_event_runs")
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_profile_single_aggregate_no_expand_blowup(spark):
    plan = _plan(spark, "prof_lineitem")
    assert "Join" not in plan and "Union" not in plan


def test_simhash_hamming_no_cartesian(spark):
    """Pigeonhole candidate generation must stay a (block, value)
    equi-join — a cartesian/BNL would defeat the whole construction."""
    plan = _plan(spark, "dd_simhash_hamming")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_jaccard_no_cartesian(spark):
    """Both the prefix candidate join and the intersection verify are
    shingle-keyed equi-joins; nothing may degrade to all-pairs."""
    plan = _plan(spark, "dd_prefix_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winsorize_broadcasts_fence_dim(spark):
    """The group-sized fence dim must broadcast back onto the fact —
    a shuffle join here would re-shuffle the full fact for a 5-row
    dimension."""
    plan = _plan(spark, "qc_winsorize_bounds")
    assert "BroadcastHashJoin" in plan


def test_skew_report_two_combinable_aggs(spark):
    """rows→keys→groups: exactly two hash exchanges (key agg, group
    agg) — adding a third would mean a lost partial-combine."""
    plan = _plan(spark, "qc_skew_report")
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rerank_candidate_sized_dense_stage(spark):
    """Two-stage retrieval: the dense rerank must broadcast the 1-row
    query vector (no shuffle of the corpus for the cross join) and
    keep every join an equi/broadcast shape."""
    plan = _plan(spark, "ir_rerank_two_stage")
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the broadcast of the 1-row
    # query-vector (and corpus-stats) dims
    assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_rolling_wau_no_cartesian_two_distincts(spark):
    plan = _plan(spark, "a12_rolling_wau")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_keyed_no_cartesian(spark):
    """Grid candidate generation must stay an equi join on
    (cell, key) — a θ-join fallback would be the quadratic plan the
    grid exists to avoid."""
    plan = _plan(spark, "j19_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_target_loo_broadcasts_group_dim(spark):
    """The fact is touched once: group stats and the 1-row global
    prior both come back as broadcasts."""
    plan = _plan(spark, "enc_target_loo")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_qsketch_quantiles_windows_on_sketch(spark):
    """The quantile walk's window runs on the SKETCH table: one
    exchange for the sketch build, bounded re-shuffles after — and
    never a cartesian."""
    plan = _plan(spark, "sk_qsketch_quantiles")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_cusum_single_exchange_for_both_windows(spark):
    """Prefix sum and prefix min share the (group) partitioning —
    the reflection identity must not pay two shuffles."""
    plan = _plan(spark, "qc_cusum_changepoints")
    assert plan.count("Exchange hashpartitioning") <= 1


def test_twa_window_and_agg_share_partitioning(spark):
    plan = _plan(spark, "w21_time_weighted_average")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_demand_v2_all_dims_broadcast(spark):
    """The demand panel is dimension-scale end to end: every join is
    a broadcast; a sort-merge join would mean a dim got misjudged as
    a fact."""
    plan = _plan(spark, "pipe_demand_v2")
    assert "CartesianProduct" not in plan


def test_curation_v4_bounded_exchanges_no_cartesian(spark):
    """Five logical stages, four shuffles: extraction and gating are
    map-side; only the URL-dedup window, the sentence windows, and
    the two rollups repartition."""
    plan = _plan(spark, "pipe_curation_v4")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 5


def test_tombstone_exclusion_is_broadcast_anti_join(spark):
    """The ANN deletion path (VERDICT r12 ask #1) must stay
    shortlist-cheap at 100 TB: the tombstone exclusion lands as ONE
    broadcast LEFT ANTI hash join on the ADC candidate stream — never
    a shuffled anti-join of the corpus-sized code table, and never a
    change to the number of exchanges the serve already pays."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.operators.pq import ivfpq_topk
    from sfdata_wrangler_spark.plans.catalog import _t
    from sfdata_wrangler_spark.plans.catalog35 import (
        _K, _M, _N_PROBE, _SHORTLIST, _SUB_DIM, _ivfpq_parts,
    )

    emb, cents, cb, enc = _ivfpq_parts(spark, SF)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
              m=_M, sub_dim=_SUB_DIM)
    tomb = emb.where(F.pmod("vec_id", F.lit(7)) == 3).select("vec_id")
    base = ivfpq_topk(queries, enc, cents, cb, emb, **kw)
    excl = ivfpq_topk(
        queries, enc, cents, cb, emb, exclude_ids=tomb, **kw
    )
    p_base = base._jdf.queryExecution().executedPlan().toString()
    p_excl = excl._jdf.queryExecution().executedPlan().toString()
    anti_base = len(re.findall(r"BroadcastHashJoin .*LeftAnti", p_base))
    anti_excl = len(re.findall(r"BroadcastHashJoin .*LeftAnti", p_excl))
    assert anti_excl == anti_base + 1, (anti_base, anti_excl)
    assert "SortMergeJoin LeftAnti" not in p_excl
    # the exclusion adds NO shuffle (its broadcast exchange is the
    # takedown-sized table): same hash-partitioning exchange count
    assert p_excl.count("Exchange hashpartitioning") == p_base.count(
        "Exchange hashpartitioning"
    )
