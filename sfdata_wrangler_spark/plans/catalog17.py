"""Catalog wave 17 (round 3, final wave): distributed PCA for
embedding columns (sufficient statistics hash-exact, driver eigh
rows-only with a numpy differential), the near-dup
connected-components rollup, four more relational shapes (q13 outer
histogram, q21 exists chains, q2 argmin join-back, q22
scalar-threshold anti join), sliding event-time windows with a
closed-form oracle, the stream-stream attribution join in batch
mode, length-grouped context packing, and hard-negative mining."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pca import gram_micro
from ..functions.metrics import portable_round as _pr17
from .catalog import _events, _register, _t

_GRAM_ORACLE = """
WITH flat AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       CAST(sum(a.q * b.q) AS BIGINT) AS s_xy
FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


@_register("emb_pca_gram", _GRAM_ORACLE)
def emb_pca_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA sufficient statistics (operators/pca.py): the d(d+1)/2
    upper-triangle gram cells as exact BIGINT micro^2 sums — one
    posexplode, one id-keyed self-join, one combinable groupBy; the
    output is basis-sized (2080 rows for d=64) no matter how large
    the corpus is."""
    emb = _t(spark, sf_dir, "embeddings")
    return gram_micro(emb).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "s_xy",
    )


def _pca_int_oracle(k: int = 4, iterations: int = 6, q: int = 10_000) -> str:
    """Unrolled-CTE replay of operators/pca.pca_fit_int: integer
    orthogonal power iteration over the exact scatter matrix
    M = n·S2 − s1·s1ᵀ (HUGEINT), every rescale a truncating ``//``
    (== Spark ``div`` — both toward zero, verified incl. HUGEINT),
    deterministic sign fix, then the exact fixed-point projection
    ``(q_i·n − s1_i)·w_i // n``. ~140 tiny CTEs over 64-row vectors
    and the 4096-cell matrix — the BPE/GD/Lloyd's unroll device."""
    ctes = [
        """
flat AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings
),
s1 AS MATERIALIZED (
  SELECT i, CAST(sum(q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM flat GROUP BY i
),
nr AS (SELECT max(n) AS n FROM s1),
g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS s_xy
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
),
mm AS MATERIALIZED (
  SELECT t.i, t.j,
         (SELECT CAST(n AS HUGEINT) FROM nr) * t.s_xy
           - CAST(sa.s AS HUGEINT) * CAST(sb.s AS HUGEINT) AS m
  FROM (SELECT i, j, s_xy FROM g
        UNION ALL
        SELECT j AS i, i AS j, s_xy FROM g WHERE i < j) t
  JOIN s1 sa ON sa.i = t.i
  JOIN s1 sb ON sb.i = t.j
)"""
    ]
    ctr = 0

    def emit(body: str) -> str:
        nonlocal ctr
        name = f"t{ctr}"
        ctr += 1
        ctes.append(f"{name} AS MATERIALIZED ({body})")
        return name

    def rescale(cur: str) -> str:
        return emit(
            f"SELECT i, CAST(val * {q} // "
            f"GREATEST((SELECT max(abs(val)) FROM {cur}), 1) AS HUGEINT)"
            f" AS val FROM {cur}"
        )

    def project_out(cur: str, w: str) -> str:
        p = emit(
            f"SELECT v.i, v.val * (SELECT sum(val * val) FROM {w})"
            f" - (SELECT sum(a.val * b.val) FROM {cur} a"
            f"    JOIN {w} b ON a.i = b.i) * wv.val AS val"
            f" FROM {cur} v JOIN {w} wv ON v.i = wv.i"
        )
        return rescale(p)

    comps: list[str] = []
    for _m in range(k):
        cur = emit(f"SELECT i, CAST({q} AS HUGEINT) AS val FROM s1")
        for w in comps:
            cur = project_out(cur, w)
        for _t in range(iterations):
            cur = emit(
                "SELECT mm.i AS i, sum(mm.m * v.val) AS val"
                f" FROM mm JOIN {cur} v ON mm.j = v.i GROUP BY 1"
            )
            cur = rescale(cur)
            for w in comps:
                cur = project_out(cur, w)
        signed = emit(
            f"SELECT i, val * (SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END"
            f" FROM {cur} WHERE abs(val) = (SELECT max(abs(val)) FROM {cur})"
            f" ORDER BY i LIMIT 1) AS val FROM {cur}"
        )
        comps.append(signed)
    w_all = emit(
        " UNION ALL ".join(
            f"SELECT {m} AS dim, i, val FROM {w}" for m, w in enumerate(comps)
        )
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT CAST(f.vec_id AS BIGINT) AS vec_id,
       CAST(w.dim AS INT) AS dim,
       CAST(CAST(sum((f.q * (SELECT n FROM nr) - s1.s) * w.val) AS HUGEINT)
            // (SELECT CAST(n AS HUGEINT) FROM nr) AS BIGINT) AS proj_q
FROM flat f
JOIN s1 ON s1.i = f.i
JOIN {w_all} w ON w.i = f.i
GROUP BY f.vec_id, w.dim
"""
    )


@_register("emb_pca_project", _pca_int_oracle())
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 principal projection of every embedding, hash-exact
    (promoted r9, VERDICT r8 ask #5): the basis is the INTEGER
    ORTHOGONAL-ITERATION fixed point of operators/pca.pca_fit_int —
    exact big-int power iteration over the scatter matrix collected
    from the distributed sufficient statistics (d(d+1)/2 rows to the
    driver, never the corpus), truncating-division rescales, integer
    previous-component removal, deterministic sign fix — so the
    oracle replays the identical unrolled iterations and the output
    is exact BIGINT fixed-point values (scale n·MICRO·Q_BASIS·‖w‖;
    closeness to the true eigh basis is pinned ≥0.98 |cos| per
    component in tests/test_pca.py, alongside the float
    :func:`pca_fit`/:func:`pca_project` numpy differential).
    Projection is broadcast-literal zip_with folds, map-only, output
    posexploded to atomic (vec_id, dim, proj_q) scalars."""
    from ..operators.pca import pca_fit_int, pca_project_int

    emb = _t(spark, sf_dir, "embeddings")
    basis, s1, n = pca_fit_int(emb, k=4, iterations=6)
    out = pca_project_int(emb, basis, s1, n)
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("dim").cast("int").alias("dim"),
        F.col("proj_q").cast("bigint").alias("proj_q"),
    )


def _dup_clusters_oracle() -> str:
    """Recursive-CTE oracle for the connected-components rollup: the
    LSH pair CTEs (catalog_text's md5 signature/band SQL) feed a
    transitive-closure fixpoint; min reachable node = Spark's
    min-label propagation result once converged."""
    from .catalog_text import _BANDS_SQL, _SIG_SQL

    return f"""
    WITH RECURSIVE sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_SQL}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(node, label) AS (
      SELECT src AS node, src AS label FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    ),
    labels AS (
      SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(node) AS BIGINT) AS member_id_sum
    FROM labels GROUP BY cluster_id
    """


@_register("dd_dup_clusters", _dup_clusters_oracle())
def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup connected components as a declared query
    (operators/dedup.cluster_duplicates — min-label propagation with
    batched convergence probes): LSH candidate pairs → components →
    per-cluster rollup with a member checksum. HASH-EXACT despite
    the iterative fixpoint: converged min-label labels equal the
    min-node-per-component that the oracle's recursive
    transitive-closure CTE computes — the labels are a pure function
    of the pair graph, not of the iteration schedule."""
    from ..operators.dedup import cluster_duplicates, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, hash_fn="md5", num_hashes=8, bands=4)
    clusters = cluster_duplicates(pairs)
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("member_id_sum"),
        )
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "n_docs",
            "member_id_sum",
        )
    )


_Q13_ORACLE = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@_register("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause filter (kept
    customers with zero matching orders still count), per-customer
    counts, then the count-of-counts histogram — two combinable
    aggregations, no subquery materialization."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q21_ORACLE = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  WHERE l_returnflag = 'R'
), lo AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lo
              WHERE lo.l_orderkey = l1.l_orderkey
                AND lo.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l1 x
                  WHERE x.l_orderkey = l1.l_orderkey
                    AND x.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@_register("q21_sole_blamed_supplier", _Q21_ORACLE)
def q21_sole_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS chain) as semi/anti
    joins: the only supplier with returns on a multi-supplier order.
    The oracle states correlated subqueries; the Spark plan states
    left_semi + left_anti on distinct (order, supplier) pairs —
    semantic equality is what the hash check proves."""
    li = _t(spark, sf_dir, "lineitem")
    lo = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = lo.withColumnRenamed("l_suppkey", "o_sk")
    other_r = l1.withColumnRenamed("l_suppkey", "r_sk")
    waited = (
        l1.join(
            other,
            (l1.l_orderkey == other.l_orderkey)
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        )
        .join(
            other_r,
            (l1.l_orderkey == other_r.l_orderkey)
            & (F.col("l_suppkey") != F.col("r_sk")),
            "left_anti",
        )
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        waited.join(sup, waited.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


_W16_ORACLE = """
WITH e AS (
  SELECT ts, event_type,
         (epoch_us(ts) // 300000000) * 300000000 AS ws1
  FROM events
), w AS (
  SELECT event_type, unnest([ws1, ws1 - 300000000]) AS ws_us FROM e
)
SELECT CAST(ws_us AS BIGINT) AS window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY ws_us, event_type
"""


@_register("w16_sliding_window_counts", _W16_ORACLE)
def w16_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10-minute duration, 5-minute
    slide) — the overlapping sibling of w15's tumbling windows, same
    streaming-ready `F.window` construct in batch mode. Every event
    belongs to exactly two windows; the oracle states that closed
    form (the epoch-floor boundary and its predecessor), so the hash
    match proves Spark's window assignment semantics, not just the
    counts."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).cast("bigint").alias(
                "window_start_us"
            ),
            "event_type",
            "n",
        )
    )


_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice) AS best_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS bp_partkey, min(best_price) AS min_price
  FROM ps GROUP BY l_partkey
)
SELECT CAST(ps.l_partkey AS BIGINT) AS l_partkey,
       CAST(min(ps.l_suppkey) AS BIGINT) AS best_suppkey,
       min_price
FROM ps JOIN best
  ON ps.l_partkey = best.bp_partkey AND ps.best_price = best.min_price
GROUP BY ps.l_partkey, min_price
"""


@_register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar-min subquery) as aggregate +
    join-back rather than a per-group window: per (part, supplier)
    offer table, per-part min, equi join back on (part, price), tie
    broken by lowest supplier. At scale the aggregate+join form beats
    a partitioned window when the group count is huge (two combinable
    aggs, one equi join — no per-group sort)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    best = (
        ps.groupBy("l_partkey")
        .agg(F.min("best_price").alias("min_price"))
        .withColumnRenamed("l_partkey", "bp_partkey")
    )
    return (
        ps.join(
            best,
            (F.col("l_partkey") == F.col("bp_partkey"))
            & (F.col("best_price") == F.col("min_price")),
        )
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").cast("bigint").alias("best_suppkey"))
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            "best_suppkey",
            "min_price",
        )
    )


# acctbal has 2-decimal values: integer cents make the scalar-average
# threshold exact in both engines (a double avg is accumulation-order
# sensitive and the comparison is knife-edged at the boundary)
_Q22_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
), thr AS (
  SELECT CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents
  FROM c WHERE cents > 0
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM c CROSS JOIN thr
WHERE cents > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@_register("q22_idle_rich_customers", _Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-aggregate subquery threshold (1-row
    broadcast) + anti join (customers with no urgent orders — every
    synthetic customer has SOME order, so the classic no-orders
    predicate would be vacuous) + rollup. The average-balance
    threshold is computed in exact integer cents so the knife-edge
    comparison is engine-independent."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    thr = F.broadcast(
        cust.where(F.col("cents") > 0).agg(
            F.expr("sum(cents) div count(*)").alias("avg_cents")
        )
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(thr)
        .where(F.col("cents") > F.col("avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


_J12_ORACLE = """
WITH v AS (
  SELECT user_id, event_id AS trigger_id, ts AS t_ts
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, event_id AS outcome_id, ts AS o_ts
  FROM events WHERE event_type = 'click'
)
SELECT CAST(v.user_id AS BIGINT) AS user_id,
       CAST(trigger_id AS BIGINT) AS trigger_id,
       CAST(outcome_id AS BIGINT) AS outcome_id,
       CAST(epoch_us(o_ts) - epoch_us(t_ts) AS BIGINT) AS delay_us
FROM v JOIN c ON v.user_id = c.user_id
 AND c.o_ts > v.t_ts
 AND c.o_ts <= v.t_ts + INTERVAL 10 MINUTE
"""


@_register("j12_event_attribution", _J12_ORACLE)
def j12_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution join (streaming/join_stream.py in batch
    mode): per-user interval-bounded pairing — the stream-stream join
    shape, where the time bound is what makes the streaming state
    finite. Hash-exact; the streaming twin is differential-tested in
    tests/test_streaming_joins.py."""
    from ..streaming.join_stream import attributed_events

    ev = _events(spark, sf_dir)
    return attributed_events(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "click"),
    )


_TOKCNT_SQL = (
    "CAST(CASE WHEN length(trim(regexp_replace(lower(text), '\\s+', ' ',"
    " 'g'))) = 0 THEN 0 ELSE len(string_split(trim(regexp_replace("
    "lower(text), '\\s+', ' ', 'g')), ' ')) END AS BIGINT)"
)
_LB_SQL = (
    "CAST(CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32 "
    "WHEN n_tokens <= 64 THEN 64 ELSE 128 END AS BIGINT)"
)
_PACKLEN_ORACLE = f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKCNT_SQL} AS n_tokens
  FROM documents
), b AS (
  SELECT doc_id, n_tokens, {_LB_SQL} AS len_bucket FROM t
), p AS (
  SELECT doc_id, n_tokens, len_bucket,
         sum(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - n_tokens AS before
  FROM b
)
SELECT doc_id, n_tokens, len_bucket,
       CAST(floor(before / 256) AS BIGINT) AS window_id,
       CAST(before % 256 AS BIGINT) AS window_offset
FROM p
"""


@_register("txt_pack_by_length", _PACKLEN_ORACLE)
def txt_pack_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped packing (operators/packing.pack_by_length): the
    padding-efficiency trick — bucket docs by padded length (exact
    CASE bounds, no log2), pack 256-token windows within each bucket
    via the two-level prefix scan keyed by (len_bucket, coarse id
    range). The oracle states the per-bucket GLOBAL cumsum; the hash
    match proves two-level ≡ global inside every bucket."""
    from ..functions.text import token_count
    from ..operators.packing import pack_by_length

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return pack_by_length(t, budget=256, bucket_width=64)


@_register(
    "emb_hard_negatives",
    """
    SELECT CAST(q.vec_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS vec_id,
           CAST(c.label AS BIGINT) AS label,
           CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])), 4)
                AS DOUBLE) AS sim,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id) AS INT) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id AND c.label <> q.label
    QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id) <= 5
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (operators/similarity.hard_negatives): per query, the top-5
    most-similar vectors with a DIFFERENT label — broadcast query
    side, label exclusion below the per-query window rank."""
    from ..operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = hard_negatives(queries, emb, k=5)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("label").cast("bigint").alias("label"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


_Q14_ORACLE = """
WITH j AS (
  SELECT CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
              AS BIGINT) AS rev_tt,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
)
SELECT CAST(round(
         100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_tt
                          ELSE 0 END) AS DOUBLE)
               / CAST(sum(rev_tt) AS DOUBLE), 6) AS DOUBLE) AS promo_share,
       CAST(count(*) AS BIGINT) AS n_rows
FROM j
"""


@_register("q14_promo_revenue_share", _Q14_ORACLE)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio over a
    fact⨝dim month slice. Both sums accumulate exact integer
    ten-thousandths BEFORE the single division, so the share is a
    ratio of two exact BIGINTs — engine-independent to the final
    rounding."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.floor(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
            + 0.5
        )
        .cast("bigint")
        .alias("rev_tt"),
        "p_type",
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_tt")).otherwise(0))
        .cast("double")
        .alias("promo"),
        F.sum("rev_tt").cast("double").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return agg.select(
        _pr17(100.0 * F.col("promo") / F.col("total"), 6).alias("promo_share"),
        "n_rows",
    )


_Q19_ORACLE = f"""
SELECT {{msum}} AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@_register(
    "q19_disjunctive_predicates",
    _Q19_ORACLE.format(
        msum="CAST((floor((sum(CAST(floor((l_extendedprice * (1 - l_discount))"
        " * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) / 100.0) AS DOUBLE)"
    ),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three disjunctive brand/size/quantity branches
    over fact⨝dim — the OR-of-ANDs pattern Catalyst splits into
    per-branch pushable ranges; revenue in exact integer
    ten-thousandths."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    from .catalog import _msum2

    return j.where(cond).agg(
        _msum2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       o.o_orderpriority,
       CAST(round(sum(l.l_quantity), 2) AS DOUBLE) AS total_qty
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY o.o_orderkey, o.o_custkey, o.o_orderpriority
"""


@_register("q18_large_volume_orders", _Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING subquery used as a semi-join
    filter back onto the detail join — the two-pass "find heavy
    groups, then expand them" pattern. The heavy-key set is
    aggregate-sized, so the semi join broadcasts at scale."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__tq"))
        .where(F.col("__tq") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderpriority")
        .agg(_pr17(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            "o_orderpriority",
            "total_qty",
        )
    )


_Q7_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST((floor((sum(CAST(floor((l_extendedprice * (1 - l_discount))
             * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) / 100.0) AS DOUBLE)
         AS volume,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name < cn.n_name
GROUP BY sn.n_name, cn.n_name
"""


@_register("q7_nation_pair_volume", _Q7_ORACLE)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joined TWICE under
    different roles (supplier side, customer side) with an
    inter-nation predicate — the aliased-dim pattern. supplier/nation
    are hinted broadcast (true dims); orders and customer carry NO
    hint — they are fact-sized at real scale, so the orders join is a
    shuffle equi join there (AQE still broadcasts them at test SF).
    Volume in exact integer ten-thousandths."""
    from .catalog import _msum2

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
    )
    return j.groupBy("supp_nation", "cust_nation").agg(
        _msum2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("double")
        .alias("volume"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
