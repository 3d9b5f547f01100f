"""Catalog wave 26 (round 4): second batch of the unregistered-operator
backlog — tf·idf keywords, A/B test readout, leave-one-out target
encoding, PPS systematic sampling, the keyed interval-overlap join,
convex-polygon geofencing, HLL audience intersection, and the
classification/calibration/correlation readouts.

Float policy (same as the rest of the engine): ratios and statistics
are single fixed trees of correctly-rounded IEEE ops (÷ and sqrt
allowed, ln/exp banned) over exact BIGINT operands, so even double
columns hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import point_in_convex_polygon
from ..operators.classifier import (
    binary_classification_report,
    calibration_table,
)
from ..operators.drift import ab_test_report, pairwise_correlation
from ..operators.encode import target_encode_loo
from ..operators.hll import _rank_expr as hll_rank_expr
from ..operators.hll import HLL_ALPHA_BY_PHEX, hll_intersect_estimate, hll_sketch
from ..operators.interval_lookup import interval_overlap_join
from ..operators.retrieval import tfidf_keywords
from ..operators.sampling import pps_systematic_sample
from .catalog import _events, _register, _t
from .catalog_text import norm_sql

# ---------------------------------------------------------------------------
# text: characteristic terms
# ---------------------------------------------------------------------------


@_register(
    "ir_tfidf_keywords",
    f"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split({norm_sql()}, ' ')) AS tok
            FROM documents)
      WHERE length(tok) >= 3
      GROUP BY doc_id, tok
    ),
    dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tok, tf, df,
             CAST(floor(CAST(tf AS DOUBLE)
                        * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                           / (CAST(df AS DOUBLE) + 0.5))
                        * 1000000.0 + 0.5) AS BIGINT) AS score_micro
      FROM tf JOIN dft USING (tok) CROSS JOIN nd
    )
    SELECT doc_id, tok, tf, df, score_micro, CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score_micro DESC, tok) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def ir_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf·idf keywords per document (operators/retrieval.
    tfidf_keywords): ln-free odds-ratio idf in integer micro-units,
    one corpus scan, vocabulary-sized broadcast back, per-doc window
    rank with a token tie-break."""
    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=3)


# ---------------------------------------------------------------------------
# experimentation readout
# ---------------------------------------------------------------------------

_AB_Z_SQL = """(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                        / CAST(n_a + n_b AS DOUBLE)))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"""


@_register(
    "qc_ab_test_report",
    f"""
    WITH pv AS (
      SELECT o_orderpriority AS exp,
             CASE WHEN o_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM orders GROUP BY 1, 2
    ),
    rk AS (SELECT *, row_number() OVER (PARTITION BY exp ORDER BY variant)
                     AS r FROM pv),
    wide AS (
      SELECT exp,
             max(CASE WHEN r = 1 THEN variant END) AS variant_a,
             max(CASE WHEN r = 1 THEN n END) AS n_a,
             max(CASE WHEN r = 1 THEN conv END) AS conv_a,
             max(CASE WHEN r = 2 THEN variant END) AS variant_b,
             max(CASE WHEN r = 2 THEN n END) AS n_b,
             max(CASE WHEN r = 2 THEN conv END) AS conv_b,
             CAST(max(r) AS BIGINT) AS n_variants
      FROM rk GROUP BY exp
    )
    SELECT exp, variant_a, n_a, conv_a, variant_b, n_b, conv_b, n_variants,
           CASE WHEN n_variants = 2 AND {_AB_Z_SQL} IS NOT NULL
                     AND sqrt((CAST(conv_a + conv_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE)
                               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                        / CAST(n_a + n_b AS DOUBLE)))
                              * (1.0 / CAST(n_a AS DOUBLE)
                                 + 1.0 / CAST(n_b AS DOUBLE))) > 0
                THEN {_AB_Z_SQL} END AS z
    FROM wide
    """,
)
def qc_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per experiment (operators/drift.
    ab_test_report): orders split into synthetic a/b variants by
    custkey parity, success = totalprice > 150k. One aggregation,
    fixed IEEE expression tree (sqrt allowed), n_variants guard."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("exp"),
        F.when(F.col("o_custkey") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("variant"),
        (F.col("o_totalprice") > 150000).alias("ok"),
    )
    return ab_test_report(o, "exp", "variant", F.col("ok"))


# ---------------------------------------------------------------------------
# feature engineering
# ---------------------------------------------------------------------------


@_register(
    "enc_target_loo",
    """
    WITH s AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT) AS t
      FROM orders WHERE o_orderkey < 500
    ),
    g AS (
      SELECT o_orderpriority, CAST(sum(t) AS BIGINT) AS gs,
             CAST(count(t) AS BIGINT) AS gn
      FROM s GROUP BY 1
    ),
    a AS (
      SELECT CAST(sum(t) AS BIGINT) AS asum,
             CAST(count(t) AS BIGINT) AS an
      FROM s
    )
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
           CAST(CASE WHEN t IS NOT NULL AND gn > 1
                THEN (gs - t) // (gn - 1) END AS BIGINT) AS enc_loo,
           CAST(CASE WHEN an > 0 THEN asum // an END AS BIGINT) AS enc_prior
    FROM s JOIN g USING (o_orderpriority) CROSS JOIN a
    """,
)
def enc_target_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (operators/encode.
    target_encode_loo): per order-priority mean of totalprice
    excluding the row itself — exact scaled-integer arithmetic, one
    combinable aggregation + broadcast join back."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    out = target_encode_loo(o, "o_orderpriority", "o_totalprice")
    return out.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderpriority",
        "enc_loo",
        "enc_prior",
    )


# ---------------------------------------------------------------------------
# survey sampling
# ---------------------------------------------------------------------------


@_register(
    "smp_pps_systematic",
    """
    WITH r AS (
      SELECT c_custkey,
             CAST(floor(c_acctbal * 1000000 + 0.5) AS BIGINT) AS w,
             md5(CAST(c_custkey AS VARCHAR)) AS key
      FROM customer
      WHERE CAST(floor(c_acctbal * 1000000 + 0.5) AS BIGINT) > 0
    ),
    o AS (
      SELECT c_custkey, w,
             CAST(coalesce(sum(w) OVER (ORDER BY key, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS before,
             CAST(sum(w) OVER () AS BIGINT) AS total
      FROM r
    ),
    h AS (
      SELECT c_custkey, w, before,
             greatest(total // 50, CAST(1 AS BIGINT)) AS stride
      FROM o
    ),
    h2 AS (
      SELECT c_custkey, w,
             greatest(CAST(0 AS BIGINT),
                      (before - (stride // 2) + stride - 1) // stride)
               AS imin,
             least(CAST(49 AS BIGINT),
                   ((before + w - 1 - (stride // 2) + stride) // stride) - 1)
               AS imax
      FROM h
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, w,
           CAST(imax - imin + 1 AS BIGINT) AS n_hits
    FROM h2
    WHERE imax - imin + 1 > 0
    """,
)
def smp_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sample of k=50
    draws over customers weighted by account balance (operators/
    sampling.pps_systematic_sample): deterministic md5 total order,
    exact BIGINT prefix sums via the two-level scan, midpoint-anchor
    stride arithmetic — RNG-free and engine-reproducible. Negative
    balances drop out (zero selection probability) by construction."""
    c = _t(spark, sf_dir, "customer")
    out = pps_systematic_sample(c, "c_custkey", "c_acctbal", k=50)
    return out.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "w",
        "n_hits",
    )


# ---------------------------------------------------------------------------
# interval × interval join (both sides fact-scale)
# ---------------------------------------------------------------------------


@_register(
    "j19_interval_overlap_join",
    """
    WITH a AS (
      SELECT o_orderkey AS a_id, o_custkey % 10 AS k,
             o_orderdate AS a_s, o_orderdate + INTERVAL 14 DAY AS a_e
      FROM orders WHERE o_orderkey < 300
    ),
    b AS (
      SELECT o_orderkey AS b_id, o_custkey % 10 AS k,
             o_orderdate AS b_s, o_orderdate + INTERVAL 14 DAY AS b_e
      FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600
    )
    SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
           CAST(a.k AS BIGINT) AS k,
           CAST(least(epoch_us(a_e), epoch_us(b_e))
                - greatest(epoch_us(a_s), epoch_us(b_s)) AS BIGINT)
             AS overlap_us
    FROM a JOIN b ON a.k = b.k
    WHERE least(a_e, b_e) > greatest(a_s, b_s)
    """,
)
def j19_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval-overlap join (operators/interval_lookup.
    interval_overlap_join): 14-day order windows vs a disjoint order
    set, grid-bucketed candidates with exactly-once emission at the
    later-start cell; the oracle is the naive θ-join the grid must
    reproduce verbatim."""
    # o_orderdate may read as TIMESTAMP_NTZ; unix_micros (inside the
    # overlap arithmetic) requires TIMESTAMP. Pin UTC and cast — the
    # overlap is an epoch difference, so the NTZ→LTZ shift cancels.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    day14 = F.expr("INTERVAL 14 DAYS")
    a = o.where(F.col("o_orderkey") < 300).select(
        F.col("o_orderkey").alias("a_id"),
        (F.col("o_custkey") % 10).alias("k"),
        F.col("o_orderdate").alias("a_s"),
        (F.col("o_orderdate") + day14).alias("a_e"),
    )
    b = o.where(
        (F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)
    ).select(
        F.col("o_orderkey").alias("b_id"),
        (F.col("o_custkey") % 10).alias("k"),
        F.col("o_orderdate").alias("b_s"),
        (F.col("o_orderdate") + day14).alias("b_e"),
    )
    out = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket="7 days", keys=("k",)
    )
    return out.select(
        F.col("a_id").cast("bigint").alias("a_id"),
        F.col("b_id").cast("bigint").alias("b_id"),
        F.col("k").cast("bigint").alias("k"),
        "overlap_us",
    )


# ---------------------------------------------------------------------------
# exact-geometry geofence (P6's convex upgrade)
# ---------------------------------------------------------------------------

_PENTAGON = [(1.0, 1.0), (9.0, 1.0), (9.5, 6.0), (5.0, 9.5), (1.0, 6.0)]


def _pentagon_sql(x: str, y: str) -> str:
    conds = []
    n = len(_PENTAGON)
    for i in range(n):
        ax, ay = _PENTAGON[i]
        bx, by = _PENTAGON[(i + 1) % n]
        conds.append(
            f"(({bx!r} - {ax!r}) * ({y} - {ay!r})"
            f" - ({by!r} - {ay!r}) * ({x} - {ax!r})) >= 0"
        )
    return " AND ".join(conds)


@_register(
    "p10_convex_geofence",
    f"""
    WITH pts AS (
      SELECT l_returnflag,
             (l_partkey % 100) / 10.0 AS x,
             (l_suppkey % 100) / 10.0 AS y
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_pentagon_sql('x', 'y')} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inside
    FROM pts GROUP BY l_returnflag
    """,
)
def p10_convex_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact convex-polygon geofence (functions/geo.
    point_in_convex_polygon): the CCW cross-product AND-fold as pure
    codegen'd column arithmetic — P6's bounding box upgraded to real
    geometry, identical IEEE sign tests in both engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        ((F.col("l_partkey") % 100) / 10.0).alias("x"),
        ((F.col("l_suppkey") % 100) / 10.0).alias("y"),
    )
    inside = point_in_convex_polygon(F.col("x"), F.col("y"), _PENTAGON)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(inside, 1).otherwise(0)).cast("bigint").alias("n_inside"),
    )


# ---------------------------------------------------------------------------
# HLL audience intersection
# ---------------------------------------------------------------------------


def _hll_half_sql(name: str, parity: int) -> str:
    return f"""
    h{name} AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events WHERE event_id % 2 = {parity}
    ),
    p{name} AS (
      SELECT event_type, substring(hx, 1, 2) AS bucket,
             substring(hx, 3, 12) AS tail
      FROM h{name}
    ),
    r{name} AS (
      SELECT event_type, bucket,
             CAST(max({hll_rank_expr('tail', 12)}) AS INTEGER) AS max_rank
      FROM p{name} GROUP BY event_type, bucket
    )"""


def _hll_est_sql(reg: str) -> str:
    numer = HLL_ALPHA_BY_PHEX[2] * 256.0 * 256.0 * float(2**49)
    return f"""
      SELECT event_type,
             {numer!r} / CAST(
               CAST(sum(CAST(1 AS BIGINT) << (49 - max_rank)) AS BIGINT)
               + (256 - count(*)) * (CAST(1 AS BIGINT) << 49) AS DOUBLE)
               AS est
      FROM {reg} GROUP BY event_type"""


@_register(
    "sk_hll_intersect",
    f"""
    WITH {_hll_half_sql('a', 0)},
    {_hll_half_sql('b', 1)},
    ru AS (
      SELECT event_type, bucket, CAST(max(max_rank) AS INTEGER) AS max_rank
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
      GROUP BY event_type, bucket
    ),
    ea AS ({_hll_est_sql('ra')}),
    eb AS ({_hll_est_sql('rb')}),
    eu AS ({_hll_est_sql('ru')})
    SELECT ea.event_type, ea.est AS est_a, eb.est AS est_b,
           eu.est AS est_union,
           greatest(ea.est + eb.est - eu.est, 0.0) AS est_intersect
    FROM ea JOIN eb ON ea.event_type = eb.event_type
           JOIN eu ON ea.event_type = eu.event_type
    """,
)
def sk_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via HLL inclusion-exclusion (operators/hll.
    hll_intersect_estimate): the even/odd event halves' distinct
    users per event_type compared without any row-level join — two
    register tables + one cell-wise max merge; all sums exact BIGINT
    units, one division per estimate."""
    ev = _events(spark, sf_dir).select("event_type", "user_id", "event_id")
    a = hll_sketch(
        ev.where(F.col("event_id") % 2 == 0), ["event_type"], "user_id"
    )
    b = hll_sketch(
        ev.where(F.col("event_id") % 2 == 1), ["event_type"], "user_id"
    )
    return hll_intersect_estimate(a, b, ["event_type"])


# ---------------------------------------------------------------------------
# model-evaluation readouts (deterministic synthetic scorer: the
# readouts are the operators under test, not the scorer)
# ---------------------------------------------------------------------------

_SCORED_SQL = """
    s AS (
      SELECT (o_orderkey % 1000) / 1000.0 AS score,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    )
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        ((F.col("o_orderkey") % 1000) / 1000.0).alias("score"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )


@_register(
    "qc_classification_report",
    f"""
    WITH {_SCORED_SQL},
    t(threshold) AS (VALUES (0.1), (0.3), (0.5), (0.7), (0.9)),
    cm AS (
      SELECT threshold,
             CAST(sum(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN score >= threshold AND y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN score < threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN score < threshold AND y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM s CROSS JOIN t GROUP BY threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
             AS recall,
           CASE WHEN tp + fp + fn + tn > 0
                THEN CAST(tp + tn AS DOUBLE)
                     / CAST(tp + fp + fn + tn AS DOUBLE) END AS accuracy
    FROM cm
    """,
)
def qc_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep confusion readout (operators/classifier.
    binary_classification_report): one aggregation pass, plan-time
    threshold literals, exact BIGINT counts + single-division
    ratios."""
    return binary_classification_report(_scored(spark, sf_dir))


@_register(
    "qc_calibration_table",
    f"""
    WITH {_SCORED_SQL},
    agg AS (
      SELECT least(CAST(floor(score * 10) AS INTEGER), 9) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS score_sum_micro,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM s GROUP BY 1
    )
    SELECT bucket, n, n_pos,
           CAST(score_sum_micro AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             AS mean_score,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
    FROM agg
    """,
)
def qc_calibration_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data (operators/classifier.
    calibration_table): fixed equal-width score deciles (no quantile
    pass), mean predicted score vs observed positive rate from exact
    micro-unit sums."""
    return calibration_table(_scored(spark, sf_dir))


@_register(
    "qc_pairwise_correlation",
    """
    WITH w AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    agg AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM w GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS r
    FROM agg
    """,
)
def qc_pairwise_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation (operators/drift.
    pairwise_correlation) of quantity vs discount: five exact BIGINT
    sufficient statistics, one fixed √-and-÷ tree — engine- and
    partitioning-reproducible."""
    li = _t(spark, sf_dir, "lineitem")
    return pairwise_correlation(
        li, ["l_returnflag"], "l_quantity", "l_discount"
    )
