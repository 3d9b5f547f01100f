"""Catalog wave 34 (round 6): multi-episode funnels, deterministic
reservoir sampling, Benford profiling, odds-ratio target encoding,
LSH parameter calibration, and a salted-skew-join demonstration.

Every oracle here follows the cross-engine determinism house rules:
integer micro-units or exact double multiply chains instead of libm
calls (pow/log differ by ulps between the JVM and DuckDB), md5 for
portable deterministic ordering, and chained MATERIALIZED CTEs for
the bounded unrolls.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _events, _msum2_sql, _register, _t

# ------------------------------------------------------------------ #
# fn_funnel_episodes — bounded multi-episode funnel (batch twin of   #
# streaming/funnel_stream.stateful_funnel's per-episode emission)    #
# ------------------------------------------------------------------ #

_EP_W = 259200.0  # 3 days, same window as fn_funnel_steps
_EP_MAX = 4

_EP_W_US = int(_EP_W * 1_000_000)

_EP_SEEDS_SQL = "\n".join(
    f"""e{e} AS MATERIALIZED (
  SELECT s1.user_id, min(s1.ts) AS t1
  FROM s1 JOIN e{e - 1} USING (user_id)
  WHERE epoch_us(s1.ts) - epoch_us(e{e - 1}.t1) > {_EP_W_US}
  GROUP BY s1.user_id
),"""
    for e in range(2, _EP_MAX + 1)
)
_EP_UNION_SQL = "\nUNION ALL ".join(
    f"SELECT user_id, {e} AS episode, t1 FROM e{e}"
    for e in range(1, _EP_MAX + 1)
)

_FN_EPISODES_ORACLE = f"""
WITH s1 AS MATERIALIZED (
  SELECT user_id, ts FROM events WHERE event_type = 'signup'
),
e1 AS MATERIALIZED (
  SELECT user_id, min(ts) AS t1 FROM s1 GROUP BY user_id
),
{_EP_SEEDS_SQL}
seeds AS ({_EP_UNION_SQL}),
c2 AS (
  SELECT s.user_id, s.episode, s.t1,
         min(CASE WHEN e.ts >= s.t1
                   AND epoch_us(e.ts) - epoch_us(s.t1) <= {_EP_W_US}
                  THEN e.ts END) AS t2
  FROM seeds s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'click'
  GROUP BY s.user_id, s.episode, s.t1
),
c3 AS (
  SELECT c.user_id, c.episode, c.t1, c.t2,
         min(CASE WHEN e.ts >= c.t2
                   AND epoch_us(e.ts) - epoch_us(c.t1) <= {_EP_W_US}
                  THEN e.ts END) AS t3
  FROM c2 c LEFT JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
  GROUP BY c.user_id, c.episode, c.t1, c.t2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(episode AS INT) AS episode,
       epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us, epoch_us(t3) AS t3_us
FROM c3
"""


@_register("fn_funnel_episodes", _FN_EPISODES_ORACLE)
def fn_funnel_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-episode funnel (operators/funnel.funnel_episodes): one
    row per greedy signup→click→purchase EPISODE — episode e+1 opens
    at the earliest signup strictly beyond episode e's 3-day window.
    Bounded unroll (4 episodes) keeps both the Spark plan and the
    oracle a fixed chain of user-keyed join+agg stages; the streaming
    operator (funnel_stream.stateful_funnel) emits the same rows
    incrementally — its batch twin, differential-tested in
    tests/test_streaming_funnel.py."""
    from ..operators.funnel import funnel_episodes

    ev = _events(spark, sf_dir)
    out = funnel_episodes(
        ev,
        ["signup", "click", "purchase"],
        within_seconds=_EP_W,
        max_episodes=_EP_MAX,
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("episode").cast("int").alias("episode"),
        F.unix_micros("t1").alias("t1_us"),
        F.unix_micros("t2").alias("t2_us"),
        F.unix_micros("t3").alias("t3_us"),
    )


# ------------------------------------------------------------------ #
# emb_matryoshka_topk / _recall — prefix-truncated (MRL-style)       #
# embedding search quality                                           #
# ------------------------------------------------------------------ #

_MRL_DIM = 32  # half of the 64-dim corpus


@_register(
    "emb_matryoshka_topk",
    f"""
    SELECT CAST(q.vec_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS vec_id,
           CAST(round(list_cosine_similarity(
                  (CAST(q.embedding AS DOUBLE[]))[1:{_MRL_DIM}],
                  (CAST(c.embedding AS DOUBLE[]))[1:{_MRL_DIM}]), 4)
                AS DOUBLE) AS sim,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                        (CAST(q.embedding AS DOUBLE[]))[1:{_MRL_DIM}],
                        (CAST(c.embedding AS DOUBLE[]))[1:{_MRL_DIM}]) DESC,
                      c.vec_id) AS INT) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
    QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(
                 (CAST(q.embedding AS DOUBLE[]))[1:{_MRL_DIM}],
                 (CAST(c.embedding AS DOUBLE[]))[1:{_MRL_DIM}]) DESC,
               c.vec_id) <= 5
    """,
)
def emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated search: brute-force cosine top-k
    over the FIRST 32 of 64 dims. At serving scale a prefix
    truncation halves vector bytes moved/compared before a full-dim
    rerank — this query is the truncated stage, and its recall vs
    the full-dim baseline is the quality gate (emb_matryoshka_recall).
    Same plan as emb_cosine_topk on F.slice'd arrays: the slice is a
    JVM-side expression, so the scan still prunes to one column."""
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(queries, emb, k=5)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def _register_matryoshka_recall() -> None:
    from .catalog import QUERIES
    from .catalog8 import _recall_sql, _topk_recall

    sql = _recall_sql(
        QUERIES["emb_cosine_topk"]["oracle"],
        QUERIES["emb_matryoshka_topk"]["oracle"],
    )

    @_register("emb_matryoshka_recall", sql)
    def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """recall@5 of 32-dim prefix-truncated cosine search vs the
        full 64-dim baseline — the measured quality cost of halving
        vector bytes at the candidate-generation stage."""
        return _topk_recall(spark, sf_dir, "emb_matryoshka_topk")


_register_matryoshka_recall()


# ------------------------------------------------------------------ #
# smp_reservoir_per_group — deterministic bottom-k (KMV) reservoir   #
# ------------------------------------------------------------------ #


@_register(
    "smp_reservoir_per_group",
    """
    SELECT o_orderpriority,
           CAST(sample_rank AS INT) AS sample_rank,
           CAST(o_orderkey AS BIGINT) AS o_orderkey
    FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS sample_rank
      FROM orders
    )
    WHERE sample_rank <= 5
    """,
)
def smp_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir (operators/sampling.py
    reservoir_sample): the 5 orders with the smallest md5(key) per
    priority class — a uniform sample that is reproducible across
    engines/partitionings and MERGEABLE across shards (bottom-k of a
    union = bottom-k of shard bottom-k's), unlike RNG reservoirs."""
    from ..operators.sampling import reservoir_sample

    orders = _t(spark, sf_dir, "orders")
    out = reservoir_sample(
        orders, ["o_orderpriority"], k=5, key_col="o_orderkey"
    )
    return out.select(
        "o_orderpriority",
        F.col("sample_rank").cast("int").alias("sample_rank"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
    )


# ------------------------------------------------------------------ #
# qc_benford_first_digit — fabricated-data / unit-mixup screen       #
# ------------------------------------------------------------------ #


def _benford_case_sql() -> str:
    from ..operators.profile import BENFORD_MICRO

    arms = " ".join(
        f"WHEN '{d}' THEN {micro}" for d, micro in BENFORD_MICRO.items()
    )
    return f"CASE first_digit {arms} END"


@_register(
    "qc_benford_first_digit",
    f"""
    WITH base AS (
      SELECT CAST(floor(l_extendedprice) AS BIGINT) AS iv
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    cnt AS (
      SELECT substr(CAST(iv AS VARCHAR), 1, 1) AS first_digit,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS HUGEINT) AS t FROM cnt)
    SELECT first_digit, n,
           CAST((CAST(n AS HUGEINT) * 1000000) // t AS BIGINT)
             AS share_micro,
           CAST({_benford_case_sql()} AS BIGINT) AS benford_micro
    FROM cnt, tot
    """,
)
def qc_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of l_extendedprice vs
    Benford's law (operators/profile.benford_first_digit) — the
    classic fabricated-data screen. Shares and expectations in
    integer micro-units; the ln(1+1/d) expectations are injected as
    the SAME precomputed constants on both engines (no cross-engine
    libm log)."""
    from ..operators.profile import benford_first_digit

    return benford_first_digit(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


# ------------------------------------------------------------------ #
# enc_woe_odds — weight-of-evidence-style odds encoding              #
# ------------------------------------------------------------------ #


@_register(
    "enc_woe_odds",
    """
    WITH per_key AS (
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS g,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                  AS BIGINT) AS b
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT CAST(sum(g + 1) AS BIGINT) AS gt,
             CAST(sum(b + 1) AS BIGINT) AS bt
      FROM per_key
    )
    SELECT o_orderpriority,
           CAST(g + b AS BIGINT) AS n,
           g AS n_good,
           CAST((CAST(g + 1 AS HUGEINT) * bt * 1000000)
                // (CAST(b + 1 AS HUGEINT) * gt) AS BIGINT)
             AS odds_micro
    FROM per_key, tot
    """,
)
def enc_woe_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence-style categorical encoding in EXACT integer
    arithmetic (operators/encode.woe_odds_encode): per priority
    class, the Laplace-smoothed odds ratio of o_orderstatus = 'F' in
    micro-units — exp(WOE) fixed-point, no cross-engine libm log.
    Complements enc_target_loo as the second feature-engineering
    encoder."""
    from ..operators.encode import woe_odds_encode

    orders = _t(spark, sf_dir, "orders").withColumn(
        "__target", (F.col("o_orderstatus") == "F").cast("int")
    )
    return woe_odds_encode(orders, "o_orderpriority", "__target")


# ------------------------------------------------------------------ #
# dd_lsh_calibration — the banding S-curve as a planning table       #
# ------------------------------------------------------------------ #


@_register(
    "dd_lsh_calibration",
    """
    WITH g AS (SELECT CAST(x AS INT) AS s_pct FROM range(5, 100, 5) t(x)),
    c AS (SELECT s_pct, s_pct / 100.0 AS s FROM g)
    SELECT s_pct,
           CAST(4 AS INT) AS bands,
           CAST(2 AS INT) AS rows_per_band,
           CAST(floor(
             (1 - ((1 - s*s) * (1 - s*s)) * ((1 - s*s) * (1 - s*s)))
             * 1000000 + 0.5) AS BIGINT) AS p_candidate_micro
    FROM c
    """,
)
def dd_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH S-curve P(candidate | jaccard = s) for the
    engine's own banding defaults (4 bands x 2 rows — the
    dd_minhash_lsh_pairs scheme), on a 5%-step similarity grid
    (operators/dedup.lsh_calibration). The pre-flight table that
    says which similarity range a banding recalls BEFORE committing
    it to a 100 TB corpus. Powers are explicit square-and-multiply
    chains — bit-identical across engines, no pow()."""
    from ..operators.dedup import lsh_calibration

    return lsh_calibration(spark, bands=4, rows_per_band=2)


# ------------------------------------------------------------------ #
# j20_salted_skew_join — proactive skew-spreading equi join          #
# ------------------------------------------------------------------ #


@_register(
    "j20_salted_skew_join",
    f"""
    SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           {_msum2_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def j20_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi join (operators/skew.salted_join): the dim side
    replicated once per salt bucket, each fact row assigned ONE
    deterministic salt — a hot supplier's rows spread over 8 reducers
    instead of one straggler. The oracle is the PLAIN join (salting
    must be semantics-free); revenue in the exact integer
    ten-thousandths idiom."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(li, supp, "s_suppkey", salt_buckets=8)
    from .catalog import _msum2

    return joined.groupBy(
        F.col("s_nationkey").cast("bigint").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        _msum2(F.col("__rev")).alias("revenue"),
    )


# ------------------------------------------------------------------ #
# mm_audio_silence — voice-activity-style run segmentation over      #
# real WAV decode                                                    #
# ------------------------------------------------------------------ #


@_register(
    "mm_audio_silence",
    """
    WITH ids AS (
      SELECT CAST(event_id AS BIGINT) AS m FROM events WHERE event_id < 200
    ),
    sized AS (SELECT m, 800 + (m % 5) * 80 AS nf FROM ids),
    s AS (SELECT m, unnest(range(0, nf)) AS i FROM sized),
    q AS (
      SELECT m, i FROM s
      WHERE abs((m * 7 + i * 13) % 2001 - 1000) <= 50
    ),
    r AS (
      SELECT m, i,
             i - row_number() OVER (PARTITION BY m ORDER BY i) AS grp
      FROM q
    ),
    agg AS (
      SELECT m, grp, min(i) AS start_frame, max(i) AS end_frame,
             count(*) AS n
      FROM r GROUP BY m, grp
    )
    SELECT CAST(m AS BIGINT) AS media_id,
           CAST(row_number() OVER (PARTITION BY m ORDER BY start_frame)
                AS BIGINT) AS run_idx,
           CAST(start_frame AS BIGINT) AS start_frame,
           CAST(end_frame AS BIGINT) AS end_frame,
           CAST(n AS BIGINT) AS n_frames
    FROM agg WHERE n >= 4
    """,
)
def mm_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run segmentation over REAL WAV decode
    (multimodal/audio_wav.detect_silence): maximal stretches of >= 4
    consecutive frames with |sample| <= 50, per file — the
    voice-activity gating primitive for audio curation. The corpus is
    the same closed-form PCM as mm_audio_wav (encoded through the
    genuine stdlib wave writer), so the oracle restates the runs with
    gaps-and-islands SQL over the sample formula."""
    from ..multimodal.audio_wav import detect_silence, synth_wav_corpus

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 200)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    return detect_silence(synth_wav_corpus(ids), threshold=50, min_run=4)


# ------------------------------------------------------------------ #
# w23_sliding_distinct_hll — sliding distinct via merged daily       #
# sketches (read data once; windows assembled from registers)        #
# ------------------------------------------------------------------ #


def _w23_oracle() -> str:
    from ..operators.hll import HLL_ALPHA_BY_PHEX
    from ..operators.hll import _rank_expr as rank_expr

    numer = HLL_ALPHA_BY_PHEX[2] * 256.0 * 256.0 * float(2**49)
    return f"""
    WITH h AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    parts AS (
      SELECT day, substring(hx, 1, 2) AS bucket,
             substring(hx, 3, 12) AS tail
      FROM h
    ),
    ranked AS (
      SELECT day, bucket, {rank_expr('tail', 12)} AS rank FROM parts
    ),
    daily AS (
      SELECT day, bucket, CAST(max(rank) AS INTEGER) AS max_rank
      FROM ranked GROUP BY day, bucket
    ),
    spread AS (
      SELECT d.day + CAST(t.x AS INTEGER) AS window_end, d.bucket, d.max_rank
      FROM daily d CROSS JOIN range(0, 7) t(x)
    ),
    merged AS (
      SELECT window_end, bucket, max(max_rank) AS max_rank
      FROM spread
      WHERE window_end <= (SELECT max(day) FROM daily)
      GROUP BY window_end, bucket
    ),
    sums AS (
      SELECT window_end,
             CAST(sum(CAST(1 AS BIGINT) << (49 - max_rank)) AS BIGINT)
               + (256 - count(*)) * (CAST(1 AS BIGINT) << 49) AS sum_units
      FROM merged GROUP BY window_end
    )
    SELECT strftime(window_end, '%Y-%m-%d') AS window_end,
           {numer!r} / CAST(sum_units AS DOUBLE) AS hll_est
    FROM sums
    """


@_register("w23_sliding_distinct_hll", _w23_oracle())
def w23_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users per day from MERGED DAILY HLL
    sketches (operators/hll.sliding_distinct_hll, the registered
    surface of windows.rolling_distinct_users_hll): events are read
    once into per-day register tables; each window is a register
    max-merge of 7 sketch tables (<= 256 rows each), never a rescan.
    The series runs from the first to the LAST OBSERVED day —
    interior days with no events of their own are included while
    their window still covers some activity (gaps >= the window
    length produce no rows, like the exact rolling form), and
    trailing projections past the last day are not emitted.
    The exact sliding countDistinct re-shuffles the fact table per
    window — this is the 100 TB form, and the estimator keeps the
    engine's BIGINT-exact unit summation so even the float estimate
    hash-matches."""
    from ..operators.hll import sliding_distinct_hll

    ev = _events(spark, sf_dir).select("ts", "user_id")
    return sliding_distinct_hll(ev, "ts", "user_id", window_days=7)


# ------------------------------------------------------------------ #
# emb_pq_recall — the missing recall telemetry for the PQ/ADC path   #
# (LSH, IVF and matryoshka already have theirs)                      #
# ------------------------------------------------------------------ #


def _register_pq_recall() -> None:
    from .catalog import QUERIES
    from .catalog8 import _recall_sql, _topk_recall

    sql = _recall_sql(
        QUERIES["emb_cosine_topk"]["oracle"],
        QUERIES["emb_pq_adc_topk"]["oracle"],
    )

    @_register("emb_pq_recall", sql)
    def emb_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """recall@5 of PQ/ADC approximate search vs brute-force
        cosine. The corpus is unit-norm (checked: all L2 norms = 1 ±
        1e-7), so the ADC's L2 ordering and the baseline's cosine
        ordering rank identically and the recall is well-defined —
        quantization loss is the only thing measured."""
        return _topk_recall(spark, sf_dir, "emb_pq_adc_topk")


_register_pq_recall()


# ------------------------------------------------------------------ #
# dd_canonical_keep — quality-aware representative per dup cluster   #
# ------------------------------------------------------------------ #


def _dd_canonical_oracle() -> str:
    from .catalog_text import norm_sql

    return f"""
    WITH corpus AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      -- case-perturbed mirror: same normalized key, higher quality
      -- score, so the canonical policy must pick the mirror
      SELECT doc_id + 10000 AS doc_id, upper(text) AS text,
             lang, 'mirror' AS source, n_chars + 1 AS n_chars
      FROM documents WHERE doc_id % 3 = 0
    ),
    keyed AS (
      SELECT doc_id, lang, source, n_chars,
             md5({norm_sql()}) AS k
      FROM corpus
    ),
    ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY k
                                ORDER BY n_chars DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY k) AS dup_count
      FROM keyed
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(dup_count AS BIGINT) AS dup_count
    FROM ranked WHERE rk = 1
    """


@_register("dd_canonical_keep", _dd_canonical_oracle())
def dd_canonical_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup (operators/dedup.canonical_keep):
    one representative per normalized-text cluster chosen by
    (n_chars DESC, doc_id ASC) — keep the best-scored copy, shed the
    rest, carry the cluster size. The policy counterpart of
    dd_exact_groups' lowest-id rule; rank and cluster size share one
    window partitioning, so the whole operator is a single md5-key
    shuffle. A case-perturbed mirror of every third doc makes the
    clusters non-degenerate (the corpus itself has no exact dups)."""
    from ..operators.dedup import canonical_keep

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # the synthetic corpus has no exact duplicates, so the fixture
    # unions a case-perturbed mirror of every third doc (same
    # normalized key, quality score +1): the policy must keep the
    # mirror and report dup_count = 2 for those clusters
    mirrored = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.upper("text").alias("text"),
        "lang",
        F.lit("mirror").alias("source"),
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    out = canonical_keep(docs.unionByName(mirrored), quality_col="n_chars")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "dup_count",
    )


# ------------------------------------------------------------------ #
# fn_funnel_episode_summary — conversion by episode index            #
# ------------------------------------------------------------------ #


@_register(
    "fn_funnel_episode_summary",
    f"""
    SELECT episode,
           CAST(count(*) AS BIGINT) AS n_opened,
           CAST(count(t2_us) AS BIGINT) AS n_step2,
           CAST(count(t3_us) AS BIGINT) AS n_completed,
           CAST((count(t3_us) * 10000) // count(*) AS BIGINT)
             AS completion_bp
    FROM ({_FN_EPISODES_ORACLE}) GROUP BY episode
    """,
)
def fn_funnel_episode_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion by EPISODE INDEX: of the users opening their e-th
    funnel episode, how many reach each step — the re-engagement
    question (does conversion decay or recover on later attempts?)
    that the single-funnel summary cannot answer. Rolls the
    user-grain episode frame (already dimension-sized) to a
    max_episodes-row table; completion in integer basis points."""
    from ..operators.funnel import funnel_episodes

    ev = _events(spark, sf_dir)
    eps = funnel_episodes(
        ev,
        ["signup", "click", "purchase"],
        within_seconds=_EP_W,
        max_episodes=_EP_MAX,
    )
    return eps.groupBy(F.col("episode").cast("int").alias("episode")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_opened"),
        F.count("t2").cast("bigint").alias("n_step2"),
        F.count("t3").cast("bigint").alias("n_completed"),
        F.expr("(count(t3) * 10000) div count(1)")
        .cast("bigint")
        .alias("completion_bp"),
    )


# ------------------------------------------------------------------ #
# s18_jsonl_quarantine — malformed-line routing for JSONL ingest     #
# ------------------------------------------------------------------ #

_DIRTY_JSONL = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "tests",
    "fixtures",
    "dirty_events.jsonl",
)
_DIRTY_JSONL_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, amount DOUBLE, note STRING"
)


def _dirty_jsonl_split(spark: SparkSession):
    from ..sources.quarantine import read_jsonl_with_quarantine

    return read_jsonl_with_quarantine(
        spark, _DIRTY_JSONL, _DIRTY_JSONL_SCHEMA
    )


@_register(
    "s18_jsonl_quarantine",
    """
    SELECT * FROM (VALUES
      (CAST(2 AS BIGINT), CAST(11 AS BIGINT), CAST(NULL AS DOUBLE),
       'bad-amount',
       '{"event_id": 2, "user_id": 11, "amount": "oops", "note": "bad-amount"}'),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR),
       '{"event_id": 4, "user_id": 13, "amount": 2.00, "note": "ok2"'),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), 'not json at all'),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), '[1, 2, 3]'),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), 'null'),
      (CAST(NULL AS BIGINT), CAST(14 AS BIGINT), CAST(3.0 AS DOUBLE),
       'bad-id',
       '{"event_id": "five", "user_id": 14, "amount": 3.00, "note": "bad-id"}')
    ) AS t(event_id, user_id, amount, note, raw_record)
    """,
)
def s18_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL bad-record quarantine (sources/quarantine.
    read_jsonl_with_quarantine): PERMISSIVE from_json over a text
    scan routes the committed dirty fixture's malformed lines — type
    mismatch WITH partial parse, truncated document, non-JSON text,
    top-level array, literal JSON null — to the side table with raw
    text; a MISSING
    field stays clean (absence is legal JSON). The oracle restates
    the expected quarantine verbatim, pinning those semantics."""
    _, quar = _dirty_jsonl_split(spark)
    return quar.select(
        "event_id", "user_id", "amount", "note", "raw_record"
    )


@_register(
    "s18_jsonl_quarantine_clean",
    """
    SELECT CAST(3 AS BIGINT) AS n_clean,
           CAST(11 AS BIGINT) AS sum_event_id,
           CAST(1150 AS BIGINT) AS sum_amount_cents,
           CAST(1 AS BIGINT) AS n_missing_note
    """,
)
def s18_jsonl_quarantine_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clean side of the same scan: exact-cents checksum proving
    no good line leaked into quarantine and no bad line leaked out,
    plus the count of legally-absent fields (missing != malformed)."""
    clean, _ = _dirty_jsonl_split(spark)
    return clean.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clean"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.sum(F.floor(F.col("amount") * 100 + 0.5))
        .cast("bigint")
        .alias("sum_amount_cents"),
        F.count(F.when(F.col("note").isNull(), 1))
        .cast("bigint")
        .alias("n_missing_note"),
    )
