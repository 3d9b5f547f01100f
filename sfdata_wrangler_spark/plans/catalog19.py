"""Catalog wave 19 (round 4): fact-scale as-of join.

``operators/asof.py`` is the union+window as-of join — one hash
shuffle, no broadcast — for when BOTH sides are fact-sized (the
broadcast range join in operators/interval_lookup.py covers the
dim-sized case, ref SFMuniDataHelper.py:587). DuckDB's native
``ASOF LEFT JOIN`` is the oracle, making this one of the few
operators whose cross-engine check exercises a dedicated physical
operator on the oracle side too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.sketch import cms_build, cms_estimate, cms_heavy_hitters
from .catalog import _events, _register, _t
from .catalog_text import norm_sql

_NORM = norm_sql()

_J13_ORACLE = """
SELECT l.event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       epoch_us(l.ts) AS ts_us,
       epoch_us(r.ts) AS purchase_ts_us,
       r.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@_register("j13_asof_join", _J13_ORACLE, bench=True)
def j13_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's most recent prior (or
    simultaneous) purchase. Spark side: tagged union + one window
    pass per user (operators/asof.asof_join) — one shuffle on
    user_id; DuckDB side: its native ASOF LEFT JOIN. Timestamps
    leave as epoch micros; the carried value is the raw parquet
    double (no arithmetic) — both hash-exact by construction."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="ts",
        value_cols=["value"],
        tiebreak="value",
    )
    return out.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_asof").alias("purchase_ts_us"),
        F.col("value_asof").alias("purchase_value"),
    )


_J14_ORACLE = """
SELECT l.event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       epoch_us(l.ts) AS ts_us,
       CASE WHEN epoch(l.ts) - epoch(r.ts) > 604800.0
            THEN NULL ELSE epoch_us(r.ts) END AS signup_ts_us,
       CASE WHEN epoch(l.ts) - epoch(r.ts) > 604800.0
            THEN NULL ELSE r.value END AS signup_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@_register("j14_asof_tolerance", _J14_ORACLE)
def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof
    semantics): matches older than 7 days null out. Both engines
    compare the identical IEEE epoch-second doubles, so the
    tolerance boundary cannot flip between them."""
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        errors,
        signups,
        on=["user_id"],
        ts="ts",
        value_cols=["value"],
        tiebreak="value",
        tolerance=604800.0,
    )
    return out.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_asof").alias("signup_ts_us"),
        F.col("value_asof").alias("signup_value"),
    )


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")


_CMS_DEPTH, _CMS_W = 4, 1

_SK1_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
), t AS (SELECT tok FROM toks WHERE tok <> '')
SELECT s.seed,
       substring(md5(CAST(s.seed AS VARCHAR) || '|' || t.tok), 1, {_CMS_W})
         AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM t, (SELECT unnest([0, 1, 2, 3]) AS seed) s
GROUP BY 1, 2
"""


@_register("sk_cms_counters", _SK1_ORACLE)
def sk_cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min counter matrix itself (operators/sketch.py):
    depth 4 × 16 string-hex buckets over the corpus token stream.
    Mergeable by construction — the shuffle carries at most 64 cells
    per partition no matter the corpus size."""
    toks = _doc_tokens(spark, sf_dir)
    return cms_build(toks, "tok", depth=_CMS_DEPTH, width_hex=_CMS_W).select(
        F.col("seed").cast("int").alias("seed"), "bucket", "cnt"
    )


_SK2_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents
), t AS (SELECT tok FROM toks WHERE tok <> ''),
cms AS (
  SELECT s.seed,
         substring(md5(CAST(s.seed AS VARCHAR) || '|' || t.tok), 1, {_CMS_W})
           AS bucket,
         count(*) AS cnt
  FROM t, (SELECT unnest([0, 1, 2, 3]) AS seed) s
  GROUP BY 1, 2
),
est AS (
  SELECT c.tok, min(m.cnt) AS cms_est
  FROM (SELECT DISTINCT tok FROM t) c,
       (SELECT unnest([0, 1, 2, 3]) AS seed) s
  JOIN cms m
    ON m.seed = s.seed
   AND m.bucket = substring(md5(CAST(s.seed AS VARCHAR) || '|' || c.tok),
                            1, {_CMS_W})
  GROUP BY c.tok
),
exact AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
SELECT e.tok, CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(x.n AS BIGINT) AS true_n
FROM est e JOIN exact x ON e.tok = x.tok
WHERE e.cms_est >= 900
"""


@_register("sk_cms_heavy_hitters", _SK2_ORACLE)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS heavy hitters with the exact count joined alongside: the
    one-sided guarantee on display (cms_est >= true_n always; 16
    buckets force visible collisions at this vocab). The candidate
    probe joins the BROADCAST 64-cell sketch — the corpus shuffles
    once for the sketch, once for the distinct candidates, never
    pairwise."""
    toks = _doc_tokens(spark, sf_dir)
    hh = cms_heavy_hitters(
        toks, "tok", threshold=900, depth=_CMS_DEPTH, width_hex=_CMS_W
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    return hh.join(exact, "tok").select(
        "tok", F.col("cms_est").cast("bigint").alias("cms_est"), "true_n"
    )


_SPAN_K = 8

_DD_SPANS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents
),
lst AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(tk) - {_SPAN_K - 1}, 0) + 1),
           i -> struct_pack(pos := i - 1,
                            gh := md5(array_to_string(
                                    list_slice(tk, i, i + {_SPAN_K - 1}),
                                    ' ')))) AS l
  FROM toks
),
grams AS (SELECT doc_id, u.pos AS pos, u.gh AS gh
          FROM (SELECT doc_id, unnest(l) AS u FROM lst)),
dup AS (SELECT gh FROM grams GROUP BY gh
        HAVING count(DISTINCT doc_id) >= 2),
flagged AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (gh)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM flagged
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, island
"""


@_register("dd_dup_spans", _DD_SPANS_ORACLE, bench=True)
def dd_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans
    (operators/spandedup.py — the Lee-et-al substring-dedup shape as
    a k-gram inverted index + gaps-and-islands, no suffix array).
    Shuffles carry 32-byte gram hashes and (id, pos) pairs only."""
    from ..operators.spandedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    out = duplicate_spans(docs, k=_SPAN_K, min_docs=2)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
    )


_DD_SCRUB_ORACLE = f"""
WITH toks0 AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents
),
lst AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(tk) - {_SPAN_K - 1}, 0) + 1),
           i -> struct_pack(pos := i - 1,
                            gh := md5(array_to_string(
                                    list_slice(tk, i, i + {_SPAN_K - 1}),
                                    ' ')))) AS l
  FROM toks0
),
grams AS (SELECT doc_id, u.pos AS pos, u.gh AS gh
          FROM (SELECT doc_id, unnest(l) AS u FROM lst)),
dup AS (SELECT gh FROM grams GROUP BY gh
        HAVING count(DISTINCT doc_id) >= 2),
flagged AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (gh)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_K - 1} AS e
  FROM isl GROUP BY doc_id, island
),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS pos FROM spans
),
tokpos AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(tk) + 1),
                 i -> struct_pack(pos := i - 1, tok := tk[i]))) AS u
        FROM toks0)
  WHERE u.tok <> ''
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tokpos t
  ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       md5(coalesce(r.clean_text, '')) AS clean_md5,
       CAST(coalesce(len(string_split(r.clean_text, ' ')), 0) AS BIGINT)
         AS n_tokens
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


@_register("dd_span_scrub", _DD_SCRUB_ORACLE)
def dd_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-scrubbed corpus, reconstruction md5-checked end-to-end:
    covered positions leave via one anti join, the survivors
    reassemble per-doc with array_sort(collect_list(struct)) — no
    global sort anywhere. Docs fully covered (or untouched) both
    round-trip: the check is total over the corpus."""
    from ..operators.spandedup import remove_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs, k=_SPAN_K, min_docs=2)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5("clean_text").alias("clean_md5"),
        F.when(F.col("clean_text") == "", F.lit(0))
        .otherwise(F.size(F.split("clean_text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )


_DSIR_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, substring(md5(tok), 1, 2) AS bucket
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
        FROM documents)
  WHERE tok <> ''
),
tocc AS (
  SELECT doc_id, substring(md5(tok), 1, 2) AS bucket
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
        FROM documents WHERE lang = 'en')
  WHERE tok <> ''
),
p AS (SELECT bucket, count(*) AS p_cnt FROM tocc GROUP BY bucket),
q AS (SELECT bucket, count(*) AS q_cnt FROM occ GROUP BY bucket),
model AS (
  SELECT q.bucket,
         CAST(floor(
           ((CAST(coalesce(p.p_cnt, 0) + 1 AS DOUBLE)
             / CAST((SELECT sum(p_cnt) FROM p) + 256 AS DOUBLE))
            / (CAST(q.q_cnt + 1 AS DOUBLE)
               / CAST((SELECT sum(q_cnt) FROM q) + 256 AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT) AS ratio_micro
  FROM q LEFT JOIN p ON q.bucket = p.bucket
)
SELECT CAST(o.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_toks,
       CAST(sum(m.ratio_micro) AS BIGINT) AS sum_ratio_micro,
       CAST(sum(m.ratio_micro) // count(*) AS BIGINT) AS mean_ratio_micro
FROM occ o JOIN model m ON o.bucket = m.bucket
GROUP BY o.doc_id
"""


@_register("txt_dsir_weights", _DSIR_ORACLE)
def txt_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/dsir.py): every document
    scored by the mean per-token target/raw hashed-bucket
    probability ratio (target = the English slice). Two <=256-row
    models broadcast into one scoring pass; integer micro-unit
    ratios make the sums order-free."""
    from ..operators.dsir import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    out = dsir_weights(docs, target)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_toks",
        "sum_ratio_micro",
        "mean_ratio_micro",
    )


_DSIR_SEL_ORACLE = _DSIR_ORACLE.replace(
    "GROUP BY o.doc_id",
    "GROUP BY o.doc_id HAVING sum(m.ratio_micro) // count(*) >= 1000000",
)


@_register("txt_dsir_select", _DSIR_SEL_ORACLE)
def txt_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: keep documents at least as likely under the
    target model as under the raw model (threshold 1.0 in micro
    units) — a pure filter over the scored table, no global sort, no
    sampler state."""
    from ..operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    out = dsir_select(docs, target, threshold_micro=1_000_000)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_toks",
        "sum_ratio_micro",
        "mean_ratio_micro",
    )


_PQ_LF = """
  SELECT vec_id,
         CAST(((i - 1) // 8) AS INT) AS subspace,
         CAST(((i - 1) % 8) AS INT) AS dim,
         CAST(floor(CAST(u AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS x_micro
  FROM (SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS u
        FROM embeddings)
"""

_PQ_CB = f"""
lf AS ({_PQ_LF}),
cb AS (
  SELECT e.label AS code, l.subspace, l.dim,
         sum(l.x_micro) // count(*) AS c_micro
  FROM lf l JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2, 3
),
enc0 AS (
  SELECT l.vec_id, l.subspace, c.code,
         sum((l.x_micro - c.c_micro) * (l.x_micro - c.c_micro)) AS d2
  FROM lf l JOIN cb c ON l.subspace = c.subspace AND l.dim = c.dim
  GROUP BY 1, 2, 3
),
enc AS (
  SELECT vec_id, subspace, code
  FROM (SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2, code) AS rn
        FROM enc0)
  WHERE rn = 1
)
"""

_PQ_CODES_ORACLE = f"""
WITH {_PQ_CB}
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(subspace AS INT) AS subspace,
       CAST(code AS INT) AS code
FROM enc
"""


@_register("emb_pq_codes", _PQ_CODES_ORACLE)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (operators/pq.py): 64-dim vectors
    → 8 subspace codes against label-mean codebooks, ALL distance
    arithmetic in exact BIGINT micro-units (no IEEE analysis needed
    anywhere). One corpus pass against the broadcast codebook."""
    from ..operators.pq import pq_codebooks, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb)
    return pq_encode(emb, cb).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )


_PQ_ADC_ORACLE = f"""
WITH {_PQ_CB},
qlf AS (
  SELECT vec_id AS query_id, subspace, dim, x_micro
  FROM lf WHERE vec_id < 3
),
lut AS (
  SELECT q.query_id, q.subspace, c.code,
         sum((q.x_micro - c.c_micro) * (q.x_micro - c.c_micro)) AS lut_d2
  FROM qlf q JOIN cb c ON q.subspace = c.subspace AND q.dim = c.dim
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT l.query_id, e.vec_id, sum(l.lut_d2) AS adc_d2
  FROM enc e JOIN lut l ON e.subspace = l.subspace AND e.code = l.code
  GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adc_d2 AS BIGINT) AS adc_d2,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, adc_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_d2, vec_id) AS rank
      FROM scored WHERE query_id <> vec_id)
WHERE rank <= 5
"""


@_register("emb_pq_adc_topk", _PQ_ADC_ORACLE, bench=True)
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5 per query: the encoded corpus
    (8 integer codes per vector) joins the BROADCAST per-query
    distance LUT — the scan never touches original vectors, never
    shuffles pairwise. Exact BIGINT distances give a bitwise-stable
    ranking with (d2, vec_id) total order."""
    from ..operators.pq import pq_adc_topk, pq_codebooks, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb)
    enc = pq_encode(emb, cb)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_adc_topk(queries, enc, cb, k=5)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("adc_d2").cast("bigint").alias("adc_d2"),
        F.col("rank").cast("int").alias("rank"),
    )


_MM_IDS_SQL = """
ids AS (
  SELECT CAST(event_id AS BIGINT) AS m
  FROM events WHERE event_id < 200
),
dims AS (
  SELECT m, 24 + (m % 9) * 4 AS w, 18 + (m % 7) * 4 AS h FROM ids
)
"""


@_register(
    "mm_image_png",
    f"""
    WITH {_MM_IDS_SQL},
    px AS (
      SELECT m, w, h, x, unnest(range(0, h)) AS y
      FROM (SELECT m, w, h, unnest(range(0, w)) AS x FROM dims)
    )
    SELECT m AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(2 AS BIGINT) AS color_type,
           CAST(sum((m * 3 + x * 7 + y * 11) % 256) AS BIGINT) AS sum_r,
           CAST(sum((m * 5 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
           CAST(sum((m * 7 + x * 19 + y * 23) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY m, w, h
    """,
)
def mm_image_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode (multimodal/image_png.py): the
    closed-form pixel pattern encodes through a genuine PNG writer —
    zlib-deflated IDAT, per-chunk CRC-32, row filters cycling
    None/Sub/Up/Average/Paeth — and parses back byte-for-byte (CRCs
    verified, every unfilter branch exercised) in an Arrow-batched
    mapInPandas kernel. The oracle restates dims and exact channel
    sums in closed form; compressed size is deliberately not emitted
    (deflate output is implementation-defined)."""
    from ..multimodal.image_png import decode_png, synth_png_corpus

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 200)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    return decode_png(synth_png_corpus(ids))


_FUNNEL_CHAIN = """
s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, s1.t1, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t1
    AND epoch_us(e.ts) - epoch_us(s1.t1) <= 259200000000
  GROUP BY e.user_id, s1.t1
),
s3 AS (
  SELECT e.user_id, s2.t1, s2.t2, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    AND epoch_us(e.ts) - epoch_us(s2.t1) <= 259200000000
  GROUP BY e.user_id, s2.t1, s2.t2
),
chain AS (
  SELECT s1.user_id, s1.t1, s2.t2, s3.t3
  FROM s1
  LEFT JOIN s2 ON s1.user_id = s2.user_id
  LEFT JOIN s3 ON s1.user_id = s3.user_id
)
"""

_FN1_ORACLE = f"""
WITH {_FUNNEL_CHAIN}
SELECT CAST(user_id AS BIGINT) AS user_id,
       epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us, epoch_us(t3) AS t3_us
FROM chain
"""


@_register("fn_funnel_steps", _FN1_ORACLE)
def fn_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (operators/funnel.py): signup → click →
    purchase within 3 days of the signup, strictly ordered, earliest
    qualifying event per step. Each step is a user-keyed equi join
    over a SHRINKING filtered stream — the full per-user event
    history never materializes."""
    from ..operators.funnel import funnel_steps

    ev = _events(spark, sf_dir)
    out = funnel_steps(
        ev, ["signup", "click", "purchase"], within_seconds=259200.0
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("t1").alias("t1_us"),
        F.unix_micros("t2").alias("t2_us"),
        F.unix_micros("t3").alias("t3_us"),
    )


_FN2_ORACLE = f"""
WITH {_FUNNEL_CHAIN},
n AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM chain)
SELECT step, event_type, CAST(n_users AS BIGINT) AS n_users
FROM (
  SELECT 1 AS step, 'signup' AS event_type, n1 AS n_users FROM n
  UNION ALL SELECT 2, 'click', n2 FROM n
  UNION ALL SELECT 3, 'purchase', n3 FROM n
)
"""


@_register("fn_funnel_summary", _FN2_ORACLE)
def fn_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion counts per step — monotone non-increasing
    by construction (each step counts a subset of the previous)."""
    from ..operators.funnel import funnel_summary

    ev = _events(spark, sf_dir)
    return funnel_summary(
        ev, ["signup", "click", "purchase"], within_seconds=259200.0
    )


_FN3_ORACLE = """
WITH first AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort_day, a.act_day) AS INT) AS day_offset,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
FROM first f JOIN active a ON f.user_id = a.user_id
GROUP BY 1, 2
"""


@_register("fn_retention_cohorts", _FN3_ORACLE)
def fn_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle at day grain (the events table spans one
    month): first-activity cohort × days-since distinct active
    users. Both join sides are user-grain aggregates of the event
    stream, so the expensive table shuffles exactly twice regardless
    of event volume."""
    from ..operators.funnel import retention_cohorts

    ev = _events(spark, sf_dir)
    out = retention_cohorts(ev, period="day")
    return out.select(
        F.date_format("cohort_period", "yyyy-MM-dd").alias("cohort_day"),
        F.col("period_offset").cast("int").alias("day_offset"),
        "n_users",
    )


_FN4_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@_register("fn_event_transitions", _FN4_ORACLE)
def fn_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (the Markov-chain /
    user-path-analysis primitive): one lag window per user (total
    order (ts, event_id)), one count groupBy — the whole 25-cell
    matrix from one shuffle of (type, prev_type) pairs."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


_W17_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS bar_day,
       CAST(count(*) AS BIGINT) AS n_events,
       min_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close_v
FROM events
GROUP BY 1, 2
"""


@_register("w17_ohlc_bars", _W17_ORACLE)
def w17_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily OHLC bars — the time-series downsampling shape
    (open/close = first/last by a TOTAL order — a fixed-width
    zero-padded (epoch_us, event_id) string key, lexicographic ==
    numeric, because DuckDB's arg-min takes no struct keys). One
    aggregation pass; min_by/max_by keep it windowless. Raw parquet
    doubles pass through unrounded — no arithmetic, exact in both
    engines."""
    ev = _events(spark, sf_dir)
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bar_day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min_by("value", key).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", key).alias("close_v"),
    )


_LK_ORACLE = """
WITH names AS (
  SELECT DISTINCT trim(regexp_replace(lower(p_name), '\\s+', ' ', 'g'))
           AS name
  FROM part
),
blocked AS (
  SELECT name, string_split(name, ' ')[-1] AS block FROM names
),
ok AS (
  SELECT b.name, b.block FROM blocked b
  SEMI JOIN (SELECT block FROM blocked GROUP BY block
             HAVING count(*) <= 10000) s USING (block)
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM ok a JOIN ok b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
"""


@_register("lk_fuzzy_parts", _LK_ORACLE)
def lk_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity linkage (operators/linkage.py) over part
    names: block on the last token (the product noun), Levenshtein
    <= 3 within blocks, a < b ordering. Both engines run the
    identical integer edit-distance — the operator family
    (block → bounded self-join → distance filter) is what record
    linkage looks like at fact scale."""
    from ..operators.linkage import blocked_fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    out = blocked_fuzzy_pairs(part, "p_name", max_distance=3)
    return out.select(
        "name_a", "name_b", F.col("dist").cast("int").alias("dist")
    )


_PROF_Q_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       quantile_cont(l_extendedprice, 0.25) AS price_p25,
       quantile_cont(l_extendedprice, 0.50) AS price_p50,
       quantile_cont(l_extendedprice, 0.95) AS price_p95,
       quantile_cont(l_quantity, 0.50) AS qty_p50
FROM lineitem
GROUP BY l_returnflag
"""


@_register("prof_quantiles", _PROF_Q_ORACLE)
def prof_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT quantile profile: Spark ``percentile`` and
    DuckDB ``quantile_cont`` both sort-and-interpolate with the same
    (1-f)·a + f·b arithmetic, so even interpolated values hash-match
    bitwise. The exact form is the oracle-parity path; swap in
    ``percentile_approx`` (KLL-style mergeable sketch) where a
    full-sort per group is too dear and a rel-error bound suffices —
    tests/test_profile.py pins the sketch's error envelope against
    this exact twin."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("price_p25"),
        F.percentile("l_extendedprice", F.lit(0.50)).alias("price_p50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("price_p95"),
        F.percentile("l_quantity", F.lit(0.50)).alias("qty_p50"),
    )


_A11_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_v,
       min(l_extendedprice) AS min_v,
       max(l_extendedprice) AS max_v,
       CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
            // count(*) AS BIGINT) AS mean_tt
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@_register("a11_incremental_merge", _A11_ORACLE)
def a11_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance
    (operators/incremental_agg.py — the engine form of the
    reference's append-per-month HDF5 workflow,
    SFMuniDataAggregator.py:261,363,459): the corpus splits into a
    'history' batch and a 'new' batch on the shipdate, each gets a
    partial aggregate, and the MERGED state must equal the oracle's
    from-scratch aggregate over everything — merge(partial(A),
    partial(B)) == partial(A ∪ B), exactly, because the state is
    algebraic and the sum is integer ten-thousandths."""
    from ..operators.incremental_agg import merge_aggregates, partial_aggregate

    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    cut = F.lit("1998-01-01").cast("timestamp")
    hist = partial_aggregate(li.where(F.col("l_shipdate") < cut), keys, "l_extendedprice")
    new = partial_aggregate(li.where(F.col("l_shipdate") >= cut), keys, "l_extendedprice")
    merged = merge_aggregates(hist, new, keys)
    return merged.select(
        *keys,
        "cnt",
        "sum_v",
        "min_v",
        "max_v",
        F.expr("sum_v div cnt").cast("bigint").alias("mean_tt"),
    )


_W18_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       epoch_us(ts) AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_7d,
       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS sum_7d_tt
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
)
"""


@_register("w18_rolling_range_window", _W18_ORACLE)
def w18_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (the one frame type the surface
    didn't yet exercise — every other window is ROWS/unbounded): per
    user, trailing-7-day event count and exact integer value sum at
    every event. Spark and DuckDB both define RANGE frames by
    ordering-key arithmetic, so the frames align row-for-row."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_7d"),
        F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long"))
        .over(w)
        .cast("bigint")
        .alias("sum_7d_tt"),
    )


_MK_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(part_a AS BIGINT) AS part_a,
       CAST(part_b AS BIGINT) AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM pairs
GROUP BY part_a, part_b
HAVING count(*) >= 2
"""


@_register("mk_part_cooccurrence", _MK_ORACLE)
def mk_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs ordered together in
    >= 2 orders. The self-join is keyed on the ORDER (bounded fan-out
    — pairs per order grow with the square of its line count, and
    baskets are short), never on the part — the same
    bounded-blowup discipline as LSH banding and linkage blocking."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .select(
            F.col("part_a").cast("bigint").alias("part_a"),
            F.col("part_b").cast("bigint").alias("part_b"),
            "n_orders",
        )
    )


_INT8_ORACLE = """
WITH stats AS (
  SELECT vec_id,
         list_min(embedding) AS lo, list_max(embedding) AS hi
  FROM embeddings
),
q AS (
  SELECT e.vec_id, s.lo, s.hi,
         CASE WHEN s.hi > s.lo
              THEN (CAST(s.hi AS DOUBLE) - CAST(s.lo AS DOUBLE)) / 255.0
              ELSE 1.0 END AS scale,
         generate_subscripts(e.embedding, 1) AS i,
         CAST(unnest(e.embedding) AS DOUBLE) AS x
  FROM embeddings e JOIN stats s ON e.vec_id = s.vec_id
),
codes AS (
  SELECT vec_id, scale, lo,
         CAST(floor((x - CAST(lo AS DOUBLE)) / scale + 0.5) AS BIGINT) AS c,
         x
  FROM q
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(min(c) AS BIGINT) AS min_code,
       CAST(max(c) AS BIGINT) AS max_code,
       CAST(sum(c) AS BIGINT) AS sum_codes,
       CAST(sum(CAST(floor(abs(x - (CAST(lo AS DOUBLE) + c * scale))
                           * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
         AS abs_err_nano
FROM codes
GROUP BY vec_id
"""


@_register("emb_int8_quantize", _INT8_ORACLE)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 (0..255) affine quantization — the
    model-serving / vector-store compression prep: scale from the
    vector's own min/max, codes by half-up rounding, plus the exact
    nano-unit reconstruction-error total so quantization quality is
    an auditable number, not a vibe. Pure column math over one
    posexplode; codes provably span [0, 255]."""
    emb = _t(spark, sf_dir, "embeddings")
    stats = emb.select(
        "vec_id",
        F.array_min("embedding").alias("lo"),
        F.array_max("embedding").alias("hi"),
        F.posexplode("embedding").alias("i", "xf"),
    )
    scale = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("hi").cast("double") - F.col("lo").cast("double")) / 255.0,
    ).otherwise(F.lit(1.0))
    q = stats.select(
        "vec_id",
        F.col("lo").cast("double").alias("lo_d"),
        scale.alias("scale"),
        F.col("xf").cast("double").alias("x"),
    ).select(
        "vec_id",
        "lo_d",
        "scale",
        "x",
        F.floor((F.col("x") - F.col("lo_d")) / F.col("scale") + 0.5)
        .cast("bigint")
        .alias("c"),
    )
    return q.groupBy("vec_id").agg(
        F.min("c").cast("bigint").alias("min_code"),
        F.max("c").cast("bigint").alias("max_code"),
        F.sum("c").cast("bigint").alias("sum_codes"),
        F.sum(
            F.floor(
                F.abs(F.col("x") - (F.col("lo_d") + F.col("c") * F.col("scale")))
                * 1e9
                + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("abs_err_nano"),
    ).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "min_code",
        "max_code",
        "sum_codes",
        "abs_err_nano",
    )


_HIST_ORACLE = """
WITH b AS (
  SELECT (SELECT min(l_extendedprice) FROM lineitem) AS lo,
         (SELECT max(l_extendedprice) FROM lineitem) AS hi
)
SELECT CAST(least(floor((l_extendedprice - b.lo) / ((b.hi - b.lo) / 20.0)),
                  19) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(l_extendedprice) AS lo_v,
       max(l_extendedprice) AS hi_v
FROM lineitem, b
GROUP BY 1
"""


@_register("prof_histogram", _HIST_ORACLE)
def prof_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of a fact column (the
    profiling companion to prof_quantiles): global min/max from a
    1-row broadcast dim, bucket index by identical IEEE division in
    both engines, top bucket closed. One scan + one tiny shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    j = li.crossJoin(F.broadcast(bounds))
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / 20.0)
        ),
        F.lit(19),
    ).cast("int")
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("l_extendedprice").alias("lo_v"),
        F.max("l_extendedprice").alias("hi_v"),
    )


_DIFF_CANON = """
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT) AS qty_tt,
         CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS price_tt,
         l_returnflag
  FROM lineitem
"""

_DIFF_ORACLE = f"""
WITH base AS ({_DIFF_CANON}),
modified AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 89 = 0 THEN qty_tt + 10000
              ELSE qty_tt END AS qty_tt,
         price_tt, l_returnflag
  FROM base WHERE l_orderkey % 97 <> 0
  UNION ALL
  SELECT -l_orderkey, l_linenumber, qty_tt, price_tt, l_returnflag
  FROM base WHERE l_orderkey % 101 = 0
),
lh AS (SELECT l_orderkey, l_linenumber,
              md5(CAST(qty_tt AS VARCHAR) || '|' || CAST(price_tt AS VARCHAR)
                  || '|' || l_returnflag) AS h
       FROM base),
rh AS (SELECT l_orderkey, l_linenumber,
              md5(CAST(qty_tt AS VARCHAR) || '|' || CAST(price_tt AS VARCHAR)
                  || '|' || l_returnflag) AS h
       FROM modified)
SELECT CAST(coalesce(lh.l_orderkey, rh.l_orderkey) AS BIGINT) AS l_orderkey,
       CAST(coalesce(lh.l_linenumber, rh.l_linenumber) AS INT)
         AS l_linenumber,
       CASE WHEN lh.h IS NULL THEN 'added'
            WHEN rh.h IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM lh FULL OUTER JOIN rh
  ON lh.l_orderkey = rh.l_orderkey AND lh.l_linenumber = rh.l_linenumber
WHERE lh.h IS NULL OR rh.h IS NULL OR lh.h <> rh.h
"""


@_register("qc_table_diff", _DIFF_ORACLE)
def qc_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py): the base lineitem
    against a deterministically perturbed copy (drops where
    orderkey%97=0 → 'removed', quantity bumps where %89=0 →
    'changed', negated-key clones where %101=0 → 'added'). Row
    payloads canonicalize to integer units BEFORE hashing (the
    module's portability contract); the join ships key + 32-byte
    hash only, and the output is delta-sized."""
    from ..operators.diff import table_diff

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") * 10000 + 0.5).cast("bigint").alias("qty_tt"),
        F.floor(F.col("l_extendedprice") * 10000 + 0.5)
        .cast("bigint")
        .alias("price_tt"),
        "l_returnflag",
    )
    kept = base.where(F.col("l_orderkey") % 97 != 0).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 89 == 0, F.col("qty_tt") + 10000)
        .otherwise(F.col("qty_tt"))
        .alias("qty_tt"),
        "price_tt",
        "l_returnflag",
    )
    added = base.where(F.col("l_orderkey") % 101 == 0).select(
        (-F.col("l_orderkey")).alias("l_orderkey"),
        "l_linenumber",
        "qty_tt",
        "price_tt",
        "l_returnflag",
    )
    modified = kept.unionByName(added)
    out = table_diff(base, modified, ["l_orderkey", "l_linenumber"])
    return out.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        "status",
    )


_U2_ORACLE = """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       attr,
       val
FROM (
  SELECT p_partkey,
         'retail_tt' AS attr,
         CAST(floor(p_retailprice * 10000 + 0.5) AS BIGINT) AS val
  FROM part
  UNION ALL
  SELECT p_partkey, 'size', CAST(p_size AS BIGINT) FROM part
)
"""


@_register("u2_unpivot_melt", _U2_ORACLE)
def u2_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of A7's pivot — wide attributes to
    long (key, attr, val) form, the shape feature stores and EAV
    exports want). Spark's native ``unpivot`` keeps it one
    map-only pass; values canonicalize to BIGINT first so the
    variable column is one portable type."""
    part = _t(spark, sf_dir, "part")
    wide = part.select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.floor(F.col("p_retailprice") * 10000 + 0.5)
        .cast("bigint")
        .alias("retail_tt"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return wide.unpivot(
        ["p_partkey"], ["retail_tt", "size"], "attr", "val"
    )


_SP_ORACLE = """
WITH lpts AS (
  SELECT event_id AS left_id, value AS x,
         CAST(event_id % 97 AS DOUBLE) AS y
  FROM events WHERE event_type = 'click'
),
rpts AS (
  SELECT event_id AS right_id, value AS x,
         CAST(event_id % 97 AS DOUBLE) AS y
  FROM events WHERE event_type = 'purchase'
),
cands AS (
  SELECT l.left_id, r.right_id,
         (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) AS d2
  FROM lpts l JOIN rpts r
    ON floor(r.x / 5.0) BETWEEN floor(l.x / 5.0) - 1
                            AND floor(l.x / 5.0) + 1
   AND floor(r.y / 5.0) BETWEEN floor(l.y / 5.0) - 1
                            AND floor(l.y / 5.0) + 1
  WHERE (l.x - r.x) * (l.x - r.x) + (l.y - r.y) * (l.y - r.y) <= 25.0
)
SELECT CAST(left_id AS BIGINT) AS left_id,
       CAST(right_id AS BIGINT) AS right_id,
       d2
FROM (SELECT left_id, right_id, d2,
             row_number() OVER (PARTITION BY left_id
                                ORDER BY d2, right_id) AS rn
      FROM cands)
WHERE rn = 1
"""


@_register("sp_grid_nearest", _SP_ORACLE)
def sp_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grid spatial join (operators/spatial.py): nearest
    purchase-point within radius 5 for every click-point (synthetic
    2-D embedding of the event stream — value × id-residue). The
    3×3 cell-neighborhood equi join makes it exact while keeping
    candidates density-bounded — the fact-scale answer to the
    reference's driver-side rtree (HwyNetwork.py:297-388); squared
    distances are one fixed IEEE expression tree in both engines."""
    from ..operators.spatial import grid_nearest_join

    ev = _events(spark, sf_dir)
    lpts = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("left_id"),
        F.col("value").alias("x"),
        (F.col("event_id") % 97).cast("double").alias("y"),
    )
    rpts = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("right_id"),
        F.col("value").alias("x"),
        (F.col("event_id") % 97).cast("double").alias("y"),
    )
    out = grid_nearest_join(lpts, rpts, radius=5.0)
    return out.select(
        F.col("left_id").cast("bigint").alias("left_id"),
        F.col("right_id").cast("bigint").alias("right_id"),
        "d2",
    )


_F18_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_mktsegment,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS INT)
         AS balance_quartile
FROM customer
"""


@_register("f18_quantile_binning", _F18_ORACLE)
def f18_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile binning (feature-engineering staple):
    ntile(4) over (segment, balance) with a custkey tiebreak making
    the bin assignment a total function of the data. Window is
    partitioned by segment — no global sort."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_mktsegment",
        F.ntile(4).over(w).cast("int").alias("balance_quartile"),
    )


@_register(
    "mm_image_gif",
    f"""
    WITH {_MM_IDS_SQL},
    px AS (
      SELECT m, w, h, (m * 3 + x * 7 + unnest(range(0, h)) * 11) % 256 AS i
      FROM (SELECT m, w, h, unnest(range(0, w)) AS x FROM dims)
    )
    SELECT m AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(256 AS BIGINT) AS palette_size,
           CAST(sum(i) AS BIGINT) AS sum_r,
           CAST(sum((2 * i) % 256) AS BIGINT) AS sum_g,
           CAST(sum((3 * i) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY m, w, h
    """,
)
def mm_image_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL paletted-image decode (multimodal/image_gif.py): the
    closed-form index pattern encodes through a genuine GIF87a
    writer (container + spec-valid literal LZW with periodic clear
    codes) and parses back through a GENERAL variable-width LZW
    decoder (LSB bitstream, dictionary tracking, clear/EOI) plus
    palette lookup. Completes the codec triple: uncompressed (BMP),
    deflate (PNG), LZW (GIF)."""
    from ..multimodal.image_gif import decode_gif_df, synth_gif_corpus

    ids = (
        _events(spark, sf_dir)
        .where(F.col("event_id") < 200)
        .select(F.col("event_id").cast("bigint").alias("media_id"))
    )
    return decode_gif_df(synth_gif_corpus(ids))
