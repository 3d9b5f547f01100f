"""Training-data operator queries: text analysis, dedup, similarity.

The beyond-reference surface (BASELINE.json north star) declared over
the driver's ``documents`` and ``embeddings`` tables. Oracle SQL is
built programmatically from the SAME constant sets as the Spark
column functions so both engines compute literally identical
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    doc_fingerprint,
    lang_id,
    lang_score,
    norm_key,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from ..operators.dedup import minhash_lsh_pairs, minhash_signatures, ngram_jaccard
from ..operators.similarity import cosine_topk
from .catalog import _register, _t

# --- SQL fragment builders (mirror functions/text.py exactly) -------------


def norm_sql(col: str = "text") -> str:
    """Oracle twin of functions/text.normalize_text over any column."""
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def tokcnt_sql(col: str = "text") -> str:
    """Oracle twin of functions/text.token_count over any column."""
    n = norm_sql(col)
    return (
        f"CAST(CASE WHEN length({n}) = 0 THEN 0 "
        f"ELSE len(string_split({n}, ' ')) END AS BIGINT)"
    )


_NORM = norm_sql()
_TOKCNT = tokcnt_sql()


def _tokhits_sql(words: list[str]) -> str:
    """Oracle twin of functions/text.stopword_hits: one split, one
    linear list filter on token membership."""
    inlist = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return (
        f"CAST(len(list_filter(string_split({_NORM}, ' '), "
        f"x -> x IN ({inlist}))) AS BIGINT)"
    )


_STOPHITS = _tokhits_sql(EN_STOPWORDS)
_PUNCT = (
    "CASE WHEN length(text) > 0 THEN "
    "(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
    " / length(text) ELSE 0.0 END"
)
_STOPRATIO = f"CASE WHEN {_TOKCNT} > 0 THEN ({_STOPHITS}) / {_TOKCNT} ELSE 0.0 END"
_QUALITY = (
    "round(("
    f"(CASE WHEN {_TOKCNT} BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)"
    f" + (CASE WHEN {_PUNCT} <= 0.2 THEN 1.0 ELSE 0.0 END)"
    f" + (CASE WHEN {_STOPRATIO} >= 0.05 THEN 1.0 ELSE 0.0 END)"
    ") / 3.0, 4)"
)

_LANG_SCORE_SQL = {
    lang: _tokhits_sql(markers) for lang, markers in LANG_MARKERS.items()
}
_GM = "greatest({})".format(", ".join(f"s_{lang}" for lang in LANG_MARKERS))
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} = __gm AND __gm > 0 THEN '{lang}'" for lang in LANG_MARKERS
    )
    + " ELSE 'und' END"
)

_TOKS = f"string_split({_NORM}, ' ')"
_SHINGLES = (
    f"list_transform(range(1, greatest(len({_TOKS}) - 2, 0) + 1), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' '))"
)
_N_MINHASH = 8
_SIG_SQL = (
    "SELECT doc_id, "
    + ", ".join(
        f"min(md5('{i}|' || s)) AS mh_{i}" for i in range(_N_MINHASH)
    )
    + f" FROM (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents) GROUP BY doc_id"
)
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(mh_{2*b} || '|' || mh_{2*b+1}) AS bh FROM sig"
    for b in range(_N_MINHASH // 2)
)


@_register(
    "txt_stats",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           {_TOKCNT} AS n_tokens,
           {_PUNCT} AS punct_ratio,
           {_STOPRATIO} AS stopword_ratio,
           CAST({_QUALITY} AS DOUBLE) AS quality
    FROM documents
    """,
    bench=True,
)
def txt_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length/punct/stopword ratios)
    — pure codegen'd column expressions, no UDF, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
    )


@_register(
    "txt_lang_id",
    f"""
    WITH scored AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
             {", ".join(f"{sql} AS s_{lang}" for lang, sql in _LANG_SCORE_SQL.items())}
      FROM documents
    ), g AS (
      SELECT *, {_GM} AS __gm FROM scored
    )
    SELECT doc_id, lang AS labeled_lang,
           {", ".join(f"s_{lang}" for lang in LANG_MARKERS)},
           {_PRED} AS pred_lang
    FROM g
    """,
)
def txt_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker n-gram heuristic."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("lang").alias("labeled_lang"),
        *[lang_score(c, lang).alias(f"s_{lang}") for lang in LANG_MARKERS],
        lang_id(c).alias("pred_lang"),
    )


@_register(
    "dd_exact_groups",
    f"""
    SELECT md5({_NORM}) AS norm_key,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM documents GROUP BY 1
    """,
    bench=True,
)
def dd_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized md5 — the shuffle moves
    16-byte keys, never document text."""
    docs = _t(spark, sf_dir, "documents")
    return docs.withColumn("norm_key", norm_key(F.col("text"))).groupBy(
        "norm_key"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("keep_id"),
    )


@_register(
    "dd_fingerprint",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           md5(array_to_string(list_slice({_TOKS}, 1, 32), ' ')) AS fingerprint
    FROM documents
    """,
)
def dd_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix fingerprint (32 normalized tokens → md5): catches
    shared-boilerplate duplicates without pairwise comparison."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        doc_fingerprint(F.col("text"), 32).alias("fingerprint"),
    )


@_register(
    "dd_minhash_signatures",
    _SIG_SQL,
)
def dd_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5-salted variant so the oracle can
    reproduce them; production path uses xxhash64 — see
    operators/dedup.py): shingle → k salted min-hashes, one explode +
    one combinable groupBy."""
    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, num_hashes=_N_MINHASH, shingle_n=3, hash_fn="md5"
    )
    return sig.withColumn("doc_id", F.col("doc_id").cast("bigint"))


@_register(
    "dd_minhash_lsh_pairs",
    f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_SQL})
    SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a,
                    CAST(b.doc_id AS BIGINT) AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    """,
)
def dd_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash LSH candidate pairs: join key is (band,
    band-hash) so only colliding docs ever meet — no cross join."""
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=_N_MINHASH, bands=_N_MINHASH // 2, shingle_n=3,
        hash_fn="md5",
    )
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


@_register(
    "dd_ngram_jaccard",
    f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS ({_BANDS_SQL}),
    pairs AS (
      SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a,
                      CAST(b.doc_id AS BIGINT) AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM documents)
    SELECT id_a, id_b,
           CASE WHEN len(list_distinct(sa.sh || sb.sh)) > 0
                THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                     / len(list_distinct(sa.sh || sb.sh))
                ELSE 0.0 END AS jaccard
    FROM pairs JOIN sh sa ON id_a = sa.doc_id JOIN sh sb ON id_b = sb.doc_id
    """,
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification over LSH candidate pairs —
    the verify stage of the near-dup pipeline (never all-pairs)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=_N_MINHASH, bands=_N_MINHASH // 2, shingle_n=3,
        hash_fn="md5",
    ).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )
    return ngram_jaccard(docs, pairs, shingle_n=3)


@_register(
    "emb_cosine_topk",
    """
    SELECT CAST(q.vec_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS vec_id,
           CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])), 4)
                AS DOUBLE) AS sim,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id) AS INT) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
    QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id) <= 5
    """,
    bench=True,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN correctness baseline):
    JVM-side zip_with/aggregate dot products in double precision,
    broadcast query side, per-query window rank."""
    emb = _t(spark, sf_dir, "embeddings")
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


@_register(
    "txt_contamination",
    f"""
    WITH train AS (
      SELECT DISTINCT unnest(list_distinct({_SHINGLES})) AS sh
      FROM documents WHERE doc_id % 10 <> 0
    ), ev AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT CAST(ev.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(sum(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(round(CAST(sum(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 4) AS DOUBLE)
             AS contamination
    FROM ev LEFT JOIN train t ON ev.sh = t.sh
    GROUP BY ev.doc_id
    """,
)
def txt_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check (the benchmark-leakage audit a
    training-data pipeline must run): eval split = every 10th doc;
    per eval doc, the share of its distinct 3-gram shingles that
    appear anywhere in the train split. Equi-join on the shingle
    against the train side's distinct set — one shuffle keyed by
    shingle, never a doc-pair join."""
    from ..operators.dedup import contamination_check

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    out = contamination_check(train, ev, shingle_n=3)
    from ..functions.metrics import portable_round as _pr

    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_ngrams",
        "n_contaminated",
        _pr(
            F.col("n_contaminated").cast("double") / F.col("n_ngrams"), 4
        ).alias("contamination"),
    )


@_register(
    "txt_vocab_topk",
    f"""
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split({_NORM}, ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
)
def txt_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 token frequencies (the
    tokenizer-training / stopword-discovery primitive). Explode →
    combinable count → distributed TakeOrdered with a total ordering
    (count desc, token asc) so the cut is deterministic."""
    from ..functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


# deterministic per-stratum sampling rates: md5-hex prefix thresholds
# (two hex chars = 256 buckets; '40' keeps 64/256 = 25%, '80' = 50%)
_SAMPLE_RATES = {"en": "40", "zh": "80"}
_DEFAULT_RATE = "20"  # 32/256 = 12.5% for every other language


@_register(
    "txt_stratified_sample",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           substring(md5(text), 1, 2) AS bucket
    FROM documents
    WHERE substring(md5(text), 1, 2) <
          (CASE {" ".join(f"WHEN lang = '{lang}' THEN '{thr}'" for lang, thr in _SAMPLE_RATES.items())}
                ELSE '{_DEFAULT_RATE}' END)
    """,
)
def txt_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language rates applied
    via an md5-hex-prefix threshold — reproducible across engines,
    runs, and partitionings (no RNG state), the scale-safe way to cut
    a training mix. en 25%, zh 50%, default 12.5%."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("text")), 1, 2)
    # when-chain in declaration order mirrors the SQL CASE
    thr = F.lit(_DEFAULT_RATE)
    for lang, t in reversed(list(_SAMPLE_RATES.items())):
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return docs.where(bucket < thr).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        bucket.alias("bucket"),
    )


@_register(
    "txt_pack_windows",
    f"""
    WITH t AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, {_TOKCNT} AS n_tokens
      FROM documents
    ), p AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS before
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor(before / 512) AS BIGINT) AS window_id,
           CAST(before % 512 AS BIGINT) AS window_offset
    FROM p
    """,
)
def txt_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk context packing (512-token windows): each doc
    gets the window its first token lands in plus its in-window
    offset. The Spark plan is the scalable two-level prefix sum
    (bucket subtotals + broadcast offsets, parallel per-bucket
    windows); the oracle states the same assignment with a global
    window — equal by construction, which is exactly what the check
    proves."""
    from ..functions.text import token_count
    from ..operators.packing import pack_context_windows

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return pack_context_windows(t, budget=512, bucket_width=64)


# --- md5-SimHash twin: oracle-reproducible bit votes ----------------------
# (the production path uses xxhash64 over 64 bits — operators/dedup.simhash,
# rows-only; this twin runs the SAME algorithm over the first 16 bits of
# md5 so DuckDB can verify the vote/assemble semantics hash-exactly)

_HEXDIGITS = "0123456789abcdef"


def _hexval_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN '{c}' THEN {v}" for v, c in enumerate(_HEXDIGITS)
    )
    return f"(CASE {expr} {cases} END)"


def _simhash16_sql() -> str:
    digs = ", ".join(
        f"{_hexval_sql(f'substring(md5(tok), {j + 1}, 1)')} AS v{j}"
        for j in range(4)
    )
    votes = ", ".join(
        f"CAST(sum(CASE WHEN (v{i // 4} >> {3 - i % 4}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS BIGINT) AS b{i}"
        for i in range(16)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
      FROM documents
    ), digs AS (
      SELECT doc_id, {digs} FROM toks
    ), votes AS (
      SELECT doc_id, {votes} FROM digs GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST({fp} AS BIGINT) AS simhash16
    FROM votes
    """


def _hexval_spark(col):
    expr = None
    for v, c in enumerate(_HEXDIGITS):
        cond = F.when(col == c, F.lit(v))
        expr = cond if expr is None else expr.when(col == c, F.lit(v))
    return expr


@_register("dd_simhash_md5", _simhash16_sql())
def dd_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with oracle-reproducible bits: per-token md5, first 16
    bits vote +1/-1 per (doc, bit), fingerprint assembled from the
    vote signs — the exact algorithm of operators/dedup.simhash
    (which uses 64-bit xxhash64 in production), made hash-checkable.
    One explode + one combinable groupBy; bit decode is a constant
    16-way CASE per hex digit, codegen'd."""
    from ..functions.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
    )
    md5 = F.md5(F.col("tok"))
    digs = toks.select(
        "doc_id",
        *[
            _hexval_spark(F.substring(md5, j + 1, 1)).alias(f"v{j}")
            for j in range(4)
        ],
    )
    votes = digs.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"v{i // 4}"), 3 - i % 4)
                    .bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            )
            .cast("bigint")
            .alias(f"b{i}")
            for i in range(16)
        ]
    )
    fp = None
    for i in range(16):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        fp.cast("bigint").alias("simhash16"),
    )


@_register(
    "pipe_curation",
    f"""
    WITH stats AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, text,
             {_TOKCNT} AS n_tokens,
             CAST({_QUALITY} AS DOUBLE) AS quality
      FROM documents
    ), filtered AS (
      SELECT * FROM stats
      WHERE quality >= 0.66 AND n_tokens >= 5 AND lang IN ('en', 'zh')
    ), deduped AS (
      SELECT min(doc_id) AS doc_id,
             min(n_tokens) AS n_tokens
      FROM (
        SELECT doc_id, n_tokens, md5({_NORM}) AS nk FROM filtered
      ) GROUP BY nk
    ), packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 256) AS BIGINT) AS window_id
      FROM deduped
    )
    SELECT window_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY window_id
    """,
)
def pipe_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the canonical training-data
    pipeline composed from this engine's operators in one lazy plan:
    quality scoring (codegen'd text stats) → threshold + language
    filter → exact dedup on the normalized md5 key → 256-token
    concat-and-chunk packing (two-level prefix sum) → per-window
    summary. The oracle restates every stage in SQL (global-cumsum
    packing), so the whole composition is value-checked, not just the
    pieces."""
    from ..operators.packing import pack_context_windows

    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    stats = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        c.alias("text"),
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
    )
    filtered = stats.where(
        (F.col("quality") >= 0.66)
        & (F.col("n_tokens") >= 5)
        & F.col("lang").isin("en", "zh")
    )
    deduped = (
        filtered.withColumn("nk", norm_key(F.col("text")))
        .groupBy("nk")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("nk")
    )
    packed = pack_context_windows(
        deduped, budget=256, bucket_width=64
    )
    return packed.groupBy("window_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
