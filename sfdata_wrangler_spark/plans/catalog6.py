"""Catalog wave 6: BPE-ish tokenization and embedding array
analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import portable_round as _pr
from .catalog import _register, _t

# word runs | digit runs | single other-symbols — identical semantics
# in Java regex (Spark) and RE2 (DuckDB); space excluded
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@_register(
    "txt_bpe_tokens",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                END AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def txt_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (letter runs / digit runs / symbols) vs
    whitespace tokens — the tokenizer-budget estimator for training-
    data pipelines; pure regexp, codegen'd."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
        F.when(F.length(ws) == 0, F.lit(0))
        .otherwise(F.size(F.split(ws, " ")))
        .cast("bigint")
        .alias("n_ws_tokens"),
    )


@_register(
    "emb_label_centroids",
    """
    SELECT CAST(label AS BIGINT) AS label,
           CAST(dim AS INT) AS dim,
           CAST(round(avg(x), 6) AS DOUBLE) AS centroid
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids: posexplode → (label, dim) mean.
    The building block for IVF-style coarse quantization (assign to
    nearest centroid → bucketed ANN) and for class-prototype dedup."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    return exploded.groupBy(
        "label", (F.col("pos") + 1).cast("int").alias("dim")
    ).agg(_pr(F.avg(F.col("x").cast("double")), 6).alias("centroid"))


def kmeans_cte_chain(k: int = 8, iterations: int = 2) -> tuple[str, str]:
    """The integer fixed-point Lloyd's as a reusable CTE fragment
    (``el`` micro long-form, seed centroids from the k lowest ids,
    per-iteration exact-L2 assign + truncating integer-division mean,
    empty cells keep their centroid). Returns ``(fragment,
    final_centroid_cte)`` so both the cosine-rerank IVF oracle here
    and the trained-quantizer IVF-PQ oracle (catalog37) replay the
    SAME training — one definition, no drift. Deliberately excludes
    any consumer-specific CTEs: DuckDB executes unreferenced
    MATERIALIZED CTEs (round-7 lesson), so the fragment carries only
    what every consumer reads."""
    parts = [
        """
el AS MATERIALIZED (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS dim,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1e6 + 0.5)
              AS BIGINT) AS x
  FROM embeddings
),
seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT """
        + str(k)
        + """)
),
c0 AS MATERIALIZED (
  SELECT s.cid, el.dim, el.x AS c
  FROM seeds s JOIN el ON el.vec_id = s.vec_id
)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""
d{i} AS MATERIALIZED (
  SELECT el.vec_id, c.cid, sum((el.x - c.c) * (el.x - c.c)) AS d2
  FROM el JOIN c{i - 1} c ON el.dim = c.dim
  GROUP BY 1, 2
),
a{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
),
m{i} AS MATERIALIZED (
  SELECT a.cid, el.dim, CAST(sum(el.x) // count(*) AS BIGINT) AS c
  FROM a{i} a JOIN el ON el.vec_id = a.vec_id
  GROUP BY 1, 2
),
c{i} AS MATERIALIZED (
  SELECT p.cid, p.dim, COALESCE(m{i}.c, p.c) AS c
  FROM c{i - 1} p LEFT JOIN m{i} ON m{i}.cid = p.cid AND m{i}.dim = p.dim
)""")
    return ",".join(parts), f"c{iterations}"


def _ivf_kmeans_oracle(k: int = 8, iterations: int = 2) -> str:
    """Chained MATERIALIZED-CTE replay of the integer fixed-point
    Lloyd's in operators/similarity.kmeans_centroids_int: micro-int
    quantize → seed from k lowest ids → per iteration exact-L2
    assign (tie: lower cid) + truncating integer-division mean
    (DuckDB ``//`` == Spark ``div``, both toward zero), empty cells
    keep their centroid — bit-identical state both engines."""
    chain, fin = kmeans_cte_chain(k, iterations)
    parts = [
        chain,
        """
e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)""",
    ]
    parts.append(f"""
dcell AS MATERIALIZED (
  SELECT el.vec_id, c.cid, sum((el.x - c.c) * (el.x - c.c)) AS d2
  FROM el JOIN {fin} c ON el.dim = c.dim
  GROUP BY 1, 2
),
cells AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dcell
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dcell WHERE vec_id < 3
  ) WHERE rn <= 2
)""")
    return (
        "WITH "
        + ",".join(parts)
        + """
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(c.vec_id AS BIGINT) AS vec_id,
       CAST(round(list_cosine_similarity(qe.v, c.v), 4) AS DOUBLE) AS sim,
       CAST(row_number() OVER (
         PARTITION BY q.query_id
         ORDER BY list_cosine_similarity(qe.v, c.v) DESC, c.vec_id
       ) AS INT) AS rank
FROM probes q
  JOIN cells a ON a.cid = q.cid
  JOIN e c ON c.vec_id = a.vec_id AND c.vec_id <> q.query_id
  JOIN e qe ON qe.vec_id = q.query_id
QUALIFY row_number() OVER (
  PARTITION BY q.query_id
  ORDER BY list_cosine_similarity(qe.v, c.v) DESC, c.vec_id
) <= 5
"""
    )


@_register("emb_ivf_topk", _ivf_kmeans_oracle())
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer, hash-exact (promoted
    r9, VERDICT r8 ask #2): Lloyd's k-means runs as an integer fixed
    point (operators/similarity.kmeans_centroids_int — micro-int
    quantize, exact squared-L2 assignment, truncating integer-division
    centroid means), so the oracle replays the identical iterations as
    chained MATERIALIZED CTEs — the same promotion device as the BPE /
    integer-GD / integer-pagerank queries. Squared L2 over micro ints
    is the coarse metric (the standard IVF cell metric); the final
    re-rank is exact double cosine, rounded to 4 dp. Cell-equi
    candidate join, broadcast probes — never all-pairs; probes are
    the nq x n_probe serving shape s19_ivfpq_lake prunes partitions
    with. Recall vs brute force pinned in tests/test_similarity.py;
    twins emb_label_centroids / emb_ivf_labels_topk keep the
    label-quantizer variant green alongside."""
    from ..operators.similarity import ivf_topk_int, kmeans_centroids_int

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids_int(emb, k=8, iterations=2)
    out = ivf_topk_int(queries, emb, cents, k=5, n_probe=2)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


@_register(
    "qc_lineitem_checks",
    """
    SELECT 'qty_positive' AS check, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_range', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.5)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_after_order', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN NOT (l_shipdate >= o_orderdate) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def qc_lineitem_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime data-quality checks (SURVEY §5 embedded-QC parity) as a
    driver-visible query: single-pass conditional-count framework
    (operators/quality.run_checks) over fact + referential rules."""
    from ..operators.quality import Check, run_checks

    li = _t(spark, sf_dir, "lineitem")
    base = run_checks(
        li,
        [
            Check("qty_positive", F.col("l_quantity") > 0),
            Check(
                "discount_range",
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.5),
            ),
        ],
    ).select("check", "n_rows", "n_violations")
    joined = li.join(
        _t(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    ref = run_checks(
        joined,
        [Check("ship_after_order", F.col("l_shipdate") >= F.col("o_orderdate"))],
    ).select("check", "n_rows", "n_violations")
    return base.unionByName(ref)


# fixed pseudo-random hyperplanes for the near-dup LSH prefilter
# (4 planes → 16 buckets; same deterministic family as catalog2's
# emb_lsh_topk so the DuckDB oracle reproduces the signatures exactly)
_ND_PLANES = [
    [((i * 37 + p * 17) % 19 - 9) / 10.0 for i in range(64)]
    for p in range(4)
]


def _nd_planes_sql() -> list[str]:
    return [
        "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        for plane in _ND_PLANES
    ]


def _nd_bkt_sql(alias: str = "v") -> str:
    terms = [
        f"(CASE WHEN list_inner_product({alias}, CAST({plane} AS DOUBLE[]))"
        f" >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(_nd_planes_sql())
    ]
    return " + ".join(terms)


@_register(
    "dd_embedding_neardup",
    f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    twins AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(range(1, len(v) + 1),
                            i -> v[CAST(i AS INT)]
                                 + 0.01 * ((vec_id + i - 1) % 7 - 3)) AS v
      FROM base WHERE vec_id % 5 = 0
    ),
    corpus AS (
      SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM twins
    ),
    sig AS (
      SELECT vec_id, v, {_nd_bkt_sql("v")} AS bkt FROM corpus
    )
    SELECT CAST(a.vec_id AS BIGINT) AS id_a,
           CAST(b.vec_id AS BIGINT) AS id_b,
           CAST(round(list_cosine_similarity(a.v, b.v), 4) AS DOUBLE) AS sim
    FROM sig a JOIN sig b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    """,
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup
    complement to MinHash), LSH-prefiltered: hyperplane sign-signature
    buckets → bucket-equi candidate self-join → exact cosine re-score
    at >= 0.9. Never materializes all pairs, so the same plan holds at
    100 TB (no CartesianProduct/BNL — plan-shape asserted in tests).

    The raw synthetic corpus has no >= 0.9 pairs, so the query seeds
    deterministic near-dup twins (every 5th vector, perturbed by
    0.01 * ((vec_id + dim) % 7 - 3) per coordinate — exact IEEE
    arithmetic both engines reproduce bit-for-bit), making the oracle
    check non-vacuous at every sf."""
    from ..operators.similarity import lsh_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    # perturb first, re-key second: a single select would resolve the
    # lambda's vec_id against the aliased output (vec_id + 1000000)
    twins = (
        base.where(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: x
                + F.lit(0.01)
                * ((F.col("vec_id") + i) % 7 - 3).cast("double"),
            ).alias("embedding"),
        )
        .select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )
    corpus = base.unionByName(twins)
    pairs = lsh_neardup_pairs(corpus, planes=_ND_PLANES, threshold=0.9)
    return pairs.select(
        "id_a", "id_b", _pr(F.col("__sim_exact"), 4).alias("sim")
    )


@_register(
    "o4_ranking_distributions",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def o4_ranking_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-distribution windows (ntile/percent_rank/cume_dist) —
    the quantile-bucketing primitives for stratified sampling and
    quality-score binning of training corpora. Total ordering via the
    unique key tie-break keeps them cross-engine deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@_register(
    "emb_ivf_labels_topk",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), comp AS (
      SELECT label, dim, round(avg(x), 6) AS m
      FROM (
        SELECT label,
               unnest(v) AS x,
               unnest(generate_series(1, len(v))) AS dim
        FROM e
      )
      GROUP BY label, dim
    ), cent AS (
      SELECT label AS cid, list(m ORDER BY dim) AS c FROM comp GROUP BY label
    ), assign AS (
      SELECT vec_id, cid
      FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, cent.c) DESC, cent.cid
               ) AS rn
        FROM e, cent
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cid
      FROM (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, cent.c) DESC, cent.cid
               ) AS rn
        FROM e, cent
        WHERE e.vec_id < 3
      ) WHERE rn <= 2
    )
    SELECT CAST(q.query_id AS BIGINT) AS query_id,
           CAST(c.vec_id AS BIGINT) AS vec_id,
           CAST(round(list_cosine_similarity(qe.v, c.v), 4) AS DOUBLE) AS sim,
           CAST(row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(qe.v, c.v) DESC, c.vec_id
           ) AS INT) AS rank
    FROM probes q
      JOIN assign a ON a.cid = q.cid
      JOIN e c ON c.vec_id = a.vec_id AND c.vec_id <> q.query_id
      JOIN e qe ON qe.vec_id = q.query_id
    QUALIFY row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(qe.v, c.v) DESC, c.vec_id
    ) <= 5
    """,
)
def emb_ivf_labels_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a DETERMINISTIC coarse quantizer: per-label mean
    vectors (rounded to 6 dp so both engines share bit-identical
    centroids) play the cell centroids, making the full IVF shape —
    assign / probe n_probe cells / cell-equi candidate join / exact
    re-rank — oracle-checkable end to end. The k-means-trained variant
    (emb_ivf_topk) keeps the same plan with learned centroids."""
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    comp = corpus.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).groupBy("label", "pos").agg(_pr(F.avg("x"), 6).alias("m"))
    cents = (
        comp.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col("label").alias("centroid_id"),
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
        )
    )
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(queries, corpus, cents, k=5, n_probe=2)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )
