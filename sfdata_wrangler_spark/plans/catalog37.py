"""Catalog wave 37 (round 9): IVF-PQ with a TRAINED coarse quantizer.

Every IVF-PQ query so far coarse-quantizes with per-label means — a
deterministic stand-in that leans on the testdata's `label` column,
which a production corpus does not have. Round 9's integer
fixed-point Lloyd's (operators/similarity.kmeans_centroids_int, the
emb_ivf_topk promotion) removes the crutch: the coarse cells are now
LEARNED from the vectors alone, and because the training is exact
integer arithmetic, the full composition — k-means training ->
residual-PQ encode -> probed ADC -> exact rerank — is still
hash-exact against a DuckDB replay. The oracle composes three
existing fragments verbatim (the k-means CTE chain from catalog6, the
assignment and encode fragments from catalog35), so the trained and
label variants cannot drift in distance or tie-break semantics.

Scale shape unchanged from catalog35: training collects only k
centroid rows per Lloyd's iteration, the code table joins a broadcast
per-(query, cell) LUT cell-equi, and the rerank touches a
shortlist-bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _register, _t
from .catalog6 import kmeans_cte_chain
from .catalog35 import (
    _IVFPQ_AD_ASSIGN,
    _K,
    _KM_ITERS,
    _KM_K,
    _M,
    _N_CODES,
    _N_PROBE,
    _SHORTLIST,
    _SUB_DIM,
    _ivfpq_encode_tail,
    _ivfpq_search_sql,
)


def _trained_cc_prefix() -> str:
    """The shared front of both trained oracles: k-means chain ->
    `lf` -> `cc` -> assignment. The chain's `el` carries full-vector
    micro values at 1-based dims; `lf` and `cc` are cheap PROJECTIONS
    of `el`/the final centroids into the (subspace, dim) geometry the
    PQ fragments expect — one unnest of embeddings total, not two
    (the label-variant's standalone `lf` re-unnests because it has no
    `el` to project from). One definition for both index builders so
    the geometry/micro mapping cannot drift (code-review r9 pass-3
    #5)."""
    chain, fin = kmeans_cte_chain(k=_KM_K, iterations=_KM_ITERS)
    return f"""{chain},
lf AS MATERIALIZED (
  SELECT vec_id, CAST((dim - 1) // {_SUB_DIM} AS INT) AS subspace,
         CAST((dim - 1) % {_SUB_DIM} AS INT) AS dim,
         x AS x_micro
  FROM el
),
cc AS MATERIALIZED (
  SELECT cid, CAST((dim - 1) // {_SUB_DIM} AS INT) AS subspace,
         CAST((dim - 1) % {_SUB_DIM} AS INT) AS dim,
         CAST(c AS BIGINT) AS c_micro
  FROM {fin}
),
{_IVFPQ_AD_ASSIGN.rstrip()}"""


def _trained_index_sql() -> str:
    """Trained coarse quantizer + the shared pseudo-label codebook
    encode tail (the cb upgrade is emb_ivfpq_fully_trained)."""
    return f"""{_trained_cc_prefix()},
{_ivfpq_encode_tail()}"""


def trained_coarse_centroids(
    spark: SparkSession, emb: DataFrame
) -> DataFrame:
    """This catalog's constants applied to the shared adapter
    (operators/pq.trained_coarse_centroids — moved there in r10 so
    the generation-rotation refresh reuses it)."""
    from ..operators.pq import trained_coarse_centroids as _tcc

    return _tcc(emb, k=_KM_K, iterations=_KM_ITERS, sub_dim=_SUB_DIM)


@_register(
    "emb_ivfpq_trained_topk",
    _ivfpq_search_sql(_trained_index_sql()),
)
def emb_ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with a LEARNED coarse quantizer (round 9): the
    integer fixed-point k-means trains the cells from the vectors
    alone — no label column, the production shape — then the standard
    composition runs unchanged (residual-PQ encode, probed-cell ADC
    against the broadcast LUT, exact integer rerank). Hash-exact
    end to end: training, assignment, encoding, and search are all
    exact BIGINT arithmetic, and the oracle replays the identical
    unrolled Lloyd's + the byte-identical assignment/encode fragments
    the label variant uses."""
    from ..operators.pq import ivfpq_index, ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    cents = trained_coarse_centroids(spark, emb)
    cb, enc = ivfpq_index(
        emb, cents, n_codes=_N_CODES, m=_M, sub_dim=_SUB_DIM
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(
        queries,
        enc,
        cents,
        cb,
        emb,
        k=_K,
        n_probe=_N_PROBE,
        shortlist=_SHORTLIST,
        m=_M,
        sub_dim=_SUB_DIM,
    )
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("adc_d2").cast("bigint").alias("adc_d2"),
        F.col("exact_d2").cast("bigint").alias("exact_d2"),
        F.col("rank").cast("int").alias("rank"),
    )


# --------------------------------------------------------------------------- #
# emb_ivfpq_fully_trained — trained coarse quantizer AND trained codebooks    #
# --------------------------------------------------------------------------- #


def _trained_cb_chain(n_codes: int, iterations: int) -> str:
    """Unrolled-CTE replay of operators/pq.pq_codebooks_trained: all m
    subspaces train simultaneously (the per-(vector, subspace)
    assignment just carries subspace as a grouping column — same CTE
    count as a single k-means). Ends by materializing the trained
    codebook under the name ``cb`` so the shared encode/search
    fragments (catalog35's _IVFPQ_ENC, _ivfpq_search_sql) consume it
    unchanged."""
    parts = [
        f"""kb0 AS MATERIALIZED (
  SELECT s.code, r.subspace, r.dim, r.r_micro AS c
  FROM (SELECT vec_id,
               CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id
              LIMIT {n_codes})) s
  JOIN res r ON r.vec_id = s.vec_id
)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""
kd{i} AS MATERIALIZED (
  SELECT r.vec_id, r.subspace, k.code,
         sum((r.r_micro - k.c) * (r.r_micro - k.c)) AS d2
  FROM res r JOIN kb{i - 1} k ON k.subspace = r.subspace AND k.dim = r.dim
  GROUP BY 1, 2, 3
),
ka{i} AS MATERIALIZED (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           row_number() OVER (PARTITION BY vec_id, subspace
                              ORDER BY d2, code) AS rn
    FROM kd{i}
  ) WHERE rn = 1
),
km{i} AS MATERIALIZED (
  SELECT a.code, r.subspace, r.dim,
         CAST(sum(r.r_micro) // count(*) AS BIGINT) AS c
  FROM ka{i} a JOIN res r ON r.vec_id = a.vec_id
                         AND r.subspace = a.subspace
  GROUP BY 1, 2, 3
),
kb{i} AS MATERIALIZED (
  SELECT p.code, p.subspace, p.dim, COALESCE(km{i}.c, p.c) AS c
  FROM kb{i - 1} p
  LEFT JOIN km{i} ON km{i}.code = p.code AND km{i}.subspace = p.subspace
                 AND km{i}.dim = p.dim
)""")
    parts.append(f"""
cb AS MATERIALIZED (
  SELECT code, subspace, dim, c AS c_micro FROM kb{iterations}
)""")
    return ",".join(parts)


def _fully_trained_index_sql() -> str:
    from .catalog35 import _IVFPQ_ENC, _IVFPQ_RES

    return f"""{_trained_cc_prefix()},
{_IVFPQ_RES},
{_trained_cb_chain(_N_CODES, _KM_ITERS)},
{_IVFPQ_ENC}"""


@_register(
    "emb_ivfpq_fully_trained",
    _ivfpq_search_sql(_fully_trained_index_sql()),
)
def emb_ivfpq_fully_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with BOTH quantizers learned (round 9): coarse cells
    from the integer fixed-point k-means AND residual codebooks from
    per-subspace integer Lloyd's (operators/pq.pq_codebooks_trained)
    — nothing leans on the testdata's label column or on arbitrary
    id-modulo binning. This is the production FAISS-style
    train-encode-search pipeline, end-to-end hash-exact because every
    training transition is exact BIGINT arithmetic with total-order
    tie-breaks; the oracle replays both unrolled trainings plus the
    byte-shared assignment/encode/search fragments."""
    from ..operators.pq import ivfpq_index, ivfpq_topk, pq_codebooks_trained

    emb = _t(spark, sf_dir, "embeddings")
    cents = trained_coarse_centroids(spark, emb)
    # the codebook_builder hook shares ivfpq_index's MATERIALIZED
    # coarse-assignment lineage (the n·L·d aggregation runs once per
    # build, not once per downstream consumer) and keeps this module
    # off pq's private helpers — code-review r9 pass-3 #6
    cb, enc = ivfpq_index(
        emb,
        cents,
        n_codes=_N_CODES,
        m=_M,
        sub_dim=_SUB_DIM,
        codebook_builder=lambda res: pq_codebooks_trained(
            res, n_codes=_N_CODES, iterations=_KM_ITERS
        ),
    )
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(
        queries,
        enc,
        cents,
        cb,
        emb,
        k=_K,
        n_probe=_N_PROBE,
        shortlist=_SHORTLIST,
        m=_M,
        sub_dim=_SUB_DIM,
    )
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("adc_d2").cast("bigint").alias("adc_d2"),
        F.col("exact_d2").cast("bigint").alias("exact_d2"),
        F.col("rank").cast("int").alias("rank"),
    )


def _register_trained_recall() -> None:
    from .catalog import QUERIES
    from .catalog8 import _recall_sql, _topk_recall

    # reuse the REGISTERED oracle (not a rebuild) so the recall
    # measurement can never diverge from the query it measures —
    # the catalog8 recall-query discipline (code-review r9 pass-4 #6)
    sql = _recall_sql(
        QUERIES["emb_cosine_topk"]["oracle"],
        QUERIES["emb_ivfpq_fully_trained"]["oracle"],
    )

    @_register("emb_ivfpq_trained_recall", sql)
    def emb_ivfpq_trained_recall(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """recall@5 of the FULLY TRAINED IVF-PQ vs brute-force cosine,
        per query — the driver-recorded quality number for the
        production (label-free) ANN path, same telemetry discipline
        as emb_lsh_recall / emb_ivf_recall / emb_ivfpq_recall: drift
        in learned-quantizer quality between rounds is visible in the
        correctness record, not silent."""
        return _topk_recall(spark, sf_dir, "emb_ivfpq_fully_trained")


_register_trained_recall()
