"""Product quantization (PQ) for embedding ANN.

The memory-side companion to the IVF coarse quantizer in
operators/similarity.py (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into
``m`` subvectors, quantize each against a small per-subspace
codebook, and answer queries with Asymmetric Distance Computation —
a per-query lookup table (LUT) of subspace distances, so the scan
touches only the m-byte codes, never the original vectors.

Distributed shape:
- codebooks: one groupBy over (code, subspace, dim) — codebook-sized
  output, broadcast everywhere else;
- encoding: corpus exploded to subvector granularity joins the
  BROADCAST codebook; the m×L candidate blowup (m subspaces × L
  codes) is the knob the caller controls;
- ADC: the encoded corpus (n·m rows of integer codes) joins the
  BROADCAST per-query LUT (nq·m·L rows) and folds per (query, vec) —
  the corpus is never shuffled pairwise and never re-reads vectors;
- top-k: per-query window with (distance, vec_id) total order.

Determinism: this implementation quantizes coordinates to integer
MICRO-UNITS first and does ALL distance arithmetic in BIGINT —
squared-L2 sums of micro ints, no floating point anywhere past the
initial quantization — so results (and the DuckDB oracle) are exact
to the bit with no IEEE accumulation-order analysis at all. The
codebook here is the deterministic label-mean quantizer (the same
device as the IVF labels twin: integer-division means per label);
a k-means codebook drops in wherever cross-engine hash parity is
not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_codebooks", "pq_encode", "pq_adc_topk"]


def _long_form(emb: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int):
    """(id, subspace, dim, x_micro) — one row per coordinate."""
    return emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("__pos", "__x"),
    ).select(
        id_col,
        (F.col("__pos") / sub_dim).cast("int").alias("subspace"),
        (F.col("__pos") % sub_dim).alias("dim"),
        F.floor(F.col("__x").cast("double") * 1e6 + 0.5)
        .cast("bigint")
        .alias("x_micro"),
    )


def pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-mean codebooks: ``(code, subspace, dim, c_micro)`` where
    c_micro = integer-division mean of the micro coordinates of all
    vectors sharing the label. Codebook-sized output (L·d rows)."""
    lf = _long_form(emb.select(id_col, vec_col, label_col), id_col, vec_col, m, sub_dim)
    labeled = lf.join(
        emb.select(id_col, F.col(label_col).alias("code")), id_col
    )
    return labeled.groupBy("code", "subspace", "dim").agg(
        F.expr("sum(x_micro) div count(1)").cast("bigint").alias("c_micro")
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: ``(id, subspace, code)`` — per subspace, the code
    whose centroid minimizes exact integer squared-L2 distance (ties
    break to the smallest code). One corpus pass against the
    broadcast codebook."""
    lf = _long_form(emb, id_col, vec_col, m, sub_dim)
    j = lf.join(F.broadcast(codebooks), ["subspace", "dim"])
    dists = j.groupBy(id_col, "subspace", "code").agg(
        F.sum(
            (F.col("x_micro") - F.col("c_micro"))
            * (F.col("x_micro") - F.col("c_micro"))
        ).alias("d2")
    )
    best = dists.groupBy(id_col, "subspace").agg(
        F.min(F.struct("d2", "code")).alias("__b")
    )
    return best.select(id_col, "subspace", F.col("__b.code").alias("code"))


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: ``(query_id, vec_id, adc_d2,
    rank)``. The per-query LUT (nq·m·L rows) broadcasts; the encoded
    corpus joins it on (subspace, code) and folds the m partial
    distances per (query, vec). Exact BIGINT arithmetic end to
    end."""
    qlf = _long_form(queries, query_id, vec_col, m, sub_dim)
    lut = (
        qlf.join(F.broadcast(codebooks), ["subspace", "dim"])
        .groupBy(query_id, "subspace", "code")
        .agg(
            F.sum(
                (F.col("x_micro") - F.col("c_micro"))
                * (F.col("x_micro") - F.col("c_micro"))
            ).alias("lut_d2")
        )
    )
    scored = (
        encoded.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy(query_id, corpus_id)
        .agg(F.sum("lut_d2").alias("adc_d2"))
        .where(F.col(query_id) != F.col(corpus_id))
    )
    w = Window.partitionBy(query_id).orderBy("adc_d2", corpus_id)
    return (
        scored.select(
            query_id, corpus_id, "adc_d2", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= k)
    )
