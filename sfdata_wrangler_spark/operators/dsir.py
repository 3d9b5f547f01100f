"""DSIR-shape importance resampling for data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by how much more likely its features are
under a TARGET corpus' distribution than under the raw corpus' own,
then keeps the top-weighted slice. The canonical instantiation —
hashed n-gram features, two multinomial bag models, per-document
likelihood ratio — is exactly aggregation + broadcast-join shaped,
so it distributes without any of the paper's reservoir machinery:

1. featurize: token → hashed bucket (md5 hex prefix, 256 buckets —
   the same portable string-bucket trick as operators/sketch.py);
2. two bucket-count models (target, raw): map-side-combinable
   groupBys producing <= 256 rows each, add-one smoothed;
3. score: per-doc sum over token occurrences of the per-bucket
   probability RATIO, via a broadcast join of the two tiny models;
4. select: threshold on the mean ratio.

Determinism (same policy as operators/lm.py): no ``ln`` — the score
is the arithmetic mean of per-token ratios p_b/q_b scaled to integer
micro-units before summation, so accumulation order cannot perturb
it and a SQL oracle reproduces it bit-for-bit. The log-ratio sum is
a one-line swap where cross-engine parity is not needed.

At 100 TB: the corpus is touched twice (model pass, scoring pass),
both times map-locally except one 256-row shuffle and one per-doc
groupBy; the models broadcast everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

__all__ = ["dsir_bucket_counts", "dsir_weights", "dsir_select"]

_N_BUCKETS = 256  # 2 hex chars


def _doc_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__tok"),
    ).where(F.col("__tok") != "")
    return toks.select(
        id_col, F.substring(F.md5("__tok"), 1, 2).alias("bucket")
    )


def dsir_bucket_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hashed-unigram model counts: ``(bucket, cnt)``, <= 256 rows."""
    return (
        _doc_buckets(df, id_col, text_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Importance scores for every raw document: ``(id, n_toks,
    sum_ratio_micro, mean_ratio_micro)`` where ratio_micro is the
    per-token ``(p_target / p_raw)`` in integer micro-units,
    add-one smoothed over the 256 hashed buckets."""
    p = dsir_bucket_counts(target, id_col, text_col).select(
        "bucket", F.col("cnt").alias("p_cnt")
    )
    q = dsir_bucket_counts(raw, id_col, text_col).select(
        "bucket", F.col("cnt").alias("q_cnt")
    )
    p_tot = p.agg(F.sum("p_cnt").alias("p_n"))
    q_tot = q.agg(F.sum("q_cnt").alias("q_n"))
    model = (
        q.join(F.broadcast(p), "bucket", "left")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
        .select(
            "bucket",
            F.floor(
                (
                    (
                        (F.coalesce("p_cnt", F.lit(0)) + 1).cast("double")
                        / (F.col("p_n") + F.lit(_N_BUCKETS)).cast("double")
                    )
                    / (
                        (F.col("q_cnt") + 1).cast("double")
                        / (F.col("q_n") + F.lit(_N_BUCKETS)).cast("double")
                    )
                )
                * 1e6
                + 0.5
            )
            .cast("bigint")
            .alias("ratio_micro"),
        )
    )
    occ = _doc_buckets(raw, id_col, text_col)
    scored = occ.join(F.broadcast(model), "bucket")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        F.sum("ratio_micro").cast("bigint").alias("sum_ratio_micro"),
        F.expr("sum(ratio_micro) div count(1)")
        .cast("bigint")
        .alias("mean_ratio_micro"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    threshold_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw documents whose mean per-token target/raw ratio clears the
    threshold (1_000_000 = 'as likely under target as under raw').
    A pure filter on the scored table — no global sort, no sampling
    state; the kept set is a deterministic function of the corpora."""
    w = dsir_weights(raw, target, id_col, text_col)
    return w.where(F.col("mean_ratio_micro") >= threshold_micro)
