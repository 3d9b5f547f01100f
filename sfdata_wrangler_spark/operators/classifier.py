"""Distributed linear text classifier (beyond-reference surface).

The fasttext-shaped primitive curation pipelines use for quality and
domain filtering: hash tokens into a fixed feature space, train a
logistic model, score every document. The standard deployment is
heuristic distillation — label a corpus slice with a cheap rule (or
human/LLM labels), train, then apply the model corpus-wide.

Everything is DataFrame-native batch gradient descent:

- Features: one token explode → ``pmod(xxhash64(token), n_buckets)``
  → per-(doc, bucket) tf normalized by doc length, plus a bias
  bucket. One shuffle, map-side combinable, fixed-width keys.
- The model is a ``(bucket, w)`` DataFrame of ``n_buckets + 1`` rows —
  broadcast into every scoring join; never corpus-sized.
- One GD iteration = margins (features ⨝ broadcast(weights) →
  groupBy(doc)) → residuals against labels → gradient (groupBy
  bucket) → weight update (outer join of the two tiny tables).
  Two corpus-wide shuffles per iteration, both on compact keys;
  features are localCheckpoint-ed once up front so the explode/hash
  never re-runs (at cluster scale: ``persist(MEMORY_AND_DISK)``).
- Driver traffic per iteration: nothing but the job itself (the
  weight table stays distributed; ``localCheckpoint`` truncates the
  iteration lineage exactly like the k-means / connected-components /
  BPE loops elsewhere in this engine).

Floating-point note: ``sigmoid`` uses ``exp`` — this operator has no
cross-engine oracle (training is iterative), so transcendentals are
fine here; determinism within Spark is preserved up to float sum
order, and declared query outputs round scores defensively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

BIAS_BUCKET = -1


def hashed_token_features(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse hashed bag-of-words: ``(id_col, bucket, x)`` with
    x = token_count(bucket)/doc_len, plus a bias row (bucket = -1,
    x = 1) per document."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    counts = toks.groupBy(
        id_col, F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    dl = counts.groupBy(id_col).agg(F.sum("cnt").alias("dl"))
    tf = counts.join(dl, id_col).select(
        id_col, "bucket", (F.col("cnt") / F.col("dl")).alias("x")
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return tf.unionByName(bias)


def logreg_train(
    features: DataFrame,
    labels: DataFrame,
    iterations: int = 20,
    lr: float = 2.0,
    reg: float = 1e-4,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> DataFrame:
    """Batch-GD logistic regression over hashed features.

    ``labels`` is ``(id_col, label_col)`` with y in {0, 1}. Returns
    the weight table ``(bucket, w)``. Deterministic up to float sum
    order (fixed iteration count, no sampling, no RNG).
    """
    feats = features.join(
        labels.select(F.col(id_col), F.col(label_col).cast("double").alias("__y")),
        id_col,
    ).localCheckpoint(eager=True)
    n_docs = feats.select(id_col).distinct().count()

    weights = (
        feats.select("bucket").distinct()
        .withColumn("w", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        margins = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy(id_col, "__y")
            .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
            .select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("__y")
                ).alias("resid"),
            )
        )
        # margins is per-doc (corpus-sized) — a shuffle equi-join on
        # the doc id, never a broadcast
        grad = (
            feats.join(margins, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("resid")) / F.lit(n_docs)).alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w") * F.lit(1.0 - lr * reg)
                    - F.lit(lr) * F.coalesce("g", F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return weights


def hashed_token_features_micro(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer-micro variant of :func:`hashed_token_features` for the
    DETERMINISTIC trainer: ``(id_col, bucket, x_micro)`` with
    ``x_micro = (count * 1e6) div doc_len`` (exact BIGINT — no float
    division anywhere) and an md5-derived bucket
    (``conv(substr(md5(tok), 1, 4), 16, 10) % n_buckets``) that an
    external SQL engine can replay, unlike xxhash64. Bias row:
    ``(bucket = -1, x_micro = 1e6)``."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("bigint")
        % n_buckets
    )
    counts = toks.groupBy(id_col, bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    dl = counts.groupBy(id_col).agg(F.sum("cnt").alias("dl"))
    tf = counts.join(dl, id_col).select(
        id_col,
        "bucket",
        F.expr("(cnt * 1000000) div dl").cast("bigint").alias("x_micro"),
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"),
        F.lit(1_000_000).cast("bigint").alias("x_micro"),
    )
    return tf.unionByName(bias)


def logreg_train_micro(
    features: DataFrame,
    labels: DataFrame,
    iterations: int = 10,
    lr: int = 2,
    id_col: str = "doc_id",
    label_col: str = "y",
) -> DataFrame:
    """DETERMINISTIC distributed trainer: batch GD over integer-micro
    features with a hard-sigmoid link, all arithmetic in exact BIGINTs.

    Why this exists next to :func:`logreg_train`: the float trainer's
    gradient SUMS depend on reduce order, so two runs of the same job
    on a many-executor cluster can ship (slightly) different models —
    operationally poisonous for reproducible data-curation lineage,
    and un-oracle-able. Quantized training fixes both: per-iteration
    state is ``(bucket, w_micro)`` BIGINTs, every sum is an integer
    sum (shuffle-order independent), and the full trajectory replays
    bit-for-bit in external SQL (txt_quality_distill_det's chained-CTE
    oracle — the BPE-unroll device applied to gradient descent).

    The link is the hard sigmoid ``p = clamp(m/4 + 1/2, 0, 1)`` (the
    standard quantized-inference surrogate): linear, so it stays in
    integer arithmetic; its GD is a robust squared-loss-style trainer
    for the same linear decision boundary. Scales: x 1e6, w 1e6,
    margins/gradients 1e12 — bounded well inside BIGINT for any
    corpus size (the 1e12-scale sums are per-doc / per-bucket, and
    ``n_docs`` rescales the gradient before it ever reaches 1e18).

    Same shuffle shape as the float trainer: two compact-key shuffles
    per iteration, model stays broadcast-sized, lineage truncated per
    step."""
    feats = features.join(
        labels.select(
            F.col(id_col), F.col(label_col).cast("bigint").alias("__y")
        ),
        id_col,
    ).localCheckpoint(eager=True)
    n_docs = feats.select(id_col).distinct().count()

    weights = (
        feats.select("bucket")
        .distinct()
        .withColumn("w_micro", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        resid = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy(id_col, "__y")
            .agg(F.sum(F.col("x_micro") * F.col("w_micro")).alias("m12"))
            .select(
                id_col,
                (
                    F.least(
                        F.lit(1_000_000).cast("bigint"),
                        F.greatest(
                            F.lit(0).cast("bigint"),
                            F.expr("m12 div 4000000") + F.lit(500_000),
                        ),
                    )
                    - F.col("__y") * F.lit(1_000_000)
                ).alias("resid_micro"),
            )
        )
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(F.col("x_micro") * F.col("resid_micro")).alias("g12")
            )
            .select(
                "bucket",
                # denominator precomputed in Python: an INT*INT literal
                # product inside the SQL string overflows int32 under
                # ANSI once n_docs > 2147 (hit at the sf0.5 probe)
                F.expr(f"g12 div {n_docs * 1_000_000}")
                .cast("bigint")
                .alias("g_micro"),
            )
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w_micro")
                    - F.lit(int(lr)) * F.coalesce("g_micro", F.lit(0))
                )
                .cast("bigint")
                .alias("w_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return weights


def logreg_predict_micro(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score integer-micro features against a micro weight table:
    ``(id_col, margin_micro12, pred)`` — the margin in 1e12 units
    (exact BIGINT) and ``pred = margin >= 0``. Bitwise-stable: the
    same inputs score identically on any cluster layout."""
    return (
        features.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("x_micro") * F.col("w_micro"))
            .cast("bigint")
            .alias("margin_micro12")
        )
        .select(
            id_col,
            "margin_micro12",
            (F.col("margin_micro12") >= 0).alias("pred"),
        )
    )


def logreg_predict(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents: ``(id_col, score, pred)`` with score =
    sigmoid(w·x) and pred = score >= 0.5."""
    return (
        features.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("score"),
            (F.col("m") >= 0).alias("pred"),
        )
    )


def binary_classification_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    thresholds: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.9),
) -> DataFrame:
    """Precision/recall/accuracy table for a scored frame at fixed
    thresholds — the evaluation readout for the distilled quality
    filter (or any binary scorer).

    One aggregation pass: per threshold, four conditional BIGINT
    sums (tp/fp/fn/tn) — the threshold list is a plan-time literal,
    so the whole report is a single map-side-combinable agg with no
    shuffle of the scores and no sort (contrast ROC curves, which
    need the global score ordering). The four BIGINT counts are the
    exact numerators/denominators; precision, recall, and accuracy
    are convenience doubles derived from them (NULL on an empty
    denominator).
    """
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col(score_col) >= F.lit(float(t))
        pos = F.col(label_col) == 1
        aggs += [
            F.sum(F.when(pred & pos, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tp_{i}"),
            F.sum(F.when(pred & ~pos, 1).otherwise(0))
            .cast("bigint")
            .alias(f"fp_{i}"),
            F.sum(F.when(~pred & pos, 1).otherwise(0))
            .cast("bigint")
            .alias(f"fn_{i}"),
            F.sum(F.when(~pred & ~pos, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tn_{i}"),
        ]
    wide = scored.agg(*aggs)
    entries = []
    for i, t in enumerate(thresholds):
        entries.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"tp_{i}").alias("tp"),
                F.col(f"fp_{i}").alias("fp"),
                F.col(f"fn_{i}").alias("fn"),
                F.col(f"tn_{i}").alias("tn"),
            )
        )
    long = wide.select(F.explode(F.array(*entries)).alias("r")).select(
        "r.*"
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    total = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    accuracy = F.when(
        total > 0,
        (F.col("tp") + F.col("tn")).cast("double") / total.cast("double"),
    )
    return long.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        accuracy.alias("accuracy"),
    )


def calibration_table(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    buckets: int = 10,
) -> DataFrame:
    """Score-calibration table: rows bucketed by score decile (fixed
    equal-WIDTH buckets over [0, 1] — plan-time arithmetic, no
    quantile pass), per bucket the mean predicted score vs the
    observed positive rate. A well-calibrated scorer has the two
    tracking each other; the gap per bucket is the reliability
    diagram every model card plots.

    Integer counts; the two means are single divisions over exact
    sums (score sums in micro-units).
    """
    b = F.least(
        F.floor(F.col(score_col) * buckets).cast("int"), F.lit(buckets - 1)
    )
    agg = (
        scored.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor(F.col(score_col) * 1_000_000 + 0.5))
            .cast("bigint")
            .alias("score_sum_micro"),
            F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
        )
    )
    return agg.select(
        "bucket",
        "n",
        "n_pos",
        (F.col("score_sum_micro").cast("double") / F.col("n").cast("double")
         / F.lit(1e6)).alias("mean_score"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
    )


def grouped_classification_report(
    scored: DataFrame,
    group_cols: Sequence[str],
    score_col: str = "score",
    label_col: str = "y",
    threshold: float = 0.5,
) -> DataFrame:
    """Per-slice confusion readout at one threshold — the fairness /
    data-QA companion to :func:`binary_classification_report`'s
    global threshold sweep: a scorer that clears the aggregate bar
    can still fail a language, a source domain, or a time slice, and
    the slice table is what surfaces it.

    One combinable aggregation keyed by the slice columns; output is
    slice-cardinality sized. Counts are exact BIGINTs; the ratios are
    single divisions (NULL on empty denominators), so the whole
    report hash-checks cross-engine.
    """
    pred = F.col(score_col) >= F.lit(float(threshold))
    pos = F.col(label_col) == 1
    agg = scored.groupBy(*group_cols).agg(
        F.sum(F.when(pred & pos, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(pred & ~pos, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(~pred & pos, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~pred & ~pos, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    total = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    accuracy = F.when(
        total > 0,
        (F.col("tp") + F.col("tn")).cast("double") / total.cast("double"),
    )
    # selection rate: the disparate-impact numerator per slice
    sel = F.when(
        total > 0,
        (F.col("tp") + F.col("fp")).cast("double") / total.cast("double"),
    )
    return agg.select(
        *group_cols,
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        accuracy.alias("accuracy"),
        sel.alias("selection_rate"),
    )
