"""Similarity search over embedding columns (``array<float>``).

Beyond-reference surface (BASELINE.json north star).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` in
  double precision (deterministic left-to-right fold, matching the
  DuckDB oracle's sequential list functions).
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path.
  Corpus vectors hash to sign-pattern buckets; each query probes only
  its own bucket (plus optional multiprobe neighbors), so the join is
  bucket-equi, never a full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.metrics import portable_round
from ..sources.inline import values_df


def _dot(a: Column, b: Column) -> Column:
    # aggregate-over-zip_with fold. Measured alternatives at 340k
    # 64-dim pairs: this HOF fold 1.3s; a fully-unrolled
    # a[0]*b[0]+... chain 3.8s (64 GetArrayItem nodes blow past
    # codegen limits and interpret WORSE than the specialized fold).
    # Keep the fold — it is also the oracle's sequential order.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Broadcast the query
    side (queries are few; corpus is the 100 TB side), rank with a
    per-query window, deterministic tie-break on corpus id."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qv")
    )
    joined = corpus.crossJoin(F.broadcast(q)).where(
        F.col(query_id) != F.col(corpus_id)
    )
    # rank on the EXACT similarity (rounding first would create ties);
    # emit the rounded value for stable cross-engine comparison
    scored = joined.select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col(vec_col)).alias("__sim_exact"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__sim_exact").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("sim", portable_round(F.col("__sim_exact"), 4))
        .drop("__sim_exact")
    )


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH: bit i set iff
    dot(vec, plane_i) >= 0. Planes are literals (broadcast constants)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane signature and
    rank within buckets. Recall is tuned by the number of planes (fewer
    planes → bigger buckets → higher recall, more compute)."""
    cb = corpus.withColumn("__bkt", hyperplane_signature(F.col(vec_col), planes))
    qb = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        hyperplane_signature(F.col(vec_col), planes).alias("__bkt"),
    )
    joined = cb.join(F.broadcast(qb), "__bkt").where(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col(vec_col)).alias("__sim_exact"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__sim_exact").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("sim", portable_round(F.col("__sim_exact"), 4))
        .drop("__sim_exact")
    )


def lsh_neardup_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.9,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-prefiltered: the
    scale path for semantic dedup. Both sides bucket by hyperplane
    sign-signature; the candidate join is bucket-equi (never a cross
    product / BNL join), then candidates are exactly re-scored and
    filtered at ``threshold``. Returns (id_a, id_b, __sim_exact) with
    id_a < id_b; recall is tuned by the number of planes (fewer planes
    → bigger buckets → higher recall). Candidate count per bucket is
    quadratic in bucket size, so at 100 TB pick enough planes that
    buckets stay executor-sized."""
    sig = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), planes).alias("__bkt"),
    )
    a = sig.select(
        F.col(corpus_id).alias("id_a"),
        F.col(vec_col).alias("__va"),
        "__bkt",
    )
    b = sig.select(
        F.col(corpus_id).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        "__bkt",
    )
    pairs = a.join(b, ["__bkt"]).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine(F.col("__va"), F.col("__vb")).alias("__sim_exact"),
        )
        .where(F.col("__sim_exact") >= threshold)
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means in pure DataFrame ops → (centroid_id,
    centroid array<double>). Seeds deterministically from the k
    lowest-id vectors; each iteration = one broadcast assign + one
    posexplode/groupBy mean. Iterations are few and each is one
    shuffle — the standard coarse-quantizer training shape."""
    # the corpus is scanned twice per iteration (assign + mean);
    # persist it across the loop so each iteration reads cached blocks
    # instead of re-scanning the source (at 100 TB: one scan, not 2k)
    corpus = corpus.persist()
    try:
        seeds = [
            (int(r[0]), [float(x) for x in r[1]])
            for r in corpus.select(corpus_id, vec_col)
            .orderBy(corpus_id)
            .limit(k)
            .collect()
        ]
        centroids = [(i, vec) for i, (_, vec) in enumerate(seeds)]
        spark = corpus.sparkSession
        for _ in range(iterations):
            # VALUES LocalRelation, not createDataFrame: a Python-list
            # RDD costs a Python-runner spin-up on every action that
            # touches it — per Lloyd iteration, that dominates
            cdf = values_df(
                spark, "centroid_id: int, centroid: array<double>", centroids
            )
            assigned = assign_to_centroids(corpus, cdf, corpus_id, vec_col)
            new = (
                assigned.join(corpus, corpus_id)
                .select(
                    "centroid_id", F.posexplode(vec_col).alias("pos", "x")
                )
                .groupBy("centroid_id", "pos")
                .agg(F.avg(F.col("x").cast("double")).alias("m"))
                .groupBy("centroid_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("pm")
                )
                .select(
                    "centroid_id",
                    F.transform(F.col("pm"), lambda s: s["m"]).alias(
                        "centroid"
                    ),
                )
            )
            centroids = [
                (int(r.centroid_id), [float(x) for x in r.centroid])
                for r in new.collect()
            ]
        return values_df(
            spark, "centroid_id: int, centroid: array<double>", centroids
        )
    finally:
        corpus.unpersist()


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id): nearest centroid by cosine — broadcast the
    (tiny) centroid table, rank per vector. One pass, no shuffle of
    the corpus beyond the rank window's partial."""
    joined = corpus.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        corpus_id,
        "centroid_id",
        cosine(F.col(vec_col), F.col("centroid")).alias("__sim"),
    )
    w = Window.partitionBy(corpus_id).orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(corpus_id, "centroid_id")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest
    centroid's cell; each query probes its ``n_probe`` nearest cells
    only. The candidate join is cell-equi (like LSH buckets) — the
    inverted-file ANN the brief's scale path calls for."""
    cells = assign_to_centroids(corpus, centroids, corpus_id, vec_col)
    indexed = corpus.join(cells, corpus_id)

    qjoined = queries.crossJoin(F.broadcast(centroids))
    qscored = qjoined.select(
        query_id,
        F.col(vec_col).alias("__qv"),
        "centroid_id",
        cosine(F.col(vec_col), F.col("centroid")).alias("__sim"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= n_probe)
        .select(query_id, "__qv", "centroid_id")
    )

    cand = indexed.join(F.broadcast(probes), "centroid_id").where(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = cand.select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col(vec_col)).alias("__sim_exact"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__sim_exact").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("sim", portable_round(F.col("__sim_exact"), 4))
        .drop("__sim_exact")
    )


def semdedup_prune(
    corpus: DataFrame,
    cluster_col: str = "label",
    threshold: float = 0.9,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDedup-style per-cluster semantic pruning: within each
    cluster, a vector is dropped when an earlier (lower-id) cluster
    member sits above the cosine ``threshold`` — the deterministic
    edge rule (drop the max id of every hot pair), so the kept set is
    a pure function of the data, reproducible across engines and
    re-runs.

    Returns the corpus with an ``int`` ``dropped`` flag (1 = prune
    before training).

    Scale shape: the pair join is cluster-equi, so cost is
    Σ cluster_size² — the standard SemDedup regime where the cluster
    count grows with the corpus and clusters stay executor-sized. For
    fat clusters swap the inner pairing for ``lsh_neardup_pairs``
    (bucket-prefiltered) inside each cluster; the drop rule is
    unchanged.
    """
    # Pre-compute each vector's norm once; the pair predicate then
    # costs one dot product instead of dot + two norms (3x fewer
    # array folds in the quadratic part). sqrt(Σx²) here and the
    # product below are the same IEEE ops as cosine(), so results
    # (and the oracle hash) are bit-identical.
    sided = corpus.select(
        F.col(cluster_col).alias("__cl"),
        F.col(corpus_id),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("__nn"),
    )
    a = sided.select(
        F.col("__cl"),
        F.col(corpus_id).alias("__id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__nn").alias("__na"),
    )
    b = sided.select(
        F.col("__cl"),
        F.col(corpus_id).alias("__id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__nn").alias("__nb"),
    )
    dup_ids = (
        a.join(b, "__cl")
        .where(F.col("__id_a") < F.col("__id_b"))
        .where(
            _dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb"))
            >= threshold
        )
        .select(F.col("__id_b").alias(corpus_id))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return (
        corpus.join(dup_ids, corpus_id, "left")
        .withColumn("dropped", F.coalesce("__dropped", F.lit(0)).cast("int"))
        .drop("__dropped")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training hard-negative mining: per query, the k
    most-similar corpus vectors with a DIFFERENT label (similar
    content, wrong class — the negatives that actually move a
    contrastive loss). Same broadcast-query/window-rank shape as
    :func:`cosine_topk` with the label-exclusion predicate pushed
    below the ranking; swap the corpus side for
    :func:`lsh_topk`-style bucketing when queries are corpus-sized."""
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__qlabel"),
    )
    joined = corpus.crossJoin(F.broadcast(q)).where(
        (F.col(label_col) != F.col("__qlabel"))
        & (F.col(query_id) != F.col(corpus_id))
    )
    scored = joined.select(
        query_id,
        corpus_id,
        F.col(label_col),
        cosine(F.col("__qv"), F.col(vec_col)).alias("__sim_exact"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__sim_exact").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("sim", portable_round(F.col("__sim_exact"), 4))
        .drop("__sim_exact")
    )


# --------------------------------------------------------------------------- #
# Integer fixed-point k-means + IVF — the hash-exact promotion device         #
# --------------------------------------------------------------------------- #


def _to_micro(vec: Column) -> Column:
    """array<bigint> micro-units: floor(x*1e6 + 0.5) per component —
    the exact quantization idiom shared with operators/pq.py (both
    engines compute it identically in double, then all arithmetic
    below is integer)."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
            "bigint"
        ),
    )


def _l2sq_int(a: Column, b: Column) -> Column:
    """Exact squared L2 between two micro-int vectors (BIGINT fold:
    (4e6)^2 * dims ~ 5e14 per pair — orders of magnitude inside the
    9.2e18 BIGINT range)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def kmeans_centroids_int(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as an INTEGER FIXED POINT → ``(centroid_id,
    centroid array<bigint>)`` in micro-units.

    The float k-means (:func:`kmeans_centroids`) is correct but not
    oracle-replayable: float means drift by ulps between engines and
    flip assignment ties. Here every state transition is exact
    integer arithmetic — quantize to micro ints, seed from the k
    lowest-id vectors, assign by exact squared-L2 (tie → lower
    centroid id), update each centroid coordinate as the TRUNCATING
    integer-division mean ``sum div count`` (Spark ``div`` == DuckDB
    ``//``, both toward zero — verified) — so any engine replaying
    the same unrolled iterations lands on bit-identical centroids.
    The same device as the BPE / integer-GD / integer-pagerank
    promotions (plans/catalog20.py).

    Scale shape is unchanged from the float version: per iteration
    one broadcast assign + one posexplode/groupBy mean; only k
    centroid rows ever reach the driver. Empty cells keep their
    previous centroid (both engines COALESCE the same way).
    """
    spark = corpus.sparkSession
    ivecs = corpus.select(
        F.col(corpus_id), _to_micro(F.col(vec_col)).alias("__iv")
    ).persist()
    try:
        seeds = (
            ivecs.orderBy(corpus_id).limit(k).select("__iv").collect()
        )
        centroids = [(i, list(r["__iv"])) for i, r in enumerate(seeds)]
        for _ in range(iterations):
            cdf = values_df(
                spark, "centroid_id: int, c: array<bigint>", centroids
            )
            d = ivecs.crossJoin(F.broadcast(cdf)).select(
                corpus_id,
                "centroid_id",
                "__iv",
                _l2sq_int(F.col("__iv"), F.col("c")).alias("__d2"),
            )
            w = Window.partitionBy(corpus_id).orderBy(
                F.col("__d2").asc(), F.col("centroid_id")
            )
            assigned = (
                d.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select(corpus_id, "centroid_id", "__iv")
            )
            new = (
                assigned.select(
                    "centroid_id", F.posexplode("__iv").alias("pos", "x")
                )
                .groupBy("centroid_id", "pos")
                .agg(F.expr("sum(x) div count(1)").alias("m"))
                .groupBy("centroid_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("pm")
                )
                .select(
                    "centroid_id",
                    F.transform(F.col("pm"), lambda s: s["m"]).alias("c"),
                )
            )
            updated = {
                int(r["centroid_id"]): [int(x) for x in r["c"]]
                for r in new.collect()
            }
            centroids = [
                (cid, updated.get(cid, prev)) for cid, prev in centroids
            ]
        return values_df(
            spark, "centroid_id: int, centroid: array<bigint>", centroids
        )
    finally:
        ivecs.unpersist()


def ivf_topk_int(
    queries: DataFrame,
    corpus: DataFrame,
    centroids_int: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with an integer coarse quantizer: cell assignment
    and probe selection use exact squared-L2 over micro ints (the
    FAISS-standard coarse metric, deterministic in every engine);
    the final re-rank is exact double cosine over the ORIGINAL
    vectors — identical join shape to :func:`ivf_topk` (cell-equi
    candidates, broadcast probes, never all-pairs)."""
    cent = centroids_int.select(
        "centroid_id", F.col("centroid").alias("__c")
    )
    corp = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        _to_micro(F.col(vec_col)).alias("__iv"),
    )
    d = corp.crossJoin(F.broadcast(cent)).select(
        corpus_id,
        vec_col,
        "centroid_id",
        _l2sq_int(F.col("__iv"), F.col("__c")).alias("__d2"),
    )
    wc = Window.partitionBy(corpus_id).orderBy(
        F.col("__d2").asc(), F.col("centroid_id")
    )
    indexed = (
        d.withColumn("__rn", F.row_number().over(wc))
        .where(F.col("__rn") == 1)
        .select(corpus_id, vec_col, "centroid_id")
    )

    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__qv"),
        _to_micro(F.col(vec_col)).alias("__qiv"),
    )
    qd = q.crossJoin(F.broadcast(cent)).select(
        query_id,
        "__qv",
        "centroid_id",
        _l2sq_int(F.col("__qiv"), F.col("__c")).alias("__d2"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("__d2").asc(), F.col("centroid_id")
    )
    probes = (
        qd.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= n_probe)
        .select(query_id, "__qv", "centroid_id")
    )

    cand = indexed.join(F.broadcast(probes), "centroid_id").where(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = cand.select(
        query_id,
        corpus_id,
        cosine(F.col("__qv"), F.col(vec_col)).alias("__sim_exact"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("__sim_exact").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("sim", portable_round(F.col("__sim_exact"), 4))
        .drop("__sim_exact")
    )
