"""Similarity search: brute-force cosine top-k and hyperplane LSH."""

from pyspark.sql import Row

from sfdata_wrangler_spark.operators.similarity import cosine_topk, lsh_topk


def _corpus(spark):
    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.9, 0.1, 0.0],   # closest to 1
        3: [0.0, 1.0, 0.0],
        4: [-1.0, 0.0, 0.0],  # opposite of 1
        5: [0.5, 0.5, 0.0],
    }
    return spark.createDataFrame(
        [Row(vec_id=k, embedding=v) for k, v in vecs.items()]
    )


def test_cosine_topk_ordering(spark):
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = cosine_topk(queries, corpus, k=2).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [2, 5]
    assert out[0].sim > 0.99
    assert out[0].rank == 1


def test_lsh_single_bucket_equals_bruteforce(spark):
    """With zero hyperplanes everything lands in one bucket — LSH must
    reduce exactly to the brute-force ranking."""
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    brute = [
        (r.vec_id, r.rank)
        for r in cosine_topk(queries, corpus, k=3).orderBy("rank").collect()
    ]
    approx = [
        (r.vec_id, r.rank)
        for r in lsh_topk(queries, corpus, planes=[], k=3).orderBy("rank").collect()
    ]
    assert brute == approx


def test_lsh_buckets_partition_space(spark):
    """One hyperplane on the x-axis separates vec 4 (negative x) from
    the query's bucket."""
    corpus = _corpus(spark)
    queries = corpus.where("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = lsh_topk(
        queries, corpus, planes=[[1.0, 0.0, 0.0]], k=5
    ).collect()
    ids = {r.vec_id for r in out}
    assert 4 not in ids  # opposite hemisphere
    assert 2 in ids


def test_ivf_recall_on_real_embeddings(spark):
    """IVF with k-means cells: recall@5 vs brute force ≥ 0.6 with
    2-of-8 cells probed (and exact when probing all cells)."""
    from sfdata_wrangler_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 10").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    cents = kmeans_centroids(emb, k=8, iterations=3)
    brute = cosine_topk(queries, emb, k=5)
    approx = ivf_topk(queries, emb, cents, k=5, n_probe=2)
    b = {(r.query_id, r.vec_id) for r in brute.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.6, f"recall {recall}"

    full = ivf_topk(queries, emb, cents, k=5, n_probe=8)
    f = {(r.query_id, r.vec_id) for r in full.collect()}
    assert f == b  # probing every cell == brute force


def test_ivf_int_fixed_point_recall_and_determinism(spark):
    """Integer fixed-point k-means (the r9 hash-exact promotion of
    emb_ivf_topk): centroids are exact BIGINT micro-units — two
    independent trainings are bit-identical (no float drift) — and
    IVF recall vs brute force holds: >= 0.6 at 2-of-8 cells, exact
    when probing all cells."""
    from sfdata_wrangler_spark.operators.similarity import (
        ivf_topk_int,
        kmeans_centroids_int,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 10").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    cents = kmeans_centroids_int(emb, k=8, iterations=2)
    again = kmeans_centroids_int(emb, k=8, iterations=2)
    c1 = sorted((r.centroid_id, tuple(r.centroid)) for r in cents.collect())
    c2 = sorted((r.centroid_id, tuple(r.centroid)) for r in again.collect())
    assert c1 == c2
    assert all(
        isinstance(x, int) for _cid, vec in c1 for x in vec
    )  # exact integers, never floats

    brute = cosine_topk(queries, emb, k=5)
    approx = ivf_topk_int(queries, emb, cents, k=5, n_probe=2)
    b = {(r.query_id, r.vec_id) for r in brute.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.6, f"recall {recall}"

    full = ivf_topk_int(queries, emb, cents, k=5, n_probe=8)
    f = {(r.query_id, r.vec_id) for r in full.collect()}
    assert f == b  # probing every cell == brute force
