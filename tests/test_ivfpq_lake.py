"""The persisted IVF-PQ lake layout (s19_ivfpq_lake): writing the
code table PARTITIONED BY cid must make the probed-cell read an
actually-pruned scan (measured via FileSourceScan metrics, the same
measured-fact discipline as test_zorder.py), and pruning must not
change the search result."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.pq import (
    ivf_coarse_centroids,
    ivfpq_index,
    ivfpq_topk,
    probed_cells,
)
from sfdata_wrangler_spark.sources.lake import (
    scan_file_metrics,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"
N_PROBE = 2


def _lake(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_coarse_centroids(emb)
    cb, enc = ivfpq_index(emb, cents)
    path = str(tmp_path_factory.mktemp("ivfpq_lake") / "codes")
    write_partitioned(enc, path, partition_cols=("cid",))
    return emb, cents, cb, enc, path


def _probed_cids(queries, cents):
    return sorted(
        r["cid"]
        for r in probed_cells(queries, cents, n_probe=N_PROBE)
        .select("cid")
        .distinct()
        .collect()
    )


def test_probed_scan_prunes_partitions_measurably(spark, tmp_path_factory):
    emb, cents, cb, enc, path = _lake(spark, tmp_path_factory)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cids = _probed_cids(queries, cents)
    assert 1 <= len(cids) <= 2 * N_PROBE  # nq * n_probe bound

    full = scan_file_metrics(spark.read.parquet(path))
    pruned = scan_file_metrics(
        spark.read.parquet(path).where(F.col("cid").isin(cids))
    )
    # 10 labels -> 10 cid partitions; <= 4 probed cells survive
    assert full["num_partitions"] == 10
    assert pruned["num_partitions"] == len(cids)
    assert pruned["num_files"] < full["num_files"]
    # the pruned scan read exactly the probed cells' rows
    probed_rows = (
        spark.read.parquet(path).where(F.col("cid").isin(cids)).count()
    )
    assert pruned["rows"] == probed_rows < full["rows"]


def test_pruned_lake_search_equals_unpruned(spark, tmp_path_factory):
    emb, cents, cb, enc, path = _lake(spark, tmp_path_factory)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cids = _probed_cids(queries, cents)

    cid_type = dict(enc.dtypes)["cid"]

    def _search(encoded):
        return sorted(
            (r["query_id"], r["vec_id"], r["adc_d2"], r["exact_d2"], r["rank"])
            for r in ivfpq_topk(
                queries, encoded, cents, cb, emb, k=5, n_probe=N_PROBE
            ).collect()
        )

    lake_pruned = (
        spark.read.parquet(path)
        .where(F.col("cid").isin(cids))
        .withColumn("cid", F.col("cid").cast(cid_type))
    )
    lake_full = spark.read.parquet(path).withColumn(
        "cid", F.col("cid").cast(cid_type)
    )
    a = _search(lake_pruned)
    assert a == _search(lake_full) == _search(enc)
    assert len(a) == 10  # 2 queries x k=5
