"""VERDICT r13 ask #5: recall under heavy deletion is bounded.

``ann_tombstone_serve`` certifies value-identity to a filtered index;
these tests certify the filtered index still finds the right
SURVIVORS when half of every probed cell is tombstoned — the
shortlist-thinning effect the r13 verdict flagged as unmeasured. The
serve's anti-join runs BEFORE the shortlist, so k candidates always
emerge from the surviving pool; the question is whether they are the
true top-k over survivors.
"""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.ann_refresh import (
    refresh_generation,
    serve_current,
    tombstone_ids,
)
from sfdata_wrangler_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"
KW = dict(km_k=8, km_iters=2, n_codes=16, cb_iters=2, m=8, sub_dim=8)
SERVE = dict(k=5, n_probe=2, shortlist=32)
N_QUERIES = 16


def _recall(exact, approx):
    """Mean recall@k of approx vs exact over the query set."""
    hits = exact.join(
        approx.withColumn("__hit", F.lit(1)), ["query_id", "vec_id"], "left"
    )
    row = hits.agg(
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))).alias(
            "r"
        )
    ).collect()[0]
    return float(row["r"])


def test_recall_under_half_cell_deletion_stays_in_band(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # undeleted baseline: full index, recall vs exact over full corpus
    root_full = str(tmp_path / "full")
    refresh_generation(spark, root_full, emb, **KW)
    base = serve_current(spark, root_full, queries, emb, **SERVE).select(
        "query_id", "vec_id"
    )
    base_recall = _recall(
        cosine_topk(queries, emb, k=SERVE["k"]).select("query_id", "vec_id"),
        base,
    )

    # heavy deletion: tombstone HALF the corpus by parity (every
    # probed cell loses ~50% of its members), same index geometry
    root_ts = str(tmp_path / "ts")
    refresh_generation(spark, root_ts, emb, **KW)
    tombstone_ids(
        spark,
        root_ts,
        emb.where(F.pmod("vec_id", F.lit(2)) == 0).select("vec_id"),
    )
    survivors = emb.where(F.pmod("vec_id", F.lit(2)) == 1)
    got = serve_current(spark, root_ts, queries, emb, **SERVE).select(
        "query_id", "vec_id"
    ).collect()

    # (a) k results per query, all survivors — the anti-join is
    # pre-shortlist, so deletion thins the POOL, never the answer size
    by_q: dict = {}
    for r in got:
        assert r["vec_id"] % 2 == 1, r
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert len(by_q) == N_QUERIES
    assert all(len(v) == SERVE["k"] for v in by_q.values())

    # (b) recall vs exact-over-survivors stays within the undeleted
    # band: the 32-candidate shortlist against k=5 absorbs 50% cell
    # thinning (sf0.001+sf0.01 catalog measurements agree). Were this
    # to fail, the serve-side mitigation is inflating `shortlist` by
    # the probed cells' tombstoned fraction.
    ts_df = spark.createDataFrame(
        [(q, v) for q, vs in by_q.items() for v in vs],
        "query_id long, vec_id long",
    )
    ts_recall = _recall(
        cosine_topk(queries, survivors, k=SERVE["k"]).select(
            "query_id", "vec_id"
        ),
        ts_df,
    )
    assert ts_recall >= base_recall - 0.15, (ts_recall, base_recall)
