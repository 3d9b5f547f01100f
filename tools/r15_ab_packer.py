"""A/B three pack_context_windows internals (standalone + inside v3).

  ORIG    : r14 shape — offsets branch aggregates below its own
            partial-agg exchange; window branch shuffles full rows
            (two exchanges, upstream evaluated twice)
  REPART  : repartition("__bkt") first (r15 candidate) — intended to
            share one exchange, but column pruning drops doc_id from
            the offsets branch so the exchanges never canonicalize
            equal and reuse cannot fire
  PERSIST : repartition + tracked_persist of the narrow (id, tokens,
            bkt) stream — both branches scan one cached exchange,
            partitioning preserved (zero further exchanges), upstream
            evaluated once

Usage: python tools/r15_ab_packer.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def make_packer(mode):
    from sfdata_wrangler_spark.operators._cache import tracked_persist

    def pack(df, budget, bucket_width, id_col="doc_id", tokens_col="n_tokens"):
        docs = df.select(
            F.col(id_col),
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.floor(F.col(id_col) / bucket_width).cast("bigint").alias("__bkt"),
        )
        if mode in ("REPART", "PERSIST"):
            docs = docs.repartition("__bkt")
        if mode == "PERSIST":
            docs = tracked_persist(docs)
        wb = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        offsets = (
            docs.groupBy("__bkt")
            .agg(F.sum(tokens_col).alias("__sub"))
            .withColumn("__cum", F.sum("__sub").over(wb))
            .select("__bkt", (F.col("__cum") - F.col("__sub")).alias("__offset"))
        )
        wd = (
            Window.partitionBy("__bkt")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        before = (
            F.col("__offset") + F.sum(tokens_col).over(wd) - F.col(tokens_col)
        )
        return docs.join(F.broadcast(offsets), "__bkt").select(
            id_col,
            tokens_col,
            F.floor(before / budget).cast("bigint").alias("window_id"),
            (before % budget).cast("bigint").alias("window_offset"),
        )

    return pack


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sfdata_wrangler_spark.functions.text import token_count
    from sfdata_wrangler_spark.plans.catalog import _t
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r15-ab-packer")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def standalone(mode):
        # txt_pack_windows shape: docs -> (doc_id, n_tokens) -> pack
        docs = _t(spark, sf_dir, "documents")
        t = docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        return make_packer(mode)(t, 512, 64)

    variants = {m: (lambda m=m: standalone(m)) for m in ("ORIG", "REPART", "PERSIST")}

    ref = None
    for name, fn in variants.items():
        spark.catalog.clearCache()
        rows = sorted(map(tuple, fn().collect()))
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} diverges"
    print(f"# outputs identical ({len(ref)} rows)")

    results = {n: {"count": [], "noop": []} for n in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn().count()
            results[name]["count"].append(time.time() - t0)
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            results[name]["noop"].append(time.time() - t0)
    for name, r in results.items():
        print(
            f"{name}: count best={min(r['count']):.3f} "
            f"all={[round(x, 2) for x in r['count']]} | "
            f"noop best={min(r['noop']):.3f} "
            f"all={[round(x, 2) for x in r['noop']]}"
        )


if __name__ == "__main__":
    main()
