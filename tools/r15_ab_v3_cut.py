"""A/B: cut the pipe_curation_v3 tail's recomputation fan-out.

The v3 tail has three branch points below the `cleaned` checkpoint —
the LM-filter join, the sampling rates aggregate, and the packer's
bucket-offset aggregate — and each branch replays everything above
it: the pre-AQE plan prints the bigram-LM aggregation pipeline FOUR
times (plans/r14/pipe_curation_v3_after.txt, zero ReusedExchange).
Variants:

  A: current catalog16 plan (one cut at `cleaned`)
  B: + second lazy localCheckpoint at `langd` (doc_id, n_tokens,
     lang — three narrow columns), so the sampling/packing branches
     scan a materialized int stream instead of replaying the LM
     (guide §5 "caching is worth it when reused AND recompute is
     expensive", §3.3 "materialising an intermediate truncates the
     plan")
  C: B + exchange-shared packer: repartition by __bkt once so the
     bucket-offset aggregate and the per-doc window reuse ONE
     exchange (guide §2.4 "two operations keyed the same way can
     share one exchange")

Asserts identical output (sorted collect) then interleaved timing
under BOTH actions. Usage: python tools/r15_ab_v3_cut.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_variants(spark, sf_dir):
    from sfdata_wrangler_spark.functions.text import (
        normalize_text,
        token_count_from_tokens,
    )
    from sfdata_wrangler_spark.operators.checkpointing import cut_lineage
    from sfdata_wrangler_spark.operators.linedup import (
        drop_boilerplate_lines,
        tokens_to_lines,
    )
    from sfdata_wrangler_spark.operators.lm import bigram_lm_score
    from sfdata_wrangler_spark.operators.packing import pack_context_windows
    from sfdata_wrangler_spark.operators.sampling import temperature_sample
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.plans.catalog import _t
    from sfdata_wrangler_spark.plans.catalog16 import (
        _BUDGET,
        _LINE_W,
        _LM_T,
        _MIX_C,
    )

    def v3_a():
        return QUERIES["pipe_curation_v3"]["fn"](spark, sf_dir)

    def _tail_common():
        docs = _t(spark, sf_dir, "documents")
        ml = docs.select(
            "doc_id", tokens_to_lines(F.col("text"), _LINE_W).alias("text")
        )
        cleaned = cut_lineage(
            drop_boilerplate_lines(ml, min_docs=2)
            .where(F.col("n_kept") > 0)
            .select(
                "doc_id",
                F.split(normalize_text(F.col("text")), " ").alias("toks"),
            )
        )
        scores = bigram_lm_score(cleaned, text_col="toks", pretokenized=True)
        counts = cleaned.select(
            "doc_id",
            token_count_from_tokens(F.col("toks")).alias("n_tokens"),
        )
        lmkept = counts.join(
            scores.where(F.col("mean_p_micro") >= _LM_T).select("doc_id"),
            "doc_id",
        )
        langd = cut_lineage(
            lmkept.join(docs.select("doc_id", "lang"), "doc_id")
        )
        sampled = temperature_sample(langd, "lang", _MIX_C)
        return sampled.select(
            F.col("doc_id").cast("bigint").alias("doc_id"), "n_tokens"
        )

    def v3_b():
        t = _tail_common()
        packed = pack_context_windows(t, budget=_BUDGET, bucket_width=64)
        return packed.groupBy("window_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )

    def _packer_shared(df, budget, bucket_width):
        docs = df.select(
            F.col("doc_id"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.floor(F.col("doc_id") / bucket_width)
            .cast("bigint")
            .alias("__bkt"),
        ).repartition("__bkt")
        wb = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        offsets = (
            docs.groupBy("__bkt")
            .agg(F.sum("n_tokens").alias("__sub"))
            .withColumn("__cum", F.sum("__sub").over(wb))
            .select(
                "__bkt", (F.col("__cum") - F.col("__sub")).alias("__offset")
            )
        )
        wd = (
            Window.partitionBy("__bkt")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        before = (
            F.col("__offset")
            + F.sum("n_tokens").over(wd)
            - F.col("n_tokens")
        )
        return docs.join(F.broadcast(offsets), "__bkt").select(
            "doc_id",
            "n_tokens",
            F.floor(before / budget).cast("bigint").alias("window_id"),
            (before % budget).cast("bigint").alias("window_offset"),
        )

    def v3_c():
        t = _tail_common()
        packed = _packer_shared(t, _BUDGET, 64)
        return packed.groupBy("window_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )

    return {"A_current": v3_a, "B_langd_cut": v3_b, "C_cut+sharedbkt": v3_c}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r15-ab-v3-cut")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    variants = build_variants(spark, sf_dir)

    # equivalence gate first
    ref = None
    for name, fn in variants.items():
        spark.catalog.clearCache()
        rows = sorted(map(tuple, fn().collect()))
        if ref is None:
            ref = rows
            print(f"# {name}: {len(rows)} rows (reference)")
        else:
            assert rows == ref, f"{name} DIVERGES from A_current"
            print(f"# {name}: identical output ok")

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
        print(
            f"# rep {rep + 1}: "
            + " ".join(
                f"{n}={results[n]['count'][-1]:.2f}/{results[n]['noop'][-1]:.2f}"
                for n in variants
            )
        )
    for name, r in results.items():
        print(
            f"{name}: count best={min(r['count']):.3f} "
            f"all={[round(x, 2) for x in r['count']]} | "
            f"noop best={min(r['noop']):.3f} "
            f"all={[round(x, 2) for x in r['noop']]}"
        )


if __name__ == "__main__":
    main()
