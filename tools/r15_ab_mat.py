"""Interleaved A/B of the gram/line-stream materialize knobs under
BOTH timed actions (VERDICT r14 ask #4: dd_dup_spans read 0.84x on the
driver's count() metric while its plan got strictly better — candidate
cause is the materialize=True persist fill, which count() charges
without crediting the pruned reassembly work it saves).

Variants (each rep rebuilds the DataFrame fresh; A/B strictly
alternate inside ONE session so frequency drift hits both sides):

  spans_mat / spans_nomat : dd_dup_spans plan, duplicate_spans
                            materialize True / False
  v3_mat / v3_nomat       : pipe_curation_v3, drop_boilerplate_lines
                            materialize True / False (patched default)

Usage: python tools/r15_ab_mat.py [--reps 4] [spans] [v3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def spans_df(spark, sf_dir, materialize):
    from sfdata_wrangler_spark.operators.spandedup import duplicate_spans
    from sfdata_wrangler_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    out = duplicate_spans(docs, k=8, min_docs=2, materialize=materialize)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
    )


def v3_df(spark, sf_dir, materialize):
    import functools

    from sfdata_wrangler_spark.operators import linedup
    from sfdata_wrangler_spark.plans import catalog16

    orig = catalog16.drop_boilerplate_lines
    catalog16.drop_boilerplate_lines = functools.partial(
        linedup.drop_boilerplate_lines, materialize=materialize
    )
    try:
        return catalog16.pipe_curation_v3(spark, sf_dir)
    finally:
        catalog16.drop_boilerplate_lines = orig


def main() -> None:
    reps = 4
    which = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            which.append(args[i])
            i += 1
    which = which or ["spans", "v3"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r15-ab-mat")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    builders = {}
    if "spans" in which:
        builders["spans_mat"] = lambda: spans_df(spark, sf_dir, True)
        builders["spans_nomat"] = lambda: spans_df(spark, sf_dir, False)
    if "v3" in which:
        builders["v3_mat"] = lambda: v3_df(spark, sf_dir, True)
        builders["v3_nomat"] = lambda: v3_df(spark, sf_dir, False)

    # outputs identical check (once, count only — full equality is
    # pinned by the oracle sweep; this guards the probe wiring)
    if "spans" in which:
        a = spans_df(spark, sf_dir, True).count()
        b = spans_df(spark, sf_dir, False).count()
        assert a == b, (a, b)
        spark.catalog.clearCache()

    out = {n: {"count": [], "noop": []} for n in builders}
    for _ in range(reps):
        for name, build in builders.items():
            spark.catalog.clearCache()
            t0 = time.time()
            build().count()
            out[name]["count"].append(round(time.time() - t0, 3))
        for name, build in builders.items():
            spark.catalog.clearCache()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            out[name]["noop"].append(round(time.time() - t0, 3))
    for name, d in out.items():
        print(
            f"# {name}: count={sorted(d['count'])} noop={sorted(d['noop'])}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
