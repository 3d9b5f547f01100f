"""Session-config second pass (VERDICT r14 ask #8), judged at BOTH
core counts so the driver's low-core rerun isn't distorted.

Candidates (guide §9, runtime-settable SQL confs so variants
interleave inside one JVM):

  BASE : the shipped get_spark defaults
  SHJ  : spark.sql.join.preferSortMergeJoin=false (planner may pick
         shuffled-hash join when its size conditions fit)
  PARA : spark.sql.adaptive.coalescePartitions.parallelismFirst=false
         (AQE coalesces to advisoryPartitionSizeInBytes instead of
         protecting parallelism — bigger post-shuffle partitions)
  BOTH : SHJ + PARA

Queries: the join/shuffle-heavy headliners. Interleaved reps; count()
action (the driver's metric).

    SPARK_GRAFT_CPUS=8 python tools/r15_ab_conf.py   # low-core side
    python tools/r15_ab_conf.py                      # 32-core side
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_SET = [
    "pipe_curation_v2",
    "pipe_curation_v3",
    "dd_dup_spans",
    "dd_minhash_lsh_pairs_fast",
    "q5_local_supplier_volume",
    "j2_interval_join",
    "flagship_expand_weight_cascade",
    "ir_rerank_two_stage",
]

CONFIGS = {
    "BASE": {},
    "SHJ": {"spark.sql.join.preferSortMergeJoin": "false"},
    "PARA": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"
    },
    "BOTH": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
}

DEFAULTS = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("r15-ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    fns = {n: QUERIES[n]["fn"] for n in QUERY_SET}

    totals = {c: [] for c in CONFIGS}
    for rep in range(reps):
        for cname, conf in CONFIGS.items():
            for k, v in DEFAULTS.items():
                spark.conf.set(k, conf.get(k, v))
            t_total = 0.0
            for name, fn in fns.items():
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).count()
                t_total += time.time() - t0
            totals[cname].append(round(t_total, 3))
            print(f"# rep{rep + 1} {cname}: {t_total:.3f}s", file=sys.stderr)
    for k, v in DEFAULTS.items():
        spark.conf.set(k, v)
    out = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": QUERY_SET,
        "totals": totals,
        "best": {c: min(v) for c, v in totals.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
