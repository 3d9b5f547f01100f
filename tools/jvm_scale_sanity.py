#!/usr/bin/env python
"""Embarrassingly-parallel JVM scaling ceiling probe (r15).

The sf1 scale point (VERDICT r14 ask #2) was expected to show 8v32
scaling ratios >= 2; it measured 0.9-1.2 even after the row-group fix
parallelized every scan. This probe isolates the ceiling: a pure
CPU-bound Spark map (40 chained md5s per row over 6M rows, one task
per core, NO shuffle, NO scan) in one fresh session per core count.

Measured on the r15 box (warm second rep):

    8 cores: 8.96 s    16 cores: 5.88 s    32 cores: 5.5 s

i.e. the JVM delivers ~1.5x from 8->16 and ~1.07x from 16->32 — the
VM saturates around 16 effective JVM threads even though 32 numpy
PROCESSES reach ~24x solo throughput. Any query-level 8v32 ratio is
bounded by this ~1.6x ceiling; ratios of 1.1-1.2 on real queries are
most of what the box can express.

Usage: python tools/jvm_scale_sanity.py [cpus ...]   (default 8 16 32)
"""
import os
import subprocess
import sys

INNER = r'''
import os, sys, time
cpus = sys.argv[1]
os.environ["SPARK_GRAFT_CPUS"] = cpus
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else "/root/repo")
sys.path.insert(0, %(repo)r)
from sfdata_wrangler_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(f"jvm_scale_sanity_c{cpus}")
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 6_000_000, 1, int(cpus))
c = F.col("id").cast("string")
for _ in range(40):
    c = F.md5(c)
for rep in range(2):
    t0 = time.time()
    df.select(F.length(c).alias("l")).agg(F.sum("l")).collect()
    print(f"cpus={cpus} rep{rep} wall={time.time()-t0:.2f}s")
'''


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpus = sys.argv[1:] or ["8", "16", "32"]
    for c in cpus:
        # fresh process per core count: one JVM cannot change master
        code = INNER % {"repo": repo}
        proc = subprocess.run(
            [sys.executable, "-c", code, c], capture_output=True, text=True
        )
        for line in proc.stdout.splitlines():
            if line.startswith("cpus="):
                print(line)


if __name__ == "__main__":
    main()
