"""Partition-invariance properties for the wave-12+ operators: results
must be byte-identical under any input partitioning (the retry /
speculative-execution / cluster-resize contract at 100 TB)."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.linedup import drop_boilerplate_lines
from sfdata_wrangler_spark.operators.lm import bigram_lm_score
from sfdata_wrangler_spark.operators.zorder import add_zorder_key


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark, n=60):
    rows = [
        (
            i,
            " ".join(
                ["tok%d" % ((i * 7 + k) % 13) for k in range(10)]
                + (["shared line marker"] if i % 3 == 0 else [])
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lm_score_partition_invariant(spark):
    docs = _docs(spark)
    a = bigram_lm_score(docs.repartition(1))
    b = bigram_lm_score(docs.repartition(13, "doc_id"))
    # integer micro-units BEFORE the sum -> no float-order drift
    assert _collect_sorted(a) == _collect_sorted(b)


def test_linedup_partition_invariant(spark):
    rows = [
        (i, "HEADER\ncontent %d\nFOOTER" % i) if i % 2 == 0
        else (i, "solo %d" % i)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = drop_boilerplate_lines(docs.repartition(1), min_docs=2)
    b = drop_boilerplate_lines(docs.repartition(7), min_docs=2)
    assert _collect_sorted(a) == _collect_sorted(b)


def test_zorder_key_partition_invariant(spark):
    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    a = add_zorder_key(li.repartition(2), ["l_partkey", "l_suppkey"])
    b = add_zorder_key(li.repartition(11), ["l_partkey", "l_suppkey"])
    assert _collect_sorted(a.select("l_orderkey", "l_linenumber", "zkey")) == \
        _collect_sorted(b.select("l_orderkey", "l_linenumber", "zkey"))


def test_pack_by_length_equals_naive_per_bucket(spark):
    from sfdata_wrangler_spark.operators.packing import pack_by_length

    rows = [(i, (i * 13) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: (r["len_bucket"], r["window_id"], r["window_offset"])
        for r in pack_by_length(df, budget=64, bucket_width=16).collect()
    }
    # naive: per-bucket sequential scan in id order
    def bucket(n):
        for b in (16, 32, 64):
            if n <= b:
                return b
        return 128
    acc = {}
    for i, n in sorted(rows):
        b = bucket(n)
        before = acc.get(b, 0)
        assert got[i] == (b, before // 64, before % 64)
        acc[b] = before + n
