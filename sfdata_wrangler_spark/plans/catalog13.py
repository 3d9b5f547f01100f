"""Catalog wave 13 (round 3): trained-BPE tokenizer queries.

BPE training is an iterative argmax chain, but with a FIXED merge
budget it is still SQL-expressible: the oracle unrolls the loop into
N_MERGES chained CTE stages (pair counts → deterministic argmax →
merge application), so both queries get the driver's full hash check
(upgraded from rows-only in round 4). The merge application uses the
separator-wrapping trick: a token list becomes
``\\x1f tok \\x1f \\x1f tok \\x1f ...`` and one ``replace()`` of
``\\x1f a \\x1f\\x1f b \\x1f`` with ``\\x1f ab \\x1f`` is exactly the
greedy left-to-right non-overlapping merge scan (replace restarts
after each substitution — the textbook BPE semantics, and what the
engine's ``_merge_fold`` / ``_merge_word`` implement).

CTEs are ``MATERIALIZED``: each stage is referenced twice (argmax +
apply), and DuckDB's default inlining would otherwise expand the
20-stage chain exponentially.

Exact correctness is additionally pinned by tests/test_bpe.py's
differential against a sequential reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import bpe_train
from .catalog import _register, _t
from .catalog_text import norm_sql

_N_MERGES = 20

_SEP = "chr(31)"


def _bpe_replay_ctes(n_merges: int, min_pair: int = 2) -> str:
    """The unrolled training replay: w0 = word-type table with char
    arrays; per stage i, p{i} = weighted adjacent-pair counts,
    best{i} = argmax under (count DESC, left ASC, right ASC),
    w{i+1} = the merge applied to every word."""
    ctes = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS n, string_split(word, '') AS t
  FROM (SELECT unnest(string_split({norm_sql()}, ' ')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY word
)"""
    ]
    for i in range(n_merges):
        ctes.append(
            f"""p{i} AS (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT n, unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
        FROM w{i} WHERE len(t) >= 2)
  GROUP BY a, b
)"""
        )
        ctes.append(
            f"""best{i} AS MATERIALIZED (
  SELECT a, b, cnt FROM p{i} WHERE cnt >= {min_pair}
  ORDER BY cnt DESC, a, b LIMIT 1
)"""
        )
        ctes.append(
            f"""w{i + 1} AS MATERIALIZED (
  SELECT word, n,
         CASE WHEN ba IS NULL THEN t
              ELSE string_split(substr(s2, 2, length(s2) - 2),
                                {_SEP} || {_SEP})
         END AS t
  FROM (
    SELECT word, n, t, b.a AS ba,
           replace({_SEP} || array_to_string(t, {_SEP} || {_SEP}) || {_SEP},
                   {_SEP} || b.a || {_SEP} || {_SEP} || b.b || {_SEP},
                   {_SEP} || b.a || b.b || {_SEP}) AS s2
    FROM w{i} LEFT JOIN best{i} b ON TRUE
  )
)"""
        )
    return ",\n".join(ctes)


_MERGES_ORACLE = (
    "WITH "
    + _bpe_replay_ctes(_N_MERGES)
    + ",\nmg AS ("
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS r, a, b, cnt FROM best{i}" for i in range(_N_MERGES)
    )
    + """)
SELECT CAST(r AS BIGINT) AS merge_rank, a AS "left", b AS "right",
       CAST(cnt AS BIGINT) AS weighted_count
FROM mg"""
)

_VOCAB_ORACLE = (
    "WITH "
    + _bpe_replay_ctes(_N_MERGES)
    + f"""
SELECT token, CAST(sum(n) AS BIGINT) AS n
FROM (SELECT n, unnest(t) AS token FROM w{_N_MERGES})
GROUP BY token ORDER BY n DESC, token LIMIT 30"""
)


@_register("txt_bpe_merges", _MERGES_ORACLE)
def txt_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators/bpe.py): training collects
    the Zipf-tiny word-type table once and runs the merge loop
    driver-side under a total tie order — fully deterministic, O(1)
    Spark jobs in the merge count."""
    merges, _ = bpe_train(
        _t(spark, sf_dir, "documents"), num_merges=_N_MERGES
    )
    return spark.createDataFrame(
        [
            (rank, left, right, cnt)
            for rank, (left, right, cnt) in enumerate(merges)
        ],
        "merge_rank bigint, left string, right string, weighted_count bigint",
    )


@_register("txt_bpe_vocab", _VOCAB_ORACLE, bench=True)
def txt_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies under the trained BPE segmentation.

    r14 (guide §8 — decide on small rows): the segmentation table
    already carries each word type's corpus frequency ``n``, so the
    corpus-wide token count is Σ over word types of n × (token's
    multiplicity in that word's segmentation) — a fold over the
    ZIPF-SIZED type table, not a second corpus pass. The old form
    re-exploded the whole corpus through bpe_tokenize and counted
    rows; values are identical by construction (the tokenize join is
    total over the same corpus the types were counted from) and
    hash-checked against the unchanged corpus-scale oracle.
    Interleaved noop A/B at sf0.1: 1.05/1.05/1.15/1.36 →
    **0.68/0.71/0.73/0.76 s**. Per-document tokenization stays
    available as operators/bpe.bpe_tokenize (pinned by test_bpe).
    Top-30 under a total order."""
    docs = _t(spark, sf_dir, "documents")
    _, seg = bpe_train(docs, num_merges=_N_MERGES)
    return (
        seg.select(F.col("n"), F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(30)
    )
