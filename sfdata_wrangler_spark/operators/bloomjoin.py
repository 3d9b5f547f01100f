"""Bloom-filter join pruning (a runtime filter you control).

The classic 100-TB join trick: when a fact table joins a selective
dimension, ship a Bloom filter of the dim's join keys to every fact
scan task and drop non-matching fact rows BEFORE the join shuffle.
Spark's optimizer does this automatically in some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
is the explicit, engine-level version for when you need it
deterministic, cross-stage, or persisted (e.g. prune today's 100 TB
ingest against yesterday's customer dim without re-planning).

Mechanics:

- ``bloom_build`` scans the (small) dim side once and OR-folds the
  bit array as ``m_bits/64`` BIGINT words via ``bit_or`` — a
  map-side-combinable aggregate whose shuffle is at most 1024 rows —
  then collects the words to the driver. The collect is dim-sized
  and bounded (8 KiB for the default 2^16 bits): the same deliberate
  tiny-collect pattern as the k-means centroid pull in
  operators/similarity.py.
- ``bloom_prune`` embeds the words as an ARRAY LITERAL in the fact
  filter, so the membership test is a pure column expression: the
  fact scan stays map-only, whole-stage-codegen'd, ZERO extra
  shuffle, and Catalyst can place it directly above the parquet scan.

Hashing: position_i = first 4 hex chars of ``md5(i || '|' || key)``
(16 bits), the repo's portable-md5 discipline (operators/sketch.py),
so an external SQL oracle can reproduce every bit. Bloom filters
have NO false negatives — pruning is semantically transparent to the
downstream join — which is exactly what the oracle checks: pruned
join ≡ plain join.

Reference parity: the reference filters fact frames by dim membership
with pandas ``isin`` after loading both sides (e.g.
SFMuniDataHelper.py route filters); this is the shape that survives
when the fact side no longer fits anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune", "bloom_fp_rate"]

_M_BITS = 1 << 16  # default filter width: 1024 BIGINT words


def _positions(key: Column, k: int) -> list[Column]:
    """k 16-bit bit positions per key, md5-derived (portable)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), key.cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        for i in range(k)
    ]


def bloom_build(
    dim: DataFrame, col: str, k: int = 4, m_bits: int = _M_BITS
) -> list[int]:
    """Bit array of the dim's keys as ``m_bits/64`` Python ints
    (dense, index = word number). One scan, one <=1024-row shuffle,
    one tiny collect."""
    assert m_bits % 64 == 0
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(col), k))).alias("pos")
    ).select((F.col("pos") % m_bits).alias("pos"))
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # SQL shiftleft takes a column shift amount (the PySpark
            # wrapper only takes a Python int)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_prune(
    fact: DataFrame,
    col: str,
    words: list[int],
    k: int = 4,
    m_bits: int = _M_BITS,
) -> DataFrame:
    """Fact rows whose key MIGHT be in the filter (all true matches
    survive; a tunable sliver of false positives passes through to
    the exact join). Map-only: no shuffle, no broadcast join node —
    the words ride into the task as a literal array. The probe
    expressions go through expr() because the SQL shiftright accepts
    a column shift amount while the PySpark wrapper does not;
    arithmetic >> then &1 extracts any bit incl. the sign bit."""
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])
    probed = fact.withColumn("_bw", words_lit)
    conds = []
    for i, p in enumerate(_positions(F.col(col), k)):
        probed = probed.withColumn(f"_bp{i}", p % m_bits)
        conds.append(
            f"((shiftright(element_at(_bw, CAST(_bp{i} / 64 AS INT) + 1), "
            f"CAST(_bp{i} % 64 AS INT)) & 1) = 1)"
        )
    out = probed.where(F.expr(" AND ".join(conds)))
    return out.drop("_bw", *[f"_bp{i}" for i in range(k)])


def bloom_fp_rate(n_keys: int, k: int = 4, m_bits: int = _M_BITS) -> float:
    """Expected false-positive rate (planning aid): (1-e^-kn/m)^k."""
    import math

    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k
