"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The lake-layout primitive behind Delta/Iceberg ``OPTIMIZE ZORDER``:
a linear sort order can make parquet min/max skipping perfect on ONE
column and useless on the rest; interleaving the bits of several
columns' normalized ranks yields files that are simultaneously tight
in every dimension, so scans filtering on ANY of the z-ordered
columns prune most files. At 100 TB this is the difference between
reading a shard and reading the corpus for secondary-dimension
predicates.

Construction is pure column arithmetic (IEEE basic ops + integer
bit ops — codegen-resident, oracle-reproducible):

1. Per-column bounds come from a 1-row broadcast aggregate dim
   (lazy — no driver action, same pattern as operators/packing.py).
2. Each value scales to a ``bits``-bit integer rank.
3. Ranks interleave bit-by-bit into one BIGINT Morton key.

Write path: ``repartitionByRange(z) + sortWithinPartitions(z)`` —
a single range shuffle; every output file then covers a compact
z-range, i.e. a small hyper-rectangle of the original space.
``bits * len(cols)`` must stay <= 62 to fit a signed BIGINT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a Morton key interleaving ``cols`` (numeric) at ``bits``
    bits per column. Constant columns rank as 0; values scale by the
    column's global [min, max] from a broadcast bounds dim."""
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("double").alias(f"__lo_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"__hi_{c}"))
    bounds = F.broadcast(df.agg(*aggs))
    out = df.crossJoin(bounds)

    top = (1 << bits) - 1
    ranks: list[Column] = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        scaled = F.when(
            hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)
        ).otherwise(F.lit(0.0))
        ranks.append(
            F.least(
                F.floor(scaled * F.lit(float(1 << bits))),
                F.lit(top),
            ).cast("bigint")
        )

    z: Column | None = None
    for i in range(bits):
        for j, q in enumerate(ranks):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * len(ranks) + j)
            z = term if z is None else z.bitwiseOR(term)
    return out.select(*df.columns, z.alias(key_col))


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for writing: one range shuffle on the Morton key,
    rows sorted within each output partition. Pass the result straight
    to ``.write.parquet`` — each file then covers a compact
    hyper-rectangle in ``cols`` space and parquet min/max skipping
    works on every z-ordered dimension."""
    keyed = add_zorder_key(df, cols, bits)
    parted = (
        keyed.repartitionByRange(num_files, "zkey")
        if num_files
        else keyed.repartitionByRange("zkey")
    )
    return parted.sortWithinPartitions("zkey")


def zorder_oracle_sql(
    table: str,
    cols: Sequence[str],
    select_sql: str,
    bits: int = 16,
) -> str:
    """DuckDB oracle for :func:`add_zorder_key`: identical scaling
    parenthesization and bit interleave stated relationally."""
    lo_hi = ", ".join(
        f"CAST(min({c}) AS DOUBLE) AS lo_{c}, "
        f"CAST(max({c}) AS DOUBLE) AS hi_{c}"
        for c in cols
    )
    top = (1 << bits) - 1
    rank = {
        c: (
            f"CAST(least(floor(CASE WHEN hi_{c} > lo_{c} THEN "
            f"(CAST({c} AS DOUBLE) - lo_{c}) / (hi_{c} - lo_{c}) "
            f"ELSE 0.0 END * {float(1 << bits)!r}), {top}) AS BIGINT)"
        )
        for c in cols
    }
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({rank[c]} >> {i}) & 1) << {i * len(cols) + j})")
    zexpr = " | ".join(terms)
    return f"""
    WITH bounds AS (SELECT {lo_hi} FROM {table})
    SELECT {select_sql}, CAST({zexpr} AS BIGINT) AS zkey
    FROM {table} CROSS JOIN bounds
    """
