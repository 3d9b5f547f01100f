"""Deterministic dataset splitting (train/val/test).

The split a training pipeline needs is a FUNCTION OF THE ROW ID, not
of RNG state: reproducible across reruns, stable under repartitioning
and cluster resize, and consistent when new rows arrive (a doc's
split never changes as the corpus grows — the property `randomSplit`
cannot give you, since it samples per-partition with a seed tied to
the partition layout).

Same md5-prefix-threshold machinery as operators/sampling.py: the
first 8 hex chars of ``md5(id)`` are a uniform 32-bit draw; cumulative
fraction thresholds cut it into named splits (the last split is the
``ELSE`` branch, so no 2^32 upper bound is ever compared). Pure
column ops — no shuffle, no RNG, oracle-reproducible."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut_hexes(fractions: Sequence[float]) -> list[str]:
    """Cumulative thresholds for all but the last split, as 8-char
    lowercase hex strings comparable against the md5 prefix."""
    if any(f < 0 for f in fractions) or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must be non-negative and sum to 1")
    cuts, acc = [], 0.0
    for f in fractions[:-1]:
        acc += f
        cuts.append(format(int(acc * 4294967296.0), "08x"))
    return cuts


def assign_split(
    df: DataFrame,
    names: Sequence[str] = ("train", "val", "test"),
    fractions: Sequence[float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    out_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Append ``out_col`` with the row's split name, decided by
    ``md5(salt|id)`` against cumulative fraction thresholds.

    The ``salt`` domain-separates this draw from every OTHER
    hash-of-id decision in the pipeline: temperature sampling, shard
    assignment, and deterministic subsampling all consume
    ``md5(id)``-family draws, and two decisions sharing one draw are
    perfectly correlated — a corpus first filtered by
    ``temperature_sample`` (keeps low-hash rows) would land almost
    entirely in the lowest-threshold split. Salting makes the draws
    independent while staying byte-reproducible."""
    if len(names) != len(fractions):
        raise ValueError("names and fractions must align")
    bucket = F.substring(
        F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 8
    )
    expr = None
    for name, hx in zip(names[:-1], _cut_hexes(fractions)):
        clause = (bucket < F.lit(hx), F.lit(name))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def assign_split_oracle_sql(
    names: Sequence[str] = ("train", "val", "test"),
    fractions: Sequence[float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """SQL expression (not a full query) computing the split name for
    ``id_col`` — identical salt, thresholds, and comparisons."""
    b = f"substring(md5('{salt}|' || CAST({id_col} AS VARCHAR)), 1, 8)"
    clauses = [
        f"WHEN {b} < '{hx}' THEN '{name}'"
        for name, hx in zip(names[:-1], _cut_hexes(fractions))
    ]
    return "(CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END)"
