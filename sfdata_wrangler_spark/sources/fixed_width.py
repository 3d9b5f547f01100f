"""Fixed-width / delimited raw ingest (S1/S2, SURVEY.md §2.1).

The reference reads 97-column byte-range AVL/APC extracts with
``pd.read_fwf(..., chunksize=100000)`` at ~167 rows/s
(``SFMuniDataHelper.py:422-430``; throughput comment ``:56-64``).
Spark-first: ``spark.read.text`` (splittable, parallel) + one
``select`` of substring/cast projections — whole-stage codegen'd,
linear scan, no Python in the loop. Chunking disappears into
partitioning (``maxPartitionBytes``).

Mid-file header/garbage rows (the reference's ``na_values=['ID']`` +
``dropna`` dance, ``:443``) are handled structurally: rows whose key
fields fail numeric parse become nulls and are dropped by
``required`` — same semantics, one pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColSpec:
    """One column of a fixed-width layout: [start, end) byte range
    (0-based, like the reference's colspec tuples) + target dtype."""

    name: str
    start: int
    end: int
    dtype: str = "string"  # string|int|bigint|double|date|timestamp


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: Sequence[ColSpec],
    required: Sequence[str] = (),
    min_length: int | None = None,
) -> DataFrame:
    """Parse a fixed-width file into typed columns.

    ``required``: columns that must parse non-null (rows failing are
    dropped — covers skiprows/mid-file headers/truncated lines).
    ``min_length``: drop physically short lines before substring.
    """
    text = spark.read.text(path)
    if min_length:
        text = text.where(F.length("value") >= min_length)
    cols = []
    for c in colspecs:
        raw = F.substring("value", c.start + 1, c.end - c.start)
        if c.dtype == "string":
            col = F.trim(raw)
        else:
            # try_cast semantics: garbage → null (then `required` drops)
            col = F.trim(raw).try_cast(c.dtype)
        cols.append(col.alias(c.name))
    out = text.select(*cols)
    if required:
        out = out.na.drop(subset=list(required))
    return out


def read_tab_delimited(
    spark: SparkSession,
    path: str,
    schema: str,
    na_values: str = "NA",
    header: bool = False,
) -> DataFrame:
    """Tab-delimited scan (S2, ``SFMuniDataHelper.py:414-420``)."""
    return (
        spark.read.option("sep", "\t")
        .option("nullValue", na_values)
        .option("header", str(header).lower())
        .schema(schema)
        .csv(path)
    )


def pack_hhmmss(hr: Column, mn: Column, sec: Column) -> Column:
    """HR/MIN/SEC columns → packed HHMMSS int (S2 recombination,
    ``SFMuniDataHelper.py:454-473``)."""
    return (hr * 10000 + mn * 100 + sec).cast("int")
