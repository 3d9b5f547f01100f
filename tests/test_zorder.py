"""Z-order layout tests: exact Morton interleave on a hand-computed
grid, and measured parquet min/max data-skipping efficacy — the
z-ordered layout must prune files on BOTH dimensions, where a linear
sort prunes only its leading column."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.zorder import (
    add_zorder_key,
    zorder_layout,
)


def test_hand_computed_morton_grid(spark):
    # 4x4 grid, 2 bits/dim: rank == value; bit j of key interleaves
    # (a at even positions, b at odd)
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {
        (r["a"], r["b"]): r["zkey"]
        for r in add_zorder_key(df, ["a", "b"], bits=2).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111
    assert out[(2, 1)] == 0b0110
    # z-curve locality: all 16 keys distinct
    assert len(set(out.values())) == 16


def test_constant_column_ranks_zero(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], ["a", "b"])
    out = add_zorder_key(df, ["a", "b"], bits=4).collect()
    # b is constant -> contributes no bits; keys differ only via a
    assert len({r["zkey"] for r in out}) == 2


def _files_overlapping(path, col, lo, hi):
    """Files whose [min, max] for col intersects [lo, hi] — the unit
    of scan-time skipping (one spark output file = one row group at
    this size)."""
    total, hit = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        total += 1
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    # sf0.01: 2000 parts x 100 suppliers — enough cardinality for the
    # z-curve geometry to show (sf0.001 has only 10 suppliers)
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    n = 64
    paths = {
        "unsorted": str(base / "unsorted"),
        "by_partkey": str(base / "by_partkey"),
        "zorder": str(base / "zorder"),
    }
    li.repartition(n).write.parquet(paths["unsorted"])
    li.repartitionByRange(n, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(paths["by_partkey"])
    zorder_layout(li, ["l_partkey", "l_suppkey"], num_files=n).write.parquet(
        paths["zorder"]
    )
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    return paths, bounds


def _range(lo, hi, frac=0.1, at=0.45):
    span = hi - lo
    a = lo + int(span * at)
    return a, a + max(1, int(span * frac))


def test_zorder_skips_on_both_dims(layouts):
    paths, b = layouts
    p_lo, p_hi = _range(b[0], b[1])
    s_lo, s_hi = _range(b[2], b[3])

    res = {
        name: {
            "part": _files_overlapping(path, "l_partkey", p_lo, p_hi),
            "supp": _files_overlapping(path, "l_suppkey", s_lo, s_hi),
        }
        for name, path in paths.items()
    }
    # unsorted: ~every file overlaps on both dims
    assert res["unsorted"]["part"][0] >= res["unsorted"]["part"][1] - 1
    assert res["unsorted"]["supp"][0] >= res["unsorted"]["supp"][1] - 1
    # linear sort: near-perfect on the leading column (a 10% range
    # spans ~10% of range partitions + boundaries), useless on the
    # other (measured: 8/64 vs 64/64)
    n = res["by_partkey"]["part"][1]
    assert res["by_partkey"]["part"][0] <= n // 8 + 2
    assert res["by_partkey"]["supp"][0] >= res["by_partkey"]["supp"][1] - 1
    # z-order: prunes meaningfully on BOTH dimensions
    n = res["zorder"]["part"][1]
    assert res["zorder"]["part"][0] <= n // 2
    assert res["zorder"]["supp"][0] <= n // 2
    # and beats the linear sort on the non-leading dimension
    assert res["zorder"]["supp"][0] < res["by_partkey"]["supp"][0]
