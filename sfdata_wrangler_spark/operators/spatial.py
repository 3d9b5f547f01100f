"""Distributed grid spatial join (nearest within radius).

The reference does spatial nearest-neighbor with a driver-side rtree
(HwyNetwork.py:297-388, G3) — right for a city-sized network,
wrong once BOTH point sets are fact-sized. The distributed shape is
the grid-bucket join: bucket space into radius-sized cells, join
each left point against the 3×3 neighborhood of its cell (a pure
equi join on cell ids after a 9-way explode), filter by true
distance, keep the argmin. Candidates are bounded by local density,
never O(n·m); the cell id is a compact shuffle key — the same
bounded-blowup discipline as LSH bands and linkage blocks.

Determinism: squared distance is one fixed expression tree of IEEE
ops (identical in any engine); the winner takes a (d2, id) total
order. The 3×3 neighborhood guarantees EVERY pair within
``radius`` shares at least one probe cell (cell size == radius), so
the join is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grid_nearest_join"]


def grid_nearest_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_id: str = "left_id",
    right_id: str = "right_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """For every left point, the nearest right point within
    ``radius``: ``(left_id, right_id, d2)``. Left points with no
    neighbor in range are absent (semi-join semantics). One explode
    (9 probe cells per left point), one equi join on the cell id,
    one per-left-point argmin window."""
    cell_x = F.floor(F.col(x) / radius).cast("long")
    cell_y = F.floor(F.col(y) / radius).cast("long")

    r = right.select(
        F.col(right_id),
        F.col(x).alias("__rx"),
        F.col(y).alias("__ry"),
        cell_x.alias("__cx"),
        cell_y.alias("__cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    l = (
        left.select(
            F.col(left_id),
            F.col(x).alias("__lx"),
            F.col(y).alias("__ly"),
            cell_x.alias("__lcx"),
            cell_y.alias("__lcy"),
        )
        .select("*", F.explode(offsets).alias("__o"))
        .select(
            left_id,
            "__lx",
            "__ly",
            (F.col("__lcx") + F.col("__o.dx")).alias("__cx"),
            (F.col("__lcy") + F.col("__o.dy")).alias("__cy"),
        )
    )
    d2 = (F.col("__lx") - F.col("__rx")) * (F.col("__lx") - F.col("__rx")) + (
        F.col("__ly") - F.col("__ry")
    ) * (F.col("__ly") - F.col("__ry"))
    cands = (
        l.join(r, ["__cx", "__cy"])
        .select(left_id, right_id, d2.alias("d2"))
        .where(F.col("d2") <= F.lit(float(radius)) * F.lit(float(radius)))
    )
    w = Window.partitionBy(left_id).orderBy("d2", right_id)
    return (
        cands.select(left_id, right_id, "d2", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
