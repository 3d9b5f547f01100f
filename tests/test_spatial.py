"""Grid spatial join (operators/spatial.py): exactness across cell
boundaries, radius cut, argmin determinism, no-cartesian plan."""

from __future__ import annotations

from sfdata_wrangler_spark.operators.spatial import grid_nearest_join


def _pts(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} long, x double, y double")


def test_cross_cell_neighbor_found(spark):
    """Nearest point sits JUST across a cell boundary — the 3×3
    neighborhood must still see it (the exactness guarantee)."""
    left = _pts(spark, [(1, 9.9, 9.9)], "left_id")  # cell (0,0) at r=10
    right = _pts(spark, [(7, 10.1, 10.1), (8, 50.0, 50.0)], "right_id")
    got = grid_nearest_join(left, right, radius=10.0).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 7)]


def test_radius_cut_excludes_far_points(spark):
    left = _pts(spark, [(1, 0.0, 0.0)], "left_id")
    right = _pts(spark, [(7, 3.9, 0.0), (8, 4.1, 0.0)], "right_id")
    got = grid_nearest_join(left, right, radius=4.0).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 7)]
    # no neighbor in range → left point absent entirely
    lone = _pts(spark, [(2, 100.0, 100.0)], "left_id")
    assert grid_nearest_join(lone, right, radius=4.0).count() == 0


def test_tie_breaks_to_smaller_id(spark):
    left = _pts(spark, [(1, 0.0, 0.0)], "left_id")
    right = _pts(spark, [(9, 1.0, 0.0), (3, -1.0, 0.0)], "right_id")
    got = grid_nearest_join(left, right, radius=2.0).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 3)]


def test_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    lrows = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(40)]
    rrows = [(100 + i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(40)]
    left, right = _pts(spark, lrows, "left_id"), _pts(spark, rrows, "right_id")
    got = {
        r["left_id"]: r["right_id"]
        for r in grid_nearest_join(left, right, radius=6.0).collect()
    }
    expected = {}
    for li, lx, ly in lrows:
        best = None
        for ri, rx, ry in rrows:
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            if d2 <= 36.0 and (best is None or (d2, ri) < best):
                best = (d2, ri)
        if best:
            expected[li] = best[1]
    assert got == expected


def test_no_cartesian(spark):
    left = _pts(spark, [(1, 0.0, 0.0)], "left_id")
    right = _pts(spark, [(7, 1.0, 1.0)], "right_id")
    plan = (
        grid_nearest_join(left, right, radius=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
