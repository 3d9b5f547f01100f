"""LCC state-plane projection (F12) + geofence (P6).

Correctness strategy without pyproj to diff against: (a) conformal
projections preserve local distances near the standard parallels —
compare projected euclidean vs ellipsoidal geodesic for nearby
points; (b) the origin maps exactly to the false easting/northing by
construction; (c) coarse known-location bounds catch wrong-zone /
wrong-parameter errors.
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.geo import (
    _M_TO_USFT,
    euclidean_feet,
    lonlat_to_ca_stateplane,
)
from sfdata_wrangler_spark.pipelines.taxi import geofence


def _project(spark, pts):
    df = spark.createDataFrame([Row(lon=lo, lat=la) for lo, la in pts])
    x, y = lonlat_to_ca_stateplane(F.col("lon"), F.col("lat"))
    return df.select(x.alias("x"), y.alias("y")).collect()


def test_origin_maps_to_false_origin(spark):
    (r,) = _project(spark, [(-120.5, 36.5)])
    assert abs(r.x - 2000000.0001016 * _M_TO_USFT) < 0.01
    assert abs(r.y - 500000.0001016 * _M_TO_USFT) < 0.01


def test_projection_preserves_local_distance(spark):
    """Between the standard parallels the scale factor is within ~0.03%
    of 1: projected euclidean ≈ ellipsoidal geodesic for a ~2.8 km
    east-west pair and a ~3.7 km north-south pair at SF."""
    a, b, c = _project(
        spark, [(-122.42, 37.78), (-122.39, 37.78), (-122.42, 37.8133)]
    )
    # ellipsoidal geodesic approximations (meters → US ft)
    lat = math.radians(37.78)
    e2 = 0.0066943800229
    nu = 6378137.0 / math.sqrt(1 - e2 * math.sin(lat) ** 2)  # prime vertical
    rho = 6378137.0 * (1 - e2) / (1 - e2 * math.sin(lat) ** 2) ** 1.5
    ew_ft = nu * math.cos(lat) * math.radians(0.03) * _M_TO_USFT
    ns_ft = rho * math.radians(0.0333) * _M_TO_USFT
    dx = math.hypot(b.x - a.x, b.y - a.y)
    dy = math.hypot(c.x - a.x, c.y - a.y)
    assert abs(dx - ew_ft) / ew_ft < 0.002
    assert abs(dy - ns_ft) / ns_ft < 0.002


def test_projection_sf_coarse_bounds(spark):
    """SF must land in the CA-III range (catches wrong zone/params):
    E ∈ [5.9M, 6.1M] ft, N ∈ [2.0M, 2.2M] ft."""
    (r,) = _project(spark, [(-122.4194, 37.7793)])
    assert 5_900_000 < r.x < 6_100_000
    assert 2_000_000 < r.y < 2_200_000


def test_euclidean(spark):
    df = spark.createDataFrame([Row(x1=0.0, y1=0.0, x2=3.0, y2=4.0)])
    out = df.select(
        euclidean_feet(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"))
        .alias("d")
    ).collect()
    assert out[0].d == 5.0


def test_geofence(spark):
    df = spark.createDataFrame(
        [
            Row(longitude=-122.42, latitude=37.78),  # inside SF
            Row(longitude=-121.90, latitude=37.34),  # San Jose: outside
        ]
    )
    out = geofence(df).collect()
    assert len(out) == 1 and out[0].latitude == 37.78


class TestPointInConvexPolygon:
    def test_square_and_triangle(self, spark):
        from sfdata_wrangler_spark.functions.geo import (
            point_in_convex_polygon,
        )

        pts = spark.createDataFrame(
            [
                (1, 0.5, 0.5),   # inside unit square
                (2, 1.5, 0.5),   # outside (right)
                (3, 0.0, 0.0),   # corner: boundary counts as inside
                (4, 1.0, 0.5),   # edge midpoint
                (5, -0.001, 0.5),
            ],
            "id bigint, x double, y double",
        )
        square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
        got = {
            r.id: r.inside
            for r in pts.select(
                "id",
                point_in_convex_polygon(
                    F.col("x"), F.col("y"), square
                ).alias("inside"),
            ).collect()
        }
        assert got == {1: True, 2: False, 3: True, 4: True, 5: False}

    def test_differential_vs_shapely_free_reference(self, spark):
        import random

        from sfdata_wrangler_spark.functions.geo import (
            point_in_convex_polygon,
        )

        tri = [(0.0, 0.0), (4.0, 0.0), (2.0, 3.0)]

        def ref(px, py):
            n = len(tri)
            for i in range(n):
                ax, ay = tri[i]
                bx, by = tri[(i + 1) % n]
                if (bx - ax) * (py - ay) - (by - ay) * (px - ax) < 0:
                    return False
            return True

        rng = random.Random(3)
        pts = [
            (i, rng.uniform(-1, 5), rng.uniform(-1, 4)) for i in range(200)
        ]
        df = spark.createDataFrame(pts, "id bigint, x double, y double")
        got = {
            r.id: r.inside
            for r in df.select(
                "id",
                point_in_convex_polygon(F.col("x"), F.col("y"), tri).alias(
                    "inside"
                ),
            ).collect()
        }
        for i, px, py in pts:
            assert got[i] == ref(px, py)

    def test_too_few_vertices_raises(self, spark):
        import pytest as _pytest

        from sfdata_wrangler_spark.functions.geo import (
            point_in_convex_polygon,
        )

        with _pytest.raises(ValueError):
            point_in_convex_polygon(F.lit(0.0), F.lit(0.0), [(0, 0), (1, 1)])
