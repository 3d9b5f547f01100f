"""Geospatial column functions (F12/F13, SURVEY.md §2.8).

The reference projects lon/lat → NAD83 California Zone III state-plane
feet via pyproj (``GTFSHelper.py:38-61``, ``HwyNetwork.py:54-77``).
pyproj is a C wrapper and is not in this container — but the Lambert
conformal conic projection is closed-form, so it is implemented here
as PURE Column trigonometry: whole-stage-codegen'd, no UDF, no Python
in the loop (strictly faster than the reference's row-wise pyproj
calls at any scale).

Formulas: standard 2-parallel LCC (Snyder, *Map Projections — A
Working Manual*, USGS PP 1395, eqs. 14-1..15-4) on the GRS80
ellipsoid; parameters are the public NAD83 CA Zone III constants.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# GRS80 ellipsoid
_A_M = 6378137.0
_F_INV = 298.257222101
_E2 = (2 - 1 / _F_INV) / _F_INV
_E = math.sqrt(_E2)

# NAD83 California zone III (EPSG:2227 uses US survey feet)
_LAT1 = math.radians(38.43333333333333)  # upper standard parallel
_LAT2 = math.radians(37.06666666666667)  # lower standard parallel
_LAT0 = math.radians(36.5)  # latitude of origin
_LON0 = math.radians(-120.5)  # central meridian
_FE_M = 2000000.0001016  # false easting (m)
_FN_M = 500000.0001016  # false northing (m)
_M_TO_USFT = 3937.0 / 1200.0  # meters → US survey feet


def _m(lat: float) -> float:
    return math.cos(lat) / math.sqrt(1 - _E2 * math.sin(lat) ** 2)


def _t(lat: float) -> float:
    return math.tan(math.pi / 4 - lat / 2) / (
        (1 - _E * math.sin(lat)) / (1 + _E * math.sin(lat))
    ) ** (_E / 2)


_N = (math.log(_m(_LAT1)) - math.log(_m(_LAT2))) / (
    math.log(_t(_LAT1)) - math.log(_t(_LAT2))
)
_BIG_F = _m(_LAT1) / (_N * _t(_LAT1) ** _N)
_RHO0 = _A_M * _BIG_F * _t(_LAT0) ** _N


def _t_col(lat_rad: Column) -> Column:
    sin_lat = F.sin(lat_rad)
    return F.tan(F.lit(math.pi / 4) - lat_rad / 2) / F.pow(
        (1 - _E * sin_lat) / (1 + _E * sin_lat), _E / 2
    )


def lonlat_to_ca_stateplane(lon: Column, lat: Column) -> tuple[Column, Column]:
    """(lon°, lat°) → (x_ft, y_ft) in NAD83 CA Zone III US-survey
    feet. Pure column expressions (codegen'd trig)."""
    lat_rad = F.radians(lat)
    lon_rad = F.radians(lon)
    rho = _A_M * _BIG_F * F.pow(_t_col(lat_rad), F.lit(_N))
    theta = _N * (lon_rad - _LON0)
    x_m = rho * F.sin(theta) + _FE_M
    y_m = _RHO0 - rho * F.cos(theta) + _FN_M
    return (x_m * _M_TO_USFT), (y_m * _M_TO_USFT)


def euclidean_feet(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Planar distance in projected feet (``HwyNetwork.py:95-104``)."""
    return F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))


METERS_TO_FEET = 3.2808399  # GTFSHelper.py:475
FEET_PER_SECOND_TO_MPH = 0.681818  # TaxiDataHelper.py:229
FEET_PER_MILE = 5280.0  # GTFSHelper.py:492


def point_in_convex_polygon(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """True iff (x, y) lies inside (or on the boundary of) the CONVEX
    polygon given by ``vertices`` in counter-clockwise order — the
    exact-geometry upgrade of the bounding-box geofence (P6): for a
    convex CCW polygon, a point is inside iff every edge's cross
    product ``(b−a) × (p−a)`` is ≥ 0.

    Pure column arithmetic (one multiply-subtract per edge, AND-fold)
    — codegen'd, broadcast-free, deterministic: the sign tests use
    identical IEEE ops in any engine. Vertex count is a literal, so
    the expression tree is fixed at plan time; for polygon DIMENSIONS
    (many polygons) use the grid join (operators/spatial.py) to
    assign candidate polygons first and this predicate to verify.
    """
    if len(vertices) < 3:
        raise ValueError("a polygon needs at least 3 vertices")
    cond = F.lit(True)
    n = len(vertices)
    for i in range(n):
        ax, ay = vertices[i]
        bx, by = vertices[(i + 1) % n]
        cross = (F.lit(bx) - F.lit(ax)) * (y - F.lit(ay)) - (
            F.lit(by) - F.lit(ay)
        ) * (x - F.lit(ax))
        cond = cond & (cross >= 0)
    return cond
