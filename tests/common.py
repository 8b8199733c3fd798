"""Shared fixtures/constructors for the conformance suite.

Mirrors the constructor surface the reference tests use
(`shapely/tests/common.py:8-221` fixture zoo) with our `Geom` scalars.
`buffer` approximates GEOS point-buffers as regular 4*quad_segs-gons with
vertices starting at angle 0 — the same vertex placement GEOS uses, which
the reference's STRtree fixtures rely on (test_strtree.py:43-49).
"""

from __future__ import annotations

import math

import numpy as np

from engine.geo.geom import Geom, GeomType

HALF_UNIT_DIAG = math.sqrt(2) / 2
EPS = 1e-9


def Point(*args):
    if len(args) == 0:
        return Geom(GeomType.POINT)
    if len(args) == 1:
        args = args[0]
    return Geom.point(float(args[0]), float(args[1]))


def LineString(coords=None):
    if coords is None:
        return Geom(GeomType.LINESTRING)
    return Geom.linestring(coords)


def LinearRing(coords=None):
    if coords is None:
        return Geom(GeomType.LINEARRING)
    return Geom.linearring(coords)


def Polygon(shell=None, holes=()):
    if shell is None:
        return Geom(GeomType.POLYGON)
    return Geom.polygon(shell, holes)


def MultiPoint(pts):
    return Geom.multi(GeomType.MULTIPOINT, [Point(p) for p in pts])


def MultiLineString(lines):
    return Geom.multi(GeomType.MULTILINESTRING, [LineString(l) for l in lines])


def MultiPolygon(polys):
    parts = []
    for p in polys:
        if isinstance(p, Geom):
            parts.append(p)
        else:
            shell = p[0]
            holes = p[1] if len(p) > 1 else ()
            parts.append(Geom.polygon(shell, holes))
    return Geom.multi(GeomType.MULTIPOLYGON, parts)


def GeometryCollection(parts=()):
    return Geom.collection(list(parts))


def box(xmin, ymin, xmax, ymax):
    return Geom.box(xmin, ymin, xmax, ymax)


def buffer(point_geom: Geom, radius: float, quad_segs: int = 8) -> Geom:
    """Point buffer as a regular (4*quad_segs)-gon, vertex 0 at angle 0.

    Matches GEOS vertex placement for point buffers closely enough that the
    reference's EPS-guarded STRtree fixtures (test_strtree.py:43-49) keep
    their designed hit/miss margins.
    """
    cx, cy = float(point_geom.xys[0, 0]), float(point_geom.xys[0, 1])
    n = 4 * quad_segs
    ang = np.arange(n) * (2.0 * np.pi / n)
    ring = np.empty((n + 1, 2))
    ring[:n, 0] = cx + radius * np.cos(ang)
    ring[:n, 1] = cy + radius * np.sin(ang)
    ring[n] = ring[0]
    return Geom(GeomType.POLYGON, rings=[ring])


# the reference's shared fixture zoo (tests/common.py:8-42)
point = Point(2, 3)
line_string = LineString([(0, 0), (1, 0), (1, 1)])
linear_ring = LinearRing([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
polygon = Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
polygon_with_hole = Polygon(
    [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
    holes=[[(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)]],
)
multi_point = MultiPoint([(0, 0), (1, 2)])
multi_line_string = MultiLineString([[(0, 0), (1, 2)]])
multi_polygon = MultiPolygon(
    [
        ([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],),
        ([(2.1, 2.1), (2.2, 2.1), (2.2, 2.2), (2.1, 2.2), (2.1, 2.1)],),
    ]
)
geometry_collection = GeometryCollection([Point(51, -1), LineString([(52, -1), (49, 2)])])
empty = GeometryCollection()
empty_point = Point()
empty_line_string = LineString()
empty_polygon = Polygon()
all_types = (
    point,
    line_string,
    linear_ring,
    polygon,
    multi_point,
    multi_line_string,
    multi_polygon,
    geometry_collection,
)
