"""Geom scalar layer: WKT round-trip, measures, representative points.

Expected values from the reference's docstrings
(`shapely/measurement.py:24-198`, `shapely/io.py:33-120`).
"""

import numpy as np
import pytest

from engine.geo import relate as R
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt
from tests.common import LineString, Point, Polygon, box, polygon_with_hole


@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (2 3)",
        "POINT EMPTY",
        "LINESTRING (0 0, 1 0, 1 1)",
        "LINESTRING EMPTY",
        "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
        "POLYGON EMPTY",
        "MULTIPOINT ((0 0), (1 2))",
        "MULTILINESTRING ((0 0, 1 2), (3 3, 4 4))",
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((3 3, 4 3, 4 4, 3 3)))",
        "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
        "GEOMETRYCOLLECTION EMPTY",
    ],
)
def test_wkt_roundtrip(wkt):
    assert to_wkt(from_wkt(wkt)) == wkt


def test_wkt_z_roundtrip():
    # Z is preserved through WKT (analysis kernels stay planar)
    g = from_wkt("POINT Z (1 2 3)")
    assert to_wkt(g) == "POINT Z (1 2 3)"
    assert g.has_z and not g.has_m


def test_area():
    # measurement.py:24 docstring values
    assert from_wkt("POLYGON ((0 0, 10 10, 10 0, 0 0))").area == 50.0
    assert polygon_with_hole.area == 100.0 - 4.0
    assert Point(0, 0).area == 0.0
    assert from_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 4 2, 4 4, 2 4, 2 2)))"
    ).area == 5.0


def test_length():
    assert LineString([(0, 0), (3, 4)]).length == 5.0
    assert box(0, 0, 2, 2).length == 8.0


def test_bounds():
    np.testing.assert_array_equal(
        LineString([(0, 0), (3, 4)]).bounds, [0, 0, 3, 4]
    )
    assert np.isnan(Point().bounds).all()


def test_centroid():
    c = box(0, 0, 2, 2).centroid
    np.testing.assert_allclose(c.xys[0], [1, 1])
    c = LineString([(0, 0), (2, 0)]).centroid
    np.testing.assert_allclose(c.xys[0], [1, 0])
    c = Geom.multi(GeomType.MULTIPOINT, [Point(0, 0), Point(2, 2)]).centroid
    np.testing.assert_allclose(c.xys[0], [1, 1])


def test_representative_point_in_interior():
    for g in [box(0, 0, 2, 2), polygon_with_hole,
              Polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]])]:
        x, y = g._representative_xy()
        assert R.contains(g, Geom.point(x, y))


def test_distance():
    assert R.distance(Point(0, 0), Point(3, 4)) == 5.0
    assert R.distance(box(0, 0, 1, 1), Point(0.5, 0.5)) == 0.0
    assert R.distance(box(0, 0, 1, 1), Point(2, 1)) == 1.0
    assert np.isnan(R.distance(Point(), Point(0, 0)))
