"""Switch-over façade: reference-style code runs against engine.compat."""
import numpy as np
import pytest

import engine.compat as shapely
from engine.compat import LineString, MultiPoint, Point, Polygon


def test_reference_style_session():
    # a typical shapely user session, verbatim API
    point = Point(0.5, 0.5)
    poly = Polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    assert shapely.contains(poly, point)
    assert poly.contains(point)
    assert point.within(poly)
    assert (poly & Polygon([(0.5, 0), (2, 0), (2, 2), (0.5, 2)])).wkt.startswith("POLYGON")
    assert shapely.area(poly) == 1.0
    assert poly.buffer(1.0).contains(Point(-0.5, 0.5))
    line = LineString([(0, 0), (1, 0), (1, 1)])
    assert shapely.length(line) == 2.0
    assert shapely.line_interpolate_point(line, 1.5).wkt == "POINT (1 0.5)"
    tree = shapely.STRtree([Point(i, i) for i in range(10)])
    q = tree.query(poly.buffer(0.1), predicate="intersects")
    assert set(q.tolist()) == {0, 1}
    assert shapely.to_wkt(shapely.from_wkb(shapely.to_wkb(point))) == "POINT (0.5 0.5)"


def test_docstring_example_predicates():
    # predicates.py:1218 docstring verbatim
    point = Point(0, 0)
    line = LineString([(0, 0), (1, 1)])
    assert shapely.relate(point, line) == "F0FFFF102"


def test_operator_overloads():
    a = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    b = Polygon([(2, 2), (6, 2), (6, 6), (2, 6)])
    assert shapely.area(a & b) == 4.0
    assert shapely.area(a | b) == 28.0
    assert shapely.area(a - b) == 12.0
    assert shapely.area(a ^ b) == 24.0


def test_multi_constructors():
    mp = MultiPoint([(0, 0), (1, 1)])
    assert shapely.get_num_geometries(mp) == 2
    assert shapely.to_wkt(mp) == "MULTIPOINT ((0 0), (1 1))"
