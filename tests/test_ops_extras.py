"""ops.split / nearest_points / accessors / precision / max inscribed circle."""
import numpy as np
import pytest

from engine.geo import measure, ops
from engine.geo import predicates as pred
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt

P = from_wkt


def test_split_polygon_by_line():
    poly = P("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    line = P("LINESTRING (5 -1, 5 11)")
    parts = ops.split(poly, line)
    assert len(parts.parts) == 2
    assert sum(measure.area(p) for p in parts.parts) == pytest.approx(100.0)
    areas = sorted(measure.area(p) for p in parts.parts)
    assert areas == [50.0, 50.0]


def test_split_line_by_point_and_line():
    line = P("LINESTRING (0 0, 10 0)")
    out = ops.split(line, P("POINT (4 0)"))
    assert [to_wkt(p) for p in out.parts] == ["LINESTRING (0 0, 4 0)", "LINESTRING (4 0, 10 0)"]
    out2 = ops.split(line, P("LINESTRING (6 -1, 6 1)"))
    assert [to_wkt(p) for p in out2.parts] == ["LINESTRING (0 0, 6 0)", "LINESTRING (6 0, 10 0)"]


def test_nearest_points():
    a, b = ops.nearest_points(P("POINT (0 5)"), P("LINESTRING (0 0, 10 0)"))
    assert to_wkt(a) == "POINT (0 5)" and to_wkt(b) == "POINT (0 0)"


def test_accessors():
    line = P("LINESTRING (0 0, 1 1, 2 2)")
    assert to_wkt(ops.get_point(line, 1)) == "POINT (1 1)"
    assert ops.get_point(line, 5) is None
    assert ops.get_num_points(line) == 3
    mp = P("MULTIPOINT ((0 0), (1 1))")
    assert to_wkt(ops.get_geometry(mp, 1)) == "POINT (1 1)"
    assert to_wkt(ops.get_geometry(P("POINT (9 9)"), 0)) == "POINT (9 9)"
    segs = ops.get_segments(line)
    assert len(segs) == 2 and to_wkt(segs[0]) == "LINESTRING (0 0, 1 1)"
    assert ops.force_2d(line) is line


def test_precision():
    g = P("LINESTRING (0.12 0.44, 1.06 1.49)")
    s = ops.set_precision(g, 0.5)
    assert to_wkt(s) == "LINESTRING (0 0.5, 1 1.5)"
    assert ops.get_precision(s) == 0.5
    assert ops.get_precision(g) == 0.0


def test_maximum_inscribed_circle():
    g = P("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    line = ops.maximum_inscribed_circle(g, tolerance=0.01)
    assert measure.length(line) == pytest.approx(5.0, abs=0.1)
    cx, cy = line.xys[0]
    assert abs(cx - 5) < 0.2 and abs(cy - 5) < 0.2
