"""OO scalar-class conformance: behaviors of the reference's
shapely/tests/geometry/ suite (test_point.py, test_linestring.py,
test_polygon.py, test_equality.py, test_hash.py, test_coords.py,
test_geometry_base.py), re-expressed against the compat facade.

Expectations are re-derived from the reference tests' *behavioral
contract* (constructor forms, equality = equals_identical, hash by WKB,
str == wkt, DimensionError on missing z/m) — not copied code.
"""

import numpy as np
import pytest

import engine.compat as sh
from engine.compat import DimensionError


# --------------------------------------------------------------- Point
def test_point_constructor_forms():
    assert sh.Point(1.0, 2.0).coords[:] == [(1.0, 2.0)]
    assert sh.Point(1.0, 2.0, 3.0).coords[:] == [(1.0, 2.0, 3.0)]
    assert sh.Point((3.0, 4.0)).coords[:] == [(3.0, 4.0)]
    assert sh.Point([3.0, 4.0]).coords[:] == [(3.0, 4.0)]
    assert sh.Point([(3.0, 4.0)]).coords[:] == [(3.0, 4.0)]
    assert sh.Point([[3.0, 4.0]]).coords[:] == [(3.0, 4.0)]
    assert sh.Point(np.array([1.0, 2.0])).coords[:] == [(1.0, 2.0)]
    # 1-size vector args (shapely-1.8 compat, reference issue #1587)
    assert sh.Point(np.array([1.0]), np.array([2.0])).coords[:] == [(1.0, 2.0)]
    # from another point: identity
    p = sh.Point(3.0, 4.0)
    assert sh.Point(p) is p
    # generator
    assert sh.Point(c for c in [(1.0, 2.0)]).coords[:] == [(1.0, 2.0)]


def test_point_empty():
    p = sh.Point()
    assert p.is_empty
    assert p.coords[:] == []
    assert isinstance(p.coords, sh.coords.CoordinateSequence)


def test_point_invalid():
    with pytest.raises(TypeError, match="at most 3 arguments"):
        sh.Point(1, 2, 3, 4)
    with pytest.raises(ValueError, match="1-size vector"):
        sh.Point([(2, 3), (11, 4)])


def test_point_xyz_accessors():
    p = sh.Point(1.0, 2.0)
    assert p.x == 1.0 and type(p.x) is float
    assert p.y == 2.0 and type(p.y) is float
    assert str(p) == p.wkt
    assert p.has_z is False
    with pytest.raises(DimensionError):
        p.z
    assert p.has_m is False
    with pytest.raises(DimensionError):
        p.m
    q = sh.Point(1.0, 2.0, 3.0)
    assert q.z == 3.0 and q.has_z


# ---------------------------------------------------------- LineString
def test_linestring_forms():
    ls = sh.LineString([(0, 0), (1, 1)])
    assert ls.coords[:] == [(0.0, 0.0), (1.0, 1.0)]
    # from points / mixed
    assert sh.LineString([sh.Point(0, 0), (1, 1)]).coords[:] == ls.coords[:]
    # from numpy
    assert sh.LineString(np.array([[0.0, 0.0], [1.0, 1.0]])).coords[:] == ls.coords[:]
    # identity passthrough
    assert sh.LineString(ls) is ls
    # from LinearRing -> closed LineString
    ring = sh.LinearRing([(0, 0), (1, 0), (1, 1)])
    ls2 = sh.LineString(ring)
    assert ls2.geom_type == "LineString"
    assert ls2.coords[0] == ls2.coords[-1]
    assert sh.LineString().is_empty
    # reference test_linestring.py:104 — 1-coordinate input is a GEOS
    # IllegalArgumentException, not a ValueError
    from engine.geo.errors import GEOSException

    with pytest.raises(GEOSException):
        sh.LineString([(0, 0)])


def test_linearring_closure_and_ccw():
    r = sh.LinearRing([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert r.coords[0] == r.coords[-1]
    assert r.is_ring
    assert r.is_closed


# ------------------------------------------------------------- Polygon
def test_polygon_forms():
    pg = sh.Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert pg.area == 16.0
    # shell from ring / polygon identity
    assert sh.Polygon(pg) is pg
    ring = sh.LinearRing([(0, 0), (2, 0), (2, 2), (0, 2)])
    assert sh.Polygon(ring).area == 4.0
    # holes
    holed = sh.Polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]]
    )
    assert holed.area == 99.0
    assert len(holed.interiors) == 1
    assert sh.Polygon().is_empty
    # points as shell vertices
    assert sh.Polygon([sh.Point(0, 0), (4, 0), (4, 4), sh.Point(0, 4)]).area == 16.0


# ---------------------------------------------------- equality and hash
def test_equality_is_equals_identical():
    assert sh.Point(1, 2) == sh.Point(1, 2)
    assert not sh.Point(1, 2) == sh.Point(1, 3)
    assert sh.Point(1, 2) != sh.Point(1, 3)
    # different dimensionality is unequal
    assert sh.Point(1, 2) != sh.Point(1, 2, 3)
    # coordinate order matters (NOT spatial equality)
    assert sh.LineString([(0, 0), (1, 1)]) != sh.LineString([(1, 1), (0, 0)])
    # extra collinear vertex -> unequal even though spatially equal
    assert sh.LineString([(0, 0), (1, 1)]) != sh.LineString([(0, 0), (0.5, 0.5), (1, 1)])
    # sub-geometry order matters
    a = sh.MultiLineString([[(1, 1), (2, 2)], [(2, 2), (3, 3)]])
    b = sh.MultiLineString([[(2, 2), (3, 3)], [(1, 1), (2, 2)]])
    assert a != b
    # NaN == NaN (identical semantics)
    n1 = sh.LineString([(0, 0), (float("nan"), 1)])
    n2 = sh.LineString([(0, 0), (float("nan"), 1)])
    assert n1 == n2
    # non-geometry comparisons
    assert sh.Point(1, 2).__eq__(1) is NotImplemented
    assert (sh.Point(1, 2) == 1) is False


def test_equality_reflexive_all_types():
    wkts = [
        "POINT (1 2)", "POINT Z (1 2 3)", "LINESTRING (0 0, 1 1)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT (1 1, 2 2)", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
        "POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
        "GEOMETRYCOLLECTION EMPTY",
    ]
    for w in wkts:
        g = sh.from_wkt(w)
        assert g == g, w
        assert g == sh.from_wkt(w), w
        assert hash(g) == hash(sh.from_wkt(w)), w


def test_hashable_in_sets_and_dicts():
    s = {sh.Point(1, 2), sh.Point(1, 2), sh.Point(3, 4)}
    assert len(s) == 2
    d = {sh.LineString([(0, 0), (1, 1)]): "a"}
    assert d[sh.LineString([(0, 0), (1, 1)])] == "a"
    # different geometries hash differently (WKB-based)
    assert hash(sh.Point(1, 2)) != hash(sh.Point(2, 1))


# ----------------------------------------------------------- str / repr
def test_str_is_wkt_and_repr_truncates():
    p = sh.Point(1, 2)
    assert str(p) == "POINT (1 2)" == p.wkt
    assert "POINT (1 2)" in repr(p)
    big = sh.Point(0, 0).buffer(2)
    r = repr(big)
    assert len(r) <= 80 and r.endswith("...>")


# -------------------------------------------------------------- coords
def test_coordinate_sequence_protocol():
    ls = sh.LineString([(0, 0), (1, 1), (2, 0)])
    cs = ls.coords
    assert len(cs) == 3
    assert cs[0] == (0.0, 0.0)
    assert cs[-1] == (2.0, 0.0)
    assert cs[1:] == [(1.0, 1.0), (2.0, 0.0)]
    assert list(cs) == [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    xs, ys = cs.xy
    assert list(xs) == [0.0, 1.0, 2.0]
    assert list(ys) == [0.0, 1.0, 0.0]
    assert np.asarray(cs).shape == (3, 2)
    # polygons have no coords (their rings do)
    with pytest.raises(NotImplementedError):
        sh.Polygon([(0, 0), (1, 0), (1, 1)]).coords
    assert sh.Polygon([(0, 0), (1, 0), (1, 1)]).exterior.coords[0] == (0.0, 0.0)
    # z coords flow through
    assert sh.Point(1, 2, 3).coords[:] == [(1.0, 2.0, 3.0)]


def test_geometry_base_properties():
    pg = sh.Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert pg.area == 16.0
    assert pg.length == 16.0
    assert tuple(pg.bounds) == (0.0, 0.0, 4.0, 4.0)
    assert pg.centroid == sh.Point(2, 2)
    assert pg.geom_type == "Polygon"
    assert bool(pg) is True
    assert bool(sh.Polygon()) is False
