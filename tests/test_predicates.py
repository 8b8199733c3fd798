"""Predicate conformance corpus.

Expected booleans ported from the reference's docstring examples
(`shapely/predicates.py:500-1300`) and None-handling rules
(`shapely/tests/test_predicates.py:117-121`).
"""

import numpy as np
import pytest

from engine.geo import predicates as P
from engine.geo.geom import Geom
from tests.common import (
    LineString,
    LinearRing,
    MultiPoint,
    Point,
    Polygon,
    all_types,
    box,
    polygon_with_hole,
)

line = LineString([(0, 0), (1, 1)])
area = Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])

BINARY_CASES = [
    # crosses (predicates.py:523-548)
    (P.crosses, line, Point(0.5, 0.5), False),
    (P.crosses, line, MultiPoint([(0, 1), (0.5, 0.5)]), True),
    (P.crosses, line, LineString([(0, 1), (1, 0)]), True),
    (P.crosses, line, LineString([(0, 0), (2, 2)]), False),
    (P.crosses, area, line, False),
    (P.crosses, area, LineString([(0, 0), (2, 2)]), True),
    (P.crosses, area, Point(0.5, 0.5), False),
    (P.crosses, area, MultiPoint([(2, 2), (0.5, 0.5)]), True),
    # contains (predicates.py:585-611)
    (P.contains, line, Point(0, 0), False),
    (P.contains, line, Point(0.5, 0.5), True),
    (P.contains, area, Point(0, 0), False),
    (P.contains, area, line, True),
    (P.contains, area, LineString([(0, 0), (2, 2)]), False),
    (P.contains, polygon_with_hole, Point(1, 1), True),
    (P.contains, polygon_with_hole, Point(2, 2), False),
    (P.contains, polygon_with_hole, LineString([(1, 1), (5, 5)]), False),
    (P.contains, area, area, True),
    (P.contains, area, None, False),
    # contains_properly (predicates.py:649-666)
    (
        P.contains,
        Polygon([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)]),
        Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]),
        True,
    ),
    (
        P.contains_properly,
        Polygon([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)]),
        Polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]),
        False,
    ),
    (
        P.contains_properly,
        Polygon([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)]),
        Polygon([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]),
        True,
    ),
    (P.contains_properly, area, area, False),
    # covered_by / covers (predicates.py:695-815)
    (P.covered_by, Point(0, 0), line, True),
    (P.covered_by, Point(0.5, 0.5), line, True),
    (P.covered_by, Point(0, 0), area, True),
    (P.covered_by, line, area, True),
    (P.covered_by, LineString([(0, 0), (2, 2)]), area, False),
    (P.covered_by, Point(1, 1), polygon_with_hole, True),
    (P.covered_by, Point(2, 2), polygon_with_hole, True),
    (P.covered_by, LineString([(1, 1), (5, 5)]), polygon_with_hole, False),
    (P.covered_by, area, area, True),
    (P.covered_by, None, area, False),
    (P.covers, line, Point(0, 0), True),
    (P.covers, line, Point(0.5, 0.5), True),
    (P.covers, area, Point(0, 0), True),
    (P.covers, area, line, True),
    (P.covers, area, LineString([(0, 0), (2, 2)]), False),
    (P.covers, polygon_with_hole, Point(1, 1), True),
    (P.covers, polygon_with_hole, Point(2, 2), True),
    (P.covers, polygon_with_hole, LineString([(1, 1), (5, 5)]), False),
    (P.covers, area, area, True),
    (P.covers, area, None, False),
    # disjoint (predicates.py:783+)
    (P.disjoint, Point(0, 0), Point(0, 0), False),
    (P.disjoint, Point(0, 0), Point(1, 1), True),
    (P.disjoint, line, Point(0.5, 0.5), False),
    (P.disjoint, None, Point(0, 0), False),
    (P.disjoint, None, None, False),
    # equals (predicates.py:830+)
    (P.equals, line, LineString([(0, 0), (1, 1)]), True),
    (P.equals, line, LineString([(0, 0), (0.5, 0.5), (1, 1)]), True),
    (P.equals, line, LineString([(1, 1), (0, 0)]), True),
    (P.equals, line, LineString([(0, 0), (2, 2)]), False),
    (P.equals, Point(), Point(), True),
    (P.equals, None, None, False),
    # intersects
    (P.intersects, line, Point(0, 0), True),
    (P.intersects, line, Point(0.5, 0.6), False),
    (P.intersects, None, None, False),
    # overlaps (predicates.py:905-964)
    (
        P.overlaps,
        Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
        Polygon([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]),
        True,
    ),
    (
        P.overlaps,
        Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
        Polygon([(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]),
        False,
    ),  # only touch at corner point
    (P.overlaps, line, LineString([(0.5, 0.5), (2, 2)]), True),
    (P.overlaps, line, line, False),
    (P.overlaps, line, area, False),
    (P.overlaps, MultiPoint([(0, 0), (1, 1)]), MultiPoint([(1, 1), (2, 2)]), True),
    (P.overlaps, MultiPoint([(0, 0), (1, 1)]), MultiPoint([(0, 0), (1, 1)]), False),
    # touches (predicates.py:968+)
    (P.touches, line, Point(0, 0), True),
    (P.touches, line, Point(1, 1), True),
    (P.touches, line, Point(0.5, 0.5), False),
    (
        P.touches,
        Polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
        Polygon([(2, 0), (4, 0), (4, 2), (2, 2), (2, 0)]),
        True,
    ),
    (P.touches, area, area, False),
    # within (predicates.py:1013+)
    (P.within, Point(0, 0), line, False),
    (P.within, Point(0.5, 0.5), line, True),
    (P.within, Point(0, 0), area, False),
    (P.within, line, area, True),
    (P.within, LineString([(0, 0), (2, 2)]), area, False),
    (P.within, Point(1, 1), polygon_with_hole, True),
    (P.within, Point(2, 2), polygon_with_hole, False),
    (P.within, area, area, True),
    (P.within, None, area, False),
]


@pytest.mark.parametrize("fn,a,b,expected", BINARY_CASES)
def test_binary_predicates(fn, a, b, expected):
    assert fn(a, b) is expected or fn(a, b) == expected


@pytest.mark.parametrize(
    "fn",
    [
        P.crosses, P.contains, P.contains_properly, P.covered_by, P.covers,
        P.disjoint, P.equals, P.intersects, P.overlaps, P.touches, P.within,
    ],
)
@pytest.mark.parametrize("g", list(all_types))
def test_binary_none_returns_false(fn, g):
    # test_predicates.py:117-121 — None always -> False
    assert fn(g, None) == False  # noqa: E712
    assert fn(None, g) == False  # noqa: E712
    assert fn(None, None) == False  # noqa: E712


def test_relate():
    assert P.relate(Point(0, 0), Point(0, 0)) == "0FFFFFFF2"
    assert P.relate(line, LineString([(0, 1), (1, 0)])) == "0F1FF0102"
    assert P.relate(None, line) is None
    # within pattern (predicates.py:1259-1262)
    assert P.relate_pattern(Point(0.5, 0.5), area, "T*F**F***")


def test_is_ccw():
    # predicates.py:136-145
    assert P.is_ccw(LinearRing([(0, 0), (0, 1), (1, 1), (0, 0)])) == False  # noqa
    assert P.is_ccw(LinearRing([(0, 0), (1, 1), (0, 1), (0, 0)])) == True  # noqa
    assert P.is_ccw(LineString([(0, 0), (1, 1), (0, 1)])) == False  # noqa
    assert P.is_ccw(Point(0, 0)) == False  # noqa


def test_is_closed():
    assert P.is_closed(LineString([(0, 0), (1, 1)])) == False  # noqa
    assert P.is_closed(LineString([(0, 0), (0, 1), (1, 1), (0, 0)])) == True  # noqa
    assert P.is_closed(Point(0, 0)) == False  # noqa


def test_is_empty_missing_geometry():
    assert P.is_empty(Point()) == True  # noqa
    assert P.is_empty(Point(0, 0)) == False  # noqa
    assert P.is_empty(None) == False  # noqa
    assert P.is_geometry(Point(0, 0)) == True  # noqa
    assert P.is_geometry(None) == False  # noqa
    assert P.is_missing(None) == True  # noqa
    assert P.is_missing(Point(0, 0)) == False  # noqa
    assert P.is_valid_input(None) == True  # noqa
    assert P.is_valid_input(Point(0, 0)) == True  # noqa


def test_is_ring_simple():
    g = LineString([(0, 0), (1, 1)])
    assert (P.is_closed(g), P.is_simple(g), P.is_ring(g)) == (False, True, False)
    g = LineString([(0, 0), (0, 1), (1, 1), (0, 0)])
    assert (P.is_closed(g), P.is_simple(g), P.is_ring(g)) == (True, True, True)
    g = LineString([(0, 0), (1, 1), (0, 1), (1, 0), (0, 0)])
    assert (P.is_closed(g), P.is_simple(g), P.is_ring(g)) == (True, False, False)
    assert P.is_simple(Polygon([(1, 1), (2, 1), (2, 2), (1, 1)])) == True  # noqa
    assert P.is_simple(None) == False  # noqa


def test_is_valid():
    assert P.is_valid(LineString([(0, 0), (1, 1)])) == True  # noqa
    assert P.is_valid(Polygon([(0, 0), (1, 1), (1, 2), (1, 1), (0, 0)])) == False  # noqa
    assert P.is_valid(Geom.collection([])) == True  # noqa
    assert P.is_valid(None) == False  # noqa
    # bowtie polygon is invalid
    assert P.is_valid(Polygon([(0, 0), (1, 1), (1, 0), (0, 1), (0, 0)])) == False  # noqa
    assert P.is_valid(box(0, 0, 1, 1)) == True  # noqa
    assert P.is_valid(polygon_with_hole) == True  # noqa


def test_is_valid_reason():
    assert P.is_valid_reason(LineString([(0, 0), (1, 1)])) == "Valid Geometry"
    assert P.is_valid_reason(None) is None


def test_equals_exact():
    p1 = Point(0, 0)
    assert P.equals_exact(p1, Point(0, 0)) == True  # noqa
    assert P.equals_exact(p1, Point(0, 0.1)) == False  # noqa
    assert P.equals_exact(p1, Point(0, 0.1), tolerance=0.2) == True  # noqa
    # structural, not topological (predicates.py:1081)
    assert P.equals_exact(
        LineString([(0, 0), (1, 1)]), LineString([(0, 0), (0.5, 0.5), (1, 1)])
    ) == False  # noqa


def test_dwithin():
    # predicates.py:1293-1304
    p = Point(0, 1)
    assert P.dwithin(p, Point(0, 0), 1.0) == True  # noqa
    assert P.dwithin(p, Point(0, 0), 0.5) == False  # noqa
    assert P.dwithin(p, Point(0, 0), -1) == False  # noqa
    assert P.dwithin(None, Point(0, 0), 1.0) == False  # noqa
    assert P.dwithin(p, None, 100.0) == False  # noqa


def test_contains_xy_intersects_xy():
    # predicates.py:1311-1418 semantics
    assert P.contains_xy(area, 0.5, 0.5) == True  # noqa
    assert P.contains_xy(area, 0, 0) == False  # noqa (on boundary)
    assert P.intersects_xy(area, 0, 0) == True  # noqa
    assert P.intersects_xy(line, 0.5, 0.5) == True  # noqa
    assert P.contains_xy(polygon_with_hole, 3, 3) == False  # noqa (in hole)
    assert P.intersects_xy(polygon_with_hole, 2, 2) == True  # noqa (hole bndry)
    xs = np.array([0.5, 0.0, 3.0, 20.0])
    ys = np.array([0.5, 0.0, 3.0, 20.0])
    np.testing.assert_array_equal(
        P.contains_xy(polygon_with_hole, xs, ys), [True, False, False, False]
    )
    np.testing.assert_array_equal(
        P.intersects_xy(polygon_with_hole, xs, ys), [True, True, False, False]
    )


def test_broadcasting():
    pts = [Point(0.5, 0.5), Point(5, 5), None]
    got = P.contains(area, pts)
    np.testing.assert_array_equal(got, [True, False, False])
    got = P.intersects(pts, area)
    np.testing.assert_array_equal(got, [True, False, False])


def test_prepare_noop_parity():
    g = box(0, 0, 2, 2)
    assert P.is_prepared(g) == False  # noqa
    P.prepare(g)
    assert P.is_prepared(g) == True  # noqa
    # prepared results identical (test_predicates.py:413-421)
    assert P.contains(g, Point(1, 1)) == True  # noqa
    P.destroy_prepared(g)
    assert P.is_prepared(g) == False  # noqa
