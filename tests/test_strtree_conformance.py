"""STRtree conformance corpus.

Expected index tables ported verbatim from the reference's own test suite
(`/root/reference/shapely/tests/test_strtree.py`, fixtures at :28-49 and
expected tables at :250-1910) — the data is the oracle; the harness and
the engine under test are ours.  Tie-order-sensitive cases are compared as
sets, matching how the reference's own tests treat its documented
nondeterminism (strtree.py:276-279).
"""

import math

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from engine.geo.strtree import STRtree
from tests.common import (
    EPS,
    HALF_UNIT_DIAG,
    LineString,
    MultiPoint,
    Point,
    Polygon,
    box,
    buffer,
    empty,
    empty_line_string,
    empty_point,
    point,
)


@pytest.fixture(scope="module")
def tree():
    return STRtree([Point(i, i) for i in range(10)])


@pytest.fixture(scope="module")
def line_tree():
    return STRtree([LineString([(i, i), (i + 1, i + 1)]) for i in range(10)])


@pytest.fixture(scope="module")
def poly_tree():
    return STRtree(
        [buffer(Point(i, i), HALF_UNIT_DIAG + EPS, quad_segs=32) for i in range(10)]
    )


# ---------------------------------------------------------------- build rules
@pytest.mark.parametrize(
    "geometry,count,hits",
    [
        ([], 0, 0),
        ([point], 1, 1),
        ([None], 0, 0),
        ([point, None], 1, 1),
        ([empty, empty_point, empty_line_string], 0, 0),
        ([empty, point, empty_point, empty_line_string], 1, 1),
    ],
)
def test_init(geometry, count, hits):
    tree = STRtree(geometry)
    assert len(tree) == count
    assert tree.query(box(0, 0, 100, 100)).size == hits


@pytest.mark.parametrize(
    "tree_geometry,geometry,expected",
    [
        ([], point, []),
        ([None], point, []),
        ([point], None, []),
        ([empty], empty, []),
        ([empty], point, []),
        ([point, empty], empty, []),
        ([None, point], box(0, 0, 10, 10), [1]),
        ([None, empty, point], box(0, 0, 10, 10), [2]),
        ([point, None, point], box(0, 0, 10, 10), [0, 2]),
        ([empty, point], [empty, point], [[1], [1]]),
    ],
)
def test_query_with_none_and_empty(tree_geometry, geometry, expected):
    assert_array_equal(STRtree(tree_geometry).query(geometry), expected)


# -------------------------------------------------------------- plain query
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), [1]),
        ([Point(1, 1), Point(-1, -1), Point(2, 2)], [[0, 2], [1, 2]]),
        (box(0, 0, 1, 1), [0, 1]),
        (box(5, 5, 15, 15), [5, 6, 7, 8, 9]),
        (
            [box(0, 0, 1, 1), box(100, 100, 110, 110), box(5, 5, 15, 15)],
            [[0, 0, 2, 2, 2, 2, 2], [0, 1, 5, 6, 7, 8, 9]],
        ),
        (buffer(Point(3, 3), 1), [2, 3, 4]),
        (MultiPoint([[5, 7], [7, 5]]), [5, 6, 7]),
    ],
)
def test_query_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), [0]),
        (Point(0.5, 0.5), [0]),
        (Point(0, 0.5), [0]),
        (Point(1, 1), [0, 1]),
        (box(0, 0, 1, 1), [0, 1]),
        (buffer(Point(3, 3), 0.5), [2, 3]),
        (MultiPoint([[5, 7], [7, 5]]), [4, 5, 6, 7]),
    ],
)
def test_query_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), [0, 1]),
        (Point(1, 1), [1]),
        (box(0, 0, 1, 1), [0, 1]),
        (box(0, 0, 1.5, 1.5), [0, 1, 2]),
        (
            [box(0, 0, 1, 1), box(100, 100, 110, 110), box(2, 2, 3, 3)],
            [[0, 0, 2, 2], [0, 1, 2, 3]],
        ),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), [2, 3, 4]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [1, 2, 3, 4, 5]),
        (MultiPoint([[5, 7], [7, 5]]), [5, 6, 7]),
    ],
)
def test_query_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry), expected)


def test_query_invalid_predicate(tree):
    with pytest.raises(ValueError):
        tree.query(Point(1, 1), predicate="bad_predicate")
    with pytest.raises(ValueError):
        tree.query(Point(1, 1), predicate="disjoint")


@pytest.mark.parametrize(
    "predicate,expected",
    [
        ("intersects", [0, 1, 2]),
        ("within", []),
        ("contains", [1]),
        ("overlaps", []),
        ("crosses", []),
        ("covers", [0, 1, 2]),
        ("covered_by", []),
        ("contains_properly", [1]),
    ],
)
def test_query_prepared_inputs(tree, predicate, expected):
    assert_array_equal(tree.query(box(0, 0, 2, 2), predicate=predicate), expected)


# --------------------------------------------------------------- intersects
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), [1]),
        (box(3, 3, 6, 6), [3, 4, 5, 6]),
        (
            [box(0, 0, 1, 1), box(100, 100, 110, 110), box(3, 3, 6, 6)],
            [[0, 0, 2, 2, 2, 2], [0, 1, 3, 4, 5, 6]],
        ),
        (buffer(Point(3, 3), 1), [3]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [2, 3, 4]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[5, 7], [7, 5]]), []),
        (MultiPoint([[5, 7], [7, 7]]), [7]),
    ],
)
def test_query_intersects_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="intersects"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), [0]),
        (Point(0.5, 0.5), [0]),
        (Point(0, 0.5), []),
        (Point(1, 1), [0, 1]),
        (box(0, 0, 1, 1), [0, 1]),
        (
            [box(0, 0, 1, 1), box(100, 100, 110, 110), box(2, 2, 3, 3)],
            [[0, 0, 2, 2, 2], [0, 1, 1, 2, 3]],
        ),
        (buffer(Point(3, 3), 0.5), [2, 3]),
        (buffer(Point(2, 1), HALF_UNIT_DIAG), [1]),
        (MultiPoint([[5, 7], [7, 5]]), []),
        (MultiPoint([[5, 7], [7, 7]]), [6, 7]),
    ],
)
def test_query_intersects_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="intersects"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0.5), [0]),
        (Point(0.5, 0), [0]),
        (Point(0.5, 0.5), [0, 1]),
        (Point(1, 1), [1]),
        (box(0, 0, 1, 1), [0, 1]),
        (box(0, 0, 1.5, 1.5), [0, 1, 2]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), [2, 3, 4]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [1, 2, 3, 4, 5]),
        (MultiPoint([[5, 7], [7, 5]]), []),
        (MultiPoint([[5, 7], [7, 7]]), [7]),
    ],
)
def test_query_intersects_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="intersects"), expected)


# ------------------------------------------------------------------- within
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), [1]),
        (box(3, 3, 6, 6), []),
        (buffer(Point(3, 3), 1), []),
        (MultiPoint([[5, 5], [7, 7]]), []),
        (MultiPoint([[5, 7], [7, 7]]), []),
    ],
)
def test_query_within_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="within"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (Point(0.5, 0.5), [0]),
        (Point(0, 0.5), []),
        (Point(1, 1), []),
        (box(0, 0, 1, 1), []),
        (buffer(Point(3, 3), 0.5), []),
        (MultiPoint([[5, 7], [7, 7]]), []),
        (MultiPoint([[6.5, 6.5], [7, 7]]), [6]),
    ],
)
def test_query_within_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="within"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0.5), [0]),
        (Point(0.5, 0.5), [0, 1]),
        (Point(1, 1), [1]),
        (box(0, 0, 1, 1), []),
        (box(0, 0, 0.5, 0.5), [0]),
        (box(0, 0, 1.5, 1.5), []),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), [3]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), []),
        (MultiPoint([[5, 7], [7, 7]]), []),
        (MultiPoint([[5.25, 5.5], [5.25, 5.0]]), [5]),
    ],
)
def test_query_within_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="within"), expected)


# ----------------------------------------------------------------- contains
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), [1]),
        (box(3, 3, 6, 6), [4, 5]),
        (buffer(Point(3, 3), 1), [3]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [2, 3, 4]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[5, 7], [7, 7]]), [7]),
    ],
)
def test_query_contains_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="contains"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1, 1), [0]),
        (buffer(Point(3, 3), 0.5), []),
        (MultiPoint([[5, 5], [6, 6]]), []),
    ],
)
def test_query_contains_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="contains"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1, 1), []),
        (box(0, 0, 2, 2), [1]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), []),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [3]),
    ],
)
def test_query_contains_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="contains"), expected)


# ----------------------------------------------------------------- overlaps
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), []),
        (box(3, 3, 6, 6), []),
        (MultiPoint([[5, 5], [7, 7]]), []),
        (MultiPoint([[5, 7], [7, 7]]), []),
    ],
)
def test_query_overlaps_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="overlaps"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1.5, 1.5), []),
        (buffer(Point(3, 3), 0.5), []),
        (MultiPoint([[5, 5], [6, 6]]), []),
    ],
)
def test_query_overlaps_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="overlaps"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1, 1), [0, 1]),
        (box(0, 0, 2, 2), [0, 2]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), [2, 4]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [1, 2, 4, 5]),
        (MultiPoint([[5, 7], [7, 7]]), []),
    ],
)
def test_query_overlaps_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="overlaps"), expected)


# ------------------------------------------------------------------ crosses
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(1, 1), []),
        (box(3, 3, 6, 6), []),
        (buffer(Point(3, 3), 1), []),
        (MultiPoint([[5, 7], [7, 7]]), []),
    ],
)
def test_query_crosses_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="crosses"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1.5, 1.5), [1]),
        (buffer(Point(3, 3), 0.5), [2, 3]),
        (LineString([(1, 0), (0, 1)]), [0]),
        (MultiPoint([[5, 7], [7, 7], [7, 8]]), []),
    ],
)
def test_query_crosses_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="crosses"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0.5), []),
        (box(0, 0, 1.5, 1.5), []),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), []),
        (MultiPoint([[5, 7], [7, 7], [7, 8]]), [7]),
    ],
)
def test_query_crosses_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="crosses"), expected)


# ------------------------------------------------------------------ touches
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), []),
        (box(3, 3, 6, 6), [3, 6]),
        (buffer(Point(3, 3), 1), []),
        (LineString([(-1, -1), (1, 1)]), [1]),
        (MultiPoint([[5, 5], [7, 7]]), []),
    ],
)
def test_query_touches_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="touches"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), [0]),
        (Point(0.5, 0.5), []),
        (Point(1, 1), [0, 1]),
        (box(0, 0, 1, 1), [1]),
        (buffer(Point(3, 3), 0.5), []),
        (buffer(Point(2, 1), HALF_UNIT_DIAG + 1e-7), []),
        (MultiPoint([[5, 7], [7, 5]]), []),
        (MultiPoint([[5, 7], [7, 7], [7, 8]]), [6, 7]),
    ],
)
def test_query_touches_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="touches"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0.5), []),
        (Point(HALF_UNIT_DIAG + EPS, 0), [0]),
        (box(0, 0, 1, 1), []),
        (box(HALF_UNIT_DIAG + EPS, 0, 2, 2), [0]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG + EPS), []),
        (MultiPoint([[0, 0], [7, 7], [7, 8]]), []),
    ],
)
def test_query_touches_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="touches"), expected)


# ------------------------------------------------------------------- covers
@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), []),
        (Point(1, 1), [1]),
        (box(3, 3, 6, 6), [3, 4, 5, 6]),
        (buffer(Point(3, 3), 1), [3]),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [2, 3, 4]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[5, 7], [7, 5]]), []),
        (MultiPoint([[5, 7], [7, 7]]), [7]),
    ],
)
def test_query_covers_points(tree, geometry, expected):
    assert_array_equal(tree.query(geometry, predicate="covers"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1.5, 1.5), [0]),
        (box(1, 1, 3, 3), [1, 2]),
        (buffer(Point(3, 3), 0.5), []),
        (MultiPoint([[5, 5], [6, 6]]), []),
    ],
)
def test_query_covers_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query(geometry, predicate="covers"), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), []),
        (box(0, 0, 1, 1), []),
        (box(0, 0, 2, 2), [1]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), []),
        (buffer(Point(3, 3), 3 * HALF_UNIT_DIAG), [3]),
        (MultiPoint([[5, 7], [7, 5]]), []),
    ],
)
def test_query_covers_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query(geometry, predicate="covers"), expected)


# ------------------------------------------------------------------ dwithin
@pytest.mark.parametrize(
    "geometry,distance,expected",
    [
        (None, 1.0, []),
        (Point(0.25, 0.25), 0, []),
        (Point(0.25, 0.25), -1, []),
        (Point(0.25, 0.25), np.nan, []),
        (Point(), 1, []),
        (Point(0.25, 0.25), 0.5, [0]),
        (Point(0.25, 0.25), 2.5, [0, 1, 2]),
        (Point(3, 3), 1.5, [2, 3, 4]),
        (Point(0.5, 0.5), 0.75, [0, 1]),
        ([Point(0.5, 0.5), Point(0.25, 0.25)], 0.75, [[0, 0, 1], [0, 1, 0]]),
        ([Point(0, 0.2), Point(1.75, 1.75)], [0.25, 2], [[0, 1, 1, 1], [0, 1, 2, 3]]),
        (box(0, 0, 3, 3), 0, [0, 1, 2, 3]),
        (box(0, 0, 3, 3), 0.25, [0, 1, 2, 3]),
        (box(1, 1, 2, 2), 1.5, [0, 1, 2, 3]),
        (MultiPoint([[0.25, 0.25], [1.5, 1.5]]), 0.75, [0, 1, 2]),
        (MultiPoint([[0.5, 0.5], [3.5, 3.5]]), 0.75, [0, 1, 3, 4]),
    ],
)
def test_query_dwithin_points(tree, geometry, distance, expected):
    assert_array_equal(
        tree.query(geometry, predicate="dwithin", distance=distance), expected
    )


@pytest.mark.parametrize(
    "geometry,distance,expected",
    [
        (None, 1.0, []),
        (Point(0.5, 0.5), 0, [0]),
        (Point(0.5, 0.5), 1.0, [0, 1]),
        (Point(2, 2), 0.5, [1, 2]),
        (box(0, 0, 1, 1), 0.5, [0, 1]),
        (box(0.5, 0.5, 1.5, 1.5), 0.5, [0, 1]),
        (MultiPoint([[5, 5], [7, 7]]), 0.5, [4, 5, 6, 7]),
        (MultiPoint([[5, 7], [7, 5]]), 1.5, [5, 6]),
    ],
)
def test_query_dwithin_lines(line_tree, geometry, distance, expected):
    assert_array_equal(
        line_tree.query(geometry, predicate="dwithin", distance=distance), expected
    )


@pytest.mark.parametrize(
    "geometry,distance,expected",
    [
        (Point(0, 0), 0, [0]),
        (Point(0, 0), 0.5, [0]),
        (Point(0, 0), 1.5, [0, 1]),
        (Point(0.5, 0.5), 1, [0, 1]),
        (Point(0.5, 0.5), 0.5, [0, 1]),
        (box(0, 0, 1, 1), 0, [0, 1]),
        (box(0, 0, 1, 1), 2, [0, 1, 2]),
        (MultiPoint([[5, 5], [7, 7]]), 0.5, [5, 7]),
        (MultiPoint([[5, 5], [7, 7]]), 2.5, [3, 4, 5, 6, 7, 8, 9]),
    ],
)
def test_query_dwithin_polygons(poly_tree, geometry, distance, expected):
    assert_array_equal(
        poly_tree.query(geometry, predicate="dwithin", distance=distance), expected
    )


def test_query_dwithin_requires_distance(tree):
    with pytest.raises(ValueError):
        tree.query(Point(1, 1), predicate="dwithin")


# ------------------------------------------------------------------ nearest
def test_nearest_empty_tree():
    assert STRtree([]).nearest(point) is None


@pytest.mark.parametrize("geometry", [None, [None], [Point(1, 1), None]])
def test_nearest_none(tree, geometry):
    with pytest.raises(ValueError):
        tree.nearest(geometry)


@pytest.mark.parametrize(
    "geometry", [empty_point, [empty_point], [Point(1, 1), empty_point]]
)
def test_nearest_empty(tree, geometry):
    with pytest.raises(ValueError):
        tree.nearest(geometry)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.25, 0.25), 0),
        (Point(0.75, 0.75), 1),
        (Point(1, 1), 1),
        ([Point(1, 1), Point(0, 0)], [1, 0]),
        ([Point(1, 1), Point(0.25, 1)], [1, 1]),
        ([Point(-10, -10), Point(100, 100)], [0, 9]),
        (box(0.5, 0.5, 0.75, 0.75), 1),
        (buffer(Point(2.5, 2.5), HALF_UNIT_DIAG), 2),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), 3),
        (MultiPoint([[5.5, 5], [7, 7]]), 7),
        (MultiPoint([[5, 7], [7, 5]]), 6),
    ],
)
def test_nearest_points(tree, geometry, expected):
    assert_array_equal(tree.nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), [0, 1]),
        (box(0, 0, 3, 3), [0, 1, 2, 3]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
    ],
)
def test_nearest_points_equidistant(tree, geometry, expected):
    assert tree.nearest(geometry) in expected


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), 0),
        (Point(1.5, 0.5), 0),
        (box(0.5, 1.5, 1, 2), 1),
        (LineString([(0, 0.5), (1, 2.5)]), 0),
    ],
)
def test_nearest_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), 0),
        (Point(2, 2), 2),
        (box(0, 5, 1, 6), 3),
        (MultiPoint([[5, 7], [7, 5]]), 6),
    ],
)
def test_nearest_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.nearest(geometry), expected)


# ------------------------------------------------------------ query_nearest
def test_query_nearest_empty_tree():
    tree = STRtree([])
    assert_array_equal(tree.query_nearest(point), [])
    assert_array_equal(tree.query_nearest([point]), [[], []])


@pytest.mark.parametrize(
    "geometry,expected",
    [(empty, []), ([empty], [[], []]), ([empty, point], [[1, 1], [2, 3]])],
)
def test_query_nearest_empty_geom(tree, geometry, expected):
    assert_array_equal(tree.query_nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.25, 0.25), [0]),
        (Point(0.75, 0.75), [1]),
        (Point(1, 1), [1]),
        (Point(0.5, 0.5), [0, 1]),
        ([Point(1, 1), Point(0, 0)], [[0, 1], [1, 0]]),
        ([Point(-10, -10), Point(100, 100)], [[0, 1], [0, 9]]),
        (box(0.5, 0.5, 0.75, 0.75), [1]),
        (box(0, 0, 3, 3), [0, 1, 2, 3]),
        (buffer(Point(2.5, 2.5), 1), [2, 3]),
        (buffer(Point(3, 3), 0.5), [3]),
        (MultiPoint([[5.5, 5], [7, 7]]), [7]),
        (MultiPoint([[5, 7], [7, 5]]), [6]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[0.5, 0.5], [3.5, 3.5]]), [0, 1, 3, 4]),
    ],
)
def test_query_nearest_points(tree, geometry, expected):
    assert_array_equal(tree.query_nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0.5, 0.5), [0]),
        (Point(2, 2), [1, 2]),
        (box(0, 0, 1, 1), [0, 1]),
        (box(0.5, 0.5, 1.5, 1.5), [0, 1]),
        ([box(0, 0, 0.5, 0.5), box(3, 3, 5, 5)], [[0, 1, 1, 1, 1], [0, 2, 3, 4, 5]]),
        (buffer(Point(2.5, 2.5), 1), [1, 2, 3]),
        (buffer(Point(3, 3), 0.5), [2, 3]),
        (MultiPoint([[5, 5], [7, 7]]), [4, 5, 6, 7]),
        (MultiPoint([[5.5, 5], [7, 7]]), [6, 7]),
        (MultiPoint([[5, 7], [7, 5]]), [5, 6]),
    ],
)
def test_query_nearest_lines(line_tree, geometry, expected):
    assert_array_equal(line_tree.query_nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,expected",
    [
        (Point(0, 0), [0]),
        (Point(2, 2), [2]),
        (Point(0.5, 0.5), [0, 1]),
        (box(0, 0, 1, 1), [0, 1]),
        (box(0.5, 0.5, 1.5, 1.5), [0, 1, 2]),
        ([box(0, 0, 1, 1), box(3, 3, 5, 5)], [[0, 0, 1, 1, 1], [0, 1, 3, 4, 5]]),
        (buffer(Point(2.5, 2.5), HALF_UNIT_DIAG), [2, 3]),
        (buffer(Point(3, 3), HALF_UNIT_DIAG), [2, 3, 4]),
        (MultiPoint([[5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[5.5, 5], [7, 7]]), [5, 7]),
        (MultiPoint([[5, 7], [7, 5]]), [6]),
    ],
)
def test_query_nearest_polygons(poly_tree, geometry, expected):
    assert_array_equal(poly_tree.query_nearest(geometry), expected)


@pytest.mark.parametrize(
    "geometry,max_distance,expected",
    [
        (Point(0.5, 0.5), None, [0, 1]),
        (Point(0.5, 0.5), 10, [0, 1]),
        (Point(0.5, 0.5), 0.1, []),
        ([Point(0.5, 0.5), Point(0, 0)], 0.1, [[1], [0]]),
    ],
)
def test_query_nearest_max_distance(tree, geometry, max_distance, expected):
    assert_array_equal(tree.query_nearest(geometry, max_distance=max_distance), expected)


@pytest.mark.parametrize("max_distance", [0, -1])
def test_query_nearest_invalid_max_distance(tree, max_distance):
    with pytest.raises(ValueError):
        tree.query_nearest(Point(0.5, 0.5), max_distance=max_distance)


@pytest.mark.parametrize(
    "geometry,expected_indices,expected_dist",
    [
        (Point(0, 0), [0], [0.0]),
        (Point(0.5, 0.5), [0, 1], [0.7071, 0.7071]),
        (box(0, 0, 1, 1), [0, 1], [0.0, 0.0]),
    ],
)
def test_query_nearest_return_distance(tree, geometry, expected_indices, expected_dist):
    idx, dist = tree.query_nearest(geometry, return_distance=True)
    assert_array_equal(idx, expected_indices)
    assert_array_equal(np.round(dist, 4), expected_dist)


@pytest.mark.parametrize(
    "geometry,exclusive,expected",
    [
        (Point(1, 1), False, [1]),
        (Point(1, 1), True, [0, 2]),
        ([Point(1, 1), Point(2, 2)], True, [[0, 0, 1, 1], [0, 2, 1, 3]]),
    ],
)
def test_query_nearest_exclusive(tree, geometry, exclusive, expected):
    assert_array_equal(tree.query_nearest(geometry, exclusive=exclusive), expected)


def test_query_nearest_exclusive_no_results():
    tree = STRtree([Point(1, 1)])
    assert_array_equal(tree.query_nearest(Point(1, 1), exclusive=True), [])


def test_query_nearest_all_matches(tree):
    assert_array_equal(tree.query_nearest(Point(0.5, 0.5), all_matches=True), [0, 1])
    idx = tree.query_nearest(Point(0.5, 0.5), all_matches=False)
    assert np.array_equal(idx, [0]) or np.array_equal(idx, [1])


# ----------------------------------------------------------------- round-2
# Validation + fast-path behaviors added for full reference-suite parity
# (reference test_strtree.py:150-170, 332, 1332-1345, 1644, 1821-1908).


class TestInputValidation:
    def test_query_non_geometry_scalar(self, tree):
        with pytest.raises(TypeError):
            tree.query("I am not a geometry")

    def test_query_non_geometry_element(self, tree):
        with pytest.raises(TypeError):
            tree.query([Point(0, 0), "still not a geometry"])

    def test_query_nested_array(self, tree):
        with pytest.raises(TypeError, match="one dimensional"):
            tree.query([[Point(0.5, 0.5)]])

    def test_query_invalid_predicate_message(self, tree):
        with pytest.raises(ValueError, match="is not a valid option"):
            tree.query(Point(1, 1), predicate="disjoint")

    def test_dwithin_distance_broadcast_error(self, tree):
        with pytest.raises(ValueError, match="Could not broadcast distance"):
            tree.query(Point(0, 0), predicate="dwithin", distance=[0, 1])
        with pytest.raises(ValueError, match="one dimensional"):
            tree.query(Point(0, 0), predicate="dwithin", distance=[[1.0]])

    def test_nearest_non_geometry(self, tree):
        with pytest.raises(TypeError):
            tree.nearest("I am not a geometry")

    def test_query_nearest_scalar_params(self, tree):
        with pytest.raises(ValueError, match="only accepts scalar"):
            tree.query_nearest(Point(0.5, 0.5), max_distance=[1])
        with pytest.raises(ValueError):
            tree.query_nearest(Point(1, 1), exclusive="invalid")
        with pytest.raises(ValueError):
            tree.query_nearest([Point(1, 1)], all_matches=[False])


class TestPointTreeFastPath:
    """The vectorized point-tree refinement must agree exactly with the
    generic per-candidate predicate loop."""

    @pytest.mark.parametrize(
        "predicate",
        ["intersects", "contains", "contains_properly", "covers", "touches"],
    )
    def test_fast_path_matches_loop(self, predicate):
        rng = np.random.default_rng(42)
        pts = [Point(x, y) for x, y in rng.uniform(-2, 2, size=(500, 2))]
        tree = STRtree(pts)
        tris = [Polygon(t) for t in rng.normal(size=(40, 3, 2))]
        # one query point exactly on a triangle vertex => boundary case
        v = tris[0].polygon_parts()[0][0][0]
        tree_b = STRtree(pts + [Point(v[0], v[1])])
        fast = tree_b.query(tris, predicate=predicate)
        # force generic path by masking the cached point coords
        saved = tree_b._pts_xy
        tree_b._pts_xy = None
        slow = tree_b.query(tris, predicate=predicate)
        tree_b._pts_xy = saved
        assert_array_equal(fast, slow)
        assert tree.query(tris, predicate=predicate).shape[0] == 2

    def test_invalid_polygon_falls_back(self):
        pts = [Point(x * 0.25, y * 0.25) for x in range(9) for y in range(9)]
        tree = STRtree(pts)
        bowtie = Polygon([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)])
        fast = tree.query([bowtie], predicate="contains")
        saved = tree._pts_xy
        tree._pts_xy = None
        slow = tree.query([bowtie], predicate="contains")
        tree._pts_xy = saved
        assert_array_equal(fast, slow)


def test_query_nan_geometry_geos313(tree):
    """NaN-coordinate query geometries: GEOS 3.13 observed results
    (reference test_strtree.py:383) — finite vertices still hit via
    intersects/crosses, every other predicate returns nothing."""
    from engine.geo.creation import linestrings

    with np.errstate(invalid="ignore"):
        line_nan = linestrings([1, 1], [1, float("nan")])
    assert_array_equal(tree.query(line_nan, predicate="intersects"), [1])
    assert_array_equal(tree.query(line_nan, predicate="crosses"), [1])
    for pred in ("within", "contains", "overlaps", "touches", "covers",
                 "covered_by", "contains_properly"):
        assert_array_equal(tree.query(line_nan, predicate=pred), [])


def test_bulk_nearest_matches_best_first_walk():
    """The vectorized bulk nearest (point queries vs boxlike tree) must
    agree with the per-query best-first walk, including on shared-edge
    ties (lowest-tree-index rule)."""
    import numpy as np

    from engine.geo.geom import Geom
    from engine.geo.strtree import STRtree

    rng = np.random.default_rng(5)
    boxes = [Geom.box(x, y, x + 0.5, y + 0.5)
             for x, y in rng.random((300, 2)) * 20]
    # duplicate a few boxes → exact ties must break to the lower index
    boxes += [Geom.box(3.0, 3.0, 4.0, 4.0), Geom.box(3.0, 3.0, 4.0, 4.0)]
    tree = STRtree(boxes)
    assert tree._boxlike
    pts = [Geom.point(x, y) for x, y in rng.random((500, 2)) * 20]
    pts += [Geom.point(3.5, 2.0), Geom.point(5.0, 3.5)]  # tie probes
    bulk = tree.nearest(pts)
    walk = np.array([tree.nearest(p) for p in pts])
    assert np.array_equal(bulk, walk)


def test_bulk_nearest_not_applied_to_general_polygons():
    """A tree holding a non-rectangle must not take the boxlike path
    (bbox distance underestimates true distance there)."""
    from engine.geo.geom import Geom
    from engine.geo.strtree import STRtree

    tri = Geom.polygon([[0, 0], [10, 0], [0, 10], [0, 0]])
    tree = STRtree([tri, Geom.box(20, 20, 21, 21)])
    assert not tree._boxlike
    # nearest from (9,9): bbox distance to tri is 0 but true distance >0;
    # the box at (20,20) is further — correct answer is still the tri
    assert tree.nearest(Geom.point(9.0, 9.0)) == 0
