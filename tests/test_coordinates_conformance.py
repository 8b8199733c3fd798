"""Conformance port of shapely/tests/test_coordinates.py (expected
values verbatim; fixtures from tests/common.py)."""
import numpy as np
import pytest
from numpy.testing import assert_equal

from engine.geo.coordinates import (
    count_coordinates, get_coordinates, set_coordinates, transform,
)
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt

P = from_wkt
point = P("POINT (2 3)")
line_string = P("LINESTRING (0 0, 1 0, 1 1)")
linear_ring = P("LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)")
polygon = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
polygon_with_hole = P(
    "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
)
multi_point = P("MULTIPOINT ((0 0), (1 2))")
multi_line_string = P("MULTILINESTRING ((0 0, 1 2))")
multi_polygon = P(
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((2.1 2.1, 2.2 2.1, 2.2 2.2, 2.1 2.2, 2.1 2.1)))"
)
geometry_collection = P("GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))")
empty = P("GEOMETRYCOLLECTION EMPTY")
nested_2 = Geom(GeomType.GEOMETRYCOLLECTION, parts=[geometry_collection, point])
nested_3 = Geom(GeomType.GEOMETRYCOLLECTION, parts=[nested_2, point])


@pytest.mark.parametrize(
    "geoms,count",
    [
        ([], 0), ([empty], 0), ([point, empty], 1), ([empty, point, empty], 1),
        ([point, None], 1), ([None, point, None], 1), ([point, point], 2),
        ([line_string, linear_ring], 8), ([polygon], 5),
        ([polygon_with_hole], 10), ([multi_point, multi_line_string], 4),
        ([multi_polygon], 10), ([geometry_collection], 3),
        ([nested_2], 4), ([nested_3], 5),
    ],
)
def test_count_coords(geoms, count):
    # test_coordinates.py:46-68 verbatim
    assert count_coordinates(np.array(geoms, np.object_)) == count


@pytest.mark.parametrize(
    "geoms,x,y",
    [
        ([], [], []),
        ([empty], [], []),
        ([point, empty], [2], [3]),
        ([point, point], [2, 2], [3, 3]),
        ([line_string], [0, 1, 1], [0, 0, 1]),
        ([geometry_collection], [51, 52, 49], [-1, -1, 2]),
    ],
)
def test_get_coords(geoms, x, y):
    # test_coordinates.py:72+ pattern
    c = get_coordinates(geoms)
    assert_equal(c, np.array([x, y], np.float64).T)


def test_get_coords_index():
    c, idx = get_coordinates([line_string, point], return_index=True)
    assert list(idx) == [0, 0, 0, 1]


def test_set_coords_roundtrip():
    for g in (point, line_string, polygon_with_hole, multi_polygon, nested_3):
        c = get_coordinates(g)
        back = set_coordinates(g, c.copy())
        assert to_wkt(back) == to_wkt(g)


def test_transform_translate():
    # test_coordinates.py transform pattern: +1 on every coordinate
    out = transform(polygon_with_hole, lambda c: c + 1)
    assert count_coordinates(out) == 10
    assert get_coordinates(out)[0].tolist() == [1.0, 1.0]
