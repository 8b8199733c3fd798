"""Conformance port of shapely/tests/test_measurement.py (expected
values verbatim; fixtures from tests/common.py:8-32)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from engine.geo import measure
from engine.geo.geom import Geom, GeomType, from_wkt

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


@pytest.mark.parametrize(
    "geom", [point, line_string, linear_ring, multi_point, multi_line_string,
             geometry_collection],
)
def test_area_non_polygon(geom):
    # test_measurement.py:23-35
    assert measure.area(geom) == 0.0


def test_area():
    # test_measurement.py:37-39
    actual = measure.area([polygon, polygon_with_hole, multi_polygon])
    assert actual.tolist() == [4.0, 96.0, pytest.approx(1.01)]


def test_distance_testdata():
    # test_measurement.py:42-46 (points 0..5 diagonal vs box(2,2,4,4))
    pts = [Geom.point(i, i) for i in range(6)]
    box = Geom.box(2, 2, 4, 4)
    actual = measure.distance(pts, box)
    assert_allclose(actual, [2 * 2**0.5, 2**0.5, 0, 0, 0, 2**0.5])


def test_distance_missing_and_empty():
    assert np.isnan(measure.distance(point, None))
    assert np.isnan(measure.distance(point, empty))


@pytest.mark.parametrize(
    "geom,expected",
    [
        (point, [2, 3, 2, 3]),
        (P("LINESTRING (0 0, 0 1)"), [0, 0, 0, 1]),
        (P("LINESTRING (0 0, 1 0)"), [0, 0, 1, 0]),
        (multi_point, [0, 0, 1, 2]),
        (multi_polygon, [0, 0, 2.2, 2.2]),
        (geometry_collection, [49, -1, 52, 2]),
        (empty, [np.nan] * 4),
        (None, [np.nan] * 4),
    ],
)
def test_bounds(geom, expected):
    # test_measurement.py:64-80
    assert_array_equal(measure.bounds(geom), expected)


@pytest.mark.parametrize(
    "geoms,expected",
    [
        ([empty, empty, None], [np.nan] * 4),
        ([point, None], [2, 3, 2, 3]),
        ([point, empty], [2, 3, 2, 3]),
        ([point, empty, None, multi_point], [0, 0, 2, 3]),
    ],
)
def test_total_bounds(geoms, expected):
    # test_measurement.py:97-117
    assert_array_equal(measure.total_bounds(geoms), expected)


def test_length():
    # test_measurement.py:133-146
    actual = measure.length(
        [point, line_string, linear_ring, polygon, polygon_with_hole,
         multi_point, multi_polygon]
    )
    assert_allclose(actual, [0.0, 2.0, 4.0, 8.0, 48.0, 0.0, 4.4])
    assert np.isnan(measure.length(None))


def test_hausdorff_geos_example():
    # test_measurement.py:153-160 (GEOS docs example)
    a = P("LINESTRING (0 0, 100 0, 10 100, 10 100)")
    b = P("LINESTRING (0 100, 0 10, 80 10)")
    assert measure.hausdorff_distance(a, b) == pytest.approx(22.360679775, abs=1e-7)


def test_hausdorff_densify():
    # test_measurement.py:167-175
    a = P("LINESTRING (0 0, 100 0, 10 100, 10 100)")
    b = P("LINESTRING (0 100, 0 10, 80 10)")
    assert measure.hausdorff_distance(a, b, densify=0.001) == pytest.approx(47.8, abs=0.1)


def test_hausdorff_missing_empty():
    assert np.isnan(measure.hausdorff_distance(point, None))
    assert np.isnan(measure.hausdorff_distance(point, empty))


FRECHET_CASES = [
    ("LINESTRING (0 0, 100 0)", "LINESTRING (0 0, 100 0)", 0),
    ("LINESTRING (0 0, 50 200, 100 0, 150 200, 200 0)",
     "LINESTRING (0 200, 200 150, 0 100, 200 50, 0 0)", 200),
    ("LINESTRING (0 0, 50 200, 100 0, 150 200, 200 0)",
     "LINESTRING (200 0, 150 200, 100 0, 50 200, 0 0)", 200),
    ("LINESTRING (0 0, 50 200, 100 0, 150 200, 200 0)",
     "LINESTRING (0 0, 200 50, 0 100, 200 150, 0 200)", 282.842712474619),
    ("LINESTRING (0 0, 100 0)", "LINESTRING (0 0, 50 50, 100 0)", 70.7106781186548),
]


@pytest.mark.parametrize("wa,wb,expected", FRECHET_CASES)
def test_frechet_geos_examples(wa, wb, expected):
    # test_measurement.py:206-240 (GEOS docs/tests examples)
    assert measure.frechet_distance(P(wa), P(wb)) == pytest.approx(expected)
