"""Conformance port of shapely/tests/test_linear.py (expected values and
error semantics verbatim; fixtures from tests/common.py:13-41)."""
import numpy as np
import pytest

from engine.geo import linear
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt
from engine.geo.linework import shared_paths

P = from_wkt
line_string = P("LINESTRING (0 0, 1 0, 1 1)")
linear_ring = P("LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)")
polygon = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
point = P("POINT (2 3)")
multi_line_string = P("MULTILINESTRING ((0 0, 1 2))")
empty_point = P("POINT EMPTY")
empty_line_string = P("LINESTRING EMPTY")


def test_line_interpolate_point_geom_array():
    # test_linear.py:21-27
    actual = linear.line_interpolate_point(
        [line_string, linear_ring, multi_line_string], -1
    )
    assert to_wkt(actual[0]) == "POINT (1 0)"
    assert to_wkt(actual[1]) == "POINT (0 1)"
    c = actual[2].xys[0]
    assert c[0] == pytest.approx(0.5528, abs=1e-3)
    assert c[1] == pytest.approx(1.1056, abs=1e-3)


def test_line_interpolate_point_normalized():
    # test_linear.py:29-36
    actual = linear.line_interpolate_point(
        [line_string, linear_ring, multi_line_string], 1, normalized=True
    )
    assert to_wkt(actual[0]) == "POINT (1 1)"
    assert to_wkt(actual[1]) == "POINT (0 0)"
    assert to_wkt(actual[2]) == "POINT (1 2)"


def test_line_interpolate_point_float_array():
    # test_linear.py:39-43
    actual = linear.line_interpolate_point(line_string, [0.2, 1.5, -0.2])
    assert to_wkt(actual[0]) == "POINT (0.2 0)"
    assert to_wkt(actual[1]) == "POINT (1 0.5)"
    assert to_wkt(actual[2]) == "POINT (1 0.8)"


@pytest.mark.parametrize("normalized", [False, True])
@pytest.mark.parametrize(
    "wkt",
    [
        "LINESTRING EMPTY",
        "MULTILINESTRING EMPTY",
        "MULTILINESTRING (EMPTY, (0 0, 1 1))",
        "GEOMETRYCOLLECTION EMPTY",
    ],
)
def test_line_interpolate_point_empty(wkt, normalized):
    g = P(wkt)
    out = linear.line_interpolate_point(g, 0.2, normalized=normalized)
    # GEOS: ANY empty member makes the interpolation empty
    # (reference test_linear.py:46-61)
    assert out.is_empty


def test_line_interpolate_gc_with_empty_line():
    gc = Geom(GeomType.GEOMETRYCOLLECTION,
              parts=[P("LINESTRING EMPTY"), P("POINT (1 1)")])
    assert linear.line_interpolate_point(gc, 0.2).is_empty


@pytest.mark.parametrize("normalized", [False, True])
@pytest.mark.parametrize("wkt", ["POINT EMPTY", "POINT (2 3)",
                                 "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"])
def test_line_interpolate_point_invalid_type(wkt, normalized):
    with pytest.raises(TypeError):
        linear.line_interpolate_point(P(wkt), 0.2, normalized=normalized)


def test_line_interpolate_point_none_and_nan():
    # test_linear.py:85-90
    assert linear.line_interpolate_point(None, 0.2) is None
    assert linear.line_interpolate_point(line_string, np.nan) is None


def test_line_locate_point_geom_array():
    # test_linear.py:102-106
    pt = P("POINT (0 1)")
    actual = linear.line_locate_point([line_string, linear_ring], [pt, pt])
    np.testing.assert_allclose(actual, [0.0, 3.0])


def test_line_locate_point_empty_and_errors():
    assert np.isnan(linear.line_locate_point(line_string, empty_point))
    assert np.isnan(linear.line_locate_point(empty_line_string, point))
    with pytest.raises(Exception):
        linear.line_locate_point(line_string, line_string)
    with pytest.raises(Exception):
        linear.line_locate_point(polygon, point)


def test_line_merge_reference_cases():
    # test_linear.py:145-160
    m = linear.line_merge(multi_line_string)
    assert to_wkt(m) == "LINESTRING (0 0, 1 2)"
    lines = P("MULTILINESTRING ((0 0, 1 0), (0 0, 3 0))")
    res = linear.line_merge(lines)
    assert to_wkt(res) == "LINESTRING (1 0, 0 0, 3 0)"
    res_dir = linear.line_merge(lines, directed=True)
    assert res_dir.type_id == GeomType.MULTILINESTRING and len(res_dir.parts) == 2


def test_shared_paths_reference():
    # test_linear.py:170-189
    g1 = P("LINESTRING (0 0, 1 0, 1 1)")
    g2 = P("LINESTRING (0 0, 1 0)")
    actual = shared_paths(g1, g2)
    fwd = actual.parts[0]
    assert len(fwd.parts) == 1 and to_wkt(fwd.parts[0]) == "LINESTRING (0 0, 1 0)"
    assert shared_paths(g1, None) is None and shared_paths(None, None) is None
    with pytest.raises(Exception):
        shared_paths(g1, P("POINT (0 1)"))


def test_shortest_line_reference():
    # test_linear.py:203-212
    g1 = P("LINESTRING (0 0, 1 0, 1 1)")
    g2 = P("LINESTRING (0 3, 3 0)")
    actual = linear.shortest_line(g1, g2)
    assert to_wkt(actual) == "LINESTRING (1 1, 1.5 1.5)"
    assert linear.shortest_line(g1, None) is None
    assert linear.shortest_line(g1, empty_line_string) is None
    assert linear.shortest_line(empty_line_string, empty_line_string) is None
