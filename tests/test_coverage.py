"""coverage_is_valid / coverage_invalid_edges / coverage_simplify +
has_z/has_m/srid metadata."""
import numpy as np

from engine.geo import coverage, measure
from engine.geo.geom import from_wkt

P = from_wkt


def test_valid_tile_coverage():
    tiles = [P(f"POLYGON (({x} 0, {x+1} 0, {x+1} 1, {x} 1, {x} 0))") for x in range(4)]
    assert coverage.coverage_is_valid(tiles)
    edges = coverage.coverage_invalid_edges(tiles)
    # reference semantics: clean entries are LINESTRING EMPTY
    assert all(e.is_empty for e in edges)


def test_overlapping_coverage_invalid():
    a = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = P("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert not coverage.coverage_is_valid([a, b])
    edges = coverage.coverage_invalid_edges([a, b])
    assert edges[0] is not None and edges[1] is not None


def test_touching_is_valid():
    a = P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    b = P("POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))")
    assert coverage.coverage_is_valid([a, b])


def test_coverage_simplify_pins_shared_vertices():
    # two polygons sharing the wiggly edge x=1 with a junction vertex
    a = P("POLYGON ((0 0, 1 0, 1.05 0.5, 1 1, 0 1, 0 0))")
    b = P("POLYGON ((1 0, 2 0, 2 1, 1 1, 1.05 0.5, 1 0))")
    out = coverage.coverage_simplify([a, b], tolerance=0.2)
    # total area preserved exactly when both sides simplify identically
    assert (measure.area(out[0]) + measure.area(out[1])) == 2.0


def test_has_z_m_srid():
    g = P("POINT (1 2)")
    # ufunc parity: scalars come back as numpy bools (reference behavior)
    assert not coverage.has_z(g) and not coverage.has_m(g)
    assert coverage.get_srid(g) == 0
    g2 = coverage.set_srid(g, 4326)
    assert coverage.get_srid(g2) == 4326
    assert coverage.get_srid(None) == -1
    arr = coverage.has_z([g, None])
    assert not arr.any()
