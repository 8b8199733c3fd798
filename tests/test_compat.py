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


def test_ops_namespace_aliases():
    """shapely.ops / wkt / wkb / prepared / testing module surfaces
    (reference ops.py:95-670, prepared.py:8-74, testing.py, wkt.py,
    wkb.py) resolve to real engine implementations."""
    import engine.compat as shapely

    p = shapely.prep(shapely.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)]))
    assert p.contains(shapely.Point(5, 5))
    assert not p.contains(shapely.Point(15, 5))
    assert p.intersects(shapely.Point(10, 5))  # boundary intersects
    assert not p.contains_properly(shapely.Point(10, 5))

    assert shapely.ops.validate(shapely.Point(1, 1)) == "Valid Geometry"
    assert shapely.wkt.loads("POINT (1 2)").wkt == "POINT (1 2)"
    assert shapely.wkb.loads(shapely.wkb.dumps(shapely.Point(3, 4))).wkt == "POINT (3 4)"

    tris = shapely.triangulate(shapely.MultiPoint([(0, 0), (1, 0), (0, 1), (1, 1)]))
    assert len(tris) == 2 and all(shapely.get_type_id(t) == 3 for t in tris)

    lm = shapely.linemerge([[(0, 0), (1, 1)], [(1, 1), (2, 2)]])
    assert lm.wkt == "LINESTRING (0 0, 1 1, 2 2)"

    # orient: sign>=0 -> CCW exterior (reference ops.py:664)
    from engine.geo.predicates import is_ccw
    from engine.geo.coordinates import get_exterior_ring
    out = shapely.orient(shapely.Polygon([(0, 0), (0, 1), (1, 1)]))
    assert bool(is_ccw(get_exterior_ring(out)))
    out_cw = shapely.orient(shapely.Polygon([(0, 0), (0, 1), (1, 1)]), sign=-1.0)
    assert not bool(is_ccw(get_exterior_ring(out_cw)))

    vd = shapely.voronoi_diagram(shapely.MultiPoint([(0, 0), (2, 0), (1, 2)]))
    assert shapely.get_type_id(vd) == 7

    shapely.testing.assert_geometries_equal(shapely.Point(1, 2), shapely.Point(1, 2))
    import pytest
    with pytest.raises(AssertionError):
        shapely.testing.assert_geometries_equal(
            shapely.Point(1, 2), shapely.Point(1, 3))
    # equal_nan + None handling
    shapely.testing.assert_geometries_equal(
        [shapely.Point(float("nan"), 2), None],
        [shapely.Point(float("nan"), 2), None])
    # Geometry is the non-callable base type (reference pygeom.c): every
    # engine geometry is an instance, direct construction raises
    assert isinstance(shapely.Point(0, 0), shapely.Geometry)
    with pytest.raises(TypeError):
        shapely.Geometry("POINT (1 1)")
    assert issubclass(shapely.GEOSException, Exception)


def test_shape_mapping_geo_interface():
    """shapely.geometry.shape / mapping / __geo_interface__
    (reference geometry/geo.py:54,121)."""
    import engine.compat as shapely

    g = shapely.shape({"type": "Point", "coordinates": [0, 1]})
    assert g.wkt == "POINT (0 1)"
    assert shapely.mapping(g) == {"type": "Point", "coordinates": (0.0, 1.0)}
    # round-trip via __geo_interface__ (shape() of a geometry)
    assert shapely.equals_exact(shapely.shape(g), g)
    p = shapely.shape(
        {"type": "Polygon",
         "coordinates": [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],
                         [(0.5, 0.5), (1, 0.5), (1, 1), (0.5, 0.5)]]})
    m = shapely.mapping(p)
    assert m["type"] == "Polygon" and len(m["coordinates"]) == 2
    f = shapely.shape({"type": "Feature", "properties": {},
                       "geometry": {"type": "Point", "coordinates": [2, 3]}})
    assert f.wkt == "POINT (2 3)"
    lr = shapely.shape({"type": "LinearRing",
                        "coordinates": [(0, 0), (1, 0), (1, 1), (0, 0)]})
    assert shapely.get_type_id(lr) == 2
    assert bool(shapely.is_empty(
        shapely.shape({"type": "MultiPolygon", "coordinates": []})))
    gc = shapely.shape({"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1, 1]},
        {"type": "LineString", "coordinates": [(0, 0), (1, 1)]}]})
    assert shapely.get_num_geometries(gc) == 2


def test_oo_property_surface():
    """Reference geometry/base.py property surface: .geom_type, .x/.y/.z,
    .exterior/.interiors, .geoms, .wkb, .convex_hull/.envelope/.boundary,
    .interpolate/.project/.representative_point."""
    import engine.compat as shapely

    g = shapely.Polygon([(0, 0), (2, 0), (2, 2), (0, 2)],
                        holes=[[(0.5, 0.5), (1, 0.5), (1, 1), (0.5, 1)]])
    assert g.geom_type == "Polygon"
    assert g.exterior.geom_type == "LinearRing"
    assert len(g.interiors) == 1
    pt = shapely.Point(1, 2)
    assert (pt.x, pt.y) == (1.0, 2.0)
    assert shapely.Point(1, 2, 3).z == 3.0
    mp = shapely.MultiPoint([(0, 0), (1, 1)])
    assert [p.wkt for p in mp.geoms] == ["POINT (0 0)", "POINT (1 1)"]
    assert g.is_valid
    assert shapely.from_wkb(g.wkb).wkt == g.wkt
    assert shapely.from_wkb(bytes.fromhex(g.wkb_hex)).wkt == g.wkt
    assert g.convex_hull.geom_type == "Polygon"
    assert g.envelope.geom_type == "Polygon"
    ls = shapely.LineString([(0, 0), (10, 0)])
    assert ls.interpolate(5).wkt == "POINT (5 0)"
    assert ls.interpolate(0.5, normalized=True).wkt == "POINT (5 0)"
    assert ls.project(shapely.Point(3, 4)) == 3.0
    assert g.representative_point().geom_type == "Point"
    assert shapely.contains(g, g.representative_point())
    assert ls.is_simple and not ls.is_closed
    import pytest
    with pytest.raises(ValueError):
        shapely.LineString([(0, 0), (1, 1)]).x


def test_errors_and_geometry_namespaces():
    """shapely.errors / shapely.geometry namespace surfaces."""
    import engine.compat as shapely

    assert issubclass(shapely.errors.GeometryTypeError, shapely.GEOSException)
    assert issubclass(shapely.errors.TopologicalError, shapely.errors.ShapelyError)
    assert issubclass(shapely.ShapelyDeprecationWarning, FutureWarning)
    assert shapely.geometry.Point(1, 2).wkt == "POINT (1 2)"
    assert shapely.geometry.box(0, 0, 1, 1).geom_type == "Polygon"
    assert shapely.geometry.shape({"type": "Point", "coordinates": [5, 6]}).x == 5.0
    assert shapely.CAP_STYLE.flat == 2 and shapely.JOIN_STYLE.bevel == 3


def test_speedups_and_signal_checks():
    """Deprecated shapely.speedups toggles (reference speedups.py) and
    top-level setup_signal_checks (reference __init__.py:7,36)."""
    import warnings

    import engine.compat as shapely

    assert shapely.speedups.available is True
    assert shapely.speedups.enabled is True
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        shapely.speedups.enable()
        shapely.speedups.disable()
    assert len(caught) == 2
    assert all(issubclass(w.category, FutureWarning) for w in caught)
    assert shapely.setup_signal_checks(interval=5000) is None


def test_vectorized_and_algorithms_namespaces():
    """Legacy shapely.vectorized / shapely.algorithms surfaces."""
    import numpy as np

    import engine.compat as shapely

    g = shapely.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    x = np.array([1.0, 15.0, 5.0])
    y = np.array([1.0, 5.0, 5.0])
    assert shapely.vectorized.contains(g, x, y).tolist() == [True, False, True]
    assert shapely.vectorized.touches(
        g, np.array([0.0, 5.0]), np.array([5.0, 5.0])).tolist() == [True, False]
    ccw = shapely.LinearRing([(0, 0), (1, 0), (1, 1), (0, 1)])
    cw = shapely.LinearRing([(0, 0), (0, 1), (1, 1), (1, 0)])
    assert shapely.algorithms.cga.signed_area(ccw) == 1.0
    assert shapely.algorithms.cga.signed_area(cw) == -1.0
    pl = shapely.algorithms.polylabel.polylabel(g, 0.1)
    assert 4 < pl.x < 6 and 4 < pl.y < 6


def test_submodule_namespace_surfaces():
    """Reference shapely.<mod> import surfaces all resolve (switch-over
    claim: every `from shapely.X import Y` in user code has a target)."""
    import engine.compat as sh

    assert sh.strtree.STRtree is sh.STRtree
    assert isinstance(sh.Point(0, 0), sh.geometry.base.BaseGeometry)
    assert sh.measurement.area(sh.Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])) == 4.0
    assert sh.coords.CoordinateSequence is type(sh.LineString([(0, 0), (1, 1)]).coords)
    assert sh.io.from_wkt("POINT (1 2)").x == 1.0
    assert sh.linear.line_merge is sh.line_merge
    # shapely.validation.make_valid is the wrapper with the is_valid
    # identity shortcut (validation.py:30), NOT the top-level kernel
    pt = sh.Point(1, 2)
    assert sh.validation.make_valid(pt) is pt
    assert sh.make_valid(pt) is not pt
    assert sh.affinity.rotate is sh.rotate
    assert sh.geos.geos_version == sh.geos_version

    @sh.decorators.requires_geos("3.10.0")
    def gated():
        return 42

    assert gated() == 42


def test_collection_operator_surface():
    """shapely.ops.operator adapter (reference ops.py:44-130)."""
    import engine.compat as sh

    op = sh.ops.operator
    polys = op.polygonize(
        [[(0, 0), (1, 0), (1, 1)], [(1, 1), (0, 1), (0, 0)], [(0, 0), (1, 1)]]
    )
    assert len(polys) == 2 and all(p.geom_type == "Polygon" for p in polys)
    assert abs(sum(p.area for p in polys) - 1.0) < 1e-12
    merged = op.linemerge([[(0, 0), (1, 1)], [(1, 1), (2, 2)]])
    assert merged.geom_type == "LineString" and len(merged.coords) == 3
    u = op.unary_union([sh.Point(0, 0).buffer(1), sh.Point(0.5, 0).buffer(1)])
    assert u.area > 3.2
    assert op.shapeup({"type": "Point", "coordinates": [1, 2]}).x == 1.0


def test_svg_surface():
    """geom.svg()/_repr_svg_ element strings (reference base.py:284,
    point.py:123, linestring.py:86, polygon.py:281, legacy/test_svg.py)."""
    import engine.compat as sh

    assert sh.Point().svg() == "<g />"
    assert sh.Point(6, 7).svg() == (
        '<circle cx="6.0" cy="7.0" r="3.0" stroke="#555555" '
        'stroke-width="1.0" fill="#66cc99" opacity="0.6" />'
    )
    assert sh.LineString([(0, 0), (0, 0)]).svg() == (
        '<polyline fill="none" stroke="#ff3333" stroke-width="2.0" '
        'points="0.0,0.0 0.0,0.0" opacity="0.8" />'
    )
    g = sh.Polygon([(35, 10), (45, 45), (15, 40), (10, 20), (35, 10)],
                   [[(20, 30), (35, 35), (30, 20), (20, 30)]])
    assert g.svg(5).startswith(
        '<path fill-rule="evenodd" fill="#66cc99" stroke="#555555" '
        'stroke-width="10.0" opacity="0.6" d="M 35.0,10.0 L ')
    doc = sh.Point(6, 7)._repr_svg_()
    assert doc.startswith('<svg xmlns="http://www.w3.org/2000/svg"')
    assert 'viewBox="5.0 6.0 2.0 2.0"' in doc


def test_degenerate_line_validity_and_union():
    """GEOS parity: zero-length lines are invalid; union keeps them as
    collection members, ascending-dimension order (legacy/test_svg.py)."""
    import engine.compat as sh

    assert not sh.LineString([(0, 0), (0, 0)]).is_valid
    assert not sh.MultiLineString([[(2, 3), (2, 3)], [(2, 8), (9, 1)]]).is_valid
    assert sh.LineString([(0, 0), (1, 1)]).is_valid
    u = sh.Point(7, 3).union(sh.LineString([(4, 2), (4, 2)]))
    assert sh.to_wkt(u) == "GEOMETRYCOLLECTION (POINT (7 3), LINESTRING (4 2, 4 2))"
    assert not u.is_valid
