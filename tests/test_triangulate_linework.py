"""Delaunay / Voronoi / concave hull / node / polygonize / build_area /
snap / shared_paths / minimum_clearance_line / minimum_width — expected
behaviors from the reference docstrings (constructive.py, linear.py)."""

from __future__ import annotations

import numpy as np
import pytest

from engine.geo import linework, measure, predicates as pred, triangulate
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt

P = from_wkt


def test_delaunay_square():
    g = P("MULTIPOINT ((0 0), (1 0), (1 1), (0 1))")
    tris = triangulate.delaunay_triangles(g)
    assert tris.type_id == GeomType.GEOMETRYCOLLECTION
    assert len(tris.parts) == 2
    assert sum(measure.area(p) for p in tris.parts) == pytest.approx(1.0)
    edges = triangulate.delaunay_triangles(g, only_edges=True)
    assert edges.type_id == GeomType.MULTILINESTRING
    assert len(edges.parts) == 5  # 4 sides + 1 diagonal


def test_delaunay_empty_condition():
    assert triangulate.delaunay_triangles(P("MULTIPOINT ((0 0), (1 1))")).is_empty


def test_delaunay_circumcircle_property():
    rng = np.random.default_rng(2)
    pts = rng.random((25, 2)) * 10
    g = Geom(GeomType.MULTIPOINT, parts=[Geom.point(x, y) for x, y in pts])
    tris = triangulate.delaunay_triangles(g)
    # no input point strictly inside any triangle's circumcircle
    for t in tris.parts:
        r = t.rings[0]
        (ax, ay), (bx, by), (cx, cy) = r[0], r[1], r[2]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        assert (d2 >= r2 * (1 - 1e-9)).all()


def test_voronoi_partition():
    g = P("MULTIPOINT ((2 2), (4 2), (3 4))")
    cells = triangulate.voronoi_polygons(g)
    assert len(cells.parts) == 3
    # each input point inside its own cell; cells tile (disjoint interiors)
    pts = [(2, 2), (4, 2), (3, 4)]
    owners = []
    for x, y in pts:
        inside = [i for i, c in enumerate(cells.parts) if pred.contains(c, Geom.point(x, y))]
        assert len(inside) == 1
        owners.append(inside[0])
    assert len(set(owners)) == 3
    # every cell boundary point is equidistant-or-closer to its site
    for i, c in enumerate(cells.parts):
        cx, cy = pts[owners.index(i)] if False else pts[[o for o in range(3) if owners[o] == i][0]]
        r = c.rings[0]
        for vx, vy in r[:-1]:
            d_own = (vx - cx) ** 2 + (vy - cy) ** 2
            for ox, oy in pts:
                assert d_own <= (vx - ox) ** 2 + (vy - oy) ** 2 + 1e-6


def test_concave_hull_contains_points_and_shrinks():
    rng = np.random.default_rng(4)
    pts = np.vstack([rng.random((30, 2)) * np.array([10, 2]),
                     rng.random((30, 2)) * np.array([2, 10])])  # L shape
    g = Geom(GeomType.MULTIPOINT, parts=[Geom.point(x, y) for x, y in pts])
    from engine.geo.constructive import convex_hull

    ch = convex_hull(g)
    cc = triangulate.concave_hull(g, ratio=0.3)
    assert cc.type_id == GeomType.POLYGON
    assert measure.area(cc) <= measure.area(ch) + 1e-9
    for x, y in pts:
        assert pred.covers(cc, Geom.point(x, y))


def test_node_splits_at_crossing():
    g = P("MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))")
    noded = linework.node(g)
    assert noded.type_id == GeomType.MULTILINESTRING
    assert len(noded.parts) == 4  # X split into 4 half-diagonals


def test_polygonize_square_and_dangle():
    # constructive.py polygonize docstring pattern
    lines = [
        P("LINESTRING (0 0, 1 1)"),
        P("LINESTRING (0 0, 0 1)"),
        P("LINESTRING (0 1, 1 1)"),
    ]
    coll = linework.polygonize(lines)
    assert len(coll.parts) == 1
    assert measure.area(coll.parts[0]) == pytest.approx(0.5)
    polys, cuts, dangles, invalid = linework.polygonize_full(
        lines + [P("LINESTRING (5 5, 6 6)")]
    )
    assert len(polys.parts) == 1
    assert len(dangles.parts) == 1
    assert invalid.is_empty


def test_polygonize_nested_hole():
    outer = P("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    inner = P("LINESTRING (2 2, 4 2, 4 4, 2 4, 2 2)")
    area = linework.build_area([outer, inner])
    # build_area nests the inner ring as a hole (constructive.py:654)
    assert measure.area(area) == pytest.approx(100 - 4)


def test_snap():
    g = P("LINESTRING (0.1 0.1, 5 5)")
    ref = P("POINT (0 0)")
    s = linework.snap(g, ref, 0.5)
    assert to_wkt(s) == "LINESTRING (0 0, 5 5)"
    far = linework.snap(g, ref, 0.05)
    assert to_wkt(far) == to_wkt(g)


def test_shared_paths():
    a = P("LINESTRING (0 0, 10 0)")
    b = P("LINESTRING (2 0, 6 0)")
    res = linework.shared_paths(a, b)
    fwd, bwd = res.parts
    assert len(fwd.parts) == 1 and bwd.is_empty
    assert to_wkt(fwd.parts[0]) == "LINESTRING (2 0, 6 0)"
    rev = linework.shared_paths(a, P("LINESTRING (6 0, 2 0)"))
    assert rev.parts[0].is_empty and len(rev.parts[1].parts) == 1


def test_minimum_clearance_line_and_width():
    g = P("POLYGON ((0 0, 0 10, 5 6, 10 10, 10 0, 5 4, 0 0))")
    line = linework.minimum_clearance_line(g)
    assert measure.length(line) == pytest.approx(2.0)
    w = linework.minimum_width(P("POLYGON ((0 0, 10 0, 10 3, 0 3, 0 0))"))
    assert measure.length(w) == pytest.approx(3.0)


def test_constrained_delaunay():
    # convex: must cover the polygon exactly
    sq = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    tris = triangulate.constrained_delaunay_triangles(sq)
    assert sum(measure.area(t) for t in tris.parts) == pytest.approx(16.0)
    # concave: boundary respected (no triangle area outside the polygon)
    conc = P("POLYGON ((0 0, 6 0, 6 6, 3 2, 0 6, 0 0))")
    tris2 = triangulate.constrained_delaunay_triangles(conc)
    assert sum(measure.area(t) for t in tris2.parts) == pytest.approx(measure.area(conc))
    for t in tris2.parts:
        cx, cy = t.rings[0][:3].mean(axis=0)
        assert pred.covers(conc, Geom.point(cx, cy))
    # non-areal input -> empty collection, None passthrough
    assert triangulate.constrained_delaunay_triangles(P("POINT (0 0)")).is_empty
    assert triangulate.constrained_delaunay_triangles(None) is None


def test_constrained_delaunay_with_holes():
    donut = P("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 3 7, 7 7, 7 3, 3 3))")
    tris = triangulate.constrained_delaunay_triangles(donut)
    assert sum(measure.area(t) for t in tris.parts) == pytest.approx(84.0)
    for t in tris.parts:
        cx, cy = t.rings[0][:3].mean(axis=0)
        assert pred.covers(donut, Geom.point(cx, cy))
    two = P("POLYGON ((0 0, 20 0, 20 10, 0 10, 0 0), "
            "(2 2, 2 4, 4 4, 4 2, 2 2), (12 5, 12 8, 15 8, 15 5, 12 5))")
    t2 = triangulate.constrained_delaunay_triangles(two)
    assert sum(measure.area(t) for t in t2.parts) == pytest.approx(measure.area(two))


def test_fast_bowyer_watson_matches_naive():
    """The adjacency-tracked incremental Delaunay must produce the same
    triangle set as the scan-all naive build (random + cocircular grid)."""
    import numpy as np

    from engine.geo.triangulate import _bowyer_watson_fast, _bowyer_watson_naive

    rng = np.random.default_rng(17)
    for n in (64, 257, 900):
        pts = rng.random((n, 2)) * 50
        a = {tuple(sorted(t)) for t in _bowyer_watson_naive(pts)}
        b = {tuple(sorted(t)) for t in _bowyer_watson_fast(pts)}
        assert a == b, n
    gx, gy = np.meshgrid(np.arange(9), np.arange(9))
    grid = np.column_stack([gx.ravel(), gy.ravel()]).astype(float)
    # cocircular quads: diagonal choice may differ — compare counts and
    # total area (both are valid Delaunay triangulations)
    na = _bowyer_watson_naive(grid)
    nb = _bowyer_watson_fast(grid)
    assert len(na) == len(nb) == 2 * 8 * 8


def test_voronoi_dual_matches_all_pairs_clipping():
    """Neighbor-restricted bisector clipping (Delaunay dual) must equal
    the all-pairs construction cell by cell."""
    import numpy as np

    from engine.geo import core
    from engine.geo.geom import Geom, GeomType
    from engine.geo.triangulate import _clip_halfplane, voronoi_polygons

    rng = np.random.default_rng(23)
    pts = rng.random((120, 2)) * 10
    mp = Geom(GeomType.MULTIPOINT,
              parts=[Geom.point(x, y) for x, y in pts])
    got = voronoi_polygons(mp)
    upts = np.unique(pts, axis=0)
    sb = np.array([upts[:, 0].min(), upts[:, 1].min(),
                   upts[:, 0].max(), upts[:, 1].max()])
    pad = max(sb[2] - sb[0], sb[3] - sb[1])
    xmin, ymin, xmax, ymax = sb[0] - pad, sb[1] - pad, sb[2] + pad, sb[3] + pad
    pad2 = max(xmax - xmin, ymax - ymin)
    box = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                    [xmin, ymax], [xmin, ymin]])
    want = []
    for i, p in enumerate(upts):
        ring = box
        for j, q in enumerate(upts):
            if i == j:
                continue
            mid = (p + q) / 2
            nvec = q - p
            tvec = np.array([-nvec[1], nvec[0]])
            tlen = np.hypot(*tvec)
            s = 2.0 ** int(np.ceil(np.log2((4 * pad2 + tlen) / tlen)))
            tvec = tvec * s
            a_, b_ = mid - tvec, mid + tvec
            if core.orient(a_[0], a_[1], b_[0], b_[1], p[0], p[1]) < 0:
                a_, b_ = b_, a_
            ring = _clip_halfplane(ring, a_, b_)
        want.append(ring)
    assert len(got.parts) == len(want)
    for cell, ring in zip(got.parts, want):
        a = {(round(x, 9), round(y, 9)) for x, y in cell.rings[0]}
        b = {(round(x, 9), round(y, 9)) for x, y in ring}
        assert a == b


def test_voronoi_10k_under_budget():
    """The reference asv voronoi shape scaled to 10k points must finish
    in seconds (Delaunay-dual path), not the all-pairs O(n^2)."""
    import time

    import numpy as np

    from engine.geo.geom import Geom, GeomType
    from engine.geo.triangulate import voronoi_polygons

    rng = np.random.default_rng(3)
    mp = Geom(GeomType.MULTIPOINT,
              parts=[Geom.point(x, y) for x, y in rng.random((10_000, 2)) * 100])
    t0 = time.perf_counter()
    v = voronoi_polygons(mp)
    assert time.perf_counter() - t0 < 10.0  # CI headroom; typical ~2s
    assert len(v.parts) == 10_000
