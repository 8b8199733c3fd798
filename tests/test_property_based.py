"""Property-based tests (hypothesis): algebraic identities that must
hold for ANY input — complements the fixed conformance tables."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.geo import measure, predicates as pred, set_operations as so
from engine.geo.constructive import buffer, convex_hull
from engine.geo.geom import Geom, GeomType

# coordinates on a modest grid: exercises general positions AND exact
# shared-edge/vertex cases (the hard ones), while keeping areas exact
coord = st.integers(min_value=0, max_value=12).map(float)


@st.composite
def rects(draw):
    x0, x1 = sorted((draw(coord), draw(coord)))
    y0, y1 = sorted((draw(coord), draw(coord)))
    if x1 == x0:
        x1 = x0 + 1
    if y1 == y0:
        y1 = y0 + 1
    return (x0, y0, x1, y1)


def rect_geom(r):
    return Geom.box(*r)


def rect_inter_area(a, b):
    w = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    h = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    return w * h


@settings(max_examples=120, deadline=None)
@given(rects(), rects())
def test_overlay_area_identities_rects(ra, rb):
    a, b = rect_geom(ra), rect_geom(rb)
    area_a = (ra[2] - ra[0]) * (ra[3] - ra[1])
    area_b = (rb[2] - rb[0]) * (rb[3] - rb[1])
    ai = rect_inter_area(ra, rb)
    inter = so.intersection(a, b)
    un = so.union(a, b)
    da = so.difference(a, b)
    sym = so.symmetric_difference(a, b)
    assert measure.area(inter) == pytest.approx(ai, abs=1e-9)
    assert measure.area(un) == pytest.approx(area_a + area_b - ai, abs=1e-9)
    assert measure.area(da) == pytest.approx(area_a - ai, abs=1e-9)
    assert measure.area(sym) == pytest.approx(area_a + area_b - 2 * ai, abs=1e-9)


@st.composite
def convex_polys(draw):
    n = draw(st.integers(min_value=4, max_value=8))
    pts = np.array(
        [[draw(coord), draw(coord)] for _ in range(n)], dtype=np.float64
    )
    h = convex_hull(Geom(GeomType.MULTIPOINT,
                         parts=[Geom.point(x, y) for x, y in pts]))
    if h.type_id != GeomType.POLYGON:
        return rect_geom((0.0, 0.0, 1.0, 1.0))
    return h


@settings(max_examples=60, deadline=None)
@given(convex_polys(), convex_polys())
def test_overlay_inclusion_exclusion_convex(a, b):
    ai = measure.area(so.intersection(a, b))
    au = measure.area(so.union(a, b))
    assert au == pytest.approx(measure.area(a) + measure.area(b) - ai, abs=1e-6)
    # intersection is inside both
    inter = so.intersection(a, b)
    if not inter.is_empty and measure.area(inter) > 1e-9:
        assert ai <= min(measure.area(a), measure.area(b)) + 1e-9


@settings(max_examples=100, deadline=None)
@given(rects(), st.tuples(coord, coord))
def test_predicate_consistency_point_rect(r, pxy):
    g = rect_geom(r)
    p = Geom.point(*pxy)
    assert pred.intersects(g, p) == (not pred.disjoint(g, p))
    if pred.contains(g, p):
        assert pred.covers(g, p)
        assert pred.within(p, g)
    if pred.covers(g, p):
        assert pred.intersects(g, p)
    assert pred.contains_xy(g, pxy[0], pxy[1]) == pred.contains(g, p)
    # relate string consistent with intersects
    m = pred.relate(g, p)
    assert (m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F") == pred.intersects(g, p)


@settings(max_examples=40, deadline=None)
@given(convex_polys())
def test_buffer_covers_input(g):
    b = buffer(g, 0.5, quad_segs=4)
    assert pred.covers(b, g)
    assert measure.area(b) >= measure.area(g) - 1e-9


@settings(max_examples=60, deadline=None)
@given(rects(), rects())
def test_strtree_vs_brute(ra, rb):
    from engine.geo.strtree import STRtree

    geoms = [rect_geom(ra), rect_geom(rb)]
    tree = STRtree(geoms)
    probe = Geom.point((ra[0] + ra[2]) / 2, (ra[1] + ra[3]) / 2)
    res = set(tree.query(probe, predicate="intersects").tolist())
    want = {i for i, g in enumerate(geoms) if pred.intersects(probe, g)}
    assert res == want


def test_overlay_concave_star_identities():
    """Randomized concave (star) polygons, general-position floats —
    the area identities must hold for every op (seeded, 40 trials)."""
    import random

    rng = random.Random(7)

    def star(cx, cy, n, r1, r2):
        ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
        rad = np.where(np.arange(2 * n) % 2 == 0, r2, r1)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        return Geom(GeomType.POLYGON, rings=[ring])

    for _ in range(40):
        a = star(rng.uniform(3, 9), rng.uniform(3, 9), rng.randint(3, 7),
                 rng.uniform(0.5, 1.5), rng.uniform(2, 4))
        b = star(rng.uniform(3, 9), rng.uniform(3, 9), rng.randint(3, 7),
                 rng.uniform(0.5, 1.5), rng.uniform(2, 4))
        aa, ab = measure.area(a), measure.area(b)
        ai = measure.area(so.intersection(a, b))
        assert abs(measure.area(so.union(a, b)) - (aa + ab - ai)) < 1e-6
        assert abs(measure.area(so.difference(a, b)) - (aa - ai)) < 1e-6
        assert abs(measure.area(so.symmetric_difference(a, b)) - (aa + ab - 2 * ai)) < 1e-6


# ---------------------------------------------------- identity semantics
@st.composite
def any_geoms(draw):
    """Small random geometry of varied type (incl. Z and empties)."""
    kind = draw(st.integers(0, 5))
    cs = lambda n: [(draw(coord), draw(coord)) for _ in range(n)]
    if kind == 0:
        if draw(st.booleans()):
            return Geom.point(draw(coord), draw(coord), draw(coord))
        return Geom.point(draw(coord), draw(coord))
    if kind == 1:
        return Geom.linestring(np.asarray(cs(draw(st.integers(2, 5)))))
    if kind == 2:
        x0, y0 = draw(coord), draw(coord)
        return Geom.box(x0, y0, x0 + 1 + draw(coord), y0 + 1 + draw(coord))
    if kind == 3:
        return Geom.multi(
            GeomType.MULTIPOINT,
            [Geom.point(x, y) for x, y in cs(draw(st.integers(1, 4)))],
        )
    if kind == 4:
        return Geom.empty(
            draw(st.sampled_from([GeomType.POINT, GeomType.LINESTRING,
                                  GeomType.POLYGON,
                                  GeomType.GEOMETRYCOLLECTION]))
        )
    return Geom.collection(
        [Geom.point(draw(coord), draw(coord)),
         Geom.linestring(np.asarray(cs(2)))]
    )


@settings(max_examples=150, deadline=None)
@given(any_geoms())
def test_identity_roundtrip_eq_hash(g):
    """WKB and WKT round-trips preserve __eq__/hash; eq implies equal
    hash (set/dict contract)."""
    from engine.geo.geom import from_wkt, to_wkt
    from engine.geo.wkb import from_wkb, to_wkb

    g2 = from_wkb(to_wkb(g))
    assert g == g2
    assert hash(g) == hash(g2)
    g3 = from_wkt(to_wkt(g))
    assert g == g3, (to_wkt(g), to_wkt(g3))
    assert hash(g) == hash(g3)
    assert (g != g2) is False


@settings(max_examples=100, deadline=None)
@given(any_geoms(), any_geoms())
def test_identity_symmetry(a, b):
    assert (a == b) == (b == a)
    if a == b:
        assert hash(a) == hash(b)


@settings(max_examples=60, deadline=None)
@given(st.sets(st.tuples(st.integers(0, 3), st.integers(0, 3)),
               min_size=1, max_size=16))
def test_grid_box_union_exact_invariants(cells):
    """Union of unit grid boxes (the raster→vector kernel's shape): area
    = cell count and perimeter = 4n − 2·(shared edges), exactly — holes
    and multi-part regions included."""
    from engine.geo.set_operations import union_all

    boxes = [Geom.box(x, y, x + 1, y + 1) for x, y in cells]
    u = union_all(boxes)
    n = len(cells)
    shared = sum(
        1
        for (x, y) in cells
        for d in ((1, 0), (0, 1))
        if (x + d[0], y + d[1]) in cells
    )
    assert u.area == float(n)
    assert u.length == float(4 * n - 2 * shared)


# ---------------------------------------------------------------------------
# round-5 vectorized covers: superset property for ANY lon/lat rect
# ---------------------------------------------------------------------------

lon_c = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat_c = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False)
span_c = st.floats(min_value=0.001, max_value=10.0, allow_nan=False)


@st.composite
def lonlat_rects(draw):
    cx = draw(lon_c)
    cy = draw(lat_c)
    w = draw(span_c)
    h = draw(span_c)
    return (max(cx - w, -180.0), cy - h, min(cx + w, 180.0), cy + h)


@given(lonlat_rects(), st.integers(min_value=1, max_value=6),
       st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_h3x_cover_rects_many_superset_property(rect, res, rnd):
    from engine.geo import hexsphere as hx

    rows, ids = hx.h3x_cover_rects_many(
        np.array([rect], dtype=np.float64), res)
    cov = ids[rows == 0]
    px = np.array([rnd.uniform(rect[0], rect[2]) for _ in range(20)]
                  + [rect[0], rect[2], rect[0], rect[2]])
    py = np.array([rnd.uniform(rect[1], rect[3]) for _ in range(20)]
                  + [rect[1], rect[1], rect[3], rect[3]])
    keys = hx.h3x_cell(np.clip(px, -179.999999, 179.999999),
                       np.clip(py, -89.9, 89.9), res)
    assert np.isin(keys, cov).all()


@given(lonlat_rects(), st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_s2_cover_rects_many_superset_property(rect, rnd):
    from engine.geo import cells

    r = np.array([rect], dtype=np.float64)
    lv = cells.s2_level_for_rects(r, 24, 12)
    rows, ids = cells.s2_cover_rects_many(r, lv)
    cov = ids[rows == 0]
    px = np.array([rnd.uniform(rect[0], rect[2]) for _ in range(20)]
                  + [rect[0], rect[2], rect[0], rect[2]])
    py = np.array([rnd.uniform(rect[1], rect[3]) for _ in range(20)]
                  + [rect[1], rect[1], rect[3], rect[3]])
    keys = np.asarray(cells.s2_cell(
        np.clip(px, -179.999999, 179.999999), py, int(lv[0])))
    assert np.isin(keys, cov).all()
    # single-level cover => disjoint per rect
    assert len(np.unique(cov)) == len(cov)
