"""Property tests for the spherical icosahedral aperture-7 hex index
(engine.geo.hexsphere) — H3-class geometry, self-derived orientation."""

import numpy as np
import pytest

from engine.geo import hexsphere as H


def _sphere_points(n, seed=0):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179.99, 179.99, n)
    lat = np.degrees(np.arcsin(rng.uniform(-0.999, 0.999, n)))
    return lon, lat


def test_icosahedron_structure():
    assert H._FN.shape == (20, 3)
    # face normals are unit and their pairwise dots match an icosahedron
    assert np.allclose(np.linalg.norm(H._FN, axis=1), 1.0)
    # every point on the sphere is claimed by exactly one face (argmax) —
    # and the 20 face normals are distinct
    assert len({tuple(np.round(f, 9)) for f in H._FN}) == 20


def test_parent_is_prefix_truncation():
    lon, lat = _sphere_points(5000, 1)
    c9 = H.h3x_cell(lon, lat, 9)
    c5 = H.h3x_parent(c9, 5)
    # parent ids are valid res-5 ids and are themselves fixed points
    assert (H.h3x_res(c5) == 5).all()
    assert (H.h3x_parent(c5, 5) == c5).all()
    # hierarchy is consistent: parenting in two hops == one hop
    assert (H.h3x_parent(H.h3x_parent(c9, 7), 5) == c5).all()


def test_center_roundtrip_rate():
    """Cell centers re-encode to their own cell except for the rare
    face-edge wobble (documented; partitioning use is unaffected)."""
    lon, lat = _sphere_points(20000, 2)
    c = H.h3x_cell(lon, lat, 7)
    clon, clat = H.h3x_center(c)
    back = H.h3x_cell(clon, clat, 7)
    assert (back == c).mean() > 0.998


def test_aperture_seven_children():
    """A res-r cell has exactly 7 distinct res-(r+1) digit children, and
    densely sampled points inside a cell produce at most those 7."""
    lon, lat = _sphere_points(200, 3)
    c6 = H.h3x_cell(lon, lat, 6)
    # sample densely around each point; children of the res-6 cell seen
    # via parent-truncation must come from at most 7 distinct ids
    for i in range(0, 20):
        d = H.cell_size_deg(6)
        gl = lon[i] + np.linspace(-d, d, 40)
        gt = np.clip(lat[i] + np.linspace(-d, d, 40)[:, None], -89.9, 89.9)
        GL, GT = np.meshgrid(gl, np.clip(gt[:, 0], -89.9, 89.9))
        c7 = H.h3x_cell(np.clip(GL.ravel(), -179.999999, 179.999999),
                        GT.ravel(), 7)
        par = H.h3x_parent(c7, 6)
        mine = c7[par == c6[i]]
        assert len(np.unique(mine)) <= 7


def test_cover_rect_superset():
    """h3x_cover_rect must contain the cell of every point in the rect
    (the celljoin superset contract), across latitudes."""
    rng = np.random.default_rng(4)
    for lat0 in (-75.0, -30.0, 10.0, 60.0):
        lon0 = rng.uniform(-170, 160)
        lon1 = lon0 + rng.uniform(1.0, 8.0)
        lat1 = lat0 + rng.uniform(1.0, 6.0)
        for res in (2, 4):
            cover = set(H.h3x_cover_rect(lon0, lat0, lon1, lat1, res).tolist())
            pl = rng.uniform(lon0, lon1, 4000)
            pt = rng.uniform(lat0, lat1, 4000)
            keys = H.h3x_cell(pl, pt, res)
            missing = set(keys.tolist()) - cover
            assert not missing, (lat0, res, len(missing))


def test_res_ladder_area_scaling():
    """Aperture 7: each finer res partitions the sphere into ~7x more
    cells (checked by distinct-cell counts over a dense uniform sample)."""
    lon, lat = _sphere_points(200000, 5)
    n2 = len(np.unique(H.h3x_cell(lon, lat, 2)))
    n3 = len(np.unique(H.h3x_cell(lon, lat, 3)))
    assert 4.0 < n3 / n2 < 10.0


def test_bad_res_raises():
    with pytest.raises(ValueError):
        H.h3x_cell(np.array([0.0]), np.array([0.0]), 14)


def test_cover_rect_superset_face_seams():
    """Regression: a face-seam cell is keyed by an arbitrarily thin
    argmax sliver — the cover must force-project samples onto every
    nearby face (found via img4535/poly 1 at sf0.01)."""
    rng = np.random.default_rng(11)
    rects = [(-102.6, -77.6, -55.8, -56.8)]  # the original miss
    for _ in range(6):
        l0 = rng.uniform(-170, 120)
        t0 = rng.uniform(-80, 50)
        rects.append((l0, t0, l0 + rng.uniform(10, 50), t0 + rng.uniform(10, 30)))
    for rect in rects:
        for res in (2, 3):
            cover = set(H.h3x_cover_rect(*rect, res).tolist())
            pl = rng.uniform(rect[0], rect[2], 20000)
            pt = rng.uniform(rect[1], rect[3], 20000)
            keys = H.h3x_cell(pl, pt, res)
            missing = set(keys.tolist()) - cover
            assert not missing, (rect, res, len(missing))


def test_neighbors_kring_polyfill():
    """Ring-1 neighbors are symmetric in-face, k-ring grows 1+3k(k+1)
    for interior cells, and polyfill keeps exactly the center-inside
    cells."""
    from engine.geo import core

    lon, lat = np.array([10.0, -50.0, 120.0]), np.array([20.0, -40.0, 70.0])
    c = H.h3x_cell(lon, lat, 5)
    nb = H.h3x_neighbors(c)
    assert nb.shape == (3, 6)
    for i in range(3):
        for n in set(nb[i]) - {int(c[i])}:
            assert int(c[i]) in set(H.h3x_neighbors(np.array([n]))[0])
    assert len(H.h3x_kring(c[:1], 1)) == 7
    assert len(H.h3x_kring(c[:1], 2)) == 19
    tri = np.array([[0, 40], [20, 40], [10, 55], [0, 40]], float)
    cells = H.h3x_polyfill(tri, 4)
    assert len(cells) > 100
    clon, clat = H.h3x_center(cells)
    assert (core.points_in_rings(clon, clat, [tri]) == 2).all()
    # completeness vs a dense point sample: every sampled inside point's
    # cell is in the polyfill
    rng = np.random.default_rng(2)
    pl = rng.uniform(0, 20, 5000)
    pt = rng.uniform(40, 55, 5000)
    inside = core.points_in_rings(pl, pt, [tri]) == 2
    keys = H.h3x_cell(pl[inside], pt[inside], 4)
    lonc, latc = H.h3x_center(np.unique(keys))
    in_cells = set(H.h3x_polyfill(tri, 4).tolist())
    # cells straddling the edge may legitimately miss (center outside);
    # interior ones must all be present
    interior = np.unique(keys)[core.points_in_rings(lonc, latc, [tri]) == 2]
    assert set(interior.tolist()) <= in_cells
