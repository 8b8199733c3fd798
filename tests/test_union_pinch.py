"""Regression: pinch-wrapped faces in areal union assembly.

A face-walk cycle can PINCH-WRAP a sibling face that touches it only at
vertices (an island corner-chained to a hole wall): the hole cycle
detours around the island, so the island is even-odd interior to the
assembled polygon — and before the fix the island's own cycle was ALSO
emitted as a separate shell, double-counting its area (union_all of 38
random integer boxes measured area 307 where the true covered-cell
count is 306).  GEOS represents the same input as a simple hole plus a
separate island polygon; either form must measure exactly.
"""

import numpy as np

from engine.geo.creation import box
from engine.geo.measure import area, length
from engine.geo.set_operations import union, union_all


ANNULUS = [(0, 0, 7, 1), (0, 6, 7, 7), (0, 1, 1, 6), (6, 1, 7, 6)]


def _union_area(bxs):
    arr = np.array(bxs, dtype=float)
    b = box(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
    return area(union_all(b))


def _covered_cells(bxs):
    cov = set()
    for (x0, y0, x1, y1) in bxs:
        for cx in range(x0, x1):
            for cy in range(y0, y1):
                cov.add((cx, cy))
    return len(cov)


def test_island_chain_pinched_to_hole_wall():
    # island1 edge-fuses with the annulus wall; island2 corner-touches
    # island1 — the hole cycle pinch-wraps island2 (the minimal repro)
    bxs = ANNULUS + [(1, 1, 2, 2), (2, 2, 3, 3)]
    assert _union_area(bxs) == 26.0 == _covered_cells(bxs)


def test_island_chain_binary_fold():
    # same configuration through iterated binary union
    bxs = ANNULUS + [(1, 1, 2, 2), (2, 2, 3, 3)]
    arr = np.array(bxs, dtype=float)
    b = box(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
    g = b[0]
    for x in b[1:]:
        g = union(g, x)
    assert area(g) == 26.0


def test_pinch_variants_still_exact():
    ann = [(0, 0, 5, 1), (0, 4, 5, 5), (0, 1, 1, 4), (4, 1, 5, 4)]
    cases = [
        ([(0, 0, 1, 1), (1, 1, 2, 2)], 2),            # corner pair
        (ann, 16),                                      # plain annulus
        (ann + [(2, 2, 3, 3)], 17),                     # free island
        (ann + [(1, 1, 2, 2)], 17),                     # wall-fused island
        (ANNULUS + [(2, 2, 3, 3), (3, 3, 4, 4)], 26),   # detached chain
        (ANNULUS + [(1, 1, 2, 2), (3, 3, 4, 4)], 26),   # fused + free
        # checkerboard pinch to the exterior
        ([(0, 0, 3, 1), (0, 1, 1, 2), (2, 1, 3, 3), (1, 2, 2, 3)], 7),
    ]
    for bxs, want in cases:
        assert _union_area(bxs) == float(want) == _covered_cells(bxs), bxs


def test_union_emits_simple_valid_rings():
    """Corner-touching covered components must come out as SEPARATE
    simple polygons (the GEOS form), never as one self-touching ring;
    union outputs must be valid so they can feed further overlays."""
    from engine.geo import predicates as pred
    from engine.geo.set_operations import intersection

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 50
        x0 = rng.integers(0, 20, n)
        y0 = rng.integers(0, 18, n)
        w = 1 + rng.integers(0, 3, n)
        h = 1 + rng.integers(0, 4, n)
        u = union_all(box(x0.astype(float), y0.astype(float),
                          (x0 + w).astype(float), (y0 + h).astype(float)))
        assert pred.is_valid(u), seed
        for p in (u.parts or [u]):
            for r in p.rings:
                vv = [tuple(v) for v in r[:-1]]
                assert len(vv) == len(set(vv)), "self-touching ring"
        # must be accepted as overlay input (the downstream contract)
        assert area(intersection(u, u)) == area(u)


def test_polygon_validity_touch_rules():
    """JTS IsValidOp ring-interaction semantics: a single point touch
    between rings is VALID; two touch points / crossings / collinear
    overlaps / touch cycles are INVALID."""
    from engine.geo.geom import from_wkt
    from engine.geo import predicates as pred

    valid = [
        # hole touches shell at one point
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (5 0, 7 3, 3 3, 5 0))",
        # two holes, each touching the shell at one distinct point
        ("POLYGON ((0 0, 20 0, 20 10, 0 10, 0 0), (3 0, 5 3, 1 3, 3 0),"
         " (13 0, 15 3, 11 3, 13 0))"),
        # star: shell + two holes ALL meeting at one single point — the
        # touch cycle encloses no area, interior stays connected (JTS)
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (5 0, 2 3, 4 3, 5 0),"
         " (5 0, 6 3, 8 3, 5 0))"),
    ]
    invalid = [
        # hole nested strictly inside another hole
        ("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
         " (2 2, 18 2, 18 18, 2 18, 2 2), (5 5, 15 5, 15 15, 5 15, 5 5))"),
        # hole wedge-contained in another hole, sharing one vertex
        ("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0),"
         " (2 2, 18 2, 18 18, 2 18, 2 2), (2 2, 9 5, 5 9, 2 2))"),
        # hole touches shell at two points (disconnects the interior)
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 0, 8 0, 5 5, 2 0))",
        # hole crosses shell
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
         " (8 2, 12 2, 12 4, 8 4, 8 2))"),
        # hole shares a collinear boundary stretch with the shell
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
         " (2 0, 5 0, 5 3, 2 3, 2 0))"),
        # touch cycle shell→hole1→hole2→shell (disconnected interior)
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 5, 4 3, 4 7, 0 5),"
         " (4 5, 10 4, 10 6, 4 5))"),
    ]
    for wkt in valid:
        assert pred.is_valid(from_wkt(wkt)), wkt
    for wkt in invalid:
        assert not pred.is_valid(from_wkt(wkt)), wkt


def test_binary_overlay_differential_vs_cells():
    """Differential stress: intersection/difference/symmetric_difference
    of two random integer-box unions measured against boolean-grid cell
    arithmetic — all exact."""
    from engine.geo.set_operations import (difference, intersection,
                                           symmetric_difference)

    def mkgrid(rng, n, W=16, H=14):
        x0 = rng.integers(0, W, n)
        y0 = rng.integers(0, H, n)
        w = 1 + rng.integers(0, 3, n)
        h = 1 + rng.integers(0, 4, n)
        g = np.zeros((W + 3, H + 4), dtype=bool)
        for i in range(n):
            g[x0[i]:x0[i] + w[i], y0[i]:y0[i] + h[i]] = True
        u = union_all(box(x0.astype(float), y0.astype(float),
                          (x0 + w).astype(float), (y0 + h).astype(float)))
        return u, g

    for seed in (0, 5):
        rng = np.random.default_rng(seed)
        A, ga = mkgrid(rng, 30)
        B, gb = mkgrid(rng, 30)
        assert area(intersection(A, B)) == float((ga & gb).sum())
        assert area(difference(A, B)) == float((ga & ~gb).sum())
        assert area(symmetric_difference(A, B)) == float((ga ^ gb).sum())


def test_random_integer_boxes_area_equals_cell_count():
    # randomized stress: dense overlapping integer boxes form rings,
    # holes, islands and pinch chains; union area must equal the covered
    # unit-cell count exactly (integer coords ⇒ float-exact overlay)
    for seed in (0, 3):
        rng = np.random.default_rng(seed)
        n = 250
        x0 = rng.integers(0, 40, n)
        y0 = rng.integers(0, 36, n)
        w = 1 + rng.integers(0, 3, n)
        h = 1 + rng.integers(0, 5, n)
        b = box(x0.astype(float), y0.astype(float),
                (x0 + w).astype(float), (y0 + h).astype(float))
        u = union_all(b)
        bxs = list(zip(x0.tolist(), y0.tolist(),
                       (x0 + w).tolist(), (y0 + h).tolist()))
        assert area(u) == float(_covered_cells(bxs))
        # exact perimeter: covered/uncovered 4-adjacency count incl. the
        # outer rim and interior hole walls (== total ring length)
        g = np.zeros((44, 45), dtype=bool)
        for (bx0, by0, bx1, by1) in bxs:
            g[bx0:bx1, by0:by1] = True
        per = int((g[1:, :] != g[:-1, :]).sum() + g[0, :].sum()
                  + g[-1, :].sum() + (g[:, 1:] != g[:, :-1]).sum()
                  + g[:, 0].sum() + g[:, -1].sum())
        assert length(u) == float(per)


def test_line_clip_length_vs_cell_rows():
    """Differential: horizontal probe lines clipped by a box-union
    multipolygon — inside length must equal the covered-cell count of
    that row (and outside length the complement).  Tolerance covers the
    parametric cut-point rounding (≤ ~1e-13 accumulated; a structural
    error — a missing or phantom piece — is ≥ 1.0)."""
    from engine.geo.geom import Geom
    from engine.geo.measure import length
    from engine.geo.set_operations import difference, intersection

    for seed in (3, 4):
        rng = np.random.default_rng(seed)
        n = 60
        x0 = rng.integers(0, 20, n)
        y0 = rng.integers(0, 18, n)
        w = 1 + rng.integers(0, 3, n)
        h = 1 + rng.integers(0, 4, n)
        g = np.zeros((23, 22), dtype=bool)
        for i in range(n):
            g[x0[i]:x0[i] + w[i], y0[i]:y0[i] + h[i]] = True
        u = union_all(box(x0.astype(float), y0.astype(float),
                          (x0 + w).astype(float), (y0 + h).astype(float)))
        for k in range(0, 20, 3):
            line = Geom.linestring(
                np.array([[-1.0, k + 0.5], [24.0, k + 0.5]]))
            want = float(g[:, k].sum())
            assert abs(length(intersection(line, u)) - want) < 1e-9
            assert abs(length(difference(line, u)) - (25.0 - want)) < 1e-9


def test_de9im_predicates_vs_cell_arithmetic():
    """Differential: every binary predicate on two random integer-box
    union multipolygons against exact cell arithmetic (interior overlap
    = shared covered cell; touch = Chebyshev cell distance exactly 1;
    containment = cell-set inclusion)."""
    from engine.geo import predicates as pred

    def mkgrid(rng, n, W=14, H=12):
        x0 = rng.integers(0, W, n)
        y0 = rng.integers(0, H, n)
        w = 1 + rng.integers(0, 3, n)
        h = 1 + rng.integers(0, 3, n)
        g = np.zeros((W + 3, H + 3), dtype=bool)
        for i in range(n):
            g[x0[i]:x0[i] + w[i], y0[i]:y0[i] + h[i]] = True
        u = union_all(box(x0.astype(float), y0.astype(float),
                          (x0 + w).astype(float), (y0 + h).astype(float)))
        return u, g

    for seed in range(1000, 1014):
        rng = np.random.default_rng(seed)
        A, ga = mkgrid(rng, int(rng.integers(2, 14)))
        B, gb = mkgrid(rng, int(rng.integers(2, 14)))
        pa_ = np.argwhere(ga)
        pb_ = np.argwhere(gb)
        cheb = int(np.max(np.abs(pa_[:, None, :] - pb_[None, :, :]),
                          axis=2).min())
        shared = bool((ga & gb).any())
        subAB = bool((gb & ~ga).sum() == 0)  # cells(B) ⊆ cells(A)
        subBA = bool((ga & ~gb).sum() == 0)
        assert bool(pred.intersects(A, B)) == (cheb <= 1), seed
        assert bool(pred.disjoint(A, B)) == (cheb >= 2), seed
        assert bool(pred.touches(A, B)) == (cheb == 1), seed
        assert bool(pred.contains(A, B)) == (subAB and shared), seed
        assert bool(pred.within(A, B)) == (subBA and shared), seed
        assert bool(pred.overlaps(A, B)) == (
            shared and not subAB and not subBA), seed
        assert bool(pred.equals(A, B)) == (subAB and subBA), seed
        assert bool(pred.covers(A, B)) == subAB, seed
        assert bool(pred.covered_by(A, B)) == subBA, seed
