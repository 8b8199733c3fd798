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
        assert length(u) == float(int(length(u)))  # integer perimeter
