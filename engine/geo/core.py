"""Low-level vectorized computational-geometry primitives.

All functions are numpy-vectorized and operate on float64 arrays.  These
are the building blocks for both the scalar DE-9IM machinery
(`engine.geo.relate`) and the batch hot-path kernels
(`engine.geo.prepared`, `engine.geo.vector`).

Reference semantics being replicated (not ported): shapely's C ufuncs in
`src/geos_funcs_YY_b.c` / GEOS predicate behavior, validated against the
expected-value tables in `shapely/tests/test_predicates.py` and
`shapely/tests/test_strtree.py`.
"""

from __future__ import annotations

import numpy as np

# Absolute snapping tolerance for "point lies on segment/ring" decisions on
# *derived* (computed) intersection points.  Exact-coordinate cases (shared
# vertices, integer grids) are decided exactly; EPS only guards float error
# in constructed points.  The reference's own STRtree fixtures embed a 1e-9
# guard (test_strtree.py:43-49 buffer radius sqrt(2)/2 + 1e-9) so 1e-12 is
# safely below fixture design margins.
EPS = 1e-12


def orient(ax, ay, bx, by, cx, cy):
    """Twice the signed area of triangle (a,b,c); >0 = counter-clockwise."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def bbox_of(coords: np.ndarray) -> np.ndarray:
    """(xmin, ymin, xmax, ymax) of an (n,2) array; NaNs for empty."""
    if len(coords) == 0:
        return np.full(4, np.nan)
    return np.array(
        [coords[:, 0].min(), coords[:, 1].min(), coords[:, 0].max(), coords[:, 1].max()]
    )


def bbox_intersects(b1, b2, pad: float = 0.0) -> bool:
    return bool(
        b1[0] <= b2[2] + pad
        and b2[0] <= b1[2] + pad
        and b1[1] <= b2[3] + pad
        and b2[1] <= b1[3] + pad
    )


# ---------------------------------------------------------------------------
# point vs segment
# ---------------------------------------------------------------------------


def on_segment(px, py, ax, ay, bx, by, eps=EPS):
    """Boolean array: does point p lie on closed segment [a,b]?

    Exact for points sharing coordinates with the segment's affine span;
    eps-tolerant otherwise (for derived intersection points).
    """
    px, py, ax, ay, bx, by = np.broadcast_arrays(px, py, ax, ay, bx, by)
    cross = orient(ax, ay, bx, by, px, py)
    seg_len2 = (bx - ax) ** 2 + (by - ay) ** 2
    # distance from line = |cross| / len; want distance <= eps, uniformly
    # in the segment length (a sub-eps segment must NOT become a huge
    # slab — tolerance slabs are per unit length, so scale by len²).
    near_line = cross * cross <= eps * eps * np.maximum(seg_len2, eps * eps)
    dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
    seg_len = np.sqrt(seg_len2)
    tol = eps * np.maximum(seg_len, 1.0)
    within = (dot >= -tol) & (dot <= seg_len2 + tol)
    # (near-)degenerate segment: treat as the point a
    degen = seg_len2 <= eps * eps
    at_a = (np.abs(px - ax) <= eps) & (np.abs(py - ay) <= eps)
    return np.where(degen, at_a, near_line & within)


def point_seg_dist2(px, py, ax, ay, bx, by):
    """Squared distance from points to segments (broadcasting)."""
    px, py, ax, ay, bx, by = np.broadcast_arrays(*map(np.asarray, (px, py, ax, ay, bx, by)))
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = np.where(len2 > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(len2 == 0, 1, len2), 0.0)
    t = np.clip(t, 0.0, 1.0)
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2


def seg_seg_dist2(ax, ay, bx, by, cx, cy, dx, dy):
    """Squared distance between segments [a,b] and [c,d] (broadcasting).

    0 when they intersect.
    """
    inter = segments_intersect_bool(ax, ay, bx, by, cx, cy, dx, dy)
    d1 = point_seg_dist2(ax, ay, cx, cy, dx, dy)
    d2 = point_seg_dist2(bx, by, cx, cy, dx, dy)
    d3 = point_seg_dist2(cx, cy, ax, ay, bx, by)
    d4 = point_seg_dist2(dx, dy, ax, ay, bx, by)
    d = np.minimum(np.minimum(d1, d2), np.minimum(d3, d4))
    return np.where(inter, 0.0, d)


def segments_intersect_bool(ax, ay, bx, by, cx, cy, dx, dy):
    """Boolean: do closed segments [a,b] and [c,d] share any point?"""
    ax, ay, bx, by, cx, cy, dx, dy = np.broadcast_arrays(
        *map(np.asarray, (ax, ay, bx, by, cx, cy, dx, dy))
    )
    d1 = orient(cx, cy, dx, dy, ax, ay)
    d2 = orient(cx, cy, dx, dy, bx, by)
    d3 = orient(ax, ay, bx, by, cx, cy)
    d4 = orient(ax, ay, bx, by, dx, dy)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    t1 = (d1 == 0) & on_segment(ax, ay, cx, cy, dx, dy, 0.0)
    t2 = (d2 == 0) & on_segment(bx, by, cx, cy, dx, dy, 0.0)
    t3 = (d3 == 0) & on_segment(cx, cy, ax, ay, bx, by, 0.0)
    t4 = (d4 == 0) & on_segment(dx, dy, ax, ay, bx, by, 0.0)
    return proper | t1 | t2 | t3 | t4


# ---------------------------------------------------------------------------
# segment/segment intersection structure (for the relate machinery)
# ---------------------------------------------------------------------------


def seg_cut_params(p: np.ndarray, q: np.ndarray, segs: np.ndarray, eps=EPS):
    """Parameters t in [0,1] where segment p->q meets any segment in segs.

    segs: (m, 4) array of (ax, ay, bx, by).  Returns a sorted 1-D float64
    array of cut parameters including collinear-overlap endpoints and
    pass-through of seg endpoints; excludes duplicates within eps of each
    other.  Used to split a geometry's edges at every event against the
    other geometry before midpoint classification (relate machinery).
    """
    if len(segs) == 0:
        return np.empty(0)
    px, py = p
    qx, qy = q
    rx, ry = qx - px, qy - py
    len2 = rx * rx + ry * ry
    if len2 == 0:
        return np.empty(0)
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    sx, sy = bx - ax, by - ay
    denom = rx * sy - ry * sx
    ts: list[np.ndarray] = []
    # proper / general intersections where lines are not parallel
    nz = denom != 0
    if nz.any():
        t = ((ax - px) * sy - (ay - py) * sx)[nz] / denom[nz]
        u = ((ax - px) * ry - (ay - py) * rx)[nz] / denom[nz]
        ok = (t >= -eps) & (t <= 1 + eps) & (u >= -eps) & (u <= 1 + eps)
        ts.append(np.clip(t[ok], 0.0, 1.0))
    # endpoints of other segments lying on p->q (covers collinear overlaps:
    # an overlapping collinear seg contributes its endpoints as cuts)
    for ex, ey in ((ax, ay), (bx, by)):
        on = on_segment(ex, ey, px, py, qx, qy, eps)
        if on.any():
            t = ((ex - px) * rx + (ey - py) * ry)[on] / len2
            ts.append(np.clip(t, 0.0, 1.0))
    if not ts:
        return np.empty(0)
    allt = np.sort(np.concatenate(ts))
    keep = np.ones(len(allt), bool)
    keep[1:] = np.diff(allt) > 1e-12
    return allt[keep]


# ---------------------------------------------------------------------------
# point in ring / polygon (even-odd)
# ---------------------------------------------------------------------------


def point_in_rings(px: float, py: float, rings: list[np.ndarray], eps=EPS) -> int:
    """Locate a point vs a polygon given as closed rings (even-odd rule).

    Returns 2 = interior, 1 = on boundary, 0 = exterior.
    """
    crossings = 0
    for ring in rings:
        ax, ay = ring[:-1, 0], ring[:-1, 1]
        bx, by = ring[1:, 0], ring[1:, 1]
        if bool(np.any(on_segment(px, py, ax, ay, bx, by, eps))):
            return 1
        # even-odd ray cast to +x; half-open rule on y avoids vertex double count
        cond = (ay > py) != (by > py)
        if cond.any():
            xint = ax[cond] + (py - ay[cond]) * (bx[cond] - ax[cond]) / (by[cond] - ay[cond])
            crossings += int(np.count_nonzero(xint > px))
    return 2 if crossings % 2 == 1 else 0


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray], eps=EPS) -> np.ndarray:
    """Vectorized locate of many points vs one polygon (closed rings).

    Returns int8 array: 2 interior, 1 boundary, 0 exterior.  This is the
    hot-path kernel behind contains_xy / intersects_xy
    (reference: predicates.py:1311,1367) and the join refinement stage.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    out = np.zeros(n, dtype=np.int8)
    if n == 0 or not rings:
        return out
    crossings = np.zeros(n, dtype=np.int64)
    on_b = np.zeros(n, dtype=bool)
    for ring in rings:
        ax, ay = ring[:-1, 0], ring[:-1, 1]
        bx, by = ring[1:, 0], ring[1:, 1]
        # (n, m) broadcasting; chunk over points to bound memory
        m = len(ax)
        if m == 0:
            continue
        chunk = max(1, int(4_000_000 // max(m, 1)))
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            cpx = px[s:e, None]
            cpy = py[s:e, None]
            onseg = on_segment(cpx, cpy, ax[None, :], ay[None, :], bx[None, :], by[None, :], eps)
            on_b[s:e] |= onseg.any(axis=1)
            cond = (ay[None, :] > cpy) != (by[None, :] > cpy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = ax[None, :] + (cpy - ay[None, :]) * (bx[None, :] - ax[None, :]) / (
                    by[None, :] - ay[None, :]
                )
            crossings[s:e] += np.count_nonzero(cond & (xint > cpx), axis=1)
    inside = crossings % 2 == 1
    out[inside] = 2
    out[on_b] = 1
    return out


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of a closed ring (CCW positive).

    Reference formula: shapely/algorithms/cga.py:8-16 (signed_area).
    Coordinates are anchored at the first vertex before summing — the
    GEOS accumulation, which keeps axis-aligned areas exact (e.g. a
    0.1 x 0.1 square at (2.1, 2.1) is exactly 0.01).
    """
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polyline_length(coords: np.ndarray) -> float:
    if len(coords) < 2:
        return 0.0
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())
