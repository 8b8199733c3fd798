"""Vectorized predicate API over Geom scalars/arrays.

Mirrors the reference's `shapely/predicates.py` surface (unary + binary
predicates, contains_xy / intersects_xy, dwithin) with numpy broadcasting
over object arrays of `Geom`.  Scalar semantics come from
`engine.geo.relate` (DE-9IM); the batch hot path for huge point tables is
`engine.geo.prepared` — this module is the API-parity + conformance layer.

None handling matches the reference exactly: binary predicates return
False for missing geometries (predicates.py:783 "missing values are never
disjoint"), unary predicates return False for None.
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo import relate as R
from engine.geo.geom import Geom, GeomType

__all__ = [
    "is_ccw", "is_closed", "is_empty", "is_geometry", "is_missing",
    "is_prepared", "is_ring", "is_simple", "is_valid", "is_valid_input",
    "is_valid_reason", "crosses", "contains", "contains_properly",
    "covered_by", "covers", "disjoint", "equals", "intersects", "overlaps",
    "touches", "within", "equals_exact", "equals_identical", "relate",
    "relate_pattern", "dwithin", "contains_xy", "intersects_xy",
    "prepare", "destroy_prepared", "distance",
]

_LINEAR = (GeomType.LINESTRING, GeomType.LINEARRING)


def _apply1(fn, geometry, dtype=bool):
    if geometry is None or isinstance(geometry, Geom):
        return fn(geometry)
    arr = np.asarray(geometry, dtype=object)
    out = np.empty(arr.shape, dtype=dtype)
    for idx in np.ndindex(arr.shape):
        out[idx] = fn(arr[idx])
    return out


def _apply2(fn, a, b, dtype=bool):
    a_scalar = a is None or isinstance(a, Geom)
    b_scalar = b is None or isinstance(b, Geom)
    if a_scalar and b_scalar:
        return fn(a, b)
    aa = np.asarray(a if not a_scalar else [a], dtype=object)
    bb = np.asarray(b if not b_scalar else [b], dtype=object)
    aa, bb = np.broadcast_arrays(aa, bb)
    out = np.empty(aa.shape, dtype=dtype)
    for idx in np.ndindex(aa.shape):
        out[idx] = fn(aa[idx], bb[idx])
    return out


# ---------------------------------------------------------------- unary
def _is_ccw(g) -> bool:
    """predicates.py:113 — False for non-linear or <4 points."""
    if g is None or g.type_id not in _LINEAR:
        return False
    c = g.xys
    if len(c) < 4:
        return False
    ring = c if np.array_equal(c[0], c[-1]) else np.vstack([c, c[:1]])
    return core.ring_signed_area(ring) > 0


def _is_closed(g) -> bool:
    """predicates.py:152 — False for non-linestrings."""
    if g is None:
        return False
    if g.type_id in _LINEAR:
        c = g.xys
        return len(c) >= 2 and bool(np.array_equal(c[0], c[-1]))
    if g.type_id == GeomType.MULTILINESTRING:
        return len(g.parts) > 0 and all(_is_closed(p) for p in g.parts)
    return False


def _line_is_simple(lines: list[np.ndarray], closed_ok=True) -> bool:
    """No self-intersections except allowed vertex junctions."""
    segs = []
    meta = []  # (line_id, seg_id, nsegs, closed, start_pt, end_pt)
    for li, line in enumerate(lines):
        n = len(line) - 1
        closed = bool(np.array_equal(line[0], line[-1]))
        for si in range(n):
            segs.append((line[si], line[si + 1]))
            meta.append((li, si, n, closed))
    line_ends = {}
    for li, line in enumerate(lines):
        line_ends[li] = (tuple(line[0]), tuple(line[-1]))
    for i in range(len(segs)):
        (p1, q1), (li, si, ni, ci) = segs[i], meta[i]
        for j in range(i + 1, len(segs)):
            (p2, q2), (lj, sj, nj, cj) = segs[j], meta[j]
            if not core.segments_intersect_bool(
                p1[0], p1[1], q1[0], q1[1], p2[0], p2[1], q2[0], q2[1]
            ):
                continue
            if li == lj:
                if sj == si + 1 and np.array_equal(q1, p2):
                    # adjacent: must meet ONLY at shared vertex
                    if core.on_segment(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1], 0.0) or \
                       core.on_segment(q2[0], q2[1], p1[0], p1[1], q1[0], q1[1], 0.0):
                        return False
                    continue
                if ci and si == 0 and sj == ni - 1 and np.array_equal(p1, q2):
                    if core.on_segment(q1[0], q1[1], p2[0], p2[1], q2[0], q2[1], 0.0) or \
                       core.on_segment(p2[0], p2[1], p1[0], p1[1], q1[0], q1[1], 0.0):
                        return False
                    continue
                return False
            # different lines: allowed only at a point that is a line
            # endpoint of BOTH lines
            for cand in (p1, q1, p2, q2):
                t = tuple(cand)
                if t in line_ends[li] and t in line_ends[lj]:
                    if core.on_segment(cand[0], cand[1], p1[0], p1[1], q1[0], q1[1], 0.0) and \
                       core.on_segment(cand[0], cand[1], p2[0], p2[1], q2[0], q2[1], 0.0):
                        break
            else:
                return False
    return True


def _is_simple(g) -> bool:
    """predicates.py:392 — polygons assumed simple; False for None/GC."""
    if g is None:
        return False
    t = g.type_id
    if t == GeomType.GEOMETRYCOLLECTION:
        return False
    if t in (GeomType.POINT, GeomType.POLYGON, GeomType.MULTIPOLYGON):
        return True
    if t == GeomType.MULTIPOINT:
        pts = g.point_parts()
        return len(np.unique(pts, axis=0)) == len(pts)
    lines = [l for l in g.line_parts() if len(l) >= 2]
    if not lines:
        return True
    return _line_is_simple(lines)


def _is_ring(g) -> bool:
    """predicates.py:354 — closed and simple, linestrings only."""
    if g is None or g.type_id not in _LINEAR:
        return False
    return _is_closed(g) and _is_simple(g)


def _ring_valid(ring: np.ndarray) -> bool:
    if len(ring) < 4:
        return False
    if not np.array_equal(ring[0], ring[-1]):
        return False
    if abs(core.ring_signed_area(ring)) == 0:
        return False
    return _line_is_simple([ring])


def _polygon_valid(rings: list[np.ndarray]) -> bool:
    for r in rings:
        if not _ring_valid(r):
            return False
    if len(rings) > 1:
        shell = rings[0]
        for h in rings[1:]:
            # hole must be inside shell (interior or boundary), no crossing
            locs = core.points_in_rings(h[:, 0], h[:, 1], [shell])
            if np.any(locs == 0):
                return False
        # rings must not cross each other (shared boundary allowed at points)
        for i in range(len(rings)):
            si = np.hstack([rings[i][:-1], rings[i][1:]])
            for j in range(i + 1, len(rings)):
                sj = np.hstack([rings[j][:-1], rings[j][1:]])
                inter = core.segments_intersect_bool(
                    si[:, None, 0], si[:, None, 1], si[:, None, 2], si[:, None, 3],
                    sj[None, :, 0], sj[None, :, 1], sj[None, :, 2], sj[None, :, 3],
                )
                if inter.sum() > 2:  # more than touch points -> likely crossing
                    return False
    return True


def _is_valid(g) -> bool:
    """predicates.py:431 — False for None; True for empty collections."""
    if g is None:
        return False
    t = g.type_id
    if g.is_empty:
        return True
    if t == GeomType.POLYGON:
        return _polygon_valid(g.rings)
    if t == GeomType.MULTIPOLYGON:
        if not all(_is_valid(p) for p in g.parts):
            return False
        # shells of distinct parts must not overlap interiors
        for i in range(len(g.parts)):
            for j in range(i + 1, len(g.parts)):
                if R.overlaps(g.parts[i], g.parts[j]) or R.contains(
                    g.parts[i], g.parts[j]
                ) or R.contains(g.parts[j], g.parts[i]):
                    return False
        return True
    if t == GeomType.GEOMETRYCOLLECTION:
        return all(_is_valid(p) for p in g.parts)
    if t in _LINEAR:
        return len(g.xys) != 1
    return True


def _is_valid_reason(g):
    if g is None:
        return None
    if _is_valid(g):
        return "Valid Geometry"
    if g.type_id == GeomType.POLYGON:
        for r in g.rings:
            if len(r) < 4:
                return "Too few points in geometry component"
        return "Self-intersection"
    return "Invalid Geometry"


def is_ccw(geometry):
    return _apply1(_is_ccw, geometry)


def is_closed(geometry):
    return _apply1(_is_closed, geometry)


def is_empty(geometry):
    return _apply1(lambda g: g is not None and g.is_empty, geometry)


def is_geometry(geometry):
    return _apply1(lambda g: isinstance(g, Geom), geometry)


def is_missing(geometry):
    return _apply1(lambda g: g is None, geometry)


def is_valid_input(geometry):
    return _apply1(lambda g: g is None or isinstance(g, Geom), geometry)


def is_prepared(geometry):
    return _apply1(lambda g: g is not None and getattr(g, "_prepared", False), geometry)


def is_ring(geometry):
    return _apply1(_is_ring, geometry)


def is_simple(geometry):
    return _apply1(_is_simple, geometry)


def is_valid(geometry):
    return _apply1(_is_valid, geometry)


def is_valid_reason(geometry):
    return _apply1(_is_valid_reason, geometry, dtype=object)


def prepare(geometry):
    """creation.py:735 — in our engine preparation is an actor-side
    acceleration structure (engine.geo.prepared); on scalars it is a
    no-op flag kept for API parity."""

    def _prep(g):
        if g is not None:
            g._prepared = True
        return True

    _apply1(_prep, geometry)
    return geometry


def destroy_prepared(geometry):
    def _unprep(g):
        if g is not None and hasattr(g, "_prepared"):
            g._prepared = False
        return True

    _apply1(_unprep, geometry)
    return geometry


# ---------------------------------------------------------------- binary
def crosses(a, b):
    return _apply2(R.crosses, a, b)


def contains(a, b):
    return _apply2(R.contains, a, b)


def contains_properly(a, b):
    return _apply2(R.contains_properly, a, b)


def covered_by(a, b):
    return _apply2(R.covered_by, a, b)


def covers(a, b):
    return _apply2(R.covers, a, b)


def disjoint(a, b):
    return _apply2(R.disjoint, a, b)


def equals(a, b):
    return _apply2(R.equals, a, b)


def intersects(a, b):
    return _apply2(R.intersects, a, b)


def overlaps(a, b):
    return _apply2(R.overlaps, a, b)


def touches(a, b):
    return _apply2(R.touches, a, b)


def within(a, b):
    return _apply2(R.within, a, b)


def relate(a, b):
    return _apply2(R.relate, a, b, dtype=object)


def relate_pattern(a, b, pattern):
    return _apply2(lambda x, y: R.relate_pattern(x, y, pattern), a, b)


def dwithin(a, b, distance):
    d_scalar = np.isscalar(distance)
    if d_scalar:
        return _apply2(lambda x, y: R.dwithin(x, y, float(distance)), a, b)
    aa = np.asarray(a if not isinstance(a, Geom) and a is not None else [a], dtype=object)
    bb = np.asarray(b if not isinstance(b, Geom) and b is not None else [b], dtype=object)
    dd = np.asarray(distance, dtype=np.float64)
    aa, bb, dd = np.broadcast_arrays(aa, bb, dd)
    out = np.empty(aa.shape, dtype=bool)
    for idx in np.ndindex(aa.shape):
        out[idx] = R.dwithin(aa[idx], bb[idx], float(dd[idx]))
    return out


def distance(a, b):
    return _apply2(R.distance, a, b, dtype=np.float64)


def _coords_equal_exact(a: Geom, b: Geom, tol: float) -> bool:
    if a.type_id != b.type_id:
        return False
    if a.type_id == GeomType.POLYGON:
        if len(a.rings) != len(b.rings):
            return False
        return all(
            ra.shape == rb.shape and np.allclose(ra, rb, rtol=0, atol=tol, equal_nan=True)
            for ra, rb in zip(a.rings, b.rings)
        )
    if a.parts or b.parts:
        if len(a.parts) != len(b.parts):
            return False
        return all(_coords_equal_exact(pa, pb, tol) for pa, pb in zip(a.parts, b.parts))
    if a.xys.shape != b.xys.shape:
        return False
    return bool(np.allclose(a.xys, b.xys, rtol=0, atol=tol, equal_nan=True))


def equals_exact(a, b, tolerance=0.0):
    """predicates.py:1081 — structural equality within tolerance."""
    return _apply2(
        lambda x, y: (
            False
            if x is None or y is None
            else _coords_equal_exact(x, y, float(tolerance))
        ),
        a,
        b,
    )


def equals_identical(a, b):
    """predicates.py:1149 — pointwise identical (NaN == NaN)."""
    return equals_exact(a, b, 0.0)


# ------------------------------------------------- xy fast predicates
def contains_xy(geom, x, y=None):
    """predicates.py:1311 — point-in-geometry from raw coordinates.

    Vectorized over (x, y); uses the batch ray-casting kernel for
    polygons (the auto-prepare semantics of predicates.py:1361-1363 are
    inherent here: the ring arrays *are* the prepared form).
    """
    if y is None:
        xy = np.asarray(x, dtype=np.float64)
        x, y = xy[..., 0], xy[..., 1]
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    scalar = x.shape == (1,) and np.isscalar(geom) is False
    if geom is None:
        out = np.zeros(np.broadcast(x, y).shape, dtype=bool)
        return bool(out[0]) if out.shape == (1,) else out
    polys = geom.polygon_parts()
    if polys and not geom.line_parts() and not len(geom.point_parts()):
        out = np.zeros(len(x), dtype=bool)
        for rings in polys:
            out |= core.points_in_rings(x, y, rings) == 2
        return bool(out[0]) if len(out) == 1 else out
    res = np.array([R.contains(geom, Geom.point(xi, yi)) for xi, yi in zip(x, y)])
    return bool(res[0]) if len(res) == 1 else res


def intersects_xy(geom, x, y=None):
    """predicates.py:1367 — like contains_xy but boundary counts."""
    if y is None:
        xy = np.asarray(x, dtype=np.float64)
        x, y = xy[..., 0], xy[..., 1]
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    if geom is None:
        out = np.zeros(np.broadcast(x, y).shape, dtype=bool)
        return bool(out[0]) if out.shape == (1,) else out
    polys = geom.polygon_parts()
    if polys and not geom.line_parts() and not len(geom.point_parts()):
        out = np.zeros(len(x), dtype=bool)
        for rings in polys:
            out |= core.points_in_rings(x, y, rings) > 0
        return bool(out[0]) if len(out) == 1 else out
    res = np.array([R.intersects(geom, Geom.point(xi, yi)) for xi, yi in zip(x, y)])
    return bool(res[0]) if len(res) == 1 else res
