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
from engine.geo.errors import GEOSException
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


def _geomlike(g) -> bool:
    return g is None or isinstance(g, Geom)


def _type_error(value):
    return TypeError(
        "One of the arguments is of incorrect type. "
        f"Provided value: {value!r}"
    )


def _box(res, out, dtype):
    """Ufunc-style scalar return (reference predicates are np ufuncs:
    scalars come back as numpy scalars, and ``out=`` writes in place)."""
    if out is not None:
        out[...] = res
        return out
    if dtype is bool:
        return np.bool_(res)
    return res


def _objarr(x, is_scalar):
    if is_scalar:
        a = np.empty((), dtype=object)
        a[()] = x
        return a
    return np.asarray(x, dtype=object)


def _apply1(fn, geometry, dtype=bool, out=None, check=True):
    if _geomlike(geometry) or not isinstance(geometry, (list, tuple, np.ndarray)):
        if check and not _geomlike(geometry):
            raise _type_error(geometry)
        return _box(fn(geometry), out, dtype)
    arr = np.asarray(geometry, dtype=object)
    res = np.empty(arr.shape, dtype=dtype)
    for idx in np.ndindex(arr.shape):
        g = arr[idx]
        if check and not _geomlike(g):
            raise _type_error(g)
        res[idx] = fn(g)
    if out is not None:
        out[...] = res
        return out
    return res


def _apply2(fn, a, b, dtype=bool, out=None, check=True):
    a_scalar = _geomlike(a) or not isinstance(a, (list, tuple, np.ndarray))
    b_scalar = _geomlike(b) or not isinstance(b, (list, tuple, np.ndarray))
    if a_scalar and b_scalar:
        if check and not (_geomlike(a) and _geomlike(b)):
            raise _type_error(a if not _geomlike(a) else b)
        return _box(fn(a, b), out, dtype)
    aa, bb = np.broadcast_arrays(_objarr(a, a_scalar), _objarr(b, b_scalar))
    res = np.empty(aa.shape, dtype=dtype)
    for idx in np.ndindex(aa.shape):
        x, y = aa[idx], bb[idx]
        if check and not (_geomlike(x) and _geomlike(y)):
            raise _type_error(x if not _geomlike(x) else y)
        res[idx] = fn(x, y)
    if out is not None:
        out[...] = res
        return out
    return res


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


def _ring_pair_touches(ri: np.ndarray, rj: np.ndarray):
    """Classify how two SIMPLE rings interact (the JTS IsValidOp rule):
    returns None if they properly cross or share a collinear overlap of
    positive length (always invalid), else the set of DISTINCT touch
    points (possibly empty).  A single point touch is valid OGC (a hole
    may touch its shell / another hole at one point); two or more touch
    points between one pair disconnect the interior."""
    si = np.hstack([ri[:-1], ri[1:]])
    sj = np.hstack([rj[:-1], rj[1:]])
    ax, ay, bx, by = (si[:, None, 0], si[:, None, 1],
                      si[:, None, 2], si[:, None, 3])
    cx, cy, dx, dy = (sj[None, :, 0], sj[None, :, 1],
                      sj[None, :, 2], sj[None, :, 3])
    d1 = core.orient(cx, cy, dx, dy, ax, ay)
    d2 = core.orient(cx, cy, dx, dy, bx, by)
    d3 = core.orient(ax, ay, bx, by, cx, cy)
    d4 = core.orient(ax, ay, bx, by, dx, dy)
    proper = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
              & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0))
    if proper.any():
        return None
    t1 = (d1 == 0) & core.on_segment(ax, ay, cx, cy, dx, dy, 0.0)
    t2 = (d2 == 0) & core.on_segment(bx, by, cx, cy, dx, dy, 0.0)
    t3 = (d3 == 0) & core.on_segment(cx, cy, ax, ay, bx, by, 0.0)
    t4 = (d4 == 0) & core.on_segment(dx, dy, ax, ay, bx, by, 0.0)
    # all four endpoints collinear + both of one segment's endpoints on
    # the other (or one endpoint of each inside the other) = overlap of
    # positive length UNLESS the shared stretch is a single point —
    # single-point cases have exactly one shared coordinate, so counting
    # distinct touch coordinates below covers them; flag genuine overlap
    colin = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    if colin.any():
        ii, jj = np.nonzero(colin)
        for k in range(len(ii)):
            a = si[ii[k], :2]; b = si[ii[k], 2:]
            c = sj[jj[k], :2]; d = sj[jj[k], 2:]
            # 1-D overlap length along the dominant axis
            axs = 0 if abs(b[0] - a[0]) >= abs(b[1] - a[1]) else 1
            lo = max(min(a[axs], b[axs]), min(c[axs], d[axs]))
            hi = min(max(a[axs], b[axs]), max(c[axs], d[axs]))
            if hi > lo:
                return None
    pts = set()
    for flag, px, py in ((t1, ax, ay), (t2, bx, by), (t3, cx, cy),
                         (t4, dx, dy)):
        if flag.any():
            m = np.broadcast_arrays(flag, px, py)
            pts.update(zip(m[1][flag].tolist(), m[2][flag].tolist()))
    return pts


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
        # holes must not nest inside each other (JTS 'holes are nested'):
        # a hole disjoint from another but with a vertex strictly inside
        # it is contained (crossings are excluded by the pair check below)
        for i in range(1, len(rings)):
            for j in range(1, len(rings)):
                if i != j and np.any(core.points_in_rings(
                        rings[i][:, 0], rings[i][:, 1], [rings[j]]) == 2):
                    return False
        # ring pairs: no proper crossing / collinear overlap; at most ONE
        # touch point per pair; interior stays connected iff the
        # bipartite ring↔touch-point incidence graph is ACYCLIC (rings
        # all meeting at one shared point form a star — valid; a cycle
        # through ≥2 distinct points encloses area — the JTS
        # connected-interior rule)
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        incidences = set()
        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                pts = _ring_pair_touches(rings[i], rings[j])
                if pts is None or len(pts) > 1:
                    return False
                for p in pts:
                    incidences.add((i, p))
                    incidences.add((j, p))
        for i, p in incidences:  # each distinct incidence is ONE edge
            a, b = find(("r", i)), find(("p", p))
            if a == b:
                return False  # cycle ⇒ disconnected interior
            parent[a] = b
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
    if t in (GeomType.GEOMETRYCOLLECTION, GeomType.MULTILINESTRING):
        return all(_is_valid(p) for p in g.parts)
    if t in _LINEAR:
        # GEOS: a line needs >= 2 DISTINCT points (zero-length lines and
        # single-vertex lines are invalid).
        xy = g.xys[:, :2]
        return len(xy) > 1 and bool((xy != xy[0]).any())
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
    if g.type_id in _LINEAR or g.type_id == GeomType.MULTILINESTRING:
        return "Too few points in geometry component"
    return "Invalid Geometry"


def is_ccw(geometry, out=None):
    return _apply1(_is_ccw, geometry, out=out)


def is_closed(geometry, out=None):
    return _apply1(_is_closed, geometry, out=out)


def is_empty(geometry, out=None):
    return _apply1(lambda g: g is not None and g.is_empty, geometry, out=out)


def is_geometry(geometry, out=None):
    return _apply1(lambda g: isinstance(g, Geom), geometry, out=out, check=False)


def is_missing(geometry, out=None):
    return _apply1(lambda g: g is None, geometry, out=out, check=False)


def is_valid_input(geometry, out=None):
    return _apply1(_geomlike, geometry, out=out, check=False)


def is_prepared(geometry, out=None):
    return _apply1(
        lambda g: g is not None and getattr(g, "_prepared", False),
        geometry, out=out,
    )


def is_ring(geometry, out=None):
    return _apply1(_is_ring, geometry, out=out)


def is_simple(geometry, out=None):
    return _apply1(_is_simple, geometry, out=out)


def is_valid(geometry, out=None):
    return _apply1(_is_valid, geometry, out=out)


def is_valid_reason(geometry, out=None):
    return _apply1(_is_valid_reason, geometry, dtype=object, out=out)


def prepare(geometry, out=None):
    """creation.py:735 — in our engine preparation is an actor-side
    acceleration structure (engine.geo.prepared); on scalars it is a
    flag kept for API parity.  Returns True where a geometry was newly
    prepared, False for missing/already-prepared (reference contract)."""

    def _prep(g):
        if g is None or getattr(g, "_prepared", False):
            return False
        g._prepared = True
        return True

    return _apply1(_prep, geometry, out=out)


def destroy_prepared(geometry, out=None):
    def _unprep(g):
        if g is None or not getattr(g, "_prepared", False):
            return False
        g._prepared = False
        return True

    return _apply1(_unprep, geometry, out=out)


# ---------------------------------------------------------------- binary
def crosses(a, b, out=None):
    return _apply2(R.crosses, a, b, out=out)


def contains(a, b, out=None):
    return _apply2(R.contains, a, b, out=out)


def contains_properly(a, b, out=None):
    return _apply2(R.contains_properly, a, b, out=out)


def covered_by(a, b, out=None):
    return _apply2(R.covered_by, a, b, out=out)


def covers(a, b, out=None):
    return _apply2(R.covers, a, b, out=out)


def disjoint(a, b, out=None):
    return _apply2(R.disjoint, a, b, out=out)


def equals(a, b, out=None):
    return _apply2(R.equals, a, b, out=out)


def intersects(a, b, out=None):
    return _apply2(R.intersects, a, b, out=out)


def overlaps(a, b, out=None):
    return _apply2(R.overlaps, a, b, out=out)


def touches(a, b, out=None):
    return _apply2(R.touches, a, b, out=out)


def within(a, b, out=None):
    return _apply2(R.within, a, b, out=out)


def relate(a, b, out=None):
    return _apply2(R.relate, a, b, dtype=object, out=out)


def relate_pattern(a, b, pattern, out=None):
    """predicates.py:~600 — pattern must be a scalar 9-char DE-9IM
    string (TypeError / ValueError / GEOSException parity with the
    reference's C argument checks)."""
    if isinstance(pattern, (list, tuple, np.ndarray)):
        raise ValueError("only supports scalar pattern values")
    if not isinstance(pattern, str):
        raise TypeError(f"expected string, got {pattern!r}")
    if len(pattern) != 9:
        raise GEOSException(
            f'IllegalArgumentException: Should be length 9, is "{pattern}" '
            f"instead"
        )
    return _apply2(lambda x, y: R.relate_pattern(x, y, pattern), a, b, out=out)


def _dwithin_one(x, y, d: float) -> bool:
    if np.isnan(d):
        return False
    return R.dwithin(x, y, d)


def dwithin(a, b, distance, out=None):
    d_scalar = np.isscalar(distance)
    if d_scalar:
        return _apply2(
            lambda x, y: _dwithin_one(x, y, float(distance)), a, b, out=out
        )
    a_scalar = _geomlike(a) or not isinstance(a, (list, tuple, np.ndarray))
    b_scalar = _geomlike(b) or not isinstance(b, (list, tuple, np.ndarray))
    dd = np.asarray(distance, dtype=np.float64)
    aa, bb, dd = np.broadcast_arrays(
        _objarr(a, a_scalar), _objarr(b, b_scalar), dd
    )
    res = np.empty(aa.shape, dtype=bool)
    for idx in np.ndindex(aa.shape):
        x, y = aa[idx], bb[idx]
        if not (_geomlike(x) and _geomlike(y)):
            raise _type_error(x if not _geomlike(x) else y)
        res[idx] = _dwithin_one(x, y, float(dd[idx]))
    if out is not None:
        out[...] = res
        return out
    return res


def distance(a, b, out=None):
    return _apply2(R.distance, a, b, dtype=np.float64, out=out)


def _arr_close(pa: np.ndarray, pb: np.ndarray, tol: float, xy_only: bool,
               equal_nan: bool) -> bool:
    if xy_only:
        pa, pb = pa[:, :2], pb[:, :2]
    if pa.shape != pb.shape:
        return False
    return bool(
        np.allclose(pa, pb, rtol=0, atol=tol, equal_nan=equal_nan)
    )


def _coords_equal_exact(a: Geom, b: Geom, tol: float, xy_only: bool = True,
                        equal_nan: bool = False) -> bool:
    if a.type_id != b.type_id:
        return False
    if a.type_id == GeomType.POLYGON:
        if len(a.rings) != len(b.rings):
            return False
        return all(
            _arr_close(ra, rb, tol, xy_only, equal_nan)
            for ra, rb in zip(a.rings, b.rings)
        )
    if a.parts or b.parts:
        if len(a.parts) != len(b.parts):
            return False
        return all(
            _coords_equal_exact(pa, pb, tol, xy_only, equal_nan)
            for pa, pb in zip(a.parts, b.parts)
        )
    return _arr_close(a.xys, b.xys, tol, xy_only, equal_nan)


def equals_exact(a, b, tolerance=0.0, normalize=False, out=None):
    """predicates.py:1081 — structural XY equality within tolerance
    (ignores Z/M; NaN != NaN; ``normalize=True`` canonicalizes both
    sides first, predicates.py:1104)."""
    if normalize:
        from engine.geo.constructive import normalize as _norm

        a = _apply1(lambda g: None if g is None else _norm(g), a,
                    dtype=object, check=False)
        b = _apply1(lambda g: None if g is None else _norm(g), b,
                    dtype=object, check=False)

    def one(x, y, tol):
        if x is None or y is None or np.isnan(tol):
            return False
        return _coords_equal_exact(x, y, tol)

    if np.isscalar(tolerance):
        return _apply2(
            lambda x, y: one(x, y, float(tolerance)), a, b, out=out
        )
    a_scalar = _geomlike(a) or not isinstance(a, (list, tuple, np.ndarray))
    b_scalar = _geomlike(b) or not isinstance(b, (list, tuple, np.ndarray))
    tt = np.asarray(tolerance, dtype=np.float64)
    aa, bb, tt = np.broadcast_arrays(
        _objarr(a, a_scalar), _objarr(b, b_scalar), tt
    )
    res = np.empty(aa.shape, dtype=bool)
    for idx in np.ndindex(aa.shape):
        x, y = aa[idx], bb[idx]
        if not (_geomlike(x) and _geomlike(y)):
            raise _type_error(x if not _geomlike(x) else y)
        res[idx] = one(x, y, float(tt[idx]))
    if out is not None:
        out[...] = res
        return out
    return res


def equals_identical(a, b, out=None):
    """predicates.py:1149 — pointwise identical: same type, same Z/M
    presence, all coordinate dimensions equal with NaN == NaN."""
    return _apply2(
        lambda x, y: (
            False
            if x is None or y is None
            else (
                x.has_z == y.has_z and x.has_m == y.has_m
                and _coords_equal_exact(x, y, 0.0, xy_only=False,
                                        equal_nan=True)
            )
        ),
        a,
        b,
        out=out,
    )


# ------------------------------------------------- xy fast predicates
def _xy_one(geom, x: np.ndarray, y: np.ndarray, boundary: bool) -> np.ndarray:
    """Bool mask for ONE geometry over 1-D coordinate arrays — the
    vectorized batch kernel (ray casting over all rings at once)."""
    if geom is None:
        return np.zeros(len(x), dtype=bool)
    polys = geom.polygon_parts()
    if polys and not geom.line_parts() and not len(geom.point_parts()):
        res = np.zeros(len(x), dtype=bool)
        for rings in polys:
            loc = core.points_in_rings(x, y, rings)
            res |= loc > 0 if boundary else loc == 2
        res &= ~(np.isnan(x) | np.isnan(y))
        return res
    pred = R.intersects if boundary else R.contains
    return np.array([
        False if (np.isnan(xi) or np.isnan(yi))
        else pred(geom, Geom.point(xi, yi))
        for xi, yi in zip(x, y)
    ], dtype=bool)


def _xy_apply(geom, x, y, boundary: bool, out=None):
    if y is None:
        xy = np.asarray(x, dtype=np.float64)
        x, y = xy[..., 0], xy[..., 1]
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    g_scalar = _geomlike(geom)
    if not g_scalar and not isinstance(geom, (list, tuple, np.ndarray)):
        raise _type_error(geom)
    if g_scalar:
        scalar = x.ndim == 0 and y.ndim == 0
        xb, yb = np.broadcast_arrays(np.atleast_1d(x), np.atleast_1d(y))
        res = _xy_one(geom, xb.ravel(), yb.ravel(), boundary).reshape(xb.shape)
        if scalar:
            return _box(bool(res[0]), out, bool)
        if out is not None:
            out[...] = res
            return out
        return res
    # geometry array: broadcast geoms against coords, per-element kernel
    gg, xb, yb = np.broadcast_arrays(np.asarray(geom, dtype=object), x, y)
    res = np.empty(gg.shape, dtype=bool)
    for idx in np.ndindex(gg.shape):
        g = gg[idx]
        if not _geomlike(g):
            raise _type_error(g)
        res[idx] = _xy_one(
            g, np.atleast_1d(xb[idx]), np.atleast_1d(yb[idx]), boundary
        )[0]
    if out is not None:
        out[...] = res
        return out
    return res


def contains_xy(geom, x, y=None, out=None):
    """predicates.py:1311 — point-in-geometry from raw coordinates.

    Vectorized over (x, y); uses the batch ray-casting kernel for
    polygons (the auto-prepare semantics of predicates.py:1361-1363 are
    inherent here: the ring arrays *are* the prepared form).  Also
    broadcasts over arrays of geometries (ufunc parity).
    """
    return _xy_apply(geom, x, y, boundary=False, out=out)


def intersects_xy(geom, x, y=None, out=None):
    """predicates.py:1367 — like contains_xy but boundary counts."""
    return _xy_apply(geom, x, y, boundary=True, out=out)
