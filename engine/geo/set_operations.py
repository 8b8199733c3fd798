"""Set operations (reference shapely/set_operations.py, 760 LoC).

Round-1 scope (documented; SURVEY.md §2.5): the north star needs tile
clip paths, point/line set semantics, and the n-ary reduce plumbing —
NOT a full general polygon-overlay engine.  Implemented exactly:

- point/multipoint × anything: intersection/difference/union via the
  exact predicate family (point-set semantics are fully decidable);
- polygon ∩ axis-aligned box (the tiling path — Sutherland–Hodgman via
  constructive.clip_by_rect);
- polygon ∩ CONVEX polygon (Sutherland–Hodgman general form);
- union/union_all for points and disjoint polygons (collection
  semantics; coverage_union_all for non-overlapping tile mosaics);
- n-ary reduce plumbing: *_all over arrays (ufuncs.c:63-130
  Y_Y_reduce_func equivalent) with the reference's empty-input rule
  (union_all([]) → GEOMETRYCOLLECTION EMPTY, set_operations.py:525-530).

General concave-polygon overlay raises NotImplementedError with this
rationale in the message.
"""

from __future__ import annotations

import numpy as np

from engine.geo import core, predicates
from engine.geo.constructive import _hull_of_points
from engine.geo.geom import Geom, GeomType


def _is_convex(ring: np.ndarray) -> bool:
    p = ring[:-1]
    n = len(p)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        o = core.orient(*p[i], *p[(i + 1) % n], *p[(i + 2) % n])
        if o != 0:
            s = 1 if o > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def _clip_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: subject ring clipped by CONVEX clip ring."""
    clip = clip_ring[:-1]
    if core.ring_signed_area(clip_ring) < 0:
        clip = clip[::-1]
    pts = list(subject[:-1])
    n = len(clip)
    for i in range(n):
        if not pts:
            break
        a, b = clip[i], clip[(i + 1) % n]
        out = []
        m = len(pts)
        for k in range(m):
            cur, nxt = pts[k], pts[(k + 1) % m]
            ci = core.orient(a[0], a[1], b[0], b[1], cur[0], cur[1]) >= 0
            ni = core.orient(a[0], a[1], b[0], b[1], nxt[0], nxt[1]) >= 0
            if ci:
                out.append(cur)
            if ci != ni:
                d1 = core.orient(a[0], a[1], b[0], b[1], cur[0], cur[1])
                d2 = core.orient(a[0], a[1], b[0], b[1], nxt[0], nxt[1])
                t = d1 / (d1 - d2)
                out.append(cur + t * (nxt - cur))
        pts = out
    if len(pts) < 3:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def _point_parts(g: Geom) -> np.ndarray:
    from engine.geo.relate import Decomp

    return Decomp(g).pts


def _points_geom(pts: np.ndarray) -> Geom:
    if len(pts) == 0:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if len(pts) == 1:
        return Geom.point(pts[0, 0], pts[0, 1])
    return Geom(GeomType.MULTIPOINT, parts=[Geom.point(x, y) for x, y in pts])


def _binary(fn):
    def wrapped(a, b, grid_size=None, **kw):
        arr_a = isinstance(a, (list, tuple, np.ndarray))
        arr_b = isinstance(b, (list, tuple, np.ndarray))
        if not arr_a and not arr_b:
            return fn(a, b)
        aa = a if arr_a else [a] * len(b)
        bb = b if arr_b else [b] * len(a)
        return np.array([fn(x, y) for x, y in zip(aa, bb)], dtype=object)

    return wrapped


@_binary
def intersection(a, b):
    """set_operations.py:114 — exact for point inputs, box/convex
    polygon clips; NotImplementedError otherwise."""
    if a is None or b is None:
        return None
    if a.is_empty or b.is_empty:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    ta, tb = a.type_id, b.type_id
    point_types = (GeomType.POINT, GeomType.MULTIPOINT)
    if ta in point_types or tb in point_types:
        pt_side, other = (a, b) if ta in point_types else (b, a)
        pts = _point_parts(pt_side)
        keep = [p for p in pts if predicates.intersects(Geom.point(*p), other)]
        return _points_geom(np.array(keep).reshape(-1, 2))
    if ta == GeomType.POLYGON and tb == GeomType.POLYGON:
        ra, rb = a.rings, b.rings
        if len(rb) == 1 and _is_convex(rb[0]):
            out = _clip_convex(ra[0], rb[0])
            if len(out) == 0:
                return Geom.empty(GeomType.POLYGON)
            holes = [h for h in (_clip_convex(r, rb[0]) for r in ra[1:]) if len(h)]
            return Geom(GeomType.POLYGON, rings=[out] + holes)
        if len(ra) == 1 and _is_convex(ra[0]):
            return intersection(b, a)
    raise NotImplementedError(
        "general concave polygon overlay is out of round-1 scope "
        "(tiling uses clip_by_rect / convex clips)"
    )


@_binary
def difference(a, b):
    """set_operations.py:41 — exact for point LHS (and disjoint pairs)."""
    if a is None or b is None:
        return None
    if a.is_empty:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if b is None or b.is_empty:
        return a
    if a.type_id in (GeomType.POINT, GeomType.MULTIPOINT):
        pts = _point_parts(a)
        keep = [p for p in pts if not predicates.intersects(Geom.point(*p), b)]
        return _points_geom(np.array(keep).reshape(-1, 2))
    if predicates.disjoint(a, b):
        return a
    raise NotImplementedError("difference beyond point/disjoint inputs (round-1 scope)")


@_binary
def union(a, b):
    """set_operations.py:395 — point unions exact; disjoint/touching
    polygons → multipolygon; overlapping concave overlay unsupported."""
    if a is None or b is None:
        return None
    if a.is_empty:
        return b
    if b.is_empty:
        return a
    pt = (GeomType.POINT, GeomType.MULTIPOINT)
    if a.type_id in pt and b.type_id in pt:
        pts = np.vstack([_point_parts(a), _point_parts(b)])
        uniq = np.unique(pts, axis=0)
        return _points_geom(uniq)
    poly = (GeomType.POLYGON, GeomType.MULTIPOLYGON)
    if a.type_id in poly and b.type_id in poly:
        if not predicates.overlaps(a, b) and not predicates.contains(a, b) and not predicates.contains(b, a):
            parts = (a.parts or [a]) + (b.parts or [b])
            return Geom(GeomType.MULTIPOLYGON, parts=parts)
        if predicates.covers(a, b):
            return a
        if predicates.covers(b, a):
            return b
    raise NotImplementedError("union of overlapping areal geometries (round-1 scope)")


def _reduce_all(fn, geometries, axis=None):
    gs = [g for g in geometries if g is not None]
    if not gs:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    acc = gs[0]
    for g in gs[1:]:
        acc = fn(acc, g)
    return acc


def union_all(geometries, grid_size=None, axis=None):
    """set_operations.py:465 — ignores None; empty input →
    GEOMETRYCOLLECTION EMPTY (:525-530)."""
    return _reduce_all(union, geometries)


unary_union = union_all


def intersection_all(geometries, axis=None):
    """set_operations.py:182."""
    return _reduce_all(intersection, geometries)


def symmetric_difference(a, b, grid_size=None):
    """set_operations.py:247 — exact for point pairs."""
    if a is None or b is None:
        return None
    pt = (GeomType.POINT, GeomType.MULTIPOINT)
    if a.type_id in pt and b.type_id in pt:
        pa = {tuple(p) for p in _point_parts(a)}
        pb = {tuple(p) for p in _point_parts(b)}
        sym = sorted(pa ^ pb)
        return _points_geom(np.array(sym).reshape(-1, 2))
    if predicates.disjoint(a, b):
        return union(a, b)
    raise NotImplementedError("symmetric_difference beyond points (round-1 scope)")


def symmetric_difference_all(geometries, axis=None):
    return _reduce_all(symmetric_difference, geometries)


def coverage_union(a, b):
    """set_operations.py:560 — fast union ASSUMING non-overlap: ring
    concatenation, no topology (the per-cell tile-mosaic path)."""
    if a is None or b is None:
        return None
    parts = (a.parts or ([] if a.is_empty else [a])) + (b.parts or ([] if b.is_empty else [b]))
    if not parts:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if all(p.type_id == GeomType.POLYGON for p in parts):
        return Geom(GeomType.MULTIPOLYGON, parts=parts)
    return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)


def coverage_union_all(geometries, axis=None):
    return _reduce_all(coverage_union, geometries)


def disjoint_subset_union(a, b):
    """set_operations.py:675 — optimized union for disjoint subsets; we
    dispatch to union (which already shortcuts disjoint inputs)."""
    return union(a, b)


def disjoint_subset_union_all(geometries, axis=None):
    return _reduce_all(disjoint_subset_union, geometries)
