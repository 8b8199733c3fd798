"""Constructive operations (reference shapely/constructive.py, 1579 LoC).

North-star-load-bearing subset implemented exactly (SURVEY.md §2.10):
envelope:593, centroid:347, clip_by_rect:380 (Sutherland–Hodgman per
ring), convex_hull:467 (monotone chain), simplify:1118
(Douglas–Peucker), boundary:92, point_on_surface:822, reverse:1035,
normalize:794, orient_polygons:1529, extract_unique_points:621,
remove_repeated_points:1003, segmentize:1070, oriented_envelope:1344
(rotating calipers), minimum_bounding_circle:1398 (Welzl),
minimum_rotated_rectangle alias, buffer:142 (positive round-join for
all input types via edge-rect + vertex-disc unions over the general
overlay; negative/erosion for areal inputs via polygon − boundary
band), offset_curve:272 (segment offset, round joins, inward trim).
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo.decorators import deprecate_positional
from engine.geo.geom import Geom, GeomType


def _apply1(fn, geometry):
    if isinstance(geometry, Geom) or geometry is None:
        return fn(geometry)
    return np.array([fn(g) for g in geometry], dtype=object)


# ----------------------------------------------------------------- envelope
def envelope(geometry):
    """constructive.py:593 — bbox polygon (point/line degenerate cases
    return the geometry's own envelope type like GEOS: point → point)."""

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return g
        b = g.bounds
        if b[0] == b[2] and b[1] == b[3]:
            return Geom.point(b[0], b[1])
        if b[0] == b[2] or b[1] == b[3]:
            return Geom.linestring(np.array([[b[0], b[1]], [b[2], b[3]]]))
        # min-corner-first CCW ring, matching GEOS envelope output order
        ring = np.array(
            [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]], [b[0], b[1]]]
        )
        return Geom(GeomType.POLYGON, rings=[ring])

    return _apply1(one, geometry)


def centroid(geometry):
    """constructive.py:347 — dimension-weighted centroid."""

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.POINT)
        c = g.centroid
        return c

    return _apply1(one, geometry)


def boundary(geometry):
    """constructive.py:92 — point → GEOMETRYCOLLECTION EMPTY; line →
    multipoint of mod-2 endpoints; polygon → (multi)linestring rings."""
    from engine.geo.relate import Decomp

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t in (GeomType.POINT, GeomType.MULTIPOINT):
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        d = Decomp(g)
        if t in (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING):
            pts = d.line_bpts
            if len(pts) == 0:
                return Geom.empty(GeomType.MULTIPOINT)
            if len(pts) == 1:
                return Geom.point(pts[0, 0], pts[0, 1])
            return Geom(
                GeomType.MULTIPOINT, parts=[Geom.point(x, y) for x, y in pts]
            )
        rings = [r for rr in d.polys for r in rr]
        if not rings:
            return Geom.empty(GeomType.MULTILINESTRING)
        if len(rings) == 1:
            return Geom.linestring(rings[0])
        return Geom(
            GeomType.MULTILINESTRING, parts=[Geom.linestring(r) for r in rings]
        )

    return _apply1(one, geometry)


# -------------------------------------------------------------- convex hull
def _hull_of_points(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull vertices (no repeat)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and core.orient(
                out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(geometry):
    """constructive.py:467 — point for 1 vertex, linestring for 2
    collinear, else CCW polygon."""
    from engine.geo.relate import Decomp

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        vs = Decomp(g).vertices
        h = _hull_of_points(vs)
        if len(h) == 1:
            return Geom.point(h[0, 0], h[0, 1])
        if len(h) == 2:
            return Geom.linestring(h)
        return Geom.polygon(h)

    return _apply1(one, geometry)


# ------------------------------------------------------------ clip_by_rect
def _clip_ring_rect(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed ring against an axis rect."""
    poly = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(points, inside, intersect):
        out = []
        n = len(points)
        for i in range(n):
            cur, nxt = points[i], points[(i + 1) % n]
            ci, ni = inside(cur), inside(nxt)
            if ci:
                out.append(cur)
                if not ni:
                    out.append(intersect(cur, nxt))
            elif ni:
                out.append(intersect(cur, nxt))
        return out

    def x_int(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return np.array([x, a[1] + t * (b[1] - a[1])])

    def y_int(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return np.array([a[0] + t * (b[0] - a[0]), y])

    pts = list(poly)
    for inside, inter in (
        (lambda p: p[0] >= xmin, lambda a, b: x_int(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: x_int(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: y_int(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: y_int(a, b, ymax)),
    ):
        if not pts:
            break
        pts = clip_edge(pts, inside, inter)
    if len(pts) < 3:
        return np.empty((0, 2))
    arr = np.vstack([pts, pts[:1]])
    return arr


def _clip_line_rect(c: np.ndarray, xmin, ymin, xmax, ymax):
    """Liang–Barsky clip of a polyline to the rect.  Segments lying ON
    the rectangle boundary are dropped (GEOS clip_by_rect semantics);
    consecutive kept pieces are stitched back together."""
    runs = []
    cur = []
    for i in range(len(c) - 1):
        (x1, y1), (x2, y2) = c[i, :2], c[i + 1, :2]
        dx, dy = x2 - x1, y2 - y1
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in ((-dx, x1 - xmin), (dx, xmax - x1),
                     (-dy, y1 - ymin), (dy, ymax - y1)):
            if p == 0:
                if q < 0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0:
                if r > t1:
                    ok = False
                    break
                t0 = max(t0, r)
            else:
                if r < t0:
                    ok = False
                    break
                t1 = min(t1, r)
        if not ok or t1 <= t0:
            if cur:
                runs.append(cur)
                cur = []
            continue
        a = (x1 + t0 * dx, y1 + t0 * dy)
        b = (x1 + t1 * dx, y1 + t1 * dy)
        # drop pieces collinear with a boundary edge (clip is open)
        if (a[0] == b[0] and a[0] in (xmin, xmax)) or (
            a[1] == b[1] and a[1] in (ymin, ymax)
        ):
            if cur:
                runs.append(cur)
                cur = []
            continue
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if cur:
                runs.append(cur)
            cur = [a, b]
    if cur:
        runs.append(cur)
    return runs


def _canon_clip_ring(r: np.ndarray, want_ccw: bool) -> np.ndarray:
    """Rotate a clipped ring to its smallest vertex with the requested
    orientation (GEOS clip_by_rect emits canonical rings)."""
    body = r[:-1]
    k = int(np.lexsort((body[:, 1], body[:, 0]))[0])
    body = np.vstack([body[k:], body[:k]])
    ccw = core.ring_signed_area(np.vstack([body, body[:1]])) > 0
    if ccw != want_ccw:
        body = np.vstack([body[:1], body[1:][::-1]])
    return np.vstack([body, body[:1]])


def clip_by_rect(geometry, xmin, ymin, xmax, ymax):
    """constructive.py:380 — clip to the OPEN rectangle (GEOS
    GEOSClipByRect): boundary-only contact yields EMPTY; polygons that
    interact with the rect boundary go through the exact overlay and
    come back with canonical rings."""

    if not all(np.isscalar(v) for v in (xmin, ymin, xmax, ymax)):
        raise TypeError("xmin/ymin/xmax/ymax only accepts scalar values")

    def keep_pt(x, y):
        return xmin < x < xmax and ymin < y < ymax

    def lines_result(runs):
        if not runs:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        parts = [Geom.linestring(np.asarray(r, dtype=np.float64)) for r in runs]
        if len(parts) == 1:
            return parts[0]
        return Geom(GeomType.MULTILINESTRING, parts=parts)

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        t = g.type_id
        if t == GeomType.POINT:
            x, y = g.xys[0, :2]
            if keep_pt(x, y):
                return g
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        if t == GeomType.MULTIPOINT:
            kept = [p for p in g.parts
                    if not p.is_empty and keep_pt(*p.xys[0, :2])]
            if not kept:
                return Geom.empty(GeomType.GEOMETRYCOLLECTION)
            if len(kept) == 1:
                return kept[0]
            return Geom(GeomType.MULTIPOINT, parts=kept)
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            return lines_result(_clip_line_rect(g.xys, xmin, ymin, xmax, ymax))
        if t == GeomType.MULTILINESTRING:
            runs = []
            for p in g.parts:
                runs.extend(_clip_line_rect(p.xys, xmin, ymin, xmax, ymax))
            return lines_result(runs)
        if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
            b = g.bounds
            if xmin <= b[0] and b[2] <= xmax and ymin <= b[1] and b[3] <= ymax:
                return g  # fully inside: unchanged, like GEOS
            from engine.geo import set_operations as _so

            box = Geom.box(xmin, ymin, xmax, ymax)
            out = _so._polygon_overlay(g, box, lambda ia, ib: ia and ib)
            if out is None or out.is_empty:
                return Geom.empty(GeomType.GEOMETRYCOLLECTION)
            polys = [out] if out.type_id == GeomType.POLYGON else list(out.parts)
            # GEOS keeps the INPUT shell orientation in the clip output
            first = g.rings[0] if g.type_id == GeomType.POLYGON else g.parts[0].rings[0]
            shell_ccw = core.ring_signed_area(first) > 0
            canon = [
                Geom(GeomType.POLYGON,
                     rings=[_canon_clip_ring(r, shell_ccw if k == 0
                                             else not shell_ccw)
                            for k, r in enumerate(p.rings)])
                for p in polys
            ]
            if len(canon) == 1:
                return canon[0]
            return Geom(GeomType.MULTIPOLYGON, parts=canon)
        if t == GeomType.GEOMETRYCOLLECTION:
            parts = [one(p) for p in g.parts]
            parts = [p for p in parts if p is not None and not p.is_empty]
            if not parts:
                return Geom.empty(GeomType.GEOMETRYCOLLECTION)
            if len(parts) == 1:
                return parts[0]
            return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)
        raise NotImplementedError(f"clip_by_rect for {t}")

    return _apply1(one, geometry)


# ---------------------------------------------------------------- simplify
def _dp(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker on an open polyline."""
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[[i, j]]
        d2 = core.point_seg_dist2(
            coords[i + 1 : j, 0], coords[i + 1 : j, 1],
            seg[0, 0], seg[0, 1], seg[1, 0], seg[1, 1],
        )
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return coords[keep]


@deprecate_positional(["preserve_topology"])
def simplify(geometry, tolerance, preserve_topology: bool = True):
    """constructive.py:1118 — Douglas–Peucker; with preserve_topology we
    keep rings that would collapse (fallback to original ring) — the
    pragmatic subset of GEOS TopologyPreservingSimplifier."""

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if g.is_empty:
            return g
        if t == GeomType.POINT:
            return g
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            return Geom(t, xys=_dp(g.xys, tolerance))
        if t == GeomType.POLYGON:
            rings = []
            for i, r in enumerate(g.rings):
                s = _dp(r, tolerance)
                if len(s) < 4 or core.ring_signed_area(s) == 0:
                    if preserve_topology:
                        s = r
                    elif i == 0:
                        return Geom.empty(GeomType.POLYGON)
                    else:
                        continue
                rings.append(s)
            return Geom(GeomType.POLYGON, rings=rings)
        return Geom(t, parts=[one(p) for p in g.parts])

    return _apply1(one, geometry)


# ------------------------------------------------- orientation / canonical
def reverse(geometry):
    """constructive.py:1035 — reverse coordinate order everywhere."""

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            return Geom(t, xys=g.xys[::-1].copy())
        if t == GeomType.POLYGON:
            return Geom(t, rings=[r[::-1].copy() for r in g.rings])
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    return _apply1(one, geometry)


def orient_polygons(geometry, exterior_cw: bool = False):
    """constructive.py:1529 — shells CCW, holes CW (flip with the flag)."""

    def fix_ring(r, want_ccw):
        ccw = core.ring_signed_area(r) > 0
        return r if ccw == want_ccw else r[::-1].copy()

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t == GeomType.POLYGON:
            if not g.rings:
                return g
            rings = [fix_ring(g.rings[0], not exterior_cw)] + [
                fix_ring(r, exterior_cw) for r in g.rings[1:]
            ]
            return Geom(t, rings=rings)
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    return _apply1(one, geometry)


import enum as _enum


class BufferCapStyle(_enum.IntEnum):
    """constructive.py:53 — buffer cap style parameter enum."""

    round = 1
    flat = 2
    square = 3


class BufferJoinStyle(_enum.IntEnum):
    """constructive.py:72 — buffer join style parameter enum."""

    round = 1
    mitre = 2
    bevel = 3


_NORMALIZE_RANK = {
    GeomType.POINT: 0, GeomType.MULTIPOINT: 1, GeomType.LINESTRING: 2,
    GeomType.LINEARRING: 3, GeomType.MULTILINESTRING: 4,
    GeomType.POLYGON: 5, GeomType.MULTIPOLYGON: 6,
    GeomType.GEOMETRYCOLLECTION: 7,
}


def _normalize_sort_key(g):
    """JTS Geometry.compareTo key: type rank, then coordinate sequences
    (shell then holes for polygons; child keys for collections)."""
    t = g.type_id
    rank = _NORMALIZE_RANK[t]
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        return (rank, tuple(map(tuple, g.xys)))
    if t == GeomType.POLYGON:
        return (
            rank,
            tuple(map(tuple, g.rings[0])) if g.rings else (),
            tuple(tuple(map(tuple, r)) for r in g.rings[1:]),
        )
    return (rank, tuple(_normalize_sort_key(p) for p in g.parts))


def normalize(geometry):
    """constructive.py:794 — canonical form: GEOS convention (shells CW,
    holes CCW, rings start at min coord, multi-parts sorted descending)."""

    def canon_ring(r, want_ccw):
        r = r[:-1]
        # rotate to lexicographically smallest vertex
        start = int(np.lexsort((r[:, 1], r[:, 0]))[0])
        r = np.vstack([r[start:], r[:start]])
        ccw = core.ring_signed_area(np.vstack([r, r[:1]])) > 0
        if ccw != want_ccw:
            r = np.vstack([r[:1], r[1:][::-1]])
        return np.vstack([r, r[:1]])

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t == GeomType.POLYGON and not g.is_empty:
            rings = [canon_ring(g.rings[0], False)] + sorted(
                (canon_ring(r, True) for r in g.rings[1:]),
                key=lambda r: (r[0, 0], r[0, 1]),
            )
            return Geom(t, rings=rings)
        if g.parts:
            parts = [one(p) for p in g.parts]
            # GEOS collection normalize: components sorted DESCENDING by
            # the JTS compareTo order (type rank, then coord sequences)
            parts.sort(key=_normalize_sort_key, reverse=True)
            return Geom(t, parts=parts)
        if t in (GeomType.LINESTRING, GeomType.LINEARRING) and len(g.xys) > 1:
            # GEOS LineString::normalize — reverse so the smaller endpoint
            # (first differing coordinate pair from the two ends) is first
            c = g.xys
            n = len(c)
            for i in range(n // 2):
                a, b = tuple(c[i]), tuple(c[n - 1 - i])
                if a != b:
                    if a > b:
                        return Geom(t, xys=c[::-1].copy(),
                                    has_z=g.has_z, has_m=g.has_m)
                    break
            return g
        return g

    return _apply1(one, geometry)


# ----------------------------------------------------------- vertex editing
def extract_unique_points(geometry):
    """constructive.py:621 — multipoint of unique vertices in order."""
    from engine.geo.relate import Decomp

    def one(g):
        if g is None:
            return None
        vs = Decomp(g).vertices
        seen = set()
        out = []
        for x, y in vs:
            if (x, y) not in seen:
                seen.add((x, y))
                out.append(Geom.point(x, y))
        if not out:
            return Geom.empty(GeomType.MULTIPOINT)
        return Geom(GeomType.MULTIPOINT, parts=out)

    return _apply1(one, geometry)


def remove_repeated_points(geometry, tolerance: float = 0.0):
    """constructive.py:1003 — drop consecutive points within tolerance."""

    def dedupe(c, min_keep):
        if len(c) == 0:
            return c
        keep = [0]
        for i in range(1, len(c)):
            d = np.hypot(c[i, 0] - c[keep[-1], 0], c[i, 1] - c[keep[-1], 1])
            if d > tolerance:
                keep.append(i)
        out = c[keep]
        return out

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            out = dedupe(g.xys, 2)
            if len(out) == 1:
                out = np.vstack([out, out])
            return Geom(t, xys=out)
        if t == GeomType.POLYGON:
            from engine.geo.errors import GEOSException

            rings = []
            for r in g.rings:
                rr = dedupe(r[:-1], 3)
                closed = np.vstack([rr, rr[:1]])
                if 0 < len(closed) < 4:
                    raise GEOSException(
                        "IllegalArgumentException: Invalid number of "
                        f"points in LinearRing found {len(closed)} - "
                        "must be 0 or >= 4"
                    )
                rings.append(closed)
            return Geom(t, rings=rings)
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    return _apply1(one, geometry)


def segmentize(geometry, max_segment_length):
    """constructive.py:1070 — add vertices so no segment exceeds the
    given length; non-positive lengths raise (GEOS rule)."""
    if np.isscalar(max_segment_length) and not np.isnan(max_segment_length) \
            and float(max_segment_length) <= 0:
        from engine.geo.errors import GEOSException

        raise GEOSException(
            "IllegalArgumentException: segment length must be positive"
        )

    def seg_line(c):
        if len(c) < 2:
            return c
        out = [c[:1]]
        for i in range(len(c) - 1):
            a, b = c[i], c[i + 1]
            d = float(np.hypot(*(b - a)))
            n = max(1, int(np.ceil(d / max_segment_length)))
            ts = np.linspace(0, 1, n + 1)[1:]
            out.append(a + ts[:, None] * (b - a))
        return np.vstack(out)

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            return Geom(t, xys=seg_line(g.xys))
        if t == GeomType.POLYGON:
            return Geom(t, rings=[seg_line(r) for r in g.rings])
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    return _apply1(one, geometry)


def point_on_surface(geometry):
    """constructive.py:822 — a point guaranteed on the geometry."""

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.POINT)
        x, y = g._representative_xy()
        return Geom.point(x, y)

    return _apply1(one, geometry)


# --------------------------------------------- min circles / rotated rects
def _circle_from(pts):
    if len(pts) == 0:
        return (0.0, 0.0, 0.0)
    if len(pts) == 1:
        return (pts[0][0], pts[0][1], 0.0)
    if len(pts) == 2:
        cx = (pts[0][0] + pts[1][0]) / 2
        cy = (pts[0][1] + pts[1][1]) / 2
        r = np.hypot(pts[0][0] - cx, pts[0][1] - cy)
        return (cx, cy, r)
    (ax, ay), (bx, by), (cx_, cy_) = pts
    d = 2 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
    if d == 0:
        return _circle_from([pts[0], pts[1]])
    ux = ((ax**2 + ay**2) * (by - cy_) + (bx**2 + by**2) * (cy_ - ay) + (cx_**2 + cy_**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx_ - bx) + (bx**2 + by**2) * (ax - cx_) + (cx_**2 + cy_**2) * (bx - ax)) / d
    r = np.hypot(ax - ux, ay - uy)
    return (ux, uy, r)


def _welzl_circle(pts: np.ndarray):
    """Iterative Welzl (move-to-front) minimum enclosing circle."""
    P = [tuple(p) for p in np.unique(pts, axis=0)]
    import random

    rnd = random.Random(0)
    rnd.shuffle(P)
    c = (0.0, 0.0, -1.0)
    for i, p in enumerate(P):
        if c[2] >= 0 and np.hypot(p[0] - c[0], p[1] - c[1]) <= c[2] * (1 + 1e-12):
            continue
        c = (p[0], p[1], 0.0)
        for j in range(i):
            q = P[j]
            if np.hypot(q[0] - c[0], q[1] - c[1]) <= c[2] * (1 + 1e-12):
                continue
            c = _circle_from([p, q])
            for k in range(j):
                s = P[k]
                if np.hypot(s[0] - c[0], s[1] - c[1]) <= c[2] * (1 + 1e-12):
                    continue
                c = _circle_from([p, q, s])
    return c


def minimum_bounding_circle(geometry):
    """constructive.py:1398 — polygon approximating the min circle (we
    return an exact circle as a 64-gon, like GEOS's quadrant segments)."""
    from engine.geo.relate import Decomp

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.POLYGON)
        cx, cy, r = _welzl_circle(Decomp(g).vertices)
        if r == 0:
            return Geom.point(cx, cy)
        # GEOS returns center.buffer(radius) with default quad_segs — use
        # the same disc construction so the vertices agree exactly
        return buffer(Geom.point(cx, cy), r)

    return _apply1(one, geometry)


def oriented_envelope(geometry):
    """constructive.py:1344 — min-area rotated rectangle via rotating
    calipers over the convex hull (pure-Python reference algorithm:
    shapely/algorithms/_oriented_envelope.py:10-56)."""
    from engine.geo.relate import Decomp

    def one(g):
        if g is None:
            return None
        if g.is_empty:
            return Geom.empty(GeomType.POLYGON)
        h = _hull_of_points(Decomp(g).vertices)
        if len(h) <= 2:
            return Geom.point(h[0, 0], h[0, 1]) if len(h) == 1 else Geom.linestring(h)
        best = None
        for i in range(len(h)):
            a, b = h[i], h[(i + 1) % len(h)]
            d = b - a
            n = np.hypot(*d)
            if n == 0:
                continue
            ux, uy = d / n
            rot = np.array([[ux, uy], [-uy, ux]])
            pts = (h - a) @ rot.T
            xmin, ymin = pts.min(axis=0)
            xmax, ymax = pts.max(axis=0)
            area = (xmax - xmin) * (ymax - ymin)
            # GEOS ≥ 3.12 MinimumAreaRectangle updates on ties, so the
            # last tied hull edge (CCW scan) supplies the rectangle
            if best is None or area <= best[0] * (1 + 1e-12):
                best = (area, a, rot, xmin, ymin, xmax, ymax)
        _, a, rot, xmin, ymin, xmax, ymax = best
        corners = np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
        ring = corners @ rot + a
        return Geom(GeomType.POLYGON, rings=[ring])

    return _apply1(one, geometry)


minimum_rotated_rectangle = oriented_envelope


def _disc(x: float, y: float, distance: float, quad_segs: int) -> Geom:
    n = max(4, 4 * quad_segs)
    ang = np.linspace(0, 2 * np.pi, n + 1)
    ring = np.column_stack([x + distance * np.cos(ang), y + distance * np.sin(ang)])
    return Geom(GeomType.POLYGON, rings=[ring])


def _capsule(a: np.ndarray, b: np.ndarray, d: float, quad_segs: int) -> Geom:
    """Round-capped segment buffer: rectangle + two half-disc fans."""
    v = b - a
    L = float(np.hypot(*v))
    if L == 0:
        return _disc(a[0], a[1], d, quad_segs)
    u = v / L
    n = np.array([-u[1], u[0]])
    theta0 = np.arctan2(n[1], n[0])
    k = max(2, 2 * quad_segs)
    cap_b = [b + d * np.array([np.cos(t), np.sin(t)])
             for t in np.linspace(theta0, theta0 - np.pi, k + 1)]
    cap_a = [a + d * np.array([np.cos(t), np.sin(t)])
             for t in np.linspace(theta0 + np.pi, theta0, k + 1)]
    ring = np.vstack([[a + d * n], cap_b, cap_a[:-1], [a + d * n]])
    return Geom(GeomType.POLYGON, rings=[ring])


@deprecate_positional(["quad_segs", "join_style", "mitre_limit"])
def offset_curve(geometry, distance, quad_segs: int = 8, join_style="round",
                 mitre_limit: float = 5.0):
    """constructive.py:272 — parallel offset of a line: positive =
    left side, negative = right.  Per-segment offset with round joins at
    outward turns, span-clamped intersection-trim at inward turns, and
    GLOBAL self-intersection removal for tight hairpins (node the raw
    curve, drop pieces closer than |distance| to the input, merge).
    Non-lineal inputs follow GEOS ≥ 3.11: points/empties map to
    LINESTRING EMPTY, polygon boundaries are offset ring-wise, and
    collections flat-map per component.  ``distance`` broadcasts over a
    geometry array."""
    for _name, _val in (("quad_segs", quad_segs),
                        ("join_style", join_style),
                        ("mitre_limit", mitre_limit)):
        if not np.isscalar(_val):
            raise TypeError(f"{_name} only accepts scalar values")
    _style_name(join_style, _JOIN_NAMES, "round")

    if not (isinstance(geometry, Geom) or geometry is None) \
            and not np.isscalar(distance):
        dists = np.asarray(distance, dtype=float)
        geoms = np.asarray(geometry, dtype=object)
        db = np.broadcast_to(dists, geoms.shape)
        out = np.empty(geoms.shape, dtype=object)
        flat_g, flat_d, flat_o = geoms.ravel(), db.ravel(), out.ravel()
        for i in range(flat_g.size):
            flat_o[i] = offset_curve(
                flat_g[i], float(flat_d[i]), quad_segs=quad_segs,
                join_style=join_style, mitre_limit=mitre_limit)
        return out

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t not in (GeomType.LINESTRING, GeomType.LINEARRING):
            if t == GeomType.MULTILINESTRING:
                return Geom(t, parts=[one(p) for p in g.parts])
            if t == GeomType.POINT or g.is_empty:
                return Geom(GeomType.LINESTRING)
            if t == GeomType.POLYGON:
                curves = [one(Geom(GeomType.LINESTRING, xys=r.copy()))
                          for r in g.rings]
                curves = [c for c in curves if not c.is_empty]
                if not curves:
                    return Geom(GeomType.LINESTRING)
                if len(curves) == 1:
                    return curves[0]
                return Geom(GeomType.MULTILINESTRING, parts=curves)
            if t in (GeomType.MULTIPOLYGON, GeomType.MULTIPOINT,
                     GeomType.GEOMETRYCOLLECTION):
                curves = [one(p) for p in g.parts]
                curves = [c for c in curves if c is not None and not c.is_empty]
                if not curves:
                    return Geom(GeomType.LINESTRING)
                if len(curves) == 1:
                    return curves[0]
                return Geom(GeomType.GEOMETRYCOLLECTION, parts=curves)
            raise TypeError("offset_curve requires lineal input")
        c = g.xys
        if len(c) < 2 or distance == 0:
            return Geom(t, xys=c.copy())
        d = float(distance)
        side = 1.0 if d > 0 else -1.0
        ad = abs(d)
        join = _style_name(join_style, _JOIN_NAMES, "round")
        # per-segment unit normals (left of travel × side)
        v = np.diff(c, axis=0)
        L = np.hypot(v[:, 0], v[:, 1])
        keepseg = L > 0
        v, L = v[keepseg], L[keepseg]
        pts = np.vstack([c[:1], c[1:][keepseg]])
        closed = len(v) >= 2 and bool(np.all(pts[0] == pts[-1]))
        n = np.column_stack([-v[:, 1], v[:, 0]]) / L[:, None] * side

        def emit_join(i, j, vert, out):
            """Join between segment i and segment j at vertex vert."""
            e_prev = vert + ad * n[i]
            e_next = vert + ad * n[j]
            turn = core.orient(0, 0, v[i, 0], v[i, 1], v[j, 0], v[j, 1])
            outward = turn * side < 0  # turning away from the offset side
            if outward:
                den = v[i, 0] * v[j, 1] - v[i, 1] * v[j, 0]
                mitre = None
                if join in ("mitre", "bevel") and den != 0:
                    tpar = ((e_next - e_prev)
                            @ np.array([v[j, 1], -v[j, 0]])) / den
                    mitre = e_prev + tpar * v[i]
                if (join == "mitre" and mitre is not None
                        and np.hypot(*(mitre - vert)) <= mitre_limit * ad):
                    # GEOS mitre: the single intersection point REPLACES
                    # both offset endpoints
                    out.append(mitre)
                elif join in ("mitre", "bevel"):
                    out.append(e_prev)  # bevel / mitre-limit fallback
                    out.append(e_next)
                else:
                    # round join: arc from e_prev to e_next around vert
                    a0 = np.arctan2(n[i, 1], n[i, 0])
                    a1 = np.arctan2(n[j, 1], n[j, 0])
                    sweep = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
                    k = max(1, int(np.ceil(
                        abs(sweep) / (np.pi / (2 * quad_segs)))))
                    angs = a0 + sweep * np.linspace(0, 1, k + 1)
                    out.extend(vert + ad * np.column_stack(
                        [np.cos(angs), np.sin(angs)]))
            else:
                # inward turn: intersect the two offset lines (trim) —
                # but ONLY when the intersection stays within both
                # segments' spans; a near-reversal would otherwise shoot
                # a mitre spike to infinity.  Out-of-span corners emit
                # both raw endpoints; the resulting self-crossing is
                # cleaned by the global removal pass below.
                den = v[i, 0] * v[j, 1] - v[i, 1] * v[j, 0]
                trimmed = False
                if den != 0:
                    tpar = ((e_next - e_prev)
                            @ np.array([v[j, 1], -v[j, 0]])) / den
                    x = e_prev + tpar * v[i]
                    upar = ((x - e_next) @ v[j]) / (L[j] ** 2)
                    if -1.0 <= tpar <= 0.5 and -0.5 <= upar <= 1.0:
                        out.append(x)
                        trimmed = True
                if not trimmed:
                    out.append(e_prev)
                    out.append(e_next)

        out = []
        if closed:
            # ring offset (GEOS computeRingBufferCurve order): one join
            # per vertex starting at pts[0], then close
            for i in range(len(v)):
                emit_join((i - 1) % len(v), i, pts[i], out)
            out.append(out[0])
        else:
            out.append(pts[0] + ad * n[0])
            for i in range(len(v) - 1):
                emit_join(i, i + 1, pts[i + 1], out)
            out.append(pts[-1] + ad * n[-1])
        coords = np.vstack(out)
        keep = np.ones(len(coords), dtype=bool)
        keep[1:] = (np.abs(np.diff(coords, axis=0)) > 1e-15).any(axis=1)
        raw = Geom(GeomType.LINESTRING, xys=coords[keep])
        return _offset_remove_self_intersections(raw, g, ad)

    return _apply1(one, geometry)


def _offset_remove_self_intersections(raw: Geom, src: Geom, ad: float) -> Geom:
    """GLOBAL self-intersection removal (GEOS OffsetCurve semantics for
    tight hairpins): when the raw per-segment offset crosses itself, node
    it against itself and keep only the pieces that stay ≥ |distance|
    from the input line, then merge.  Simple outputs pass through."""
    from engine.geo import predicates

    if len(raw.xys) < 3 or predicates.is_simple(raw):
        return raw
    from engine.geo.linear import line_merge
    from engine.geo.linework import node
    from engine.geo.measure import distance as geo_distance

    noded = node(raw)
    tol = ad - 1e-9 * max(1.0, ad)
    kept = []
    for piece in noded.parts:
        if len(piece.xys) < 2:
            continue
        mid = piece.xys[len(piece.xys) // 2]
        if len(piece.xys) % 2 == 0:
            mid = 0.5 * (piece.xys[len(piece.xys) // 2 - 1]
                         + piece.xys[len(piece.xys) // 2])
        if geo_distance(Geom.point(mid[0], mid[1]), src) >= tol:
            kept.append(piece)
    if not kept:
        return Geom(GeomType.LINESTRING)
    merged = line_merge(Geom(GeomType.MULTILINESTRING, parts=kept))
    return merged


def _fillet_cw(cx, cy, a0, a1, r, quad_segs):
    """Interior points of a CLOCKWISE circular fillet from angle a0 to
    a1 around (cx, cy) — GEOS OffsetSegmentGenerator::addDirectedFillet
    (fillet quantum = pi/2 / quad_segs, endpoints NOT emitted)."""
    total = a0 - a1
    while total < 0:
        total += 2 * np.pi
    while total > 2 * np.pi:
        total -= 2 * np.pi
    quantum = (np.pi / 2) / quad_segs
    nsegs = int(total / quantum + 0.5)
    if nsegs < 1:
        return np.empty((0, 2))
    inc = total / nsegs
    ang = a0 - inc * np.arange(1, nsegs)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def _geos_point_fan(x, y, r, quad_segs):
    """GEOS createCircle: start at (x+r, y), clockwise full circle."""
    n = 4 * quad_segs
    ang = -(2 * np.pi / n) * np.arange(n)
    pts = np.column_stack([x + r * np.cos(ang), y + r * np.sin(ang)])
    return Geom(GeomType.POLYGON, rings=[np.vstack([pts, pts[:1]])])


def _geos_segment_capsule(p0, p1, r, quad_segs):
    """GEOS computeLineBufferCurve emission order for a 2-point line
    with round caps: left-offset end, round cap at p1, right side,
    round cap at p0, close."""
    d = p1 - p0
    L = float(np.hypot(*d))
    if L == 0:
        return _geos_point_fan(p0[0], p0[1], r, quad_segs)
    u = d / L
    left = np.array([-u[1], u[0]]) * r
    ang = float(np.arctan2(u[1], u[0]))
    pts = [p1 + left]
    pts.extend(_fillet_cw(p1[0], p1[1], ang + np.pi / 2, ang - np.pi / 2,
                          r, quad_segs))
    pts.append(p1 - left)
    pts.append(p0 - left)
    pts.extend(_fillet_cw(p0[0], p0[1], ang - np.pi / 2, ang - 3 * np.pi / 2,
                          r, quad_segs))
    pts.append(p0 + left)
    pts.append(p1 + left)
    return Geom(GeomType.POLYGON, rings=[np.asarray(pts, dtype=float)])


def _geos_convex_ring_buffer(g: Geom, r, quad_segs):
    """GEOS computeRingBufferCurve emission order for a CONVEX
    single-ring polygon (outside offset curve is provably simple).
    Returns None when the fast path does not apply."""
    if len(g.rings) != 1:
        return None
    ring = g.rings[0][:, :2]
    pts = ring[:-1]
    if len(pts) < 3:
        return None
    if core.ring_signed_area(ring) > 0:  # GEOS traverses shells CW,
        # keeping the original start vertex when reversing
        pts = np.vstack([pts[:1], pts[1:][::-1]])
    n = len(pts)
    nxt = np.roll(pts, -1, axis=0)
    prv = np.roll(pts, 1, axis=0)
    cross = (pts[:, 0] - prv[:, 0]) * (nxt[:, 1] - pts[:, 1]) - (
        pts[:, 1] - prv[:, 1]) * (nxt[:, 0] - pts[:, 0])
    if np.any(cross > 1e-12):  # inside turn → not convex → fall back
        return None
    segs = np.hstack([pts, nxt])  # seg i: pts[i] → pts[i+1 mod n]
    d = segs[:, 2:] - segs[:, :2]
    L = np.hypot(d[:, 0], d[:, 1])
    if np.any(L == 0):
        return None
    u = d / L[:, None]
    normal = np.column_stack([-u[:, 1], u[:, 0]]) * r  # left normal
    nang = np.arctan2(normal[:, 1], normal[:, 0])
    out = []
    # join at vertex pts[i] between seg i-1 and seg i; GEOS starts at
    # vertex pts[0] (initSideSegments on the closing seg) and skips the
    # incoming offset end only there (addStartPoint = i != 1)
    for i in range(n):
        jprev = (i - 1) % n
        if i != 0:
            out.append(pts[i] + normal[jprev])
        out.extend(_fillet_cw(pts[i][0], pts[i][1], nang[jprev], nang[i],
                              r, quad_segs))
        out.append(pts[i] + normal[i])
    out.append(pts[0] + normal[n - 1])  # addLastSegment: closing seg end
    out.append(out[0])
    return Geom(GeomType.POLYGON, rings=[np.asarray(out, dtype=float)])


def _buffer_positive(g: Geom, dist: float, quad_segs: int) -> Geom:
    from engine.geo.relate import Decomp
    from engine.geo.set_operations import union_all

    t = g.type_id
    if g.is_empty:
        return Geom.empty(GeomType.POLYGON)
    if t == GeomType.POINT:
        x, y = g.xys[0]
        return _geos_point_fan(x, y, dist, quad_segs)
    if t == GeomType.LINESTRING and len(g.xys) == 2:
        return _geos_segment_capsule(
            g.xys[0, :2].astype(float), g.xys[1, :2].astype(float),
            dist, quad_segs,
        )
    if t == GeomType.POLYGON:
        fast = _geos_convex_ring_buffer(g, dist, quad_segs)
        if fast is not None:
            return fast
    if t == GeomType.MULTIPOINT:
        return union_all([_disc(p.xys[0, 0], p.xys[0, 1], dist, quad_segs)
                          for p in g.parts])
    d = Decomp(g)
    # one rectangle per edge + ONE disc per distinct vertex: every
    # buffer circle appears exactly once, so the overlay never sees
    # two overlapping arcs of the same circle (degenerate noding);
    # adjacent capsules would (their corner arcs share circles).
    pieces = []
    for s in d.segs:
        a, b = s[:2], s[2:]
        v = b - a
        L = float(np.hypot(*v))
        if L == 0:
            continue
        n = np.array([-v[1], v[0]]) / L * dist
        ring = np.vstack([[a + n], [b + n], [b - n], [a - n], [a + n]])
        pieces.append(Geom(GeomType.POLYGON, rings=[ring]))
    for vx, vy in np.unique(d.vertices, axis=0):
        pieces.append(_disc(vx, vy, dist, quad_segs))
    if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        pieces = [p for p in ([g] if t == GeomType.POLYGON else list(g.parts))] + pieces
    return union_all(pieces)


_CAP_NAMES = {1: "round", 2: "flat", 3: "square"}
_JOIN_NAMES = {1: "round", 2: "mitre", 3: "bevel"}


def _style_name(style, table, default):
    if style is None:
        return default
    if isinstance(style, str):
        if style not in table.values():
            raise ValueError(
                "'{}' is not a valid option, must be one of '{}'".format(
                    style, "', '".join(table.values())
                )
            )
        return style
    return table[int(style)]


def _join_pieces(coords: np.ndarray, closed: bool, dist: float,
                 quad_segs: int, join: str, mitre_limit: float) -> list:
    """Join patches at the turn vertices of one part (both sides added —
    the inner side's patch lands inside the union harmlessly, the outer
    side's fills the notch between the two edge rectangles)."""
    out = []
    pts = coords[:-1] if closed else coords
    n = len(pts)
    idx = range(n) if closed else range(1, n - 1)
    for i in idx:
        p0 = pts[(i - 1) % n]
        v = pts[i]
        p1 = pts[(i + 1) % n]
        d1, d2 = v - p0, p1 - v
        L1, L2 = float(np.hypot(*d1)), float(np.hypot(*d2))
        if L1 == 0 or L2 == 0:
            out.append(_disc(v[0], v[1], dist, quad_segs))
            continue
        n1 = np.array([-d1[1], d1[0]]) / L1 * dist
        n2 = np.array([-d2[1], d2[0]]) / L2 * dist
        cross = d1[0] * d2[1] - d1[1] * d2[0]
        if cross == 0:
            continue  # collinear: edge rects already meet flush
        for sgn in (1.0, -1.0):
            a, b = v + sgn * n1, v + sgn * n2
            if join == "bevel":
                out.append(Geom(GeomType.POLYGON, rings=[np.vstack([v, a, b, v])]))
            else:  # mitre (with limit fallback to bevel)
                denom = d1[0] * d2[1] - d1[1] * d2[0]
                w = b - a
                t = (w[0] * d2[1] - w[1] * d2[0]) / denom
                m = a + t * d1
                if np.hypot(*(m - v)) <= mitre_limit * dist:
                    out.append(
                        Geom(GeomType.POLYGON, rings=[np.vstack([v, a, m, b, v])])
                    )
                else:
                    out.append(
                        Geom(GeomType.POLYGON, rings=[np.vstack([v, a, b, v])])
                    )
    return out


def _cap_pieces(coords: np.ndarray, dist: float, quad_segs: int,
                cap: str) -> list:
    """End-cap patches for one OPEN line part."""
    if cap == "flat":
        return []
    out = []
    for e, o in ((coords[0], coords[1]), (coords[-1], coords[-2])):
        d = e - o
        L = float(np.hypot(*d))
        if L == 0:
            continue
        u = d / L * dist
        n = np.array([-u[1], u[0]])
        if cap == "round":
            out.append(_disc(e[0], e[1], dist, quad_segs))
        else:  # square: extend dist beyond the endpoint
            out.append(Geom(GeomType.POLYGON, rings=[
                np.vstack([e + n, e + n + u, e - n + u, e - n, e + n])
            ]))
    return out


def _buffer_styled(g: Geom, dist: float, quad_segs: int, cap: str,
                   join: str, mitre_limit: float) -> Geom:
    """Non-default cap/join buffer (GEOS constructive.py:142 semantics):
    per-edge rectangles + style-specific vertex/end patches."""
    from engine.geo.relate import Decomp
    from engine.geo.set_operations import union_all

    t = g.type_id
    if g.is_empty:
        return Geom.empty(GeomType.POLYGON)
    if t in (GeomType.POINT, GeomType.MULTIPOINT):
        pieces = []
        for p in ([g] if t == GeomType.POINT else list(g.parts)):
            x, y = p.xys[0][:2]
            if cap == "round":
                pieces.append(_disc(x, y, dist, quad_segs))
            elif cap == "square":
                pieces.append(Geom(GeomType.POLYGON, rings=[np.array(
                    [[x - dist, y - dist], [x + dist, y - dist],
                     [x + dist, y + dist], [x - dist, y + dist],
                     [x - dist, y - dist]])]))
            # flat cap on a point: GEOS yields POLYGON EMPTY
        if not pieces:
            return Geom.empty(GeomType.POLYGON)
        return union_all(pieces)
    if t == GeomType.GEOMETRYCOLLECTION:
        from engine.geo.set_operations import union_all as _ua

        parts = [_buffer_styled(p, dist, quad_segs, cap, join, mitre_limit)
                 for p in g.parts]
        parts = [p for p in parts if not p.is_empty]
        return _ua(parts) if parts else Geom.empty(GeomType.POLYGON)
    d = Decomp(g)
    pieces = []
    for s in d.segs:
        a, b = s[:2], s[2:]
        v = b - a
        L = float(np.hypot(*v))
        if L == 0:
            continue
        n = np.array([-v[1], v[0]]) / L * dist
        ring = np.vstack([[a + n], [b + n], [b - n], [a - n], [a + n]])
        pieces.append(Geom(GeomType.POLYGON, rings=[ring]))
    for line in d.lines:
        closed = np.array_equal(line[0], line[-1])
        pieces += _join_pieces(line, closed, dist, quad_segs, join, mitre_limit)
        if not closed:
            pieces += _cap_pieces(line, dist, quad_segs, cap)
    for rings in d.polys:
        for r in rings:
            pieces += _join_pieces(r, True, dist, quad_segs, join, mitre_limit)
    if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        pieces = ([g] if t == GeomType.POLYGON else list(g.parts)) + pieces
    if not pieces:
        return Geom.empty(GeomType.POLYGON)
    return union_all(pieces)


def _sector(v, n1, n2, quad_segs: int) -> Geom:
    """Circular-sector fan at ``v`` sweeping (the short way) from
    direction n1 to n2 (both length = radius)."""
    r = float(np.hypot(*n1))
    a0 = np.arctan2(n1[1], n1[0])
    a1 = np.arctan2(n2[1], n2[0])
    sweep = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
    k = max(1, int(np.ceil(abs(sweep) / (np.pi / (2 * max(1, quad_segs))))))
    angs = a0 + sweep * np.linspace(0, 1, k + 1)
    arc = v + r * np.column_stack([np.cos(angs), np.sin(angs)])
    ring = np.vstack([v, arc, v])
    return Geom(GeomType.POLYGON, rings=[ring])


def _buffer_single_sided(g: Geom, dist: float, quad_segs: int, join: str,
                         mitre_limit: float) -> Geom:
    """GEOS single-sided buffer (constructive.py:142, lineal inputs):
    the region between the line and its one-side offset — one-sided edge
    rectangles + offset-side join patches, flat ends."""
    from engine.geo.set_operations import union_all

    t = g.type_id
    if t == GeomType.MULTILINESTRING:
        parts = [_buffer_single_sided(p, dist, quad_segs, join, mitre_limit)
                 for p in g.parts]
        parts = [p for p in parts if not p.is_empty]
        return union_all(parts) if parts else Geom.empty(GeomType.POLYGON)
    if t not in (GeomType.LINESTRING, GeomType.LINEARRING):
        raise TypeError("single_sided buffer requires lineal input")
    c = g.xys[:, :2]
    if len(c) < 2:
        return Geom.empty(GeomType.POLYGON)
    side = 1.0 if dist > 0 else -1.0
    ad = abs(float(dist))
    if len(c) == 2 and not np.array_equal(c[0], c[1]):
        # GEOS computeSingleSidedBufferCurve emission for one segment:
        # the input line traversed against the offset side, then the
        # offset side returned, closed (left: p1,p0,p0+n,p1+n)
        vv = c[1] - c[0]
        nn = np.array([-vv[1], vv[0]]) / float(np.hypot(*vv)) * side * ad
        if side > 0:
            ring = np.vstack([c[1], c[0], c[0] + nn, c[1] + nn, c[1]])
        else:
            ring = np.vstack([c[0], c[1], c[1] + nn, c[0] + nn, c[0]])
        return Geom(GeomType.POLYGON, rings=[ring.astype(float)])
    closed = np.array_equal(c[0], c[-1])
    v = np.diff(c, axis=0)
    L = np.hypot(v[:, 0], v[:, 1])
    keep = L > 0
    v, L = v[keep], L[keep]
    pts = np.vstack([c[:1], c[1:][keep]])
    if len(v) == 0:
        return Geom.empty(GeomType.POLYGON)
    n = np.column_stack([-v[:, 1], v[:, 0]]) / L[:, None] * side * ad
    pieces = []
    for i in range(len(v)):
        a, b = pts[i], pts[i + 1]
        ring = np.vstack([a, b, b + n[i], a + n[i], a])
        pieces.append(Geom(GeomType.POLYGON, rings=[ring]))
    njoin = len(v) if closed else len(v) - 1
    for j in range(njoin):
        i2 = (j + 1) % len(v)
        vert = pts[j + 1]
        turn = core.orient(0, 0, v[j, 0], v[j, 1], v[i2, 0], v[i2, 1])
        if turn * side >= 0:
            continue  # inward turn on the offset side: rects overlap
        n1, n2 = n[j], n[i2]
        a, b = vert + n1, vert + n2
        if join == "round":
            pieces.append(_sector(vert, n1, n2, quad_segs))
        elif join == "bevel":
            pieces.append(Geom(GeomType.POLYGON, rings=[np.vstack([vert, a, b, vert])]))
        else:  # mitre
            d1, d2 = v[j], v[i2]
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            w = b - a
            tpar = (w[0] * d2[1] - w[1] * d2[0]) / denom
            m = a + tpar * d1
            if np.hypot(*(m - vert)) <= mitre_limit * ad:
                pieces.append(
                    Geom(GeomType.POLYGON, rings=[np.vstack([vert, a, m, b, vert])])
                )
            else:
                pieces.append(
                    Geom(GeomType.POLYGON, rings=[np.vstack([vert, a, b, vert])])
                )
    return union_all(pieces)


@deprecate_positional(
    ["quad_segs", "cap_style", "join_style", "mitre_limit", "single_sided"]
)
def buffer(geometry, distance, quad_segs: int = 8, cap_style="round",
           join_style="round", mitre_limit: float = 5.0,
           single_sided: bool = False, **kwargs):
    """constructive.py:142 — positive via union of per-edge rectangles +
    per-vertex join patches over the general overlay (round joins use
    one disc per distinct vertex; mitre/bevel use corner patches with
    the GEOS mitre-limit fallback; flat/square caps per GEOS); negative
    (erosion, areal inputs) via polygon − boundary band.
    ``single_sided`` buffers lineal inputs on the left (positive
    distance) / right (negative) with flat ends."""
    for _name, _val in (("quad_segs", quad_segs), ("cap_style", cap_style),
                        ("join_style", join_style),
                        ("mitre_limit", mitre_limit),
                        ("single_sided", single_sided)):
        if not np.isscalar(_val):
            raise TypeError(f"{_name} only accepts scalar values")
    cap = _style_name(cap_style, _CAP_NAMES, "round")
    join = _style_name(join_style, _JOIN_NAMES, "round")
    if single_sided:
        def one_ss(g):
            if g is None:
                return None
            if distance == 0:
                return Geom.empty(GeomType.POLYGON)
            if g.type_id not in (GeomType.LINESTRING, GeomType.LINEARRING,
                                 GeomType.MULTILINESTRING):
                # GEOS: single_sided is meaningful for lines; other
                # inputs fall back to the ordinary buffer
                return buffer(g, distance, quad_segs, cap_style,
                              join_style, mitre_limit)
            return _buffer_single_sided(
                g, float(distance), quad_segs, join, float(mitre_limit)
            )

        return _apply1(one_ss, geometry)

    def pos(g, dd):
        if cap == "round" and join == "round":
            return _buffer_positive(g, dd, quad_segs)
        return _buffer_styled(g, dd, quad_segs, cap, join, float(mitre_limit))

    def one(g):
        if g is None:
            return None
        if distance == 0 or (
            distance < 0 and g.type_id not in (GeomType.POLYGON, GeomType.MULTIPOLYGON)
        ):
            return Geom.empty(GeomType.POLYGON)
        if distance < 0:
            from engine.geo.set_operations import difference

            band = pos(boundary(g), -distance)
            return difference(g, band)
        return pos(g, float(distance))

    return _apply1(one, geometry)
