"""Linear referencing (reference shapely/linear.py, 238 LoC + ops).

line_interpolate_point:26 (+normalized), line_locate_point:78,
line_merge:119, shortest_line:206, plus ops.substring:509.
Cumulative-length math is vectorized per line (cumsum over segment
lengths — the segment-reduceat pattern of SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo.decorators import deprecate_positional
from engine.geo.errors import GEOSException
from engine.geo.geom import Geom, GeomType


def _seg_cumlen(c: np.ndarray) -> np.ndarray:
    d = np.sqrt(((np.diff(c, axis=0)) ** 2).sum(axis=1))
    return np.concatenate([[0.0], np.cumsum(d)])


def _line_runs(g: Geom) -> list | None:
    """Per-part coordinate runs of a lineal geometry; None if not
    lineal.  Linear referencing over multi-part inputs accumulates the
    TRUE part lengths — no phantom segment joins the parts (GEOS
    LengthIndexedLine semantics; legacy/test_linear_referencing.py)."""
    t = g.type_id
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return [g.xys]
    if t == GeomType.MULTILINESTRING:
        return [p.xys for p in g.parts if len(p.xys)]
    if t == GeomType.GEOMETRYCOLLECTION:
        # only DIRECT LineString/LinearRing members count; an empty GC is
        # lineal-empty, a GC with members but no line member is invalid
        if not g.parts:
            return []
        lines = [
            p for p in g.parts
            if p.type_id in (GeomType.LINESTRING, GeomType.LINEARRING)
        ]
        if not lines:
            return None
        return [p.xys for p in lines if len(p.xys)]
    return None


def _line_coords(g: Geom) -> np.ndarray | None:
    runs = _line_runs(g)
    if runs is None:
        return None
    return np.vstack(runs) if runs else np.empty((0, 2))


@deprecate_positional(["normalized"])
def line_interpolate_point(line, distance, normalized: bool = False):
    """linear.py:26 — point at distance along line (negative = from
    end; clamped to endpoints like GEOS); NaN distance → None; non-line
    input → TypeError (reference test_linear.py:80-90).  A
    multilinestring with ANY empty member interpolates to POINT EMPTY
    (GEOS behavior)."""

    def one(g, dist):
        if g is None:
            return None
        if np.isnan(dist):
            return None
        if g.type_id == GeomType.MULTILINESTRING and any(
            len(p.xys) == 0 for p in g.parts
        ):
            return Geom.empty(GeomType.POINT)
        runs = _line_runs(g)
        if runs is None:
            raise TypeError(
                "One of the Geometry inputs is of incorrect geometry type.")
        runs = [r for r in runs if len(r) >= 2]
        if not runs:
            return Geom.empty(GeomType.POINT)
        lens = [float(_seg_cumlen(r)[-1]) for r in runs]
        total = sum(lens)
        d = float(dist) * total if normalized else float(dist)
        if d < 0:
            d = total + d
        d = min(max(d, 0.0), total)
        for c, ln in zip(runs, lens):
            if d > ln:
                d -= ln
                continue
            cl = _seg_cumlen(c)
            i = int(np.searchsorted(cl, d, side="right") - 1)
            i = min(i, len(c) - 2)
            seg = cl[i + 1] - cl[i]
            t = 0.0 if seg == 0 else (d - cl[i]) / seg
            p = c[i] + t * (c[i + 1] - c[i])
            return Geom.point(p[0], p[1])
        p = runs[-1][-1]
        return Geom.point(p[0], p[1])

    if isinstance(line, Geom) or line is None:
        if isinstance(distance, (list, tuple, np.ndarray)):
            return np.array([one(line, d) for d in distance], dtype=object)
        return one(line, distance)
    dists = distance if isinstance(distance, (list, tuple, np.ndarray)) else [distance] * len(line)
    return np.array([one(g, d) for g, d in zip(line, dists)], dtype=object)


@deprecate_positional(["normalized"])
def line_locate_point(line, other, normalized: bool = False):
    """linear.py:78 — distance along line of the point's projection.
    Non-point second arg / non-lineal first arg raise GEOSException
    (GEOS IllegalArgumentException parity)."""

    def one(g, p):
        if g is None or p is None:
            return np.nan
        if p.type_id != GeomType.POINT:
            raise GEOSException(
                "IllegalArgumentException: line_locate_point: the second "
                "geometry must be a point"
            )
        runs = _line_runs(g)
        if runs is None:
            raise GEOSException(
                "IllegalArgumentException: line_locate_point: the first "
                "geometry must be lineal"
            )
        runs = [r for r in runs if len(r) >= 2]
        if not runs or p.is_empty:
            return np.nan
        px, py = p.xys[0]
        best_d2, best_pos = np.inf, 0.0
        offset = 0.0
        total = 0.0
        for c in runs:
            cl = _seg_cumlen(c)
            ax, ay = c[:-1, 0], c[:-1, 1]
            bx, by = c[1:, 0], c[1:, 1]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t = np.where(
                len2 > 0,
                ((px - ax) * dx + (py - ay) * dy)
                / np.where(len2 == 0, 1, len2), 0)
            t = np.clip(t, 0, 1)
            qx, qy = ax + t * dx, ay + t * dy
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            i = int(np.argmin(d2))
            if d2[i] < best_d2:
                best_d2 = float(d2[i])
                best_pos = offset + float(cl[i] + t[i] * np.sqrt(len2[i]))
            offset += float(cl[-1])
            total += float(cl[-1])
        return best_pos / total if (normalized and total > 0) else best_pos

    line_s = isinstance(line, Geom) or line is None
    other_s = isinstance(other, Geom) or other is None
    if line_s and other_s:
        return one(line, other)
    ll = np.asarray([line] if line_s else line, dtype=object)
    oo = np.asarray([other] if other_s else other, dtype=object)
    ll, oo = np.broadcast_arrays(ll, oo)
    return np.array(
        [one(g, p) for g, p in zip(ll.ravel(), oo.ravel())],
        dtype=np.float64,
    ).reshape(ll.shape)


def line_merge(line, directed: bool = False):
    """linear.py:119 — join multilinestring parts at shared endpoints.

    Greedy chain-walk: repeatedly extend a chain while exactly one other
    part shares the endpoint (GEOS LineMerger semantics for the simple
    cases; ambiguous junctions stay unmerged)."""

    def one(g):
        if g is None:
            return None
        if g.type_id != GeomType.MULTILINESTRING:
            return g
        parts = [p.xys.copy() for p in g.parts if len(p.xys) >= 2]
        if not parts:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        merged = True
        while merged and len(parts) > 1:
            merged = False
            for i in range(len(parts)):
                for j in range(i + 1, len(parts)):
                    a, b = parts[i], parts[j]
                    na = None
                    if np.array_equal(a[-1], b[0]):
                        na = np.vstack([a, b[1:]])
                    elif not directed and np.array_equal(a[-1], b[-1]):
                        na = np.vstack([a, b[::-1][1:]])
                    elif not directed and np.array_equal(a[0], b[0]):
                        na = np.vstack([a[::-1], b[1:]])
                    elif np.array_equal(b[-1], a[0]):
                        na = np.vstack([b, a[1:]])
                    if na is not None:
                        parts[i] = na
                        parts.pop(j)
                        merged = True
                        break
                if merged:
                    break
        if not directed:
            # JTS LineMerger starts edge strings at the terminal node
            # that sorts FIRST by coordinate (nodes live in a TreeMap) —
            # orient each open chain accordingly
            for k, p in enumerate(parts):
                if not np.array_equal(p[0], p[-1]) and tuple(p[-1]) < tuple(p[0]):
                    parts[k] = p[::-1]
        if len(parts) == 1:
            return Geom.linestring(parts[0])
        return Geom(GeomType.MULTILINESTRING, parts=[Geom.linestring(p) for p in parts])

    if isinstance(line, Geom) or line is None:
        return one(line)
    return np.array([one(g) for g in line], dtype=object)


def shortest_line(a, b):
    """linear.py:206 — the connecting segment at the min-distance pair."""
    from engine.geo.relate import Decomp

    def one(x, y):
        if x is None or y is None or x.is_empty or y.is_empty:
            return None
        da, db = Decomp(x), Decomp(y)
        best = (np.inf, None, None)
        pa = np.vstack([da.pts, da.vertices]) if len(da.pts) or len(da.vertices) else np.empty((0, 2))
        pb = np.vstack([db.pts, db.vertices]) if len(db.pts) or len(db.vertices) else np.empty((0, 2))
        # vertex of A -> segments of B (projection), and vice versa
        for src, segs in ((pa, db.segs), (pb, da.segs)):
            swap = segs is da.segs
            if len(src) == 0 or len(segs) == 0:
                continue
            ax, ay = segs[:, 0], segs[:, 1]
            bx, by = segs[:, 2], segs[:, 3]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            for px, py in src:
                t = np.where(len2 > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(len2 == 0, 1, len2), 0)
                t = np.clip(t, 0, 1)
                qx, qy = ax + t * dx, ay + t * dy
                d2 = (px - qx) ** 2 + (py - qy) ** 2
                i = int(np.argmin(d2))
                if d2[i] < best[0]:
                    p1, p2 = (px, py), (float(qx[i]), float(qy[i]))
                    best = (d2[i], p2 if swap else p1, p1 if swap else p2)
        if best[1] is None:
            # point-point only
            d2 = (pa[:, None, 0] - pb[None, :, 0]) ** 2 + (pa[:, None, 1] - pb[None, :, 1]) ** 2
            i, j = np.unravel_index(np.argmin(d2), d2.shape)
            best = (d2[i, j], tuple(pa[i]), tuple(pb[j]))
        # intersecting geometries -> degenerate zero-length at a shared pt
        return Geom.linestring(np.array([best[1], best[2]]))

    if isinstance(a, Geom) or a is None:
        return one(a, b)
    return np.array([one(x, y) for x, y in zip(a, b)], dtype=object)


def substring(line, start_dist, end_dist, normalized: bool = False):
    """ops.py:509 — sub-linestring between two distances; reversed
    inputs yield reversed substring; equal → point (ops semantics)."""
    if line is None or line.type_id != GeomType.LINESTRING:
        from engine.geo.errors import GeometryTypeError

        raise GeometryTypeError("substring requires a LineString")
    c = line.xys
    cl = _seg_cumlen(c)
    total = cl[-1]

    def resolve(d):
        d = float(d) * total if normalized else float(d)
        if d < 0:
            d = total + d
        return min(max(d, 0.0), total)

    s, e = resolve(start_dist), resolve(end_dist)
    rev = s > e
    if rev:
        s, e = e, s
    if s == e:
        from engine.geo.linear import line_interpolate_point

        return line_interpolate_point(line, s)

    def point_at(d):
        i = min(int(np.searchsorted(cl, d, side="right") - 1), len(c) - 2)
        seg = cl[i + 1] - cl[i]
        t = 0.0 if seg == 0 else (d - cl[i]) / seg
        return c[i] + t * (c[i + 1] - c[i]), i

    p0, i0 = point_at(s)
    p1, i1 = point_at(e)
    mids = c[i0 + 1 : i1 + 1]
    coords = np.vstack([[p0], mids, [p1]])
    keep = np.ones(len(coords), dtype=bool)
    keep[1:] = (np.diff(coords, axis=0) != 0).any(axis=1)
    coords = coords[keep]
    if rev:
        coords = coords[::-1]
    return Geom.linestring(coords)
