"""Measurement family (reference shapely/measurement.py, 359 LoC).

Array-level vectorized wrappers over Geom scalars: area:24, distance:54,
bounds:85, total_bounds:114, length:167, hausdorff_distance:200
(+densify), frechet_distance:245 (discrete Fréchet on vertices +
densify), minimum_clearance:289, minimum_bounding_radius:326.
NaN/empty conventions match the reference (empty → nan bounds; distance
with missing → nan).
"""

from __future__ import annotations

import numpy as np

from engine.geo import relate
from engine.geo.geom import Geom


def _apply1(fn, geometry, dtype=np.float64):
    if isinstance(geometry, Geom) or geometry is None:
        return fn(geometry)
    return np.array([fn(g) for g in geometry], dtype=dtype)


def _apply2(fn, a, b, dtype=np.float64):
    a_arr = isinstance(a, (list, tuple, np.ndarray))
    b_arr = isinstance(b, (list, tuple, np.ndarray))
    if not a_arr and not b_arr:
        return fn(a, b)
    aa = a if a_arr else [a] * len(b)
    bb = b if b_arr else [b] * len(a)
    return np.array([fn(x, y) for x, y in zip(aa, bb)], dtype=dtype)


def area(geometry):
    """measurement.py:24 — 0.0 for non-areal; nan for missing."""
    return _apply1(lambda g: np.nan if g is None else g.area, geometry)


def length(geometry):
    return _apply1(lambda g: np.nan if g is None else g.length, geometry)


def distance(a, b):
    """measurement.py:54 — min distance; nan for missing/empty."""
    return _apply2(relate.distance, a, b)


def bounds(geometry):
    """measurement.py:85 — (…, 4) xmin/ymin/xmax/ymax, NaN for empty;
    maps over arbitrarily nested arrays (ufunc (…) -> (…, 4))."""

    def one(g):
        if g is None or g.is_empty:
            return np.full(4, np.nan)
        return np.asarray(g.bounds, dtype=np.float64)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    arr = np.asarray(geometry, dtype=object)
    out = np.empty(arr.shape + (4,), dtype=np.float64)
    for idx in np.ndindex(arr.shape):
        out[idx] = one(arr[idx])
    return out


def total_bounds(geometry):
    """measurement.py:114 — nanmin/nanmax over bounds; all-nan if none."""
    b = bounds(geometry if isinstance(geometry, (list, tuple, np.ndarray)) else [geometry])
    b = np.atleast_2d(b).reshape(-1, 4)
    if len(b) == 0 or np.all(np.isnan(b)):
        return np.full(4, np.nan)
    with np.errstate(all="ignore"):
        return np.array(
            [np.nanmin(b[:, 0]), np.nanmin(b[:, 1]), np.nanmax(b[:, 2]), np.nanmax(b[:, 3])]
        )


def _densify(coords: np.ndarray, frac: float) -> np.ndarray:
    """Insert points so no segment exceeds frac × total length
    (hausdorff densify semantics, measurement.py:223-229)."""
    if len(coords) < 2:
        return coords
    out = [coords[:1]]
    n_add = max(0, int(np.ceil(1.0 / frac)) - 1)
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        ts = np.linspace(0, 1, n_add + 2)[1:]
        out.append(a + ts[:, None] * (b - a))
    return np.vstack(out)


def _vertices(g: Geom, densify_frac: float | None) -> np.ndarray:
    d = relate.Decomp(g)
    vs = []
    if len(d.pts):
        vs.append(d.pts)
    for line in d.lines:
        vs.append(_densify(line, densify_frac) if densify_frac else line)
    for rings in d.polys:
        for r in rings:
            vs.append(_densify(r, densify_frac) if densify_frac else r)
    return np.vstack(vs) if vs else np.empty((0, 2))


def _directed_hausdorff(p: np.ndarray, q: np.ndarray) -> float:
    # max over p of min distance to q's vertex set
    d2 = ((p[:, None, 0] - q[None, :, 0]) ** 2 + (p[:, None, 1] - q[None, :, 1]) ** 2)
    return float(np.sqrt(d2.min(axis=1).max()))




def _densify_scalar(densify):
    """Validate one densify fraction (GEOS: in (0.0, 1.0]); NaN yields a
    NaN distance rather than an error."""
    d = float(densify)
    if np.isnan(d):
        return None
    if not (0.0 < d <= 1.0):
        from engine.geo.errors import GEOSException

        raise GEOSException(
            "IllegalArgumentException: Fraction is not in range (0.0 - 1.0]"
        )
    return d


def _densified_pair(fn, a, b, densify):
    """Broadcast (a, b, densify) like the reference's *_densify ufuncs."""
    if densify is None or np.isscalar(densify):
        d = _densify_scalar(densify) if densify is not None else False
        if d is None:  # NaN densify
            return _apply2(lambda x, y: np.nan, a, b)
        return _apply2(
            lambda x, y: fn(x, y, d if densify is not None else None), a, b
        )
    a_s = a is None or isinstance(a, Geom)
    b_s = b is None or isinstance(b, Geom)
    aa = np.asarray([a] if a_s else a, dtype=object)
    bb = np.asarray([b] if b_s else b, dtype=object)
    dd = np.asarray(densify, dtype=np.float64)
    aa, bb, dd = np.broadcast_arrays(aa, bb, dd)
    out = np.empty(aa.shape, dtype=np.float64)
    for idx in np.ndindex(aa.shape):
        d = _densify_scalar(dd[idx])
        out[idx] = np.nan if d is None else fn(aa[idx], bb[idx], d)
    return out

def hausdorff_distance(a, b, densify=None):
    """measurement.py:200 — discrete Hausdorff over vertices (+densify),
    matching GEOSHausdorffDistance's discrete algorithm."""

    def one(x, y, d=None):
        if x is None or y is None or x.is_empty or y.is_empty:
            return np.nan
        p = _vertices(x, d)
        q = _vertices(y, d)
        return max(_directed_hausdorff(p, q), _directed_hausdorff(q, p))

    if densify is None:
        return _apply2(one, a, b)
    return _densified_pair(one, a, b, densify)


def frechet_distance(a, b, densify=None):
    """measurement.py:245 — discrete Fréchet distance (dp over vertex
    sequences of the line parts)."""

    def one(x, y, d=None):
        if x is None or y is None or x.is_empty or y.is_empty:
            return np.nan
        p = _vertices(x, d)
        q = _vertices(y, d)
        n, m = len(p), len(q)
        d = np.sqrt(
            (p[:, None, 0] - q[None, :, 0]) ** 2 + (p[:, None, 1] - q[None, :, 1]) ** 2
        )
        ca = np.full((n, m), np.inf)
        ca[0, 0] = d[0, 0]
        for i in range(n):
            for j in range(m):
                if i == 0 and j == 0:
                    continue
                prev = min(
                    ca[i - 1, j] if i > 0 else np.inf,
                    ca[i, j - 1] if j > 0 else np.inf,
                    ca[i - 1, j - 1] if (i > 0 and j > 0) else np.inf,
                )
                ca[i, j] = max(prev, d[i, j])
        return float(ca[-1, -1])

    if densify is None:
        return _apply2(one, a, b)
    return _densified_pair(one, a, b, densify)


def minimum_bounding_radius(geometry):
    """measurement.py:326 — radius of the minimum bounding circle
    (Welzl's algorithm over all vertices)."""

    def one(g):
        if g is None or g.is_empty:
            return np.nan if g is None else 0.0
        from engine.geo.constructive import _welzl_circle

        pts = _vertices(g, None)
        _, _, r = _welzl_circle(pts)
        return r

    return _apply1(one, geometry)


def minimum_clearance(geometry):
    """measurement.py:289 — min distance a vertex can move to create
    invalidity: min over vertices of distance to non-incident segments,
    and min distance between distinct vertices (GEOS MinimumClearance
    discrete definition).  Infinity when undefined (e.g. single point).
    """
    from engine.geo import core

    def one(g):
        if g is None:
            return np.nan
        if g.is_empty:
            return np.inf
        d = relate.Decomp(g)
        segs = d.segs
        best = np.inf
        # vertex-to-vertex (distinct)
        vs = d.vertices
        if len(vs) >= 2:
            d2 = (vs[:, None, 0] - vs[None, :, 0]) ** 2 + (vs[:, None, 1] - vs[None, :, 1]) ** 2
            d2[d2 == 0] = np.inf
            best = min(best, float(np.sqrt(d2.min())))
        # vertex-to-nonincident-segment
        if len(segs) and len(vs):
            d2 = core.point_seg_dist2(
                vs[:, None, 0], vs[:, None, 1],
                segs[None, :, 0], segs[None, :, 1], segs[None, :, 2], segs[None, :, 3],
            )
            incident = (
                ((vs[:, None, 0] == segs[None, :, 0]) & (vs[:, None, 1] == segs[None, :, 1]))
                | ((vs[:, None, 0] == segs[None, :, 2]) & (vs[:, None, 1] == segs[None, :, 3]))
            )
            d2 = np.where(incident, np.inf, d2)
            if np.isfinite(d2.min()):
                best = min(best, float(np.sqrt(d2.min())))
        return best

    return _apply1(one, geometry)
