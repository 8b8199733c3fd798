"""Coverage validation (reference shapely/_coverage.py: coverage_is_valid:12,
coverage_invalid_edges:55, coverage_simplify:101) + coordinate-dimension
predicates (predicates.py has_z:46 / has_m:80 — real flags; analysis
kernels stay planar like GEOS) and SRID metadata (_geometry.py
get_srid:207 / set_srid:239).
"""

from __future__ import annotations

import numpy as np

from engine.geo import core, predicates
from engine.geo.geom import Geom


def has_z(geometry, out=None):
    """predicates.py:46 — True for XYZ/XYZM geometries."""
    return predicates._apply1(
        lambda g: bool(g is not None and g.has_z), geometry, out=out
    )


def has_m(geometry, out=None):
    """predicates.py:80 — True for XYM/XYZM geometries."""
    return predicates._apply1(
        lambda g: bool(g is not None and g.has_m), geometry, out=out
    )


def get_srid(geometry):
    """_geometry.py:207 — SRID metadata (0 default, -1 missing)."""

    def one(g):
        if g is None:
            return -1
        return int(getattr(g, "_srid", 0))

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=np.int64)


def set_srid(geometry, srid: int):
    """_geometry.py:239 — returns geometries tagged with the SRID."""

    def one(g):
        if g is None:
            return None
        g._srid = int(srid)  # noqa: SLF001 (engine-side metadata slot)
        return g

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def coverage_is_valid(geometries, gap_width: float = 0.0) -> bool:
    """_coverage.py:12 — a polygon set is a valid coverage when no two
    polygons' interiors overlap (shared boundaries are fine)."""
    return len(_overlapping_pairs(geometries)) == 0


def coverage_invalid_edges(geometries, gap_width: float = 0.0):
    """_coverage.py:55 — per input: a linestring marking invalid
    (overlapping) interaction, or None when clean.  We mark the overlap
    region's bbox diagonal of each offending pair (diagnostic, like the
    reference's per-geometry edge output)."""
    geoms = list(geometries)
    out: list = [None] * len(geoms)
    for i, j in _overlapping_pairs(geoms):
        bi = geoms[i].bounds
        bj = geoms[j].bounds
        xmin, ymin = max(bi[0], bj[0]), max(bi[1], bj[1])
        xmax, ymax = min(bi[2], bj[2]), min(bi[3], bj[3])
        seg = Geom.linestring(np.array([[xmin, ymin], [xmax, ymax]]))
        out[i] = seg
        out[j] = seg
    return np.array(out, dtype=object)


def _overlapping_pairs(geometries):
    geoms = [g for g in geometries]
    n = len(geoms)
    bounds = np.array(
        [g.bounds if g is not None and not g.is_empty else [np.nan] * 4 for g in geoms]
    )
    pairs = []
    for i in range(n):
        if geoms[i] is None:
            continue
        for j in range(i + 1, n):
            if geoms[j] is None:
                continue
            if not core.bbox_intersects(bounds[i], bounds[j]):
                continue
            m = predicates.relate(geoms[i], geoms[j])
            if m is not None and m[0] == "2":  # interior∩interior is areal
                pairs.append((i, j))
    return pairs


def coverage_simplify(geometries, tolerance: float, simplify_boundary: bool = True):
    """_coverage.py:101 — shared-edge-consistent simplification.

    Engine approach: Douglas–Peucker keeping ALL vertices that appear in
    more than one polygon (junction/shared vertices are pinned), so
    shared boundaries simplify identically on both sides."""
    from collections import Counter

    from engine.geo.geom import GeomType

    geoms = list(geometries)
    counts: Counter = Counter()
    for g in geoms:
        if g is None:
            continue
        for r in (g.rings if g.type_id == GeomType.POLYGON else []):
            for xy in map(tuple, r[:-1]):
                counts[xy] += 1
    pinned = {xy for xy, c in counts.items() if c > 2}  # ring-closure counts twice

    def dp_pinned(ring: np.ndarray) -> np.ndarray:
        keep = np.zeros(len(ring), dtype=bool)
        keep[0] = keep[-1] = True
        for k in range(len(ring)):
            if tuple(ring[k]) in pinned:
                keep[k] = True
        stack = [(i, j) for i, j in zip(
            np.flatnonzero(keep)[:-1], np.flatnonzero(keep)[1:]
        )]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            d2 = core.point_seg_dist2(
                ring[i + 1 : j, 0], ring[i + 1 : j, 1],
                ring[i, 0], ring[i, 1], ring[j, 0], ring[j, 1],
            )
            k = int(np.argmax(d2))
            if d2[k] > tolerance * tolerance:
                m = i + 1 + k
                keep[m] = True
                stack.append((i, m))
                stack.append((m, j))
        out = ring[keep]
        if len(out) < 4:
            return ring
        return out

    out = []
    for g in geoms:
        if g is None or g.type_id != GeomType.POLYGON:
            out.append(g)
            continue
        out.append(Geom(GeomType.POLYGON, rings=[dp_pinned(r) for r in g.rings]))
    return np.array(out, dtype=object)
