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
        import copy as _copy

        out = _copy.copy(g)  # reference returns a NEW geometry
        out._srid = int(srid)  # noqa: SLF001 (engine-side metadata slot)
        return out

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def _poly_rings(g, want_ccw_shell=True, normalize=True):
    """Closed 2-D rings of a (multi)polygon, shells normalized CCW and
    holes CW so matched shared edges of a VALID coverage are traversed
    anti-parallel by the two adjacent polygons.  normalize=False keeps
    the input traversal direction."""
    from engine.geo.geom import GeomType

    out = []
    if g is None:
        return out
    if g.type_id == GeomType.POLYGON:
        polys = [g]
    elif g.type_id in (GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION):
        polys = [p for p in g.parts if p.type_id == GeomType.POLYGON]
    else:
        return out
    for p in polys:
        for k, r in enumerate(p.rings):
            r = np.asarray(r, dtype=np.float64)[:, :2]
            if len(r) < 4:
                continue
            if normalize:
                ccw = core.ring_signed_area(r) > 0
                want = want_ccw_shell if k == 0 else not want_ccw_shell
                if ccw != want:
                    r = r[::-1]
            out.append(r)
    return out


def _segments(rings):
    """Directed segments ((x1,y1),(x2,y2)) in traversal order."""
    segs = []
    for r in rings:
        for i in range(len(r) - 1):
            segs.append((tuple(r[i]), tuple(r[i + 1])))
    return segs


def _collinear_overlap(s, t) -> bool:
    """True when s and t lie on one line and share more than a point."""
    (ax, ay), (bx, by) = s
    (cx, cy), (dx, dy) = t
    ux, uy = bx - ax, by - ay
    if ux == 0 and uy == 0:
        return False
    if (cx - ax) * uy - (cy - ay) * ux != 0:
        return False
    if (dx - ax) * uy - (dy - ay) * ux != 0:
        return False
    # project on the dominant axis
    tc = (cx - ax) * ux + (cy - ay) * uy
    td = (dx - ax) * ux + (dy - ay) * uy
    lo, hi = min(tc, td), max(tc, td)
    L = ux * ux + uy * uy
    return min(hi, L) > max(lo, 0)


def _pt_seg_dist(px, py, s) -> float:
    (ax, ay), (bx, by) = s
    ux, uy = bx - ax, by - ay
    L = ux * ux + uy * uy
    if L == 0:
        return float(np.hypot(px - ax, py - ay))
    t = max(0.0, min(1.0, ((px - ax) * ux + (py - ay) * uy) / L))
    return float(np.hypot(px - (ax + t * ux), py - (ay + t * uy)))


def _strictly_inside(x, y, geom) -> bool:
    from engine.geo.geom import GeomType

    for rings in geom.polygon_parts():
        if core.points_in_rings(
            np.asarray([x]), np.asarray([y]), rings
        )[0] == 2:
            return True
    return False


def _invalid_segment_sets(geoms, gap_width: float):
    """Per-geometry set of invalid directed segments, GEOS 3.12
    CoverageValidator semantics (_coverage.py:55):

    - a segment collinearly overlapping a non-identical segment of
      another polygon is invalid on both sides (mismatched vertices);
    - an identical segment traversed in the SAME direction by two
      normalized rings means the interiors coincide -> invalid;
    - a segment whose midpoint lies strictly inside another polygon is
      invalid (interior overlap);
    - with gap_width > 0: a segment faced across a narrow gap by a
      deviating chain (max deviation d with d <= gap_width < 2d) is
      invalid together with that chain (calibrated to the reference's
      GEOS 3.12 behavior, tests/test_coverage.py:68-120).
    """
    n = len(geoms)
    seglists = [_segments(_poly_rings(g)) for g in geoms]
    segsets = [set(s) for s in seglists]
    bad = [set() for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if i == j or not seglists[i] or not seglists[j]:
                continue
            undirected_j = {frozenset(t) for t in segsets[j]}
            for s in seglists[i]:
                su = frozenset(s)
                if s in segsets[j]:
                    # same direction -> interiors on the same side
                    bad[i].add(s)
                    bad[j].add(s)
                    continue
                if (s[1], s[0]) in segsets[j]:
                    continue  # exactly matched, anti-parallel: valid
                hit = False
                for t in seglists[j]:
                    if frozenset(t) != su and _collinear_overlap(s, t):
                        bad[i].add(s)
                        bad[j].add(t)
                        hit = True
                if hit:
                    continue
                interior_hit = False
                for frac in (0.5, 0.25, 0.75):
                    px = s[0][0] + frac * (s[1][0] - s[0][0])
                    py = s[0][1] + frac * (s[1][1] - s[0][1])
                    if _strictly_inside(px, py, geoms[j]):
                        interior_hit = True
                        break
                if interior_hit:
                    bad[i].add(s)
                    continue
                if gap_width > 0:
                    chain = [
                        t for t in seglists[j]
                        if frozenset(t) != su
                        and (t[1], t[0]) != s and t != s
                        and _pt_seg_dist(t[0][0], t[0][1], s) <= gap_width
                        and _pt_seg_dist(t[1][0], t[1][1], s) <= gap_width
                    ]
                    if chain:
                        dmax = max(
                            max(_pt_seg_dist(t[0][0], t[0][1], s),
                                _pt_seg_dist(t[1][0], t[1][1], s))
                            for t in chain
                        )
                        if 0 < dmax <= gap_width < 2 * dmax:
                            bad[i].add(s)
                            for t in chain:
                                bad[j].add(t)
    # report flagged segments in the INPUT ring direction (GEOS output
    # direction; the normalized direction above is analysis-only)
    seglists_in = [_segments(_poly_rings(g, normalize=False))
                   for g in geoms]
    bad_undirected = [{frozenset(s) for s in b} for b in bad]
    return seglists_in, bad_undirected


def _stitch(seglist, badset) -> Geom:
    """Merge flagged segments (in traversal order) into a linestring."""
    from engine.geo.geom import GeomType

    runs = []
    cur = []
    for s in seglist:
        if frozenset(s) in badset:
            if cur and cur[-1] == s[0]:
                cur.append(s[1])
            else:
                if cur:
                    runs.append(cur)
                cur = [s[0], s[1]]
    if cur:
        runs.append(cur)
    if not runs:
        return Geom.empty(GeomType.LINESTRING)
    if len(runs) == 1:
        return Geom.linestring(np.asarray(runs[0], dtype=np.float64))
    return Geom(
        GeomType.MULTILINESTRING,
        parts=[Geom.linestring(np.asarray(r, dtype=np.float64))
               for r in runs],
    )


def _coverage_rows(geometries):
    arr = np.asarray(geometries, dtype=object)
    if arr.ndim == 0:
        return arr, [np.array([arr[()]], dtype=object)]
    if arr.ndim == 1:
        return arr, [arr]
    return arr, [arr[idx] for idx in np.ndindex(arr.shape[:-1])]


def coverage_is_valid(geometries, gap_width: float = 0.0):
    """_coverage.py:12 — gufunc (n)->(): True when the polygons form a
    valid coverage (exactly matched shared edges, no interior overlaps,
    no sub-gap_width gaps).  Non-polygonal members are ignored."""
    arr, rows = _coverage_rows(geometries)
    out = []
    for row in rows:
        _, bad = _invalid_segment_sets(list(row), float(gap_width))
        out.append(not any(bad))
    if arr.ndim <= 1:
        return np.bool_(out[0])
    return np.array(out, dtype=bool).reshape(arr.shape[:-1])


def coverage_invalid_edges(geometries, gap_width: float = 0.0):
    """_coverage.py:55 — per input polygon, the section of its boundary
    that breaks the coverage (LINESTRING EMPTY when clean)."""
    arr, rows = _coverage_rows(geometries)
    res = np.empty(arr.shape if arr.ndim else (1,), dtype=object)
    flat = res.reshape(-1, arr.shape[-1]) if arr.ndim > 1 else res[None, :]
    for k, row in enumerate(rows):
        seglists, bad = _invalid_segment_sets(list(row), float(gap_width))
        for g_idx in range(len(row)):
            flat[k, g_idx] = _stitch(seglists[g_idx], bad[g_idx])
    return res if arr.ndim else res[0]


def coverage_simplify(geometries, tolerance: float,
                      simplify_boundary: bool = True):
    """_coverage.py:101 — shared-edge-consistent simplification.

    Rings are decomposed into chains between junction vertices; each
    chain is simplified ONCE (iterative smallest-perpendicular-distance
    vertex removal, endpoints pinned, strict ``< tolerance``), so shared
    boundaries simplify identically on both sides.  Free rings keep at
    least 3 vertices.  ``simplify_boundary=False`` leaves chains owned
    by a single polygon untouched."""
    from engine.geo.geom import GeomType

    scalar = isinstance(geometries, Geom)
    geoms = [geometries] if scalar else list(np.asarray(geometries, dtype=object).ravel())
    for g in geoms:
        if g is not None and g.type_id not in (
            GeomType.POLYGON, GeomType.MULTIPOLYGON
        ):
            raise TypeError(
                "One of the arguments has an incorrect geometry type; "
                "coverage_simplify only supports (Multi)Polygons."
            )

    # ring inventory: (geom idx, poly idx, ring idx) -> closed ring
    rings = []
    for gi, g in enumerate(geoms):
        if g is None:
            continue
        polys = [g] if g.type_id == GeomType.POLYGON else list(g.parts)
        for pi, p in enumerate(polys):
            for ri, r in enumerate(p.rings):
                rings.append((gi, pi, ri, np.asarray(r, dtype=np.float64)))

    # junction vertices: endpoints of segments used by more than one
    # (geom, ring) or vertices where ring paths diverge
    from collections import defaultdict

    seg_owner = defaultdict(set)
    vert_deg = defaultdict(set)
    for key_i, (gi, pi, ri, r) in enumerate(rings):
        for a in range(len(r) - 1):
            s = frozenset((tuple(r[a][:2]), tuple(r[a + 1][:2])))
            seg_owner[s].add(key_i)
            for v in s:
                vert_deg[v].add(s)
    junctions = {v for v, ss in vert_deg.items() if len(ss) > 2}

    # chains between junctions, simplified once per canonical key
    def simplify_chain(pts):
        pts = [np.asarray(p, dtype=np.float64) for p in pts]
        n = len(pts)
        alive = list(range(n))
        closed = n > 1 and np.array_equal(pts[0], pts[-1])
        min_keep = 4 if closed else 2
        while len(alive) > min_keep:
            best_k, best_d = None, None
            for k in range(1, len(alive) - 1):
                a, b, c = pts[alive[k - 1]], pts[alive[k]], pts[alive[k + 1]]
                d = _pt_seg_dist(b[0], b[1], ((a[0], a[1]), (c[0], c[1])))
                if best_d is None or d < best_d:
                    best_k, best_d = k, d
            if best_d is None or best_d >= tolerance:
                break
            del alive[best_k]
        return [pts[k] for k in alive]

    chain_cache = {}

    def chain_key(pts):
        f = tuple(tuple(p[:2]) for p in pts)
        b = tuple(reversed(f))
        return min(f, b)

    out_rings = {}
    for key_i, (gi, pi, ri, r) in enumerate(rings):
        pts = [r[a] for a in range(len(r) - 1)]
        cuts = [a for a, p in enumerate(pts) if tuple(p[:2]) in junctions]
        if not cuts:
            # free ring: simplify cyclically (iterative removal,
            # >= 3 distinct vertices)
            ring_pts = pts[:]
            owned_multi = any(
                len(seg_owner[frozenset((tuple(r[a][:2]), tuple(r[a + 1][:2])))]) > 1
                for a in range(len(r) - 1)
            )
            if simplify_boundary or owned_multi:
                while len(ring_pts) > 3:
                    best_k, best_d = None, None
                    for k in range(len(ring_pts)):
                        a = ring_pts[(k - 1) % len(ring_pts)]
                        b = ring_pts[k]
                        c = ring_pts[(k + 1) % len(ring_pts)]
                        d = _pt_seg_dist(
                            b[0], b[1], ((a[0], a[1]), (c[0], c[1]))
                        )
                        if best_d is None or d < best_d:
                            best_k, best_d = k, d
                    if best_d is None or best_d >= tolerance:
                        break
                    del ring_pts[best_k]
            closed = np.vstack([ring_pts, ring_pts[:1]])
            out_rings[(gi, pi, ri)] = closed
            continue
        # rotate so the ring starts at a junction, then split into chains
        order = cuts[0]
        pts = pts[order:] + pts[:order]
        cuts = [a - order for a in cuts]
        chains = []
        for c_i, start in enumerate(cuts):
            end = cuts[c_i + 1] if c_i + 1 < len(cuts) else len(pts)
            chain = pts[start:end] + [pts[end % len(pts)]]
            chains.append(chain)
        new_pts = []
        for chain in chains:
            shared = len(seg_owner.get(frozenset(
                (tuple(chain[0][:2]), tuple(chain[1][:2]))
            ), ())) > 1 if len(chain) > 1 else False
            if not simplify_boundary and not shared:
                simp = chain
            else:
                ck = chain_key(chain)
                if ck not in chain_cache:
                    # simplify in FIRST-ENCOUNTER direction (the owning
                    # ring's traversal) — GEOS TPVW pops the first of
                    # equal-area candidates in that order, and the
                    # surviving vertex of a tie depends on it
                    chain_cache[ck] = [
                        tuple(p[:2]) for p in simplify_chain(chain)
                    ]
                simp_c = chain_cache[ck]
                if simp_c[0] != tuple(chain[0][:2]):
                    simp_c = simp_c[::-1]
                simp = [np.asarray(p, dtype=np.float64) for p in simp_c]
            new_pts.extend(simp[:-1])
        closed = np.vstack([new_pts, new_pts[:1]])
        out_rings[(gi, pi, ri)] = closed

    out = []
    for gi, g in enumerate(geoms):
        if g is None:
            out.append(None)
            continue
        polys = [g] if g.type_id == GeomType.POLYGON else list(g.parts)
        new_polys = []
        for pi, p in enumerate(polys):
            new_polys.append(Geom(
                GeomType.POLYGON,
                rings=[out_rings[(gi, pi, ri)] for ri in range(len(p.rings))],
            ))
        if g.type_id == GeomType.POLYGON:
            out.append(new_polys[0])
        else:
            out.append(Geom(GeomType.MULTIPOLYGON, parts=new_polys))
    if scalar:
        return out[0]
    return np.array(out, dtype=object).reshape(np.asarray(geometries, dtype=object).shape)
