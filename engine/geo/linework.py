"""Linework operations (reference constructive.py: node:850,
polygonize:884, polygonize_full:939, build_area:654, snap:1171,
minimum_clearance_line:758, minimum_width:1434; linear.py
shared_paths:172).

polygonize follows the GEOS Polygonizer model: node the linework, build
the planar graph, extract minimal rings by always taking the most
clockwise outgoing edge (left-hand traversal), keep CCW faces (the
bounded ones), then nest holes for build_area.
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo.geom import Geom, GeomType


def _all_segments(geoms) -> np.ndarray:
    from engine.geo.relate import Decomp

    segs = []
    for g in geoms:
        if g is None:
            continue
        d = Decomp(g)
        if len(d.segs):
            segs.append(d.segs)
    return np.vstack(segs) if segs else np.empty((0, 4))


def node(geometry):
    """constructive.py:850 — split all segments at every intersection,
    dedupe, return MULTILINESTRING of the noded pieces."""
    geoms = [geometry] if isinstance(geometry, Geom) else list(geometry)
    segs = _all_segments(geoms)
    return _node_segs(segs)


def _node_segs(segs: np.ndarray) -> Geom:
    pieces = _noded_pieces(segs)
    if not pieces:
        return Geom.empty(GeomType.MULTILINESTRING)
    parts = [Geom.linestring(np.array(p)) for p in pieces]
    return Geom(GeomType.MULTILINESTRING, parts=parts)


def _noded_pieces(segs: np.ndarray) -> list[tuple]:
    """Unique noded (p, q) pieces from raw segments.

    Bbox-prefiltered: each segment is only cut against segments whose
    bounding boxes overlap its own (vectorized candidate mask — the
    all-pairs form copied the whole array per segment and went
    quadratic in real work, not just in cheap comparisons)."""
    n = len(segs)
    if n == 0:
        return []
    xmin = np.minimum(segs[:, 0], segs[:, 2])
    xmax = np.maximum(segs[:, 0], segs[:, 2])
    ymin = np.minimum(segs[:, 1], segs[:, 3])
    ymax = np.maximum(segs[:, 1], segs[:, 3])
    pad = 1e-12
    # vertex snapper: intersection points computed from two different
    # segments' parametrizations differ by ~ulp·extent; an absolute
    # 12-decimal round splits such twins across a rounding boundary and
    # DISCONNECTS the noded graph.  Snap to the first-seen vertex within
    # an extent-relative tolerance instead (exact inputs pass through).
    extent = max(float(xmax.max() - xmin.min()),
                 float(ymax.max() - ymin.min()), 1.0)
    tol = max(1e-12, extent * 1e-13)
    grid: dict = {}

    def snap(pt):
        gx, gy = round(pt[0] / tol), round(pt[1] / tol)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                v = grid.get((gx + dx, gy + dy))
                if v is not None and abs(v[0] - pt[0]) <= tol \
                        and abs(v[1] - pt[1]) <= tol:
                    return v
        v = (float(pt[0]), float(pt[1]))
        grid[(gx, gy)] = v
        return v

    out = set()
    idx = np.arange(n)
    for i in range(n):
        p = segs[i, :2]
        q = segs[i, 2:]
        if p[0] == q[0] and p[1] == q[1]:
            continue
        cand = (
            (xmin <= xmax[i] + pad) & (xmax >= xmin[i] - pad)
            & (ymin <= ymax[i] + pad) & (ymax >= ymin[i] - pad)
            & (idx != i)
        )
        others = segs[cand]
        cuts = (core.seg_cut_params(p, q, others) if len(others)
                else np.empty(0))
        ts = np.unique(np.concatenate([[0.0, 1.0], cuts]))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            a = snap(p + t0 * (q - p))
            b = snap(p + t1 * (q - p))
            if a == b:
                continue
            key = (a, b)
            rkey = (b, a)
            if rkey in out:
                continue
            out.add(key)
    return sorted(out)


def _minimal_rings(pieces) -> list[np.ndarray]:
    """Planar face walk: every directed edge belongs to exactly one face;
    from incoming (u→v) continue with the neighbor immediately CLOCKWISE
    of the reverse edge in v's angular order.  Bounded faces come out
    with positive signed area; the single unbounded face is negative and
    is dropped.  Dangles (degree-1 chains) and cut edges / bridges
    (edges traversed twice within one face) are removed first, like the
    GEOS polygonizer classifies and drops them."""
    pieces = [tuple(sorted((a, b))) for a, b in pieces]
    pieces = list(dict.fromkeys(pieces))
    while True:
        pieces = _prune_dangles(pieces)
        if not pieces:
            return []
        paths = _face_walk_paths(pieces)
        spurs = set()
        for path in paths:
            seen = set()
            n = len(path)
            for i in range(n):
                u, v = path[i], path[(i + 1) % n]
                if (v, u) in seen:
                    spurs.add(tuple(sorted((u, v))))
                seen.add((u, v))
        if not spurs:
            break
        pieces = [e for e in pieces if e not in spurs]
    rings = []
    for path in paths:
        if len(path) < 3:
            continue
        arr = np.vstack([path, path[:1]])
        if core.ring_signed_area(arr) > 1e-15:
            rings.append(arr)
    return rings


def _prune_dangles(pieces):
    while True:
        deg: dict[tuple, int] = {}
        for a, b in pieces:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        kept = [e for e in pieces if deg[e[0]] > 1 and deg[e[1]] > 1]
        if len(kept) == len(pieces):
            return pieces
        pieces = kept


def _face_walk_paths(pieces) -> list[list]:
    adj: dict[tuple, list[tuple]] = {}
    for a, b in pieces:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ang_index: dict[tuple, dict[tuple, int]] = {}
    for v, ns in adj.items():
        uniq = sorted(set(ns), key=lambda w: np.arctan2(w[1] - v[1], w[0] - v[0]))
        adj[v] = uniq
        ang_index[v] = {w: i for i, w in enumerate(uniq)}
    dir_edges = set()
    for a, b in pieces:
        dir_edges.add((a, b))
        dir_edges.add((b, a))
    used: set = set()
    paths = []
    max_steps = 4 * len(dir_edges) + 8
    for e0 in sorted(dir_edges):
        if e0 in used:
            continue
        path = []
        e = e0
        for _ in range(max_steps):
            used.add(e)
            u, v = e
            path.append(u)
            ns = adj[v]
            i = ang_index[v][u]
            w = ns[(i - 1) % len(ns)]
            e = (v, w)
            if e == e0:
                break
        else:
            continue  # open walk (shouldn't happen on a closed graph)
        paths.append(path)
    return paths


def polygonize_noded(geometries):
    """Noding variant (internal): node the linework first, then extract
    the planar FACES like the GEOS polygonizer — every CCW cycle is a
    face shell and every CW cycle except the unbounded one is the hole
    of the smallest shell containing it.  Used by split(), whose inputs
    self-intersect; the PUBLIC polygonize below follows GEOS and does
    NOT node."""
    geoms = [geometries] if isinstance(geometries, Geom) else [g for g in geometries]
    segs = _all_segments(geoms)
    pieces = _noded_pieces(segs)
    pieces = [tuple(sorted((a, b))) for a, b in pieces]
    pieces = list(dict.fromkeys(pieces))
    paths = None
    while True:
        pieces = _prune_dangles(pieces)
        if not pieces:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        paths = _face_walk_paths(pieces)
        spurs = set()
        for path in paths:
            seen = set()
            n = len(path)
            for i in range(n):
                u, v = path[i], path[(i + 1) % n]
                if (v, u) in seen:
                    spurs.add(tuple(sorted((u, v))))
                seen.add((u, v))
        if not spurs:
            break
        pieces = [e for e in pieces if e not in spurs]
    pos, neg = [], []
    for path in paths:
        if len(path) < 3:
            continue
        arr = np.vstack([path, path[:1]])
        sa = core.ring_signed_area(arr)
        if sa > 1e-15:
            pos.append(arr)
        elif sa < -1e-15:
            neg.append(arr)
    shells = [[r] for r in pos]
    areas = [abs(core.ring_signed_area(r)) for r in pos]
    for n_ring in neg:
        rx, ry = Geom(GeomType.POLYGON,
                      rings=[n_ring[::-1]])._representative_xy()
        n_area = abs(core.ring_signed_area(n_ring))
        best, best_area = None, np.inf
        for k, r in enumerate(pos):
            # the owning face shell must be strictly larger than the
            # hole cycle (faces INSIDE the hole region are not owners)
            if (areas[k] > n_area and areas[k] < best_area
                    and core.point_in_rings(rx, ry, [r]) == 2):
                best, best_area = k, areas[k]
        if best is not None:
            shells[best].append(n_ring[::-1])
        # no container → the unbounded face's cycle → dropped
    polys = [Geom(GeomType.POLYGON, rings=s) for s in shells]
    return Geom(GeomType.GEOMETRYCOLLECTION, parts=polys)


def _nest_rings(rings: list[np.ndarray]) -> list[Geom]:
    """Assign each ring as shell or hole of its smallest container."""
    polys = []
    order = np.argsort([-abs(core.ring_signed_area(r)) for r in rings])
    shells: list[list[np.ndarray]] = []
    for i in order:
        r = rings[i]
        placed = False
        cx, cy = r[:-1].mean(axis=0)
        for s in shells:
            if core.point_in_rings(cx, cy, [s[0]]) == 2:
                # inside an existing shell: check not inside one of its holes
                if all(core.point_in_rings(cx, cy, [h]) != 2 for h in s[1:]):
                    s.append(r)
                    placed = True
                    break
        if not placed:
            shells.append([r])
    for s in shells:
        polys.append(Geom(GeomType.POLYGON, rings=s))
    return polys


def polygonize_full_noded(geometries):
    """Noding variant of polygonize_full (internal — see
    polygonize_noded).  (polygons, cut_edges, dangles, invalid); cut /
    dangle outputs are MULTILINESTRINGs of noded pieces."""
    geoms = [geometries] if isinstance(geometries, Geom) else [g for g in geometries]
    segs = _all_segments(geoms)
    pieces = _noded_pieces(segs)
    rings = _minimal_rings(pieces)
    ring_edges = set()
    for r in rings:
        for k in range(len(r) - 1):
            e = (tuple(r[k]), tuple(r[k + 1]))
            ring_edges.add(e)
            ring_edges.add((e[1], e[0]))
    ring_verts = {v for e in ring_edges for v in e}
    dangles, cuts = [], []
    for a, b in pieces:
        if (a, b) in ring_edges:
            continue
        if a in ring_verts and b in ring_verts:
            cuts.append(Geom.linestring(np.array([a, b])))
        else:
            dangles.append(Geom.linestring(np.array([a, b])))
    polys = _nest_rings(rings)

    def ml(parts):
        return Geom(GeomType.MULTILINESTRING, parts=parts) if parts else Geom.empty(
            GeomType.MULTILINESTRING
        )

    return (
        Geom(GeomType.GEOMETRYCOLLECTION, parts=polys),
        ml(cuts),
        ml(dangles),
        Geom.empty(GeomType.GEOMETRYCOLLECTION),
    )


# --------------------------------------------------------------- polygonize
# GEOS/JTS Polygonizer semantics (reference constructive.py:884,939):
# the input linework is NOT noded — nodes exist only at linestring
# endpoints.  Dangles are pruned from coordinate-sorted degree-1 nodes
# (LIFO), cut edges are edges traversed twice by the same face walk, and
# faces are traced with the interior on the RIGHT (next outgoing edge =
# first one counter-clockwise of the reversed incoming edge), which
# yields each bounded face as a clockwise ring whose start vertex and
# discovery order follow the input edge order — matching GEOS output
# coordinate-for-coordinate.


def _extract_linework(geoms, include_rings: bool):
    """Coordinate arrays of the lineal components.  ``include_rings``
    adds polygon rings (BuildArea extracts all linework; Polygonizer
    extracts only LineString components)."""
    out = []

    def walk(g):
        if g is None or g.is_empty:
            return
        t = g.type_id
        if t in (GeomType.LINESTRING, GeomType.LINEARRING):
            c = np.asarray(g.xys, dtype=float)[:, :2]
            if len(c) >= 2:
                out.append(c)
        elif t == GeomType.POLYGON and include_rings:
            for r in g.rings:
                r = np.asarray(r, dtype=float)[:, :2]
                if len(r) >= 2:
                    out.append(r)
        elif t in (GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON,
                   GeomType.MULTIPOINT, GeomType.GEOMETRYCOLLECTION):
            for p in g.parts:
                walk(p)

    for g in geoms:
        walk(g)
    return out


class _PolyGraph:
    def __init__(self, lines):
        self.lines = []
        for c in lines:
            # drop consecutive duplicate coordinates (angles need them)
            keep = np.ones(len(c), dtype=bool)
            keep[1:] = (np.diff(c, axis=0) != 0).any(axis=1)
            c = c[keep]
            if len(c) >= 2:
                self.lines.append(c)
        n = len(self.lines)
        self.alive = [True] * n
        self.start = [tuple(c[0]) for c in self.lines]
        self.end = [tuple(c[-1]) for c in self.lines]
        self.at: dict[tuple, list[tuple[int, bool]]] = {}
        for i in range(n):
            self.at.setdefault(self.start[i], []).append((i, True))
            self.at.setdefault(self.end[i], []).append((i, False))

    def _angle(self, de):
        i, fwd = de
        c = self.lines[i]
        a, b = (c[0], c[1]) if fwd else (c[-1], c[-2])
        return np.arctan2(b[1] - a[1], b[0] - a[0])

    def _deg(self, v):
        return sum(1 for i, _ in self.at.get(v, ()) if self.alive[i])

    def delete_dangles(self):
        stack = sorted(v for v in self.at if self._deg(v) == 1)
        dangles = []
        while stack:
            v = stack.pop()
            if self._deg(v) != 1:
                continue
            i = next(i for i, _ in self.at[v] if self.alive[i])
            self.alive[i] = False
            dangles.append(i)
            w = self.end[i] if v == self.start[i] else self.start[i]
            if self._deg(w) == 1:
                stack.append(w)
        return dangles

    def _next(self, de):
        """Face-walk successor: first outgoing dirEdge CCW of the
        reversed incoming edge (interior stays on the right)."""
        i, fwd = de
        v = self.end[i] if fwd else self.start[i]
        back = (i, not fwd)
        ref = self._angle(back)
        best, best_key = None, None
        for cand in self.at[v]:
            if not self.alive[cand[0]] or cand == back:
                continue
            delta = (self._angle(cand) - ref) % (2 * np.pi)
            if delta == 0:
                # coincident duplicate edge: full turn, chosen last
                delta = 2 * np.pi
            if best_key is None or delta < best_key:
                best, best_key = cand, delta
        return best if best is not None else back

    def _walk_rings(self):
        """All face walks over live edges, in dirEdge order.  Returns a
        list of (ring coords, [dirEdges])."""
        used = set()
        rings = []
        dir_order = []
        for i in range(len(self.lines)):
            dir_order.append((i, True))
            dir_order.append((i, False))
        limit = 2 * len(self.lines) + 4
        for e0 in dir_order:
            if e0 in used or not self.alive[e0[0]]:
                continue
            path = []
            e = e0
            for _ in range(limit):
                used.add(e)
                path.append(e)
                e = self._next(e)
                if e == e0:
                    break
            rings.append(path)
        return rings

    def ring_coords(self, path):
        pts = []
        for i, fwd in path:
            c = self.lines[i] if fwd else self.lines[i][::-1]
            pts.append(c[:-1])
        pts.append(self.lines[path[0][0]][:1] if path[0][1]
                   else self.lines[path[0][0]][-1:])
        return np.vstack(pts)

    def delete_cut_edges(self):
        label = {}
        for rid, path in enumerate(self._walk_rings()):
            for de in path:
                label[de] = rid
        cuts = []
        for i in range(len(self.lines)):
            if self.alive[i] and label.get((i, True)) == label.get((i, False)):
                self.alive[i] = False
                cuts.append(i)
        return cuts


def _polygonize_faces(lines):
    """Shared JTS-polygonizer core.  Returns (shells, dangle_idx,
    cut_idx, invalid_rings, graph) where shells = [(shell_ring,
    [hole_rings], area)] in discovery order."""
    g = _PolyGraph(lines)
    dangle_idx = g.delete_dangles()
    cut_idx = g.delete_cut_edges()
    shells, holes, invalid = [], [], []
    for path in g._walk_rings():
        ring = g.ring_coords(path)
        if len(np.unique(ring[:-1], axis=0)) < 3:
            invalid.append(ring)
            continue
        area = core.ring_signed_area(ring)
        if area < 0:
            shells.append([ring, [], -area])
        elif area > 0:
            holes.append(ring)
    # assign each CCW ring as a hole of the smallest shell that properly
    # contains it (a hole vertex not on the shell must be interior);
    # unassigned CCW rings bound the unbounded face and are dropped
    for h in holes:
        hx0, hy0 = h[:, 0].min(), h[:, 1].min()
        hx1, hy1 = h[:, 0].max(), h[:, 1].max()
        best = None
        for s in shells:
            ring = s[0]
            if (ring[:, 0].min() > hx0 or ring[:, 1].min() > hy0
                    or ring[:, 0].max() < hx1 or ring[:, 1].max() < hy1):
                continue
            shell_pts = {tuple(p) for p in ring[:-1]}
            probe = next(
                (p for p in h[:-1] if tuple(p) not in shell_pts), None
            )
            if probe is None:
                continue
            if core.point_in_rings(probe[0], probe[1], [ring]) != 2:
                continue
            if best is None or s[2] < best[2]:
                best = s
        if best is not None:
            best[1].append(h)
    return shells, dangle_idx, cut_idx, invalid, g


def _shell_polys(shells):
    return [
        Geom(GeomType.POLYGON, rings=[s[0]] + s[1]) for s in shells
    ]


def _gc(parts):
    return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts) if parts \
        else Geom.empty(GeomType.GEOMETRYCOLLECTION)


def _apply_lastaxis(fn, geometries, axis=None):
    """GEOS polygonize is a generalized ufunc reducing one axis
    (default the last): scalars / 1-D collapse to a scalar result."""
    if isinstance(geometries, Geom) or geometries is None:
        return fn([geometries])
    arr = np.asarray(geometries, dtype=object)
    if arr.ndim <= 1:
        return fn(list(arr))
    arr = np.moveaxis(arr, -1 if axis is None else axis, -1)
    out = np.empty(arr.shape[:-1], dtype=object)
    for idx in np.ndindex(out.shape):
        out[idx] = fn(list(arr[idx]))
    return out


def polygonize(geometries, axis=None):
    """constructive.py:884 — GEOMETRYCOLLECTION of the faces of the
    (pre-noded) linework, GEOS Polygonizer semantics and ordering."""

    def one(geoms):
        lines = _extract_linework(geoms, include_rings=False)
        shells, *_ = _polygonize_faces(lines)
        return _gc(_shell_polys(shells))

    return _apply_lastaxis(one, geometries, axis)


def polygonize_full(geometries, axis=None):
    """constructive.py:939 — (polygons, cut_edges, dangles, invalid),
    each a GEOMETRYCOLLECTION, GEOS Polygonizer semantics/ordering."""

    def one(geoms):
        lines = _extract_linework(geoms, include_rings=False)
        shells, dangle_idx, cut_idx, invalid, g = _polygonize_faces(lines)
        return (
            _gc(_shell_polys(shells)),
            _gc([Geom.linestring(g.lines[i]) for i in sorted(cut_idx)]),
            _gc([Geom.linestring(g.lines[i]) for i in dangle_idx]),
            _gc([Geom.linestring(r) for r in invalid]),
        )

    res = _apply_lastaxis(one, geometries, axis)
    if isinstance(res, tuple):
        return res
    # array form: transpose the array of 4-tuples into a 4-tuple of arrays
    outs = []
    for k in range(4):
        o = np.empty(res.shape, dtype=object)
        for idx in np.ndindex(res.shape):
            o[idx] = res[idx][k]
        outs.append(o)
    return tuple(outs)


def build_area(geometry):
    """constructive.py:654 — areal geometry from ALL linework (polygon
    rings included): polygonize the arrangement, keep faces at even
    containment depth (GEOS BuildArea)."""
    geoms = [geometry] if isinstance(geometry, Geom) or geometry is None \
        else list(geometry)
    lines = _extract_linework(geoms, include_rings=True)
    shells, *_ = _polygonize_faces(lines)
    kept = []
    for i, s in enumerate(shells):
        depth = 0
        for j, t in enumerate(shells):
            if i == j:
                continue
            other_pts = {tuple(p) for p in t[0][:-1]}
            probe = next(
                (p for p in s[0][:-1] if tuple(p) not in other_pts), None
            )
            if probe is not None and core.point_in_rings(
                probe[0], probe[1], [t[0]]
            ) == 2:
                depth += 1
        if depth % 2 == 0:
            kept.append(s)
    polys = _shell_polys(kept)
    if not polys:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if len(polys) == 1:
        return polys[0]
    return Geom(GeomType.MULTIPOLYGON, parts=polys)


def snap(geometry, reference, tolerance):
    """constructive.py:1171 — move vertices of ``geometry`` onto nearby
    vertices (preferred) or segments of ``reference`` within tolerance."""
    from engine.geo.coordinates import get_coordinates, set_coordinates
    from engine.geo.relate import Decomp

    def one(g, ref):
        if g is None or ref is None:
            return None
        dref = Decomp(ref)
        rv = dref.vertices
        segs = dref.segs
        c = get_coordinates(g).copy()
        for i in range(len(c)):
            x, y = c[i]
            if len(rv):
                d2 = (rv[:, 0] - x) ** 2 + (rv[:, 1] - y) ** 2
                j = int(np.argmin(d2))
                if d2[j] <= tolerance * tolerance:
                    c[i] = rv[j]
                    continue
            if len(segs):
                d2 = core.point_seg_dist2(
                    x, y, segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
                )
                j = int(np.argmin(d2))
                if d2[j] <= tolerance * tolerance:
                    a = segs[j, :2]
                    b = segs[j, 2:]
                    ab = b - a
                    t = float(np.clip(((np.array([x, y]) - a) @ ab) / max(ab @ ab, 1e-300), 0, 1))
                    c[i] = a + t * ab
        return set_coordinates(g, c, _keep_dims=True)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry, reference)
    return np.array([one(g, r) for g, r in zip(geometry, reference)], dtype=object)


def shared_paths(a, b):
    """linear.py:172 — GEOMETRYCOLLECTION (forward MULTILINESTRING,
    backward MULTILINESTRING) of collinear overlapping pieces; None
    propagates, non-lineal input raises."""
    from engine.geo.relate import Decomp

    if a is None or b is None:
        return None
    lineal = (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING)
    if a.type_id not in lineal or b.type_id not in lineal:
        from engine.geo.errors import GEOSException

        raise GEOSException(
            "IllegalArgumentException: shared_paths requires lineal "
            "geometries"
        )

    da, db = Decomp(a), Decomp(b)
    fwd, bwd = [], []
    for sa in da.segs:
        p, q = sa[:2], sa[2:]
        r = q - p
        len2 = r @ r
        if len2 == 0:
            continue
        for sb in db.segs:
            u, v = sb[:2], sb[2:]
            # collinear?
            if core.orient(p[0], p[1], q[0], q[1], u[0], u[1]) != 0:
                continue
            if core.orient(p[0], p[1], q[0], q[1], v[0], v[1]) != 0:
                continue
            tu = ((u - p) @ r) / len2
            tv = ((v - p) @ r) / len2
            lo, hi = min(tu, tv), max(tu, tv)
            lo, hi = max(lo, 0.0), min(hi, 1.0)
            if hi - lo <= 1e-12:
                continue
            seg = np.array([p + lo * r, p + hi * r])
            if tv >= tu:
                fwd.append(Geom.linestring(seg))
            else:
                bwd.append(Geom.linestring(seg))

    def ml(parts):
        return Geom(GeomType.MULTILINESTRING, parts=parts) if parts else Geom.empty(
            GeomType.MULTILINESTRING
        )

    return Geom(GeomType.GEOMETRYCOLLECTION, parts=[ml(fwd), ml(bwd)])


def minimum_clearance_line(geometry):
    """constructive.py:758 — the two-point LINESTRING achieving the
    minimum clearance."""
    from engine.geo.relate import Decomp

    g = geometry
    if g is None:
        return None
    d = Decomp(g)
    vs = d.vertices
    segs = d.segs
    best = (np.inf, None)
    if len(vs) >= 2:
        d2 = (vs[:, None, 0] - vs[None, :, 0]) ** 2 + (vs[:, None, 1] - vs[None, :, 1]) ** 2
        d2[d2 == 0] = np.inf
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        if d2[i, j] < best[0]:
            best = (d2[i, j], np.array([vs[i], vs[j]]))
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
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        if d2[i, j] < best[0]:
            a = segs[j, :2]
            b = segs[j, 2:]
            ab = b - a
            t = float(np.clip(((vs[i] - a) @ ab) / max(ab @ ab, 1e-300), 0, 1))
            best = (d2[i, j], np.array([vs[i], a + t * ab]))
    if best[1] is None:
        return Geom.empty(GeomType.LINESTRING)
    return Geom.linestring(best[1])


def minimum_width(geometry):
    """constructive.py:1434 — shortest LINESTRING across the geometry:
    rotating calipers min hull width (GEOS MinimumDiameter)."""
    from engine.geo.constructive import _hull_of_points
    from engine.geo.relate import Decomp

    g = geometry
    if g is None:
        return None
    h = _hull_of_points(Decomp(g).vertices)
    if len(h) < 2:
        return Geom.empty(GeomType.LINESTRING)
    if len(h) == 2:
        return Geom.linestring(h)
    best = (np.inf, None)
    n = len(h)
    for i in range(n):
        a, b = h[i], h[(i + 1) % n]
        ab = b - a
        L = np.hypot(*ab)
        if L == 0:
            continue
        d = np.abs(core.orient(a[0], a[1], b[0], b[1], h[:, 0], h[:, 1])) / L
        j = int(np.argmax(d))
        if d[j] < best[0]:
            p = h[j]
            t = float(((p - a) @ ab) / (L * L))
            foot = a + np.clip(t, 0, 1) * ab
            best = (d[j], np.array([foot, p]))
    return Geom.linestring(best[1])
