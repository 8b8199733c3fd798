"""Triangulation family (reference constructive.py:491
`delaunay_triangles`, :1270 `voronoi_polygons`, :431 `concave_hull`).

- Delaunay: Bowyer–Watson over the input's unique vertices (O(n²),
  adequate for the reference's own benchmark sizes); ``only_edges``
  returns the unique edge set as MULTILINESTRING.
- Voronoi: per-site half-plane intersection (perpendicular bisectors
  clipped against an envelope box) — O(n² · m) but robust; matches GEOS
  semantics of clipping cells to an expanded envelope.
- Concave hull: Delaunay border-edge peeling (chi-shape).  ``ratio``
  interpolates the edge-length threshold between the min and max border
  edge length, like GEOS ConcaveHull.
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo.decorators import deprecate_positional
from engine.geo.geom import Geom, GeomType


def _unique_vertices(g: Geom) -> np.ndarray:
    from engine.geo.relate import Decomp

    vs = Decomp(g).vertices
    return np.unique(vs, axis=0) if len(vs) else vs


def _bowyer_watson(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Indices of Delaunay triangles over pts (Bowyer–Watson).

    Dispatches to the adjacency-tracked incremental build past a small
    size — the naive variant scans every triangle per insertion (O(n²))
    and falls over by a few thousand points."""
    if len(pts) >= 64:
        return _bowyer_watson_fast(pts)
    return _bowyer_watson_naive(pts)


def _bowyer_watson_fast(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Incremental Bowyer–Watson with triangle adjacency: points are
    inserted in Morton order, each located by an orientation walk from
    the previous insertion, and the bad-triangle cavity grows by BFS
    over neighbors — expected O(n) work overall instead of the naive
    scan-all-triangles O(n²).  Same super-triangle and incircle
    tolerance as the naive variant, so results agree."""
    n = len(pts)
    if n < 3:
        return []
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 10
    P = np.vstack([
        pts,
        [[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]],
    ])
    Px, Py = P[:, 0], P[:, 1]

    # Morton insertion order (quantized interleave) for walk locality
    qx = ((pts[:, 0] - pts[:, 0].min()) / max(span / 10, 1e-300) * 65535).astype(np.uint64)
    qy = ((pts[:, 1] - pts[:, 1].min()) / max(span / 10, 1e-300) * 65535).astype(np.uint64)

    def _spread(v):
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
        return v

    order = np.argsort(_spread(qx) | (_spread(qy) << np.uint64(1)), kind="stable")

    # triangle soup: tv[t]=(a,b,c) CCW, tn[t][k]=neighbor across the
    # directed edge (tv[k], tv[(k+1)%3]), cc[t]=(ux,uy,r2) circumcircle
    tv: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    tn: list[list[int]] = [[-1, -1, -1]]
    alive = [True]
    cc: list[tuple[float, float, float]] = []

    def circum(a, b, c):
        ax, ay, bx, by, ccx, ccy = Px[a], Py[a], Px[b], Py[b], Px[c], Py[c]
        d = 2 * (ax * (by - ccy) + bx * (ccy - ay) + ccx * (ay - by))
        if d == 0:
            return (0.0, 0.0, -1.0)
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = ccx * ccx + ccy * ccy
        ux = (a2 * (by - ccy) + b2 * (ccy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (ccx - bx) + b2 * (ax - ccx) + c2 * (bx - ax)) / d
        return (ux, uy, (ax - ux) ** 2 + (ay - uy) ** 2)

    cc.append(circum(n, n + 1, n + 2))
    last = 0
    for i in order:
        px, py = Px[i], Py[i]
        # --- locate by orientation walk (fallback: scan)
        t = last if alive[last] else next(k for k in range(len(tv)) if alive[k])
        found = -1
        for _ in range(4 * (len(tv) + 4)):
            a, b, c = tv[t]
            if (px - Px[a]) * (Py[b] - Py[a]) - (py - Py[a]) * (Px[b] - Px[a]) > 0:
                t2 = tn[t][0]
            elif (px - Px[b]) * (Py[c] - Py[b]) - (py - Py[b]) * (Px[c] - Px[b]) > 0:
                t2 = tn[t][1]
            elif (px - Px[c]) * (Py[a] - Py[c]) - (py - Py[c]) * (Px[a] - Px[c]) > 0:
                t2 = tn[t][2]
            else:
                found = t
                break
            if t2 == -1:
                break
            t = t2
        if found == -1:  # degenerate walk; exact but slow fallback
            found = next(
                k for k in range(len(tv))
                if alive[k] and _tri_contains(tv[k], Px, Py, px, py)
            )
        # --- cavity: BFS over neighbors with the incircle test
        bad = {found}
        stack = [found]
        while stack:
            cur = stack.pop()
            for nb in tn[cur]:
                if nb != -1 and nb not in bad:
                    ux, uy, r2 = cc[nb]
                    if r2 >= 0 and (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                        bad.add(nb)
                        stack.append(nb)
        # --- boundary edges (directed as in their bad triangle → CCW fans)
        boundary = []  # (u, v, outer_neighbor)
        for bt in bad:
            a, b, c = tv[bt]
            for k, (u, v) in enumerate(((a, b), (b, c), (c, a))):
                nb = tn[bt][k]
                if nb == -1 or nb not in bad:
                    boundary.append((u, v, nb))
        for bt in bad:
            alive[bt] = False
        # --- retriangulate the fan; stitch adjacency via per-vertex map
        edge_new: dict[int, int] = {}  # fan vertex u -> new tri with edge (i, u)
        first_new = len(tv)
        for (u, v, outer) in boundary:
            nt = len(tv)
            tv.append((u, v, i))
            tn.append([outer, -1, -1])  # edges: (u,v)->outer, (v,i), (i,u)
            alive.append(True)
            cc.append(circum(u, v, i))
            if outer != -1:
                o_tv = tv[outer]
                for k in range(3):
                    if o_tv[k] == v and o_tv[(k + 1) % 3] == u:
                        tn[outer][k] = nt
                        break
            edge_new[u] = nt
        # edge (v,i) of tri(u,v,i) pairs with edge (i,v) of tri(v,w,i)
        for (u, v, _o) in boundary:
            nt = edge_new[u]
            nxt = edge_new.get(v)
            if nxt is not None:
                tn[nt][1] = nxt
                tn[nxt][2] = nt
        last = first_new if first_new < len(tv) else last
    out = []
    for k, t in enumerate(tv):
        if alive[k] and t[0] < n and t[1] < n and t[2] < n:
            out.append(t)
    return out


def _tri_contains(t, Px, Py, px, py) -> bool:
    a, b, c = t
    return (
        (px - Px[a]) * (Py[b] - Py[a]) - (py - Py[a]) * (Px[b] - Px[a]) <= 0
        and (px - Px[b]) * (Py[c] - Py[b]) - (py - Py[b]) * (Px[c] - Px[b]) <= 0
        and (px - Px[c]) * (Py[a] - Py[c]) - (py - Py[c]) * (Px[a] - Px[c]) <= 0
    )


def _bowyer_watson_naive(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Reference implementation: scan-all-triangles Bowyer–Watson."""
    n = len(pts)
    if n < 3:
        return []
    # super-triangle
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 10
    sp = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]])
    P = np.vstack([pts, sp])
    tris = [(n, n + 1, n + 2)]

    def circum(t):
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return (0.0, 0.0, -1.0)
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (ux, uy, r2)

    cc = {tris[0]: circum(tris[0])}
    for i in range(n):
        px, py = P[i]
        bad = []
        for t in tris:
            ux, uy, r2 = cc[t]
            if r2 >= 0 and (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the bad-triangle cavity
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del cc[t]
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                nt = (u, v, i)
                tris.append(nt)
                cc[nt] = circum(nt)
    out = []
    for t in tris:
        if all(v < n for v in t):
            out.append(t)
    return out


def delaunay_triangles(geometry, tolerance: float = 0.0, only_edges: bool = False):
    """constructive.py:491."""

    def one(g):
        if g is None:
            return None
        pts = _unique_vertices(g)
        if len(pts) < 3:
            return (
                Geom.empty(GeomType.MULTILINESTRING)
                if only_edges
                else Geom.empty(GeomType.GEOMETRYCOLLECTION)
            )
        tris = _bowyer_watson(pts)
        if only_edges:
            edges = set()
            for a, b, c in tris:
                for e in ((a, b), (b, c), (c, a)):
                    edges.add((min(e), max(e)))
            parts = [
                Geom.linestring(np.array([pts[u], pts[v]])) for u, v in sorted(edges)
            ]
            return Geom(GeomType.MULTILINESTRING, parts=parts)
        parts = []
        for a, b, c in tris:
            ring = np.array([pts[a], pts[b], pts[c], pts[a]])
            if core.ring_signed_area(ring) < 0:
                ring = ring[::-1]
            parts.append(Geom(GeomType.POLYGON, rings=[ring]))
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def _ear_clip(ring: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear clipping of a simple CCW ring (no holes) → triangle index
    triples into ring[:-1]."""
    n = len(ring) - 1
    idx = list(range(n))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        ear_found = False
        for k in range(len(idx)):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % len(idx)]
            a, b, c = ring[i0], ring[i1], ring[i2]
            if core.orient(a[0], a[1], b[0], b[1], c[0], c[1]) <= 0:
                continue  # reflex or collinear
            # no other active vertex strictly inside the ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = ring[j]
                if (
                    core.orient(a[0], a[1], b[0], b[1], p[0], p[1]) > 0
                    and core.orient(b[0], b[1], c[0], c[1], p[0], p[1]) > 0
                    and core.orient(c[0], c[1], a[0], a[1], p[0], p[1]) > 0
                ):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:
            break
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris


def _bridge_holes(shell: np.ndarray, holes: list[np.ndarray]) -> np.ndarray:
    """Splice CW holes into a CCW shell with zero-width bridges (the
    earcut approach): pick a mutually visible shell-vertex/hole-vertex
    pair (segment crossing no edge of any ring) and duplicate both
    endpoints, producing one simple weakly-closed ring."""
    outer = shell[:-1]
    remaining = sorted(holes, key=lambda h: -h[:, 0].max())
    for hole in remaining:
        hpts = hole[:-1]
        hi = int(np.argmax(hpts[:, 0]))  # rightmost hole vertex
        M = hpts[hi]
        # all edges that a bridge must not cross: current outer + this hole
        def edges_of(r):
            rr = np.vstack([r, r[:1]])
            return np.hstack([rr[:-1], rr[1:]])

        segs = np.vstack([edges_of(outer)] + [edges_of(h[:-1]) for h in remaining])
        best, best_d = None, np.inf
        for pi in range(len(outer)):
            P = outer[pi]
            d2 = (P[0] - M[0]) ** 2 + (P[1] - M[1]) ** 2
            if d2 >= best_d:
                continue
            inter = core.segments_intersect_bool(
                M[0], M[1], P[0], P[1],
                segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3],
            )
            # crossings touching only at M or P endpoints are fine
            shares = (
                ((segs[:, 0] == M[0]) & (segs[:, 1] == M[1]))
                | ((segs[:, 2] == M[0]) & (segs[:, 3] == M[1]))
                | ((segs[:, 0] == P[0]) & (segs[:, 1] == P[1]))
                | ((segs[:, 2] == P[0]) & (segs[:, 3] == P[1]))
            )
            if not bool(np.any(inter & ~shares)):
                best, best_d = pi, d2
        if best is None:
            raise NotImplementedError("no visible bridge vertex found (degenerate hole)")
        pi = best
        # splice: ...P, M, hole-cycle..., M, P, ...
        cyc = np.vstack([hpts[hi:], hpts[:hi]])
        outer = np.vstack([outer[: pi + 1], cyc, [M], [outer[pi]], outer[pi + 1:]])
    return np.vstack([outer, outer[:1]])


def _lawson_flips(pts: np.ndarray, tris: list[tuple[int, int, int]],
                  constrained: set) -> list[tuple[int, int, int]]:
    """Flip non-constrained interior edges until locally Delaunay."""

    def in_circum(t, p):
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return False
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (p[0] - ux) ** 2 + (p[1] - uy) ** 2 < r2 * (1 - 1e-12)

    tris = [tuple(t) for t in tris]
    for _ in range(len(tris) * len(tris) + 10):
        edge_map: dict = {}
        for ti, t in enumerate(tris):
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edge_map.setdefault((min(e), max(e)), []).append(ti)
        flipped = False
        for e, owners in edge_map.items():
            if len(owners) != 2 or e in constrained:
                continue
            t1, t2 = tris[owners[0]], tris[owners[1]]
            o1 = next(v for v in t1 if v not in e)
            o2 = next(v for v in t2 if v not in e)
            if in_circum(t1, pts[o2]):
                # flip e → (o1, o2)
                n1 = (o1, e[0], o2)
                n2 = (o1, o2, e[1])

                def fix(t):
                    a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
                    if core.orient(a[0], a[1], b[0], b[1], c[0], c[1]) < 0:
                        return (t[0], t[2], t[1])
                    return t

                tris[owners[0]] = fix(n1)
                tris[owners[1]] = fix(n2)
                flipped = True
                break
        if not flipped:
            break
    return tris


def constrained_delaunay_triangles(geometry):
    """constructive.py:546 — triangulation of polygon interiors
    respecting the boundary: ear clipping + Lawson flips on
    non-constrained edges (= constrained Delaunay for simple rings;
    polygons with holes triangulate shell-only and raise if holed)."""

    def one(g):
        if g is None:
            return None
        if g.type_id == GeomType.MULTIPOLYGON:
            parts = []
            for p in g.parts:
                parts.extend(one(p).parts)
            return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)
        if g.type_id != GeomType.POLYGON or g.is_empty:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        ring = g.rings[0]
        if core.ring_signed_area(ring) < 0:
            ring = ring[::-1].copy()
        if len(g.rings) > 1:
            holes = []
            for h in g.rings[1:]:
                hh = h if core.ring_signed_area(h) < 0 else h[::-1].copy()
                holes.append(hh)
            ring = _bridge_holes(ring, holes)
        pts = ring[:-1]
        tris = _ear_clip(ring)
        n = len(pts)
        constrained = {(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)}
        tris = _lawson_flips(pts, tris, constrained)
        parts = []
        for a, b, c in tris:
            tri = np.array([pts[a], pts[b], pts[c], pts[a]])
            parts.append(Geom(GeomType.POLYGON, rings=[tri]))
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


@deprecate_positional(["extend_to", "only_edges", "ordered"])
def voronoi_polygons(geometry, tolerance: float = 0.0, extend_to=None,
                     only_edges: bool = False, ordered: bool = False):
    """constructive.py:1270 — cell per unique input point, clipped to the
    (expanded) envelope.  Default cell order is lexicographic by (x, y)
    (GEOS order); ``ordered=True`` returns cells in input first-appearance
    order (GEOS ≥ 3.12 semantics)."""
    from engine.geo.set_operations import _clip_convex

    def one(g):
        if g is None:
            return None
        if ordered:
            from engine.geo.relate import Decomp

            vs = Decomp(g).vertices
            if len(vs):
                _, first = np.unique(vs, axis=0, return_index=True)
                pts = vs[np.sort(first)]
            else:
                pts = vs
        else:
            pts = _unique_vertices(g)
        if tolerance and len(pts):
            # GEOS snapping emulation: sequential site snapping with an
            # effective radius of tolerance/sqrt(2) (the quadedge vertex
            # tolerance).  GEOS's triangulator throws a TopologyException
            # for most inputs where a nonzero tolerance does NOT merge
            # any sites (tests/legacy/test_voronoi_diagram.py pins this
            # observable behavior) — mirror that failure mode.
            from engine.geo.errors import GEOSException

            radius = float(tolerance) / np.sqrt(2.0)
            kept: list[np.ndarray] = []
            merged = False
            for p in pts:
                if kept and min(
                    float(np.hypot(*(p - k))) for k in kept
                ) < radius:
                    merged = True
                    continue
                kept.append(p)
            if not merged:
                raise GEOSException(
                    "TopologyException: Could not compute Voronoi diagram "
                    f"with tolerance {tolerance}"
                )
            pts = np.asarray(kept)
        if len(pts) < 2:
            # constructive.py:1277 — empty for fewer than 2 vertices
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        # GEOS VoronoiDiagramBuilder clip envelope: the sites envelope
        # expanded by max(width, height) on each side, then extended to
        # include extend_to's envelope
        sb = np.array([pts[:, 0].min(), pts[:, 1].min(),
                       pts[:, 0].max(), pts[:, 1].max()])
        pad = max(sb[2] - sb[0], sb[3] - sb[1])
        xmin, ymin = sb[0] - pad, sb[1] - pad
        xmax, ymax = sb[2] + pad, sb[3] + pad
        if isinstance(extend_to, Geom):
            eb = extend_to.bounds
            xmin, ymin = min(xmin, eb[0]), min(ymin, eb[1])
            xmax, ymax = max(xmax, eb[2]), max(ymax, eb[3])
        pad = max(xmax - xmin, ymax - ymin, 1e-300)
        box = np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
        # Voronoi via the Delaunay dual: a point's cell is exactly the
        # intersection of bisector half-planes with its DELAUNAY
        # NEIGHBORS (≈6 clips/cell) — all-pairs clipping would be O(n²).
        # No triangulation (collinear sites / n==2) → keep all-pairs.
        nbrs: list | None = None
        if len(pts) >= 3:
            tris = _bowyer_watson(pts)
            if tris:
                nbr_sets = [set() for _ in range(len(pts))]
                for a, b, c in tris:
                    nbr_sets[a].update((b, c))
                    nbr_sets[b].update((a, c))
                    nbr_sets[c].update((a, b))
                if all(nbr_sets):
                    nbrs = [sorted(s) for s in nbr_sets]
        cells = []
        for i, p in enumerate(pts):
            ring = box
            for j in (nbrs[i] if nbrs is not None else range(len(pts))):
                if i == j:
                    continue
                q = pts[j]
                # half-plane closer to p than q: clip by bisector
                mid = (p + q) / 2
                nvec = q - p  # points away from p
                # build a long clip edge along the bisector, oriented so
                # the kept side (left) contains p
                tvec = np.array([-nvec[1], nvec[0]])
                tlen = np.hypot(*tvec)
                if tlen == 0:
                    continue
                # scale by a POWER OF TWO (exact in binary floats) so the
                # clip-line endpoints stay on the exact bisector — a
                # normalized direction would smear ~ulp error into every
                # cell corner and the cell areas stop tiling the clip
                # rect exactly
                s = 2.0 ** int(np.ceil(np.log2(
                    (4 * pad + tlen) / tlen)))
                tvec = tvec * s
                a_, b_ = mid - tvec, mid + tvec
                if core.orient(a_[0], a_[1], b_[0], b_[1], p[0], p[1]) < 0:
                    a_, b_ = b_, a_
                ring = _clip_halfplane(ring, a_, b_)
                if len(ring) == 0:
                    break
            if len(ring):
                cells.append(Geom(GeomType.POLYGON, rings=[ring]))
        if only_edges:
            edges = set()
            for c in cells:
                r = c.rings[0]
                for k in range(len(r) - 1):
                    e = (tuple(r[k]), tuple(r[k + 1]))
                    if e[0] == e[1]:
                        continue
                    edges.add(tuple(sorted(e)))
            return Geom(
                GeomType.MULTILINESTRING,
                parts=[Geom.linestring(np.array(e)) for e in sorted(edges)],
            )
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=cells)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def _clip_halfplane(ring: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Keep the part of closed ring left of directed line a→b."""
    pts = list(ring[:-1])
    out = []
    m = len(pts)
    for k in range(m):
        cur, nxt = pts[k], pts[(k + 1) % m]
        d1 = core.orient(a[0], a[1], b[0], b[1], cur[0], cur[1])
        d2 = core.orient(a[0], a[1], b[0], b[1], nxt[0], nxt[1])
        if d1 >= 0:
            out.append(cur)
        if (d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0):
            t = d1 / (d1 - d2)
            out.append(cur + t * (nxt - cur))
    if len(out) < 3:
        return np.empty((0, 2))
    return np.vstack([out, out[:1]])


def concave_hull(geometry, ratio: float = 0.0, allow_holes: bool = False):
    """constructive.py:431 — chi-shape: Delaunay border-edge peeling;
    ratio=1 → convex hull, ratio=0 → shortest-edge threshold."""
    from engine.geo.constructive import convex_hull

    def one(g):
        if g is None:
            return None
        pts = _unique_vertices(g)
        if len(pts) < 4:
            return convex_hull(g)
        tris = set(_bowyer_watson(pts))

        def border_edges(tris):
            cnt: dict[tuple[int, int], int] = {}
            for t in tris:
                for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                    k = (min(e), max(e))
                    cnt[k] = cnt.get(k, 0) + 1
            return {e for e, c in cnt.items() if c == 1}

        def elen(e):
            return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

        all_lens = [elen(e) for t in tris for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
        lmin, lmax = min(all_lens), max(all_lens)
        threshold = lmin + ratio * (lmax - lmin)
        changed = True
        while changed:
            changed = False
            border = border_edges(tris)
            # vertex use count (don't disconnect)
            vcnt: dict[int, int] = {}
            for t in tris:
                for v in t:
                    vcnt[v] = vcnt.get(v, 0) + 1
            for t in sorted(tris, key=lambda t: -max(elen((t[0], t[1])), elen((t[1], t[2])), elen((t[2], t[0])))):
                long_border = [
                    e
                    for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))
                    if (min(e), max(e)) in border and elen(e) > threshold
                ]
                if not long_border:
                    continue
                # removing t must not orphan a vertex or pinch the shape:
                # every vertex of t must stay used by another triangle
                if any(vcnt[v] <= 1 for v in t):
                    continue
                tris.remove(t)
                if not _edges_form_single_ring(border_edges(tris)):
                    tris.add(t)
                    continue
                changed = True
                break
        if allow_holes:
            # carve interior cavities: drop any triangle whose longest
            # edge exceeds the threshold as long as no vertex is
            # orphaned and every boundary vertex stays degree-2 (simple)
            changed = True
            while changed:
                changed = False
                for t in sorted(
                    tris,
                    key=lambda t: -max(elen((t[0], t[1])),
                                       elen((t[1], t[2])),
                                       elen((t[2], t[0]))),
                ):
                    if max(elen((t[0], t[1])), elen((t[1], t[2])),
                           elen((t[2], t[0]))) <= threshold:
                        break
                    vcnt: dict[int, int] = {}
                    for tt in tris:
                        for v in tt:
                            vcnt[v] = vcnt.get(v, 0) + 1
                    if any(vcnt[v] <= 1 for v in t):
                        continue
                    tris.remove(t)
                    be = border_edges(tris)
                    deg: dict[int, int] = {}
                    for u, v in be:
                        deg[u] = deg.get(u, 0) + 1
                        deg[v] = deg.get(v, 0) + 1
                    if any(d != 2 for d in deg.values()):
                        tris.add(t)
                        continue
                    changed = True
                    break
        ring_edges = border_edges(tris)
        rings = _edges_to_rings(ring_edges, pts)
        if not rings:
            return convex_hull(g)
        rings.sort(key=lambda r: -abs(core.ring_signed_area(r)))
        shell = rings[0] if core.ring_signed_area(rings[0]) > 0 else rings[0][::-1]
        holes = [
            r if core.ring_signed_area(r) < 0 else r[::-1] for r in rings[1:]
        ]
        return Geom(GeomType.POLYGON, rings=[shell] + holes)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def _edges_form_single_ring(edges) -> bool:
    if not edges:
        return False
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    if any(len(vs) != 2 for vs in adj.values()):
        return False
    # connected?
    start = next(iter(adj))
    seen = {start}
    stack = [start]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return len(seen) == len(adj)


def _edges_to_rings(edges, pts) -> list[np.ndarray]:
    """Split a degree-2 boundary edge set into its connected rings."""
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    if any(len(vs) != 2 for vs in adj.values()):
        one = _edges_to_ring(edges, pts)
        return [one] if one is not None else []
    rings = []
    visited: set[int] = set()
    for start in adj:
        if start in visited:
            continue
        path = [start]
        visited.add(start)
        prev, cur = None, start
        while True:
            nxt = adj[cur][0] if adj[cur][0] != prev else adj[cur][1]
            if nxt == start:
                break
            path.append(nxt)
            visited.add(nxt)
            prev, cur = cur, nxt
        if len(path) >= 3:
            rings.append(np.vstack([pts[path], pts[path[:1]]]))
    return rings


def _edges_to_ring(edges, pts) -> np.ndarray | None:
    if not _edges_form_single_ring(edges):
        return None
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    start = next(iter(adj))
    path = [start]
    prev = None
    cur = start
    while True:
        nxt = adj[cur][0] if adj[cur][0] != prev else adj[cur][1]
        if nxt == start:
            break
        path.append(nxt)
        prev, cur = cur, nxt
    return np.vstack([pts[path], pts[path[:1]]])
