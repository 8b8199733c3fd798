"""Set operations (reference shapely/set_operations.py, 760 LoC).

Coverage (SURVEY.md §2.5):
- GENERAL areal overlay (intersection / union / difference /
  symmetric_difference of arbitrary polygons incl. holes, concave
  shapes, multipolygons) via the arrangement construction in
  ``_polygon_overlay`` — node both boundaries, keep edges whose two
  sides differ in membership, face-walk, nest holes;
- point/multipoint set semantics exact via the predicate family;
- line×areal intersection/difference via boundary splitting;
- convex×convex Sutherland–Hodgman fast path (the tiling clip);
- n-ary reduce plumbing: *_all with balanced-tree reduction
  (ufuncs.c:63-130 Y_Y_reduce_func equivalent) and the reference's
  empty-input rule (union_all([]) → GEOMETRYCOLLECTION EMPTY,
  set_operations.py:525-530);
- coverage_union(_all) concat semantics for non-overlapping mosaics.

Also covered: line×line overlay (shared linework via noded segment
classification) and grid_size precision snapping (inputs and result
snapped to the grid like GEOSIntersectionPrec).  Remaining edges:
mixed-dimension combos inside GeometryCollections raise (documented).
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


def _face_interior_point(ring: np.ndarray) -> tuple[float, float]:
    """Point just inside a CCW ring: midpoint of its longest edge offset
    a hair to the LEFT.  Edge-local (immune to islands inside the face,
    which representative_point is not — a face of an arrangement can
    contain a disconnected boundary component)."""
    d = np.diff(ring, axis=0)
    lens = np.hypot(d[:, 0], d[:, 1])
    k = int(np.argmax(lens))
    mx, my = (ring[k] + ring[k + 1]) / 2.0
    ux, uy = d[k] / lens[k]
    eps = max(lens[k] * 1e-6, 1e-9)
    return (mx - uy * eps, my + ux * eps)


def _locate_in(decomp, x: float, y: float) -> bool:
    """True iff (x, y) is in the interior of the areal geometry."""
    from engine.geo.relate import I

    return decomp.locate(x, y) == I


def _split_simple_cycles(ring: np.ndarray) -> list[np.ndarray]:
    """Split a closed cycle that revisits vertices into SIMPLE cycles.

    The face walk can emit pinched cycles — a single cycle through a
    vertex where two region components touch only at that corner (a
    self-touching ring, invalid OGC; GEOS emits separate simple
    polygons there).  Stack walk: each time a vertex repeats, pop the
    enclosed loop as one simple cycle and continue from the first
    occurrence.  Exact float comparison is right here: pinch vertices
    are NODES of the arrangement, so both visits carry bit-identical
    coordinates."""
    pts = [tuple(p) for p in ring[:-1]]
    out: list[np.ndarray] = []
    stack: list[tuple] = []
    index: dict[tuple, int] = {}
    for p in pts:
        k = index.get(p)
        if k is None:
            index[p] = len(stack)
            stack.append(p)
            continue
        loop = stack[k:]
        if len(loop) >= 3:
            out.append(np.asarray(loop + [p], dtype=np.float64))
        for q in loop[1:]:
            index.pop(q, None)
        del stack[k + 1:]
    if len(stack) >= 3:
        out.append(np.asarray(stack + [stack[0]], dtype=np.float64))
    return out


def _expand_simple_cycles(rings, min_area):
    """Apply _split_simple_cycles to every face cycle, normalize to CCW,
    drop degenerate slivers, and DEDUP geometrically identical cycles —
    a face pinch-wrapped by a sibling's cycle appears once from its own
    face walk and once from the split of the wrapper (same undirected
    edge set)."""
    seen = set()
    out = []
    for r in rings:
        for c in _split_simple_cycles(r):
            if abs(core.ring_signed_area(c)) <= min_area:
                continue
            if core.ring_signed_area(c) < 0:
                c = c[::-1].copy()
            key = frozenset(
                (a, b) if a <= b else (b, a)
                for a, b in zip(map(tuple, c[:-1]), map(tuple, c[1:])))
            if key in seen:
                continue
            seen.add(key)
            out.append(c)
    return out


def _drop_pinch_wrapped_shells(polys, shell_pts):
    """Drop face-walk shells already encoded inside a sibling polygon.

    A face-walk cycle can PINCH-WRAP a sibling face that touches it only
    at vertices (e.g. an island corner-chained to a hole wall: the hole
    cycle detours around the island, so the island is even-odd INTERIOR
    to the assembled polygon — and the island's own cycle would count it
    a second time).  Holes are immune: a pinch-wrapped hole reads
    even-odd EXTERIOR to the wrapping shell, so nesting skips it.  Drop
    any polygon whose shell interior point is even-odd interior to
    another assembled polygon's full ring set; a legit nested island
    sits inside a containing polygon's HOLE (even-odd exterior) and
    survives.  Bbox prescreen keeps this O(pairs-that-could-nest)."""
    n = len(polys)
    if n < 2:
        return polys
    pts = np.asarray(shell_pts, dtype=np.float64).reshape(-1, 2)
    lo = np.array([p[0][:, :2].min(axis=0) for p in polys])
    hi = np.array([p[0][:, :2].max(axis=0) for p in polys])
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        x, y = pts[i]
        cand = np.flatnonzero(
            (lo[:, 0] <= x) & (x <= hi[:, 0])
            & (lo[:, 1] <= y) & (y <= hi[:, 1]))
        for j in cand:
            if j == i:
                continue
            if core.point_in_rings(x, y, polys[j]) == 2:
                keep[i] = False
                break
    return [p for k, p in zip(keep, polys) if k]


def _polygon_overlay(a: Geom, b: Geom, keep) -> Geom:
    """General areal overlay via the engine's arrangement machinery:

    1. node BOTH boundaries' segments (linework._noded_pieces);
    2. planar face walk → every bounded face of the arrangement;
    3. keep faces by (interior-point ∈ A, ∈ B) through ``keep``;
    4. dissolve: edges used by exactly ONE kept face form the result
       boundary; face-walk it again and classify each traced ring as
       shell (interior point kept) or hole;
    5. nest holes into their smallest containing shell.

    This is the classical overlay-by-arrangement construction (same
    plan GEOS' OverlayNG follows), built on the noding and face-walk
    already powering polygonize (constructive.py:884 machinery).
    """
    from engine.geo.linework import _minimal_rings, _noded_pieces
    from engine.geo.relate import Decomp

    from engine.geo import predicates as _pred
    from engine.geo.errors import GEOSException

    for idx, g in enumerate((a, b)):
        if g.type_id in _AREAL and not _pred.is_valid(g):
            # GEOS overlay refuses invalid areal input with a
            # TopologyException (legacy/test_invalid_geometries.py)
            raise GEOSException(
                "TopologyException: found non-noded intersection in "
                f"overlay input {idx}"
            )
    da, db = Decomp(a), Decomp(b)
    segs = [s for s in (da.ring_segs, db.ring_segs) if len(s)]
    if not segs:
        return Geom.empty(GeomType.POLYGON)
    pieces = _noded_pieces(np.vstack(segs))
    # a noded edge bounds the result iff membership differs across it
    border = []
    for p, q in pieces:
        px, py = p
        qx, qy = q
        L = np.hypot(qx - px, qy - py)
        if L == 0:
            continue
        ux, uy = (qx - px) / L, (qy - py) / L
        # offset must clear locate()'s point-on-boundary tolerance, which
        # is ~EPS/edge_length in DISTANCE terms for short edges — a 1e-9
        # relative offset lands INSIDE it and both sides read "boundary"
        eps = max(L * 1e-6, 1e-9)
        mx, my = (px + qx) / 2.0, (py + qy) / 2.0
        lx, ly = mx - uy * eps, my + ux * eps  # left of p→q
        rx, ry = mx + uy * eps, my - ux * eps
        kl = keep(_locate_in(da, lx, ly), _locate_in(db, lx, ly))
        kr = keep(_locate_in(da, rx, ry), _locate_in(db, rx, ry))
        if kl != kr:
            border.append((p, q))
    if not border:
        return Geom.empty(GeomType.POLYGON)
    rings2 = _minimal_rings(border)
    # numeric hygiene on emitted rings: (a) merge consecutive vertices
    # within extent·1e-12 (near-duplicate nodes survive noding and break
    # downstream predicates with ~ulp-length segments), (b) drop sliver
    # faces of ~ulp area (near-coincident inputs produce them and they
    # poison subsequent overlays)
    extent = max(
        float(np.ptp(np.vstack([e for pair in border for e in pair])[:, 0])),
        float(np.ptp(np.vstack([e for pair in border for e in pair])[:, 1])),
        1e-300,
    )
    vtol = extent * 1e-12

    def clean_ring(r: np.ndarray) -> np.ndarray | None:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (np.abs(np.diff(r, axis=0)) > vtol).any(axis=1)
        rr = r[keep]
        if len(rr) and (np.abs(rr[0] - rr[-1]) > vtol).any():
            rr = np.vstack([rr, rr[:1]])
        elif len(rr):
            rr = np.vstack([rr[:-1], rr[:1]]) if len(rr) > 1 else rr
        return rr if len(rr) >= 4 else None

    min_area = (extent * 1e-9) ** 2
    rings2 = [
        cr
        for cr in (clean_ring(r) for r in rings2)
        if cr is not None and abs(core.ring_signed_area(cr)) > min_area
    ]
    rings2 = _expand_simple_cycles(rings2, min_area)
    shells, holes = [], []
    for r in rings2:
        x, y = _face_interior_point(r)
        if keep(_locate_in(da, x, y), _locate_in(db, x, y)):
            shells.append((r, (x, y)))
        else:
            holes.append((r[::-1].copy(), (x, y)))  # store CW + interior pt
    polys: list[list[np.ndarray]] = [[s] for s, _ in shells]
    for h, (hx, hy) in holes:
        # smallest containing shell
        best, best_area = None, np.inf
        for p in polys:
            if core.point_in_rings(hx, hy, [p[0]]) == 2:
                ar = abs(core.ring_signed_area(p[0]))
                if ar < best_area:
                    best, best_area = p, ar
        if best is not None:
            best.append(h)
    polys = _drop_pinch_wrapped_shells(polys, [pt for _, pt in shells])
    parts = [Geom(GeomType.POLYGON, rings=p) for p in polys]
    if len(parts) == 1:
        return parts[0]
    return Geom(GeomType.MULTIPOLYGON, parts=parts)


_AREAL = (GeomType.POLYGON, GeomType.MULTIPOLYGON)


def _snap_grid(g, grid_size):
    if g is None or grid_size in (None, 0):
        return g
    from engine.geo.ops import set_precision

    return set_precision(g, grid_size)


def _binary(fn):
    def wrapped(a, b, grid_size=None, **kw):
        arr_a = isinstance(a, (list, tuple, np.ndarray))
        arr_b = isinstance(b, (list, tuple, np.ndarray))
        for x, is_arr in ((a, arr_a), (b, arr_b)):
            if not is_arr and x is not None and not isinstance(x, Geom):
                # ufunc parity: non-geometry scalar arguments (e.g. a
                # PreparedGeometry) are a TypeError, not an attribute
                # crash (src/geos.h input validation)
                raise TypeError(
                    "One of the arguments is of incorrect type. "
                    f"Provided value: {x!r}"
                )
        if grid_size:
            # reference grid_size semantics (set_operations.py:52-57):
            # inputs snapped to the precision grid, output on the grid
            snap = lambda g: _snap_grid(g, grid_size)  # noqa: E731
            post = snap
        else:
            snap = post = lambda g: g  # noqa: E731
        if not arr_a and not arr_b:
            return post(fn(snap(a), snap(b)))
        aa = a if arr_a else [a] * len(b)
        bb = b if arr_b else [b] * len(a)
        return np.array(
            [post(fn(snap(x), snap(y))) for x, y in zip(aa, bb)], dtype=object
        )

    return wrapped


@_binary
def _overlay_precision(a, b):
    """GEOS keeps the finest precision grid of the operands through an
    overlay (reference test_geometry.py:593-606)."""
    pa = float(getattr(a, "_precision", 0.0) or 0.0)
    pb = float(getattr(b, "_precision", 0.0) or 0.0)
    grids = [p for p in (pa, pb) if p > 0]
    return min(grids) if grids else 0.0


def intersection(a, b):
    """set_operations.py:114 — exact for point inputs, box/convex
    polygon clips; NotImplementedError otherwise.  When an operand
    carries a precision grid (set_precision), the result is computed on
    and tagged with the finest grid."""
    if a is None or b is None:
        return None
    grid = _overlay_precision(a, b)
    if grid > 0:
        from engine.geo.ops import set_precision

        a2 = set_precision(a, grid)
        b2 = set_precision(b, grid)
        a2._precision = b2._precision = 0.0  # avoid recursion
        out = intersection(a2, b2)
        if out is not None:
            out = set_precision(out, grid)
        return out
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
        # fast path: Sutherland–Hodgman, correct only when the SUBJECT is
        # convex too (concave subjects produce degenerate bridge edges)
        if (
            len(ra) == 1 and len(rb) == 1
            and _is_convex(rb[0]) and _is_convex(ra[0])
        ):
            out = _clip_convex(ra[0], rb[0])
            if len(out) and abs(core.ring_signed_area(out)) > 0:
                return Geom(GeomType.POLYGON, rings=[out])
            # empty or degenerate (boundary-contact only): fall through
            # to the general branch for the lower-dimension result
    if ta in _AREAL and tb in _AREAL:
        out = _polygon_overlay(a, b, lambda ia, ib: ia and ib)
        if out.is_empty and predicates.intersects(a, b):
            # polygons touching along boundary only: GEOS returns the
            # lower-dimension contact (shared edges / touch points)
            from engine.geo.constructive import boundary

            contact = _line_line_intersection(boundary(a), boundary(b))
            if contact is not None and not contact.is_empty:
                return contact
        return out
    _LINE = (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING)
    if ta in _LINE and tb in _AREAL:
        return _clip_line_by_area(a, b, inside=True)
    if tb in _LINE and ta in _AREAL:
        return _clip_line_by_area(b, a, inside=True)
    if ta in _LINE and tb in _LINE:
        return _line_line_intersection(a, b)
    if ta == GeomType.GEOMETRYCOLLECTION or tb == GeomType.GEOMETRYCOLLECTION:
        # (A ∪ B) ∩ C = (A ∩ C) ∪ (B ∩ C): decompose the collection into
        # its single-dimension components and union the part results
        gc, other = (a, b) if ta == GeomType.GEOMETRYCOLLECTION else (b, a)
        parts = [intersection(p, other) for p in _dim_components(gc)]
        parts = [p for p in parts if p is not None and not p.is_empty]
        if not parts:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        out = parts[0]
        for p in parts[1:]:
            out = union(out, p)
        return out
    raise NotImplementedError(f"intersection({ta}, {tb})")


def _line_line_intersection(a: Geom, b: Geom) -> Geom:
    """line ∩ line = collinear overlap pieces (dim 1, via shared_paths)
    + isolated proper crossing/touch points (dim 0) not already covered
    by a shared piece."""
    from engine.geo.linework import shared_paths
    from engine.geo.relate import Decomp

    sp = shared_paths(a, b)
    pieces = list(sp.parts[0].parts) + list(sp.parts[1].parts)
    # crossing points: cut parameters of each A segment against B
    da, db = Decomp(a), Decomp(b)
    pts = set()
    for seg in da.line_segs:
        p, q = seg[:2], seg[2:]
        for t in core.seg_cut_params(p, q, db.line_segs):
            x, y = p + t * (q - p)
            pts.add((round(float(x), 12), round(float(y), 12)))

    with_z = a.has_z and b.has_z

    def _z_at(g, x, y):
        """Interpolated z of (x, y) on g's nearest 3-D segment."""
        best, bz = np.inf, np.nan
        for line in (g.parts or [g]):
            c = line.xys
            if c.shape[1] < 3 or len(c) < 2:
                continue
            for k in range(len(c) - 1):
                vx, vy = c[k + 1, 0] - c[k, 0], c[k + 1, 1] - c[k, 1]
                L2 = vx * vx + vy * vy
                t = 0.0 if L2 == 0 else np.clip(
                    ((x - c[k, 0]) * vx + (y - c[k, 1]) * vy) / L2, 0, 1)
                dx = c[k, 0] + t * vx - x
                dy = c[k, 1] + t * vy - y
                d2 = dx * dx + dy * dy
                if d2 < best:
                    best = d2
                    bz = c[k, 2] + t * (c[k + 1, 2] - c[k, 2])
        return float(bz)
    # drop points lying on a shared piece (they're part of dim-1 output)
    def on_piece(x, y):
        for pc in pieces:
            c = pc.xys
            if bool(np.any(core.on_segment(x, y, c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1]))):
                return True
        return False

    iso = sorted(p for p in pts if not on_piece(*p))
    if with_z:
        # GEOS interpolates output z as the mean of the inputs'
        # interpolated z at the intersection
        point_parts = [
            Geom.point(x, y, 0.5 * (_z_at(a, x, y) + _z_at(b, x, y)))
            for x, y in iso
        ]
    else:
        point_parts = [Geom.point(x, y) for x, y in iso]
    if pieces and point_parts:
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=point_parts + pieces)
    if pieces:
        if len(pieces) == 1:
            return pieces[0]
        return Geom(GeomType.MULTILINESTRING, parts=pieces)
    if with_z and point_parts:
        if len(point_parts) == 1:
            return point_parts[0]
        return Geom(GeomType.MULTIPOINT, parts=point_parts, has_z=True)
    return _points_geom(np.array(iso).reshape(-1, 2))


def _clip_line_by_area(line: Geom, areal: Geom, inside: bool) -> Geom:
    """Pieces of a line inside (or outside) an areal geometry's closure:
    split each segment at boundary crossings, keep by midpoint locate."""
    from engine.geo.linear import line_merge
    from engine.geo.relate import Decomp, E

    d_area = Decomp(areal)
    kept = []
    d_line = Decomp(line)
    for seg in d_line.line_segs:
        p, q = seg[:2], seg[2:]
        cuts = core.seg_cut_params(p, q, d_area.ring_segs)
        ts = np.unique(np.concatenate([[0.0, 1.0], cuts]))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            mid = p + 0.5 * (t0 + t1) * (q - p)
            in_closure = d_area.locate(mid[0], mid[1]) != E
            if in_closure == inside:
                kept.append(Geom.linestring(np.vstack([p + t0 * (q - p), p + t1 * (q - p)])))
    if not kept:
        return Geom.empty(GeomType.LINESTRING)
    merged = line_merge(Geom(GeomType.MULTILINESTRING, parts=kept))
    return merged


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
    if a.type_id in _AREAL and b.type_id in _AREAL:
        return _polygon_overlay(a, b, lambda ia, ib: ia and not ib)
    _LINE = (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING)
    if a.type_id in _LINE and b.type_id in _AREAL:
        return _clip_line_by_area(a, b, inside=False)
    if a.type_id in _LINE and b.type_id in _LINE:
        return _line_line_difference(a, b)
    if a.type_id in _AREAL and b.type_id in _LINE + (GeomType.POINT, GeomType.MULTIPOINT):
        return a  # lower-dimensional subtrahend removes no area
    if a.type_id in _LINE and b.type_id in (GeomType.POINT, GeomType.MULTIPOINT):
        return a  # dim-0 subtrahend removes no length
    if b.type_id == GeomType.GEOMETRYCOLLECTION:
        # a − (B ∪ C) = (a − B) − C: subtract components sequentially
        out = a
        for comp in _dim_components(b):
            out = difference(out, comp)
            if out is None or out.is_empty:
                return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        return out
    if a.type_id == GeomType.GEOMETRYCOLLECTION:
        # (A ∪ B) − C = (A − C) ∪ (B − C)
        parts = [difference(p, b) for p in _dim_components(a)]
        parts = [p for p in parts if p is not None and not p.is_empty]
        if not parts:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        out = parts[0]
        for p in parts[1:]:
            out = union(out, p)
        return out
    raise NotImplementedError("difference of these input dimensions (TBD)")


def _line_line_difference(a: Geom, b: Geom) -> Geom:
    """a − b for lines: split a's segments at b and at collinear-overlap
    bounds; keep pieces whose midpoint is NOT on b."""
    from engine.geo.linear import line_merge
    from engine.geo.relate import Decomp

    da, db = Decomp(a), Decomp(b)
    kept = []
    for seg in da.line_segs:
        p, q = seg[:2], seg[2:]
        cuts = core.seg_cut_params(p, q, db.line_segs) if len(db.line_segs) else np.empty(0)
        ts = np.unique(np.concatenate([[0.0, 1.0], cuts]))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            mid = p + 0.5 * (t0 + t1) * (q - p)
            on_b = bool(
                np.any(
                    core.on_segment(
                        mid[0], mid[1],
                        db.line_segs[:, 0], db.line_segs[:, 1],
                        db.line_segs[:, 2], db.line_segs[:, 3],
                    )
                )
            ) if len(db.line_segs) else False
            if not on_b:
                kept.append(
                    Geom.linestring(np.vstack([p + t0 * (q - p), p + t1 * (q - p)]))
                )
    if not kept:
        return Geom.empty(GeomType.LINESTRING)
    return line_merge(Geom(GeomType.MULTILINESTRING, parts=kept))


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
    if a.type_id in _AREAL and b.type_id in _AREAL:
        if predicates.disjoint(a, b):
            parts = (a.parts or [a]) + (b.parts or [b])
            return Geom(GeomType.MULTIPOLYGON, parts=parts)
        if predicates.covers(a, b):
            return a
        if predicates.covers(b, a):
            return b
        return _polygon_overlay(a, b, lambda ia, ib: ia or ib)
    return _union_general(a, b)


def _dim_components(g: Geom) -> list[Geom]:
    """Single-dimension components of any geometry: one (multi)polygon,
    one (multi)linestring, one (multi)point — whichever are non-empty."""
    out = []
    polys = [
        Geom(GeomType.POLYGON, rings=[np.asarray(r) for r in rings])
        for rings in g.polygon_parts()
    ]
    if polys:
        out.append(polys[0] if len(polys) == 1
                   else Geom(GeomType.MULTIPOLYGON, parts=polys))
    lines = [Geom.linestring(l) for l in g.line_parts() if len(l) >= 2]
    if lines:
        out.append(lines[0] if len(lines) == 1
                   else Geom(GeomType.MULTILINESTRING, parts=lines))
    pts = g.point_parts()
    if len(pts):
        out.append(_points_geom(pts))
    return out


def _union_general(a: Geom, b: Geom) -> Geom:
    """Mixed-dimension / GeometryCollection union (GEOS UnaryUnion
    semantics): union per dimension, then keep each lower-dimensional
    residue only where no higher-dimensional component covers it; a
    single surviving dimension collapses out of the collection."""
    from engine.geo.linear import line_merge
    from engine.geo.linework import node

    poly_parts, line_parts, pt_blocks = [], [], []
    for g in (a, b):
        for rings in g.polygon_parts():
            poly_parts.append(
                Geom(GeomType.POLYGON, rings=[np.asarray(r) for r in rings])
            )
        line_parts.extend(Geom.linestring(l) for l in g.line_parts() if len(l) >= 2)
        pp = g.point_parts()
        if len(pp):
            pt_blocks.append(pp)
    poly_u = None
    if poly_parts:
        poly_u = poly_parts[0]
        for p in poly_parts[1:]:
            poly_u = union(poly_u, p)
    line_u = None
    if line_parts:
        # GEOS keeps zero-length lines as-is; the noder would drop them
        degen = [l for l in line_parts if not (l.xys[:, :2] != l.xys[0, :2]).any()]
        line_parts = [l for l in line_parts if l not in degen]
        merged = None
        if line_parts:
            # noding splits at crossings and dedupes collinear overlap —
            # the lineal union; then subtract the areal interior
            merged = line_merge(node(Geom(GeomType.MULTILINESTRING, parts=line_parts)))
            if poly_u is not None and not merged.is_empty:
                merged = difference(merged, poly_u)
            if merged is not None and merged.is_empty:
                merged = None
        if degen:
            seen, keep = set(), []
            for l in degen:
                k = (l.xys[0, 0], l.xys[0, 1])
                if k not in seen:
                    seen.add(k)
                    keep.append(l)
            mparts = ([] if merged is None else
                      (list(merged.parts) if merged.parts else [merged]))
            mparts += keep
            merged = mparts[0] if len(mparts) == 1 else Geom(
                GeomType.MULTILINESTRING, parts=mparts)
        if merged is not None and not merged.is_empty:
            line_u = merged
    pt_u = None
    if pt_blocks:
        uniq = np.unique(np.vstack(pt_blocks), axis=0)
        keep = []
        for p in uniq:
            pg = Geom.point(p[0], p[1])
            if poly_u is not None and predicates.intersects(poly_u, pg):
                continue
            if line_u is not None and predicates.intersects(line_u, pg):
                continue
            keep.append(p)
        if keep:
            pt_u = _points_geom(np.array(keep).reshape(-1, 2))
    # GEOS emits union collections in ascending dimension order
    comps = [c for c in (pt_u, line_u, poly_u) if c is not None and not c.is_empty]
    if not comps:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if len(comps) == 1:
        return comps[0]
    return Geom(GeomType.GEOMETRYCOLLECTION, parts=comps)


def _reduce_all(fn, geometries, axis=None):
    """Balanced-tree n-ary reduce (associative ops): keeps intermediate
    operands small — the same shape as the engine's partial+final
    aggregate plumbing (ufuncs.c:63-130 Y_Y_reduce_func equivalent)."""
    gs = [g for g in geometries if g is not None]
    if not gs:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    while len(gs) > 1:
        nxt = []
        for i in range(0, len(gs) - 1, 2):
            nxt.append(fn(gs[i], gs[i + 1]))
        if len(gs) % 2:
            nxt.append(gs[-1])
        gs = nxt
    return gs[0]


def _nary_union_areal(geoms: list[Geom]) -> Geom:
    """Single-pass n-ary areal union: ONE arrangement over all inputs
    with membership = "interior of ANY input".

    Iterated pairwise unions degrade: each round's output carries seam
    vertices whose ~ulp discrepancies become spurious crossings in the
    next round's noding.  One pass nodes only the ORIGINAL clean inputs
    (this is why buffer() dissolves its rect+disc decomposition here).
    """
    from engine.geo.linework import _minimal_rings, _noded_pieces
    from engine.geo.relate import Decomp

    decomps = [Decomp(g) for g in geoms]
    segs = [d.ring_segs for d in decomps if len(d.ring_segs)]
    if not segs:
        return Geom.empty(GeomType.POLYGON)
    pieces = _noded_pieces(np.vstack(segs))
    arr = np.asarray(pieces, dtype=np.float64).reshape(-1, 2, 2)
    P, Q = arr[:, 0], arr[:, 1]
    L = np.hypot(*(Q - P).T)
    ok = L > 0
    U = (Q[ok] - P[ok]) / L[ok, None]
    eps = np.maximum(L[ok] * 1e-6, 1e-9)
    M = (P[ok] + Q[ok]) / 2.0
    lpt = M + np.column_stack([-U[:, 1], U[:, 0]]) * eps[:, None]
    rpt = M - np.column_stack([-U[:, 1], U[:, 0]]) * eps[:, None]
    kl = np.zeros(len(M), dtype=bool)
    kr = np.zeros(len(M), dtype=bool)
    for d in decomps:
        kl |= d.inside_many(lpt[:, 0], lpt[:, 1])
        kr |= d.inside_many(rpt[:, 0], rpt[:, 1])
    keep_idx = np.flatnonzero(ok)[kl != kr]
    border = [pieces[i] for i in keep_idx]
    if not border:
        return Geom.empty(GeomType.POLYGON)
    rings2 = _minimal_rings(border)
    allc = np.vstack([e for pair in border for e in pair])
    extent = max(float(np.ptp(allc[:, 0])), float(np.ptp(allc[:, 1])), 1e-300)
    vtol = extent * 1e-12
    min_area = (extent * 1e-9) ** 2
    cleaned = []
    for r in rings2:
        keep_m = np.ones(len(r), dtype=bool)
        keep_m[1:] = (np.abs(np.diff(r, axis=0)) > vtol).any(axis=1)
        rr = r[keep_m]
        if len(rr) and (np.abs(rr[0] - rr[-1]) > vtol).any():
            rr = np.vstack([rr, rr[:1]])
        if len(rr) >= 4 and abs(core.ring_signed_area(rr)) > min_area:
            cleaned.append(rr)
    cleaned = _expand_simple_cycles(cleaned, min_area)
    shells, holes = [], []
    face_pts = np.array([_face_interior_point(r) for r in cleaned],
                        dtype=np.float64).reshape(-1, 2)
    face_in = np.zeros(len(cleaned), dtype=bool)
    for d in decomps:
        face_in |= d.inside_many(face_pts[:, 0], face_pts[:, 1])
    for r, (x, y), ins in zip(cleaned, face_pts, face_in):
        if ins:
            shells.append((r, (x, y)))
        else:
            holes.append((r[::-1].copy(), (x, y)))
    polys: list[list[np.ndarray]] = [[s] for s, _ in shells]
    for h, (hx, hy) in holes:
        best, best_area = None, np.inf
        for p in polys:
            if core.point_in_rings(hx, hy, [p[0]]) == 2:
                ar = abs(core.ring_signed_area(p[0]))
                if ar < best_area:
                    best, best_area = p, ar
        if best is not None:
            best.append(h)
    polys = _drop_pinch_wrapped_shells(polys, [pt for _, pt in shells])
    parts = [Geom(GeomType.POLYGON, rings=p) for p in polys]
    if not parts:
        return Geom.empty(GeomType.POLYGON)
    if len(parts) == 1:
        return parts[0]
    return Geom(GeomType.MULTIPOLYGON, parts=parts)


def union_all(geometries, grid_size=None, axis=None):
    """set_operations.py:465 — ignores None; empty input →
    GEOMETRYCOLLECTION EMPTY (:525-530).  All-areal inputs take the
    single-pass arrangement union (see _nary_union_areal)."""
    gs = [g for g in geometries if g is not None and not g.is_empty]
    if gs and all(g.type_id in _AREAL for g in gs):
        flat: list[Geom] = []
        for g in gs:
            flat.extend(g.parts or [g])
        return _nary_union_areal(flat)
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
    if a.type_id in _AREAL and b.type_id in _AREAL:
        return _polygon_overlay(a, b, lambda ia, ib: ia != ib)
    # mixed dimensions / collections: (a − b) ∪ (b − a)
    d1 = difference(a, b)
    d2 = difference(b, a)
    if d1 is None or d2 is None:
        return None
    if d1.is_empty:
        return d2
    if d2.is_empty:
        return d1
    return union(d1, d2)


def symmetric_difference_all(geometries, axis=None):
    return _reduce_all(symmetric_difference, geometries)


def _effective_types(g) -> set:
    """Single-geometry type names, collections flattened (GEOS 3.12
    CoverageUnion input rule)."""
    if g.parts and not g.is_empty:
        out = set()
        for p in g.parts:
            out |= _effective_types(p)
        return out
    name = {
        GeomType.POINT: "Point", GeomType.LINESTRING: "LineString",
        GeomType.LINEARRING: "LineString", GeomType.POLYGON: "Polygon",
        GeomType.MULTIPOINT: "Point", GeomType.MULTILINESTRING: "LineString",
        GeomType.MULTIPOLYGON: "Polygon",
        GeomType.GEOMETRYCOLLECTION: "GeometryCollection",
    }[g.type_id]
    return {name}


def coverage_union(a, b):
    """set_operations.py:560 — fast union ASSUMING non-overlap: ring
    concatenation, no topology (the per-cell tile-mosaic path).  GEOS
    3.12 rules: inputs must share ONE effective simple type; mixed
    dimensions raise GEOSException."""
    if a is None or b is None:
        return None
    from engine.geo.errors import GEOSException

    ta, tb = _effective_types(a), _effective_types(b)
    if len(ta | tb) != 1 or "GeometryCollection" in (ta | tb):
        raise GEOSException(
            "IllegalArgumentException: Overlay input is mixed-dimension"
        )
    kind = (ta | tb).pop()
    parts = (a.parts or ([] if a.is_empty else [a])) + (b.parts or ([] if b.is_empty else [b]))
    if kind == "Point":
        parts = [p for p in parts if not p.is_empty]
        if not parts:
            return Geom.empty(GeomType.MULTIPOINT)
        return Geom(GeomType.MULTIPOINT, parts=parts, **_zm_of(parts))
    if kind == "LineString":
        parts = [p for p in parts if not p.is_empty]
        if not parts:
            return Geom.empty(GeomType.MULTILINESTRING)
        return Geom(GeomType.MULTILINESTRING, parts=parts, **_zm_of(parts))
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


def _zm_of(parts):
    return dict(has_z=any(p.has_z for p in parts),
                has_m=any(p.has_m for p in parts))


# ---------------------------------------------------- public ufunc API layer
# (reference set_operations.py signatures: array broadcasting, grid_size
# fixed-precision overlays, axis= reduction, positional deprecations)
_intersection_scalar = intersection
_union_scalar = union
_difference_scalar = difference
_symmetric_difference_scalar = symmetric_difference
_coverage_union_scalar = coverage_union
_disjoint_subset_union_scalar = disjoint_subset_union


def _grid_value(grid_size):
    if grid_size is None:
        return None
    if not np.isscalar(grid_size):
        raise ValueError("grid_size parameter only accepts scalar values")
    g = float(grid_size)
    return None if g == 0 else g


def _empty_dims(out, a, b):
    """GEOS >= 3.12 keeps the coordinate dimension of empty results
    (reference test_set_operations.py:437)."""
    if out is not None and out.is_empty and not out.parts:
        hz = bool(getattr(a, "has_z", False)) or bool(getattr(b, "has_z", False))
        hm = bool(getattr(a, "has_m", False)) or bool(getattr(b, "has_m", False))
        if hz != out.has_z or hm != out.has_m:
            return Geom(out.type_id, has_z=hz, has_m=hm)
    return out


def _precise_pair(scalar_fn, x, y, g: float):
    from engine.geo.ops import set_precision

    if np.isnan(g):
        return None
    x2 = None if x is None else set_precision(x, g)
    y2 = None if y is None else set_precision(y, g)
    for q in (x2, y2):
        if q is not None:
            q._precision = 0.0  # the wrapper owns the grid here
    out = scalar_fn(x2, y2)
    if out is not None:
        out = set_precision(out, g)
    return out


def _binary_api(scalar_fn, name, supports_grid=True):
    def api(a, b, *args, grid_size=None):
        if args:
            import warnings

            warnings.warn(
                f"positional argument `grid_size` for `{name}` is "
                "deprecated. Please use a keyword argument instead.",
                DeprecationWarning, stacklevel=2,
            )
            grid_size = args[0]
        g = _grid_value(grid_size) if supports_grid else None

        def one(x, y):
            if g is not None:
                return _precise_pair(scalar_fn, x, y, g)
            return _empty_dims(scalar_fn(x, y), x, y)

        a_s = a is None or isinstance(a, Geom)
        b_s = b is None or isinstance(b, Geom)
        if a_s and b_s:
            return one(a, b)
        if a_s:
            aa = np.empty((), dtype=object)
            aa[()] = a
        else:
            aa = np.asarray(a, dtype=object)
        if b_s:
            bb = np.empty((), dtype=object)
            bb[()] = b
        else:
            bb = np.asarray(b, dtype=object)
        aa, bb = np.broadcast_arrays(aa, bb)
        out = np.empty(aa.shape, dtype=object)
        for idx in np.ndindex(aa.shape):
            out[idx] = one(aa[idx], bb[idx])
        return out

    api.__name__ = name
    api.__qualname__ = name
    api.__doc__ = scalar_fn.__doc__
    return api


intersection = _binary_api(_intersection_scalar, "intersection")
union = _binary_api(_union_scalar, "union")
difference = _binary_api(_difference_scalar, "difference")
symmetric_difference = _binary_api(
    _symmetric_difference_scalar, "symmetric_difference"
)
coverage_union = _binary_api(_coverage_union_scalar, "coverage_union",
                             supports_grid=False)
disjoint_subset_union = _binary_api(
    _disjoint_subset_union_scalar, "disjoint_subset_union",
    supports_grid=False,
)


def _union_core(gs):
    """n-ary union over a flat list (None already removed): all-areal
    inputs take the single-pass arrangement union."""
    live = [g for g in gs if not g.is_empty]
    if live and all(g.type_id in _AREAL for g in live):
        flat = []
        for g in live:
            flat.extend(g.parts or [g])
        return _nary_union_areal(flat)
    return _reduce_all(_union_scalar, gs)


def _reduce_api(pair_fn, name, core=None, supports_grid=False,
                positional_names=("axis",), flatten_collections=False):
    def _flatten(x, out):
        if x.type_id == GeomType.GEOMETRYCOLLECTION and x.parts:
            for p in x.parts:
                _flatten(p, out)
        else:
            out.append(x)

    def reduce_one(gs, g):
        if g is not None and np.isnan(g):
            return None
        gs = [x for x in gs if x is not None]
        if flatten_collections:
            # GEOS unary union dissolves GEOMETRYCOLLECTION members
            flat: list = []
            for x in gs:
                _flatten(x, flat)
            gs = flat
        if g is not None:
            from engine.geo.ops import set_precision

            gs = [set_precision(x, g) for x in gs]
            for x in gs:
                x._precision = 0.0
        if not gs:
            return Geom.empty(GeomType.GEOMETRYCOLLECTION)
        out = core(gs) if core is not None else _reduce_all(pair_fn, gs)
        if g is not None and out is not None:
            from engine.geo.ops import set_precision

            out = set_precision(out, g)
        return out

    def api(geometries, *args, grid_size=None, axis=None):
        if args:
            import warnings

            used = [f"`{n}`" for n in positional_names[: len(args)]]
            if len(used) == 1:
                msg = (f"positional argument {used[0]} for `{name}` is "
                       "deprecated. Please use a keyword argument instead.")
            else:
                msg = (f"positional arguments {' and '.join(used)} for "
                       f"`{name}` are deprecated. Please use keyword "
                       "arguments instead.")
            warnings.warn(msg, DeprecationWarning, stacklevel=2)
            if positional_names[0] == "grid_size":
                grid_size = args[0]
                if len(args) > 1:
                    axis = args[1]
            else:
                axis = args[0]
        g = _grid_value(grid_size) if supports_grid else None
        if grid_size is not None and not supports_grid:
            raise TypeError(f"{name}() got an unexpected keyword "
                            "argument 'grid_size'")
        arr = np.asarray(geometries, dtype=object)
        if axis is None:
            return reduce_one(list(arr.ravel()), g)
        moved = np.moveaxis(arr, axis, -1)
        out = np.empty(moved.shape[:-1], dtype=object)
        for idx in np.ndindex(moved.shape[:-1]):
            out[idx] = reduce_one(list(moved[idx]), g)
        return out

    api.__name__ = name
    api.__qualname__ = name
    return api


union_all = _reduce_api(_union_scalar, "union_all", core=_union_core,
                        supports_grid=True,
                        positional_names=("grid_size", "axis"),
                        flatten_collections=True)
unary_union = _reduce_api(_union_scalar, "unary_union", core=_union_core,
                          supports_grid=True,
                          positional_names=("grid_size", "axis"),
                          flatten_collections=True)
intersection_all = _reduce_api(_intersection_scalar, "intersection_all")
symmetric_difference_all = _reduce_api(
    _symmetric_difference_scalar, "symmetric_difference_all"
)
coverage_union_all = _reduce_api(_coverage_union_scalar, "coverage_union_all")
disjoint_subset_union_all = _reduce_api(
    _disjoint_subset_union_scalar, "disjoint_subset_union_all"
)
