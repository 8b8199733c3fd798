"""DE-9IM relate machinery + the full binary predicate family.

Reimplements (from scratch, no GEOS) the semantics of the reference's
binary predicates (`shapely/predicates.py:500-1269`) and `relate`
(`predicates.py:1194`) by computing the full DE-9IM intersection matrix of
a pair of geometries and deriving every predicate from pattern matches —
this guarantees the predicates are mutually consistent exactly as GEOS's
are.

Method: decompose each geometry into point parts (interior role), line
segments (interior role; mod-2 boundary endpoints), and polygon rings
(boundary role).  Split every 1-D edge at all intersection events with the
other geometry, classify piece midpoints and all event points with an
exact point locator, and fill the 3x3 matrix with max-dimension
contributions; areal (dim-2) entries are resolved with
coverage/containment logic.  Validated against the expected-value tables
of `shapely/tests/test_predicates.py` and docstring examples.
"""

from __future__ import annotations

import numpy as np

from engine.geo import core
from engine.geo.geom import Geom, GeomType

# matrix row/col indexing
I, B, E = 0, 1, 2
_F = -1  # empty intersection


class Decomp:
    """Cached structural decomposition of a geometry for relate/locate."""

    def __init__(self, g: Geom):
        self.g = g
        self.pts = g.point_parts()
        self.lines = [l for l in g.line_parts() if len(l) >= 2]
        self.polys = g.polygon_parts()
        # mod-2 boundary endpoints of the line parts (closed lines have none)
        ends = []
        for line in self.lines:
            if not np.array_equal(line[0], line[-1]):
                ends.append(tuple(line[0]))
                ends.append(tuple(line[-1]))
        from collections import Counter

        cnt = Counter(ends)
        bpts = [p for p, c in cnt.items() if c % 2 == 1]
        self.line_bpts = np.array(bpts, dtype=np.float64).reshape(-1, 2)
        line_segs = [np.hstack([l[:-1], l[1:]]) for l in self.lines]
        self.line_segs = np.vstack(line_segs) if line_segs else np.empty((0, 4))
        ring_segs = [
            np.hstack([r[:-1], r[1:]])
            for rings in self.polys
            for r in rings
            if len(r) >= 2
        ]
        self.ring_segs = np.vstack(ring_segs) if ring_segs else np.empty((0, 4))
        self.segs = (
            np.vstack([self.line_segs, self.ring_segs])
            if len(self.line_segs) or len(self.ring_segs)
            else np.empty((0, 4))
        )
        vs = [self.pts] + [l for l in self.lines] + [
            r for rings in self.polys for r in rings
        ]
        vs = [v for v in vs if len(v)]
        self.vertices = np.vstack(vs) if vs else np.empty((0, 2))

    @property
    def interior_dim(self) -> int:
        if self.polys:
            return 2
        if self.lines:
            return 1
        if len(self.pts):
            return 0
        return _F

    @property
    def boundary_dim(self) -> int:
        if self.polys:
            return 1
        if len(self.line_bpts):
            return 0
        return _F

    def inside_many(self, xs: np.ndarray, ys: np.ndarray,
                    eps=core.EPS) -> np.ndarray:
        """Vectorized strict-interior test (locate(...) == I) for an
        array of probe points against the AREAL parts — bbox-cropped
        even-odd parity minus an on-boundary belt of half-width eps.
        Chunked so the (points × segments) broadcast stays bounded."""
        n = len(xs)
        inside = np.zeros(n, dtype=bool)
        if not self.polys or n == 0:
            return inside
        s = self.ring_segs
        bx0 = np.minimum(s[:, 0], s[:, 2]).min() - eps
        bx1 = np.maximum(s[:, 0], s[:, 2]).max() + eps
        by0 = np.minimum(s[:, 1], s[:, 3]).min() - eps
        by1 = np.maximum(s[:, 1], s[:, 3]).max() + eps
        sel = (xs >= bx0) & (xs <= bx1) & (ys >= by0) & (ys <= by1)
        if not sel.any():
            return inside
        pxs, pys = xs[sel], ys[sel]
        m = len(pxs)
        res = np.zeros(m, dtype=bool)
        CH = max(1, int(4e6 // max(len(s), 1)))
        ax, ay, bx, by = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
        dy = by - ay
        dy_safe = np.where(dy == 0, 1e-300, dy)
        seg_len2 = (bx - ax) ** 2 + (by - ay) ** 2
        for rings in self.polys:
            # per-polygon even-odd over its rings (matches locate())
            rs = np.vstack([np.hstack([r[:-1], r[1:]])
                            for r in rings if len(r) >= 2])
            rax, ray, rbx, rby = rs[:, 0], rs[:, 1], rs[:, 2], rs[:, 3]
            rdy = rby - ray
            rdys = np.where(rdy == 0, 1e-300, rdy)
            for lo in range(0, m, CH):
                hi = min(lo + CH, m)
                P = pxs[lo:hi, None]
                Q = pys[lo:hi, None]
                cond = (ray[None, :] > Q) != (rby[None, :] > Q)
                xint = rax[None, :] + (Q - ray[None, :]) * (
                    rbx[None, :] - rax[None, :]) / rdys[None, :]
                parity = (np.sum(cond & (xint > P), axis=1) % 2) == 1
                res[lo:hi] |= parity
        # subtract the boundary belt (locate returns B there, not I)
        for lo in range(0, m, CH):
            hi = min(lo + CH, m)
            if not res[lo:hi].any():
                continue
            P = pxs[lo:hi, None]
            Q = pys[lo:hi, None]
            d2 = core.point_seg_dist2(P, Q, ax[None, :], ay[None, :],
                                      bx[None, :], by[None, :])
            onb = (d2 <= eps * eps).any(axis=1)
            res[lo:hi] &= ~onb
        inside[sel] = res
        return inside

    def locate(self, px: float, py: float, eps=core.EPS) -> int:
        """0 = Interior, 1 = Boundary, 2 = Exterior of the point vs self."""
        best = E
        for rings in self.polys:
            loc = core.point_in_rings(px, py, rings, eps)
            if loc == 2:
                return I
            if loc == 1:
                best = B
        if len(self.line_segs):
            s = self.line_segs
            on = core.on_segment(px, py, s[:, 0], s[:, 1], s[:, 2], s[:, 3], eps)
            if bool(np.any(on)):
                if len(self.line_bpts) and bool(
                    np.any(
                        (np.abs(self.line_bpts[:, 0] - px) <= eps)
                        & (np.abs(self.line_bpts[:, 1] - py) <= eps)
                    )
                ):
                    best = min(best, B)
                else:
                    return I
        if len(self.pts) and bool(
            np.any((np.abs(self.pts[:, 0] - px) <= eps) & (np.abs(self.pts[:, 1] - py) <= eps))
        ):
            return I
        return best

    def sample_interior_points(self) -> list[tuple[float, float]]:
        out = []
        for rings in self.polys:
            out.append(Geom(GeomType.POLYGON, rings=rings)._representative_xy())
        return out


def _segments_with_roles(d: Decomp):
    if len(d.line_segs):
        for s in d.line_segs:
            yield s, I
    if len(d.ring_segs):
        for s in d.ring_segs:
            yield s, B


def relate_matrix(a: Geom, b: Geom, eps=core.EPS) -> np.ndarray:
    """Full 3x3 DE-9IM matrix; entries in {-1, 0, 1, 2} (-1 = F)."""
    M = np.full((3, 3), _F, dtype=np.int64)
    M[E, E] = 2
    da, db = Decomp(a), Decomp(b)
    a_empty, b_empty = a.is_empty, b.is_empty
    if a_empty and b_empty:
        return M
    if a_empty:
        M[E, I] = db.interior_dim
        M[E, B] = db.boundary_dim
        return M
    if b_empty:
        M[I, E] = da.interior_dim
        M[B, E] = da.boundary_dim
        return M

    def bump(r, c, d):
        if d > M[r, c]:
            M[r, c] = d

    # ---- dim-0 contributions: all event points ----
    events = [da.vertices, db.vertices, da.pts, db.pts]
    ev = np.vstack([e for e in events if len(e)])
    # pairwise segment intersection points (cut points) are classified via
    # the piece machinery below (cut endpoints are classified there too),
    # but isolated proper crossings need explicit classification:
    for p in ev:
        bump(da.locate(p[0], p[1], eps), db.locate(p[0], p[1], eps), 0)

    # ---- dim-1 contributions: pieces of A's edges vs B, and vice versa ----
    ringA_locs: list[int] = []  # locations of boundary-of-A pieces in B
    ringB_locs: list[int] = []
    for (da_, db_, swap, ring_locs) in ((da, db, False, ringA_locs), (db, da, True, ringB_locs)):
        other_segs = db_.segs
        for seg, role in _segments_with_roles(da_):
            p, q = seg[:2], seg[2:]
            cuts = core.seg_cut_params(p, q, other_segs, eps)
            # also cut at the other geometry's 0-dim parts lying ON this
            # segment — otherwise a piece midpoint can coincide with an
            # isolated point of B and claim a spurious dim-1 intersection
            if len(db_.pts):
                on = core.on_segment(
                    db_.pts[:, 0], db_.pts[:, 1], p[0], p[1], q[0], q[1], eps
                )
                if bool(np.any(on)):
                    r = q - p
                    len2 = float(r @ r)
                    if len2 > 0:
                        t = (
                            (db_.pts[on, 0] - p[0]) * r[0]
                            + (db_.pts[on, 1] - p[1]) * r[1]
                        ) / len2
                        cuts = np.sort(
                            np.concatenate([cuts, np.clip(t, 0.0, 1.0)])
                        )
            ts = np.concatenate([[0.0], cuts, [1.0]])
            ts = np.unique(ts)
            # classify each cut point (dim-0) and each piece midpoint (dim-1)
            for t in cuts:
                cp = p + t * (q - p)
                la = da.locate(cp[0], cp[1], eps)
                lb = db.locate(cp[0], cp[1], eps)
                bump(la, lb, 0)
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                mid = p + 0.5 * (t0 + t1) * (q - p)
                loc_other = (da if swap else db).locate(mid[0], mid[1], eps)
                if swap:
                    bump(loc_other, role, 1)
                else:
                    bump(role, loc_other, 1)
                if role == B:
                    ring_locs.append(loc_other)

    # ---- dim-2 contributions ----
    dimA, dimB = a.dimension, b.dimension
    if dimA == 2 or dimB == 2:
        samplesA = [(pt, db.locate(pt[0], pt[1], eps)) for pt in da.sample_interior_points()]
        samplesB = [(pt, da.locate(pt[0], pt[1], eps)) for pt in db.sample_interior_points()]
        a_cov_b = None  # is area(A) ⊆ closure(B)?
        b_cov_a = None
        if dimA == 2 and dimB == 2:
            a_cov_b = (
                all(l != E for l in ringA_locs)
                and not any(l == I for l in ringB_locs)
                and all(l != E for _, l in samplesA)
            )
            b_cov_a = (
                all(l != E for l in ringB_locs)
                and not any(l == I for l in ringA_locs)
                and all(l != E for _, l in samplesB)
            )
            ii = (
                any(l == I for l in ringA_locs)
                or any(l == I for l in ringB_locs)
                or any(l == I for _, l in samplesA)
                or any(l == I for _, l in samplesB)
            )
            if ii:
                bump(I, I, 2)
            bump(I, E, 2) if not a_cov_b else None
            bump(E, I, 2) if not b_cov_a else None
        elif dimA == 2:
            bump(I, E, 2)  # a 0/1-dim B cannot cover A's interior
        else:
            bump(E, I, 2)
    return M


def matrix_to_str(M: np.ndarray) -> str:
    return "".join("F" if v < 0 else str(int(v)) for v in M.reshape(-1))


def relate(a: Geom, b: Geom) -> str | None:
    """DE-9IM string (predicates.py:1194); None input -> None."""
    if a is None or b is None:
        return None
    return matrix_to_str(relate_matrix(a, b))


def relate_pattern_match(matrix: str, pattern: str) -> bool:
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must be 9 chars, got {pattern!r}")
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p in "Tt":
            if m == "F":
                return False
        elif p in "Ff":
            if m != "F":
                return False
        else:
            if m != p:
                return False
    return True


# ---------------------------------------------------------------------------
# binary predicates (predicates.py semantics; None -> False everywhere)
# ---------------------------------------------------------------------------


def _mat(a, b):
    return matrix_to_str(relate_matrix(a, b))


def intersects(a, b) -> bool:
    """predicates.py:865 — any shared portion; None -> False."""
    if a is None or b is None:
        return False
    m = _mat(a, b)
    return not relate_pattern_match(m, "FF*FF****")


def disjoint(a, b) -> bool:
    """predicates.py:783 — None is never disjoint -> False."""
    if a is None or b is None:
        return False
    return relate_pattern_match(_mat(a, b), "FF*FF****")


def within(a, b) -> bool:
    """predicates.py:1013 — T*F**F***."""
    if a is None or b is None:
        return False
    return relate_pattern_match(_mat(a, b), "T*F**F***")


def contains(a, b) -> bool:
    """predicates.py:556 — contains(a,b) == within(b,a)."""
    return within(b, a)


def covers(a, b) -> bool:
    """predicates.py:729 — no point of B outside A."""
    if a is None or b is None:
        return False
    m = _mat(a, b)
    return any(
        relate_pattern_match(m, p)
        for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*")
    )


def covered_by(a, b) -> bool:
    """predicates.py:674 — covered_by(a,b) == covers(b,a)."""
    return covers(b, a)


def contains_properly(a, b) -> bool:
    """predicates.py:619 — B in interior of A: T**FF*FF*."""
    if a is None or b is None:
        return False
    return relate_pattern_match(_mat(a, b), "T**FF*FF*")


def crosses(a, b) -> bool:
    """predicates.py:500 — dim-dependent pattern."""
    if a is None or b is None:
        return False
    dimA, dimB = a.dimension, b.dimension
    m = _mat(a, b)
    if dimA < dimB:
        return relate_pattern_match(m, "T*T******")
    if dimA > dimB:
        return relate_pattern_match(m, "T*****T**")
    if dimA == 1 and dimB == 1:
        return relate_pattern_match(m, "0********")
    return False


def overlaps(a, b) -> bool:
    """predicates.py:905 — same dim, share some but not all."""
    if a is None or b is None:
        return False
    dimA, dimB = a.dimension, b.dimension
    if dimA != dimB or dimA < 0:
        return False
    m = _mat(a, b)
    if dimA == 1:
        return relate_pattern_match(m, "1*T***T**")
    return relate_pattern_match(m, "T*T***T**")


def touches(a, b) -> bool:
    """predicates.py:968 — only boundary points shared."""
    if a is None or b is None:
        return False
    m = _mat(a, b)
    return any(
        relate_pattern_match(m, p) for p in ("FT*******", "F**T*****", "F***T****")
    )


def equals(a, b) -> bool:
    """predicates.py:830 — topological equality; two empties are equal."""
    if a is None or b is None:
        return False
    if a.is_empty and b.is_empty:
        return True
    return relate_pattern_match(_mat(a, b), "T*F**FFF*")


def relate_pattern(a, b, pattern: str) -> bool:
    """predicates.py:1226."""
    if a is None or b is None:
        return False
    return relate_pattern_match(_mat(a, b), pattern)


# ---------------------------------------------------------------------------
# distance + dwithin (measurement.py:54, predicates.py:1269)
# ---------------------------------------------------------------------------


def distance(a: Geom | None, b: Geom | None) -> float:
    """Min euclidean distance; nan for None/empty (measurement.py:54)."""
    if a is None or b is None:
        return float("nan")
    if a.is_empty or b.is_empty:
        return float("nan")
    da, db = Decomp(a), Decomp(b)
    best = np.inf
    # vertex-containment short-circuit (part of A inside B's area or vice
    # versa implies distance 0; partial overlap is caught by seg-seg = 0)
    for dsrc, dother in ((da, db), (db, da)):
        if dother.polys and len(dsrc.vertices):
            for rings in dother.polys:
                if np.any(
                    core.points_in_rings(dsrc.vertices[:, 0], dsrc.vertices[:, 1], rings)
                ):
                    return 0.0
    sa = da.segs
    sb = db.segs
    if len(sa) and len(sb):
        d2 = core.seg_seg_dist2(
            sa[:, None, 0], sa[:, None, 1], sa[:, None, 2], sa[:, None, 3],
            sb[None, :, 0], sb[None, :, 1], sb[None, :, 2], sb[None, :, 3],
        )
        best = min(best, float(np.sqrt(d2.min())))
    pa = np.vstack([da.pts, da.vertices]) if len(da.pts) or len(da.vertices) else np.empty((0, 2))
    pb = np.vstack([db.pts, db.vertices]) if len(db.pts) or len(db.vertices) else np.empty((0, 2))
    if len(pa) and len(sb):
        d2 = core.point_seg_dist2(
            pa[:, None, 0], pa[:, None, 1],
            sb[None, :, 0], sb[None, :, 1], sb[None, :, 2], sb[None, :, 3],
        )
        best = min(best, float(np.sqrt(d2.min())))
    if len(pb) and len(sa):
        d2 = core.point_seg_dist2(
            pb[:, None, 0], pb[:, None, 1],
            sa[None, :, 0], sa[None, :, 1], sa[None, :, 2], sa[None, :, 3],
        )
        best = min(best, float(np.sqrt(d2.min())))
    if len(pa) and len(pb):
        d2 = (pa[:, None, 0] - pb[None, :, 0]) ** 2 + (pa[:, None, 1] - pb[None, :, 1]) ** 2
        best = min(best, float(np.sqrt(d2.min())))
    if best == np.inf:
        return float("nan")
    return best


def dwithin(a, b, d: float) -> bool:
    """predicates.py:1269 — distance(a,b) <= d; negative d -> False."""
    if a is None or b is None:
        return False
    if d < 0:
        return False
    if a.is_empty or b.is_empty:
        return False
    dist = distance(a, b)
    return bool(dist <= d)
