"""PreparedPolygons: the actor-state form of prepared-geometry semantics.

The reference accelerates repeated predicate calls by caching a
`GEOSPreparedGeometry` on the input (creation.py:735 `prepare`; dispatch
src/geos_funcs_YY_b.c:99-105) and bulk joins via `STRtree` (strtree.py).
In our engine both collapse into ONE structure built once per worker in
an actor's ``__init__`` (SURVEY.md §2.3): the whole polygon layer in
ragged form, with per-polygon bounds and a grid-cell → polygon-ids
prefilter index.  Batches of points stream through ``query_points`` /
``locate_pairs`` — fully vectorized ray casting, no Python loop over
points.
"""

from __future__ import annotations

import numpy as np

from engine.geo import cells, core
from engine.geo.ragged import PolygonArray


class PreparedPolygons:
    """Broadcast polygon layer + prefilter index (build once per actor)."""

    def __init__(self, polys: PolygonArray, cell_size: float | None = None):
        self.polys = polys
        self.bounds = polys.bounds()
        widths = self.bounds[:, 2] - self.bounds[:, 0]
        heights = self.bounds[:, 3] - self.bounds[:, 1]
        dims = np.concatenate([widths, heights])
        dims = dims[np.isfinite(dims) & (dims > 0)]
        if cell_size is None:
            # ~1 polygon bbox per cell: median positive bbox dimension
            cell_size = float(np.median(dims)) if len(dims) else 1.0
        # guard: a cell size far below the typical bbox would explode the
        # covering sets (grid_cover is O(bbox_area / cell_size^2))
        if len(dims):
            cell_size = max(cell_size, float(np.max(dims)) / 4096.0)
        self.cell_size = float(cell_size)
        rows, cids = cells.grid_cover_many(self.bounds, self.cell_size)
        order = np.argsort(cids, kind="stable")
        self._cell_ids = cids[order]
        self._cell_polys = rows[order]
        # rings per polygon, pre-sliced once (scalar fallback paths)
        self._rings = [polys.rings_of(i) for i in range(len(polys))]
        # flat edge table in polygon order (vectorized PIP kernel state):
        # all ring edges of polygon p occupy _edge_off[p]:_edge_off[p+1]
        edges = []
        counts = np.zeros(len(polys), dtype=np.int64)
        for p in range(len(polys)):
            n = 0
            for r in self._rings[p]:
                if len(r) >= 2:
                    edges.append(np.hstack([r[:-1], r[1:]]))
                    n += len(r) - 1
            counts[p] = n
        self._edges = np.vstack(edges) if edges else np.empty((0, 4))
        self._edge_off = np.concatenate([[0], np.cumsum(counts)])
        self._build_slabs()

    # y-slab edge index: per polygon, edges bucketed into NSLAB horizontal
    # slabs of its bbox.  A point only ever interacts (ray-crossing or
    # boundary test) with edges whose y-range contains its y — i.e. edges
    # bucketed in its slab — so refinement touches ~edges/NSLAB per
    # candidate instead of all edges (memory-bandwidth is the scaling
    # limiter of the expanded (pair, edge) kernel).
    NSLAB = 8

    def _build_slabs(self):
        P = len(self.polys)
        B = self.NSLAB
        eps = 1e-9
        ymin_p = np.where(np.isnan(self.bounds[:, 1]), 0.0, self.bounds[:, 1])
        ymax_p = np.where(np.isnan(self.bounds[:, 3]), 0.0, self.bounds[:, 3])
        h = np.maximum((ymax_p - ymin_p) / B, 1e-300)
        self._slab_y0 = ymin_p
        self._slab_h = h
        bucket_rows: list[np.ndarray] = []
        bucket_keys: list[np.ndarray] = []
        for p in range(P):
            e0, e1 = self._edge_off[p], self._edge_off[p + 1]
            if e1 == e0:
                continue
            ed = self._edges[e0:e1]
            y0 = np.minimum(ed[:, 1], ed[:, 3]) - eps
            y1 = np.maximum(ed[:, 1], ed[:, 3]) + eps
            s0 = np.clip(((y0 - ymin_p[p]) / h[p]).astype(np.int64), 0, B - 1)
            s1 = np.clip(((y1 - ymin_p[p]) / h[p]).astype(np.int64), 0, B - 1)
            span = s1 - s0 + 1
            rows = np.repeat(np.arange(e0, e1, dtype=np.int64), span)
            within = np.arange(len(rows), dtype=np.int64) - np.repeat(
                np.cumsum(span) - span, span
            )
            slabs = s0.repeat(span) + within
            bucket_rows.append(rows)
            bucket_keys.append(p * B + slabs)
        if bucket_rows:
            rows = np.concatenate(bucket_rows)
            keys = np.concatenate(bucket_keys)
            order = np.argsort(keys, kind="stable")
            self._slab_edges = rows[order]
            counts = np.bincount(keys, minlength=P * B)
            self._slab_off = np.concatenate([[0], np.cumsum(counts)])
        else:
            self._slab_edges = np.empty(0, dtype=np.int64)
            self._slab_off = np.zeros(P * B + 1, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.polys)

    # ---------------------------------------------------------------- core
    def candidates(self, px: np.ndarray, py: np.ndarray):
        """Grid-prefiltered candidate pairs -> (point_idx, poly_idx).

        This is the in-actor equivalent of the H3/S2 cell-prefilter stage:
        point cell ids are joined against the precomputed polygon covering
        cells (searchsorted on the sorted cell index), then bbox-filtered.
        """
        pc = cells.grid_cell(px, py, self.cell_size)
        lo = np.searchsorted(self._cell_ids, pc, side="left")
        hi = np.searchsorted(self._cell_ids, pc, side="right")
        counts = hi - lo
        if counts.sum() == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pt_idx = np.repeat(np.arange(len(px), dtype=np.int64), counts)
        # vectorized ragged gather of the matching _cell_polys slices
        total = int(counts.sum())
        starts = np.repeat(lo, counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        poly_idx = self._cell_polys[starts + within]
        b = self.bounds[poly_idx]
        inbox = (
            (px[pt_idx] >= b[:, 0])
            & (px[pt_idx] <= b[:, 2])
            & (py[pt_idx] >= b[:, 1])
            & (py[pt_idx] <= b[:, 3])
        )
        return pt_idx[inbox], poly_idx[inbox]

    def locate_pairs(self, px, py, pt_idx, poly_idx) -> np.ndarray:
        """int8 classification per candidate pair: 0 out / 1 bndry / 2 in.

        Vectorized per distinct polygon in the batch (points grouped by
        polygon, each group ray-cast in one numpy pass) — the prepared
        point-in-polygon refinement of SURVEY.md §2.2."""
        npairs = len(pt_idx)
        out = np.zeros(npairs, dtype=np.int8)
        if npairs == 0 or len(self._edges) == 0:
            return out
        # expand each pair to its polygon's edges IN THE POINT'S Y-SLAB
        # (slab index built once in __init__): every edge a point can
        # cross or lie on has a y-range containing the point's y, so the
        # slab's edge list is sufficient — ~edges/NSLAB rows per pair.
        B = self.NSLAB
        qy_pair = py[pt_idx]
        slab = np.clip(
            ((qy_pair - self._slab_y0[poly_idx]) / self._slab_h[poly_idx]).astype(np.int64),
            0,
            B - 1,
        )
        key = poly_idx * B + slab
        cnt = self._slab_off[key + 1] - self._slab_off[key]
        total = int(cnt.sum())
        if total == 0:
            return out
        pair_of = np.repeat(np.arange(npairs, dtype=np.int64), cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        erow = self._slab_edges[self._slab_off[key].repeat(cnt) + within]
        # chunk to bound peak memory on huge batches
        crossings = np.zeros(npairs, dtype=np.int64)
        on_b = np.zeros(npairs, dtype=np.int64)
        # small chunk keeps peak temporaries ~tens of MB: bounds worker
        # heap (SURVEY §7 memory-aware rule) and, in this sandbox, caps
        # the first-touch page-fault bill a fresh worker pays (~200µs/4K
        # page); the arena then recycles the same pages every chunk.
        chunk = 500_000
        for s in range(0, total, chunk):
            e = slice(s, min(total, s + chunk))
            pid = pair_of[e]
            ed = self._edges[erow[e]]
            qx = px[pt_idx[pid]]
            qy = py[pt_idx[pid]]
            ax, ay, bx, by = ed[:, 0], ed[:, 1], ed[:, 2], ed[:, 3]
            # cheap bbox pre-mask: only edge rows whose y-span brackets the
            # point (ray-cast candidates) or whose bbox contains the point
            # (boundary candidates) do any further work
            cond = (ay > qy) != (by > qy)
            nearx = (qx >= np.minimum(ax, bx) - 1e-9) & (qx <= np.maximum(ax, bx) + 1e-9)
            neary = (qy >= np.minimum(ay, by) - 1e-9) & (qy <= np.maximum(ay, by) + 1e-9)
            near = nearx & neary
            if near.any():
                idx = np.flatnonzero(near)
                onseg = core.on_segment(
                    qx[idx], qy[idx], ax[idx], ay[idx], bx[idx], by[idx]
                )
                if onseg.any():
                    on_b += np.bincount(pid[idx[onseg]], minlength=npairs)
            if cond.any():
                idx = np.flatnonzero(cond)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = ax[idx] + (qy[idx] - ay[idx]) * (bx[idx] - ax[idx]) / (
                        by[idx] - ay[idx]
                    )
                hits = idx[xint > qx[idx]]
                crossings += np.bincount(pid[hits], minlength=npairs)
        out[crossings % 2 == 1] = 2
        out[on_b > 0] = 1
        return out

    # ------------------------------------------------------------- queries
    def query_points(self, px, py, predicate: str = "intersects"):
        """Bulk point-vs-layer join -> (point_idx, poly_idx) pairs.

        predicate ∈ {intersects, contains, covers, within, covered_by}:
        applied as predicate(polygon, point) for contains/covers (i.e.
        polygon contains point) and point-side for within/covered_by —
        all reduce to the boundary/interior distinction
        (predicates.py:556/729 semantics)."""
        px = np.ascontiguousarray(px, dtype=np.float64)
        py = np.ascontiguousarray(py, dtype=np.float64)
        pt_idx, poly_idx = self.candidates(px, py)
        locs = self.locate_pairs(px, py, pt_idx, poly_idx)
        if predicate in ("intersects", "covers", "covered_by"):
            keep = locs > 0
        elif predicate in ("contains", "within", "contains_properly"):
            keep = locs == 2
        elif predicate == "touches":
            keep = locs == 1
        else:
            raise ValueError(f"unsupported point predicate: {predicate!r}")
        return pt_idx[keep], poly_idx[keep]

    def query_points_dwithin(self, px, py, distance: float):
        """Point within ``distance`` of polygon (bbox-padded prefilter +
        exact point-to-ring segment distance; strtree.py:247-262)."""
        px = np.ascontiguousarray(px, dtype=np.float64)
        py = np.ascontiguousarray(py, dtype=np.float64)
        d = float(distance)
        if d < 0 or np.isnan(d):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # padded-bbox candidate pass over all polygons (layer is small;
        # bbox test is vectorized (n_pts, n_polys) in chunks)
        n, p = len(px), len(self.polys)
        pt_list, poly_list = [], []
        b = self.bounds
        chunk = max(1, int(2_000_000 // max(p, 1)))
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            inbox = (
                (px[s:e, None] >= b[None, :, 0] - d)
                & (px[s:e, None] <= b[None, :, 2] + d)
                & (py[s:e, None] >= b[None, :, 1] - d)
                & (py[s:e, None] <= b[None, :, 3] + d)
            )
            ii, jj = np.nonzero(inbox)
            pt_list.append(ii + s)
            poly_list.append(jj)
        pt_idx = np.concatenate(pt_list) if pt_list else np.empty(0, dtype=np.int64)
        poly_idx = np.concatenate(poly_list) if poly_list else np.empty(0, dtype=np.int64)
        if len(pt_idx) == 0:
            return pt_idx, poly_idx
        keep = np.zeros(len(pt_idx), dtype=bool)
        order = np.argsort(poly_idx, kind="stable")
        bnds = np.flatnonzero(np.diff(poly_idx[order])) + 1
        for grp in np.split(order, bnds):
            pid = int(poly_idx[grp[0]])
            qx, qy = px[pt_idx[grp]], py[pt_idx[grp]]
            locs = core.points_in_rings(qx, qy, self._rings[pid])
            near = locs > 0
            far = ~near
            if far.any():
                segs = [
                    np.hstack([r[:-1], r[1:]]) for r in self._rings[pid] if len(r) >= 2
                ]
                if segs:
                    segs = np.vstack(segs)
                    d2 = core.point_seg_dist2(
                        qx[far, None], qy[far, None],
                        segs[None, :, 0], segs[None, :, 1],
                        segs[None, :, 2], segs[None, :, 3],
                    ).min(axis=1)
                    near[np.flatnonzero(far)] = d2 <= d * d
            keep[grp] = near
        return pt_idx[keep], poly_idx[keep]

    def nearest_poly(self, px, py):
        """For each point: (poly_idx, distance) of the nearest polygon
        (lowest index on ties — documented deviation, strtree.py:276-279).
        """
        px = np.ascontiguousarray(px, dtype=np.float64)
        py = np.ascontiguousarray(py, dtype=np.float64)
        n, p = len(px), len(self.polys)
        best_d = np.full(n, np.inf)
        best_i = np.full(n, -1, dtype=np.int64)
        if p == 0 or n == 0:
            return best_i, best_d
        # distance 0 shortcut: inside/boundary via prefilter
        pt_idx, poly_idx = self.query_points(px, py, "intersects")
        if len(pt_idx):
            first = np.full(n, -1, dtype=np.int64)
            # lowest poly index per point
            order = np.lexsort((poly_idx, pt_idx))
            pi, xi = poly_idx[order], pt_idx[order]
            firstmask = np.ones(len(xi), dtype=bool)
            firstmask[1:] = xi[1:] != xi[:-1]
            first[xi[firstmask]] = pi[firstmask]
            hit = first >= 0
            best_i[hit] = first[hit]
            best_d[hit] = 0.0
        todo = np.flatnonzero(best_i < 0)
        if len(todo) == 0:
            return best_i, best_d
        # exact distance to each polygon's rings, polygon-major loop
        # (layer small; per-polygon pass is vectorized over points)
        for pid in range(p):
            segs = [np.hstack([r[:-1], r[1:]]) for r in self._rings[pid] if len(r) >= 2]
            if not segs:
                continue
            segs = np.vstack(segs)
            qx, qy = px[todo], py[todo]
            chunk = max(1, int(2_000_000 // max(len(segs), 1)))
            for s in range(0, len(todo), chunk):
                e = min(len(todo), s + chunk)
                d2 = core.point_seg_dist2(
                    qx[s:e, None], qy[s:e, None],
                    segs[None, :, 0], segs[None, :, 1],
                    segs[None, :, 2], segs[None, :, 3],
                ).min(axis=1)
                dd = np.sqrt(d2)
                upd = dd < best_d[todo[s:e]]
                best_d[todo[s:e][upd]] = dd[upd]
                best_i[todo[s:e][upd]] = pid
        return best_i, best_d
