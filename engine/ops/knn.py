"""EXACT big-big k-nearest-neighbor join, grid-partitioned.

Reference parity: the reference's STRtree ``query_nearest`` / kNN
semantics (reference ``shapely/strtree.py`` nearest queries) lifted to
a DISTRIBUTED two-table join — every left point gets its k nearest
right points, both sides too large to broadcast.

Design (the partitioning contract the operator relies on):

- Square grid, cell side ``s`` (a POWER OF TWO so ``R·s`` and
  ``(R·s)²`` are exact doubles — the resolution bound below is then
  exact, no epsilon games).  Right points are keyed by their OWN cell
  and never replicated.  Left points replicate to the cells of the
  current search annulus.
- Round with radius R: each unresolved left explodes to the cells at
  Chebyshev distance (prevR, R] of its home cell; ONE union exchange
  co-locates visitors with resident rights; per cell, a chunked
  vectorized distance matrix emits each visitor's top-k candidates in
  that cell.  A second exchange keyed by the left id merges new
  candidates with carried partials (dedup on (left, right)) and keeps
  the running top-k.
- Resolution bound: after scanning Chebyshev ≤ R, any unseen right is
  ≥ R·s away (a point anywhere in its home cell is ≥ R·s from every
  cell at Chebyshev R+1).  A left is resolved when it holds ≥ k
  candidates with d_k² < (R·s)² — strict, so an unseen tie can never
  displace a kept neighbor — or when the annulus has covered the whole
  grid.  Radii double (1, 2, 4, …): isolated points cost O(log grid)
  rounds, and each round's explode touches only still-unresolved lefts.
- Ties: ordered by (d², right_id) everywhere, and d² is evaluated as
  ``(xl−xr)² + (yl−yr)²`` in IEEE doubles in BOTH the kernel and the
  SQL oracle — identical bits, identical ranking.

Scale: exchanges move only (cell, id, x, y) tuples — ring-1 left
replication is 9×, later annuli touch the (tiny) unresolved tail only.
Skewed hot cells are bounded by the chunked (512 × |cell|) distance
matrix, the same device as the interval join.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

CHUNK = 512  # visiting-left rows per distance-matrix chunk


def auto_cell(n_right: int, extent: float, k: int) -> float:
    """Power-of-two cell side sized so the UNIFORM-case kth-neighbor
    distance √(k/(πρ)) clears the ring-1 resolution bound with a 2×
    safety margin — round 1 resolves nearly every point.  Density
    collapse (tiny n) clamps to the whole extent."""
    import math

    if n_right <= 0:
        return 2.0
    density = n_right / (extent * extent)
    want = 2.0 * math.sqrt(max(k, 1) / (math.pi * density))
    return float(min(2.0 ** math.ceil(math.log2(max(want, 1e-6))),
                     2.0 ** math.ceil(math.log2(extent))))


def _cells_within(cx: np.ndarray, cy: np.ndarray, lo: int, hi: int,
                  span: int):
    """Explode (cx, cy) to all cells at Chebyshev distance in
    (lo, hi] — returns (row_idx, cell_key).  ``span`` folds (cx, cy)
    into one int64 key; out-of-grid cells are emitted (harmless — no
    rights live there) but clipped to ≥0 to keep keys non-negative."""
    offs = []
    for dx in range(-hi, hi + 1):
        for dy in range(-hi, hi + 1):
            if max(abs(dx), abs(dy)) > lo:
                offs.append((dx, dy))
    offs = np.asarray(offs, dtype=np.int64)
    n = len(cx)
    ridx = np.repeat(np.arange(n, dtype=np.int64), len(offs))
    gx = np.tile(offs[:, 0], n) + np.repeat(cx, len(offs))
    gy = np.tile(offs[:, 1], n) + np.repeat(cy, len(offs))
    ok = (gx >= 0) & (gy >= 0)
    return ridx[ok], gx[ok] * np.int64(span) + gy[ok]


def _cell_topk(group: pa.Table, k: int, exclude_same_id: bool):
    """Per-cell candidates: for every visiting left (side 0), its top-k
    nearest resident rights (side 1) IN THIS CELL.  Vectorized per cell;
    visiting lefts are chunked so a hot cell never allocates more than
    CHUNK × |cell| distances."""
    cell = group["_cell"].to_numpy(zero_copy_only=False)
    side = group["_side"].to_numpy(zero_copy_only=False)
    ids = group["_id"].to_numpy(zero_copy_only=False)
    xs = group["_x"].to_numpy(zero_copy_only=False)
    ys = group["_y"].to_numpy(zero_copy_only=False)
    order = np.argsort(cell, kind="stable")
    cell, side, ids, xs, ys = (a[order] for a in (cell, side, ids, xs, ys))
    starts = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
    ends = np.r_[starts[1:], len(cell)]
    out_l, out_r, out_d, out_lx, out_ly = [], [], [], [], []
    # SENTINEL presence rows (rid=-1, d²=inf) for every visitor: a left
    # whose annulus holds no rights must still reach the merge stage as
    # UNRESOLVED (d_k=inf fails the bound) so later rounds escalate it;
    # without these an isolated point would silently vanish.  Dedup in
    # the merge collapses them; the final projection filters rid ≥ 0.
    vis = np.nonzero(side == 0)[0]
    if len(vis):
        out_l.append(ids[vis])
        out_r.append(np.full(len(vis), -1, dtype=np.int64))
        out_d.append(np.full(len(vis), np.inf))
        out_lx.append(xs[vis])
        out_ly.append(ys[vis])
    for a, b in zip(starts, ends):
        sl = side[a:b]
        li = np.nonzero(sl == 0)[0] + a
        ri = np.nonzero(sl == 1)[0] + a
        if len(li) == 0 or len(ri) == 0:
            continue
        # rights sorted by id: a per-row STABLE argsort on d² then
        # tie-breaks by column index == right id — the same (d², rid)
        # order the merge and the SQL oracle use (argpartition alone
        # could drop the smaller-id member of a boundary tie)
        ro = np.argsort(ids[ri], kind="stable")
        rx, ry, rid = xs[ri][ro], ys[ri][ro], ids[ri][ro]
        for c0 in range(0, len(li), CHUNK):
            ch = li[c0:c0 + CHUNK]
            dx = xs[ch][:, None] - rx[None, :]
            dy = ys[ch][:, None] - ry[None, :]
            d2 = dx * dx + dy * dy
            if exclude_same_id:
                d2 = np.where(ids[ch][:, None] == rid[None, :], np.inf, d2)
            kk = min(k, d2.shape[1])
            part = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(len(ch)), kk)
            cols = part.ravel()
            dd = d2[rows, cols]
            keep = np.isfinite(dd)
            out_l.append(np.repeat(ids[ch], kk)[keep])
            out_r.append(rid[cols][keep])
            out_d.append(dd[keep])
            out_lx.append(np.repeat(xs[ch], kk)[keep])
            out_ly.append(np.repeat(ys[ch], kk)[keep])
    if not out_l:
        return pa.table({
            "_lid": pa.array([], type=pa.int64()),
            "_rid": pa.array([], type=pa.int64()),
            "_d2": pa.array([], type=pa.float64()),
            "_lx": pa.array([], type=pa.float64()),
            "_ly": pa.array([], type=pa.float64()),
        })
    return pa.table({
        "_lid": np.concatenate(out_l).astype(np.int64),
        "_rid": np.concatenate(out_r).astype(np.int64),
        "_d2": np.concatenate(out_d),
        "_lx": np.concatenate(out_lx),
        "_ly": np.concatenate(out_ly),
    })


def _merge_topk(group: pa.Table, k: int, bound2: float):
    """Per-left merge: dedup (left, right), keep top-k by (d², rid);
    resolved ⇔ k candidates with d_k² strictly under ``bound2``
    (``inf`` = annulus covered the grid → always resolved)."""
    lid = group["_lid"].to_numpy(zero_copy_only=False)
    rid = group["_rid"].to_numpy(zero_copy_only=False)
    d2 = group["_d2"].to_numpy(zero_copy_only=False)
    lx = group["_lx"].to_numpy(zero_copy_only=False)
    ly = group["_ly"].to_numpy(zero_copy_only=False)
    if len(lid) == 0:
        return pa.table({
            "_lid": pa.array([], type=pa.int64()),
            "_rid": pa.array([], type=pa.int64()),
            "_d2": pa.array([], type=pa.float64()),
            "_lx": pa.array([], type=pa.float64()),
            "_ly": pa.array([], type=pa.float64()),
            "_rank": pa.array([], type=pa.int64()),
            "_done": pa.array([], type=pa.bool_()),
        })
    order = np.lexsort((rid, d2, lid))
    lid, rid, d2, lx, ly = (a[order] for a in (lid, rid, d2, lx, ly))
    # dedup (lid, rid) — carried partials re-enter each round; rows are
    # sorted by (lid, d2, rid) and a duplicate pair has equal d2, so
    # duplicates are ADJACENT here
    keep = np.ones(len(lid), dtype=bool)
    keep[1:] = (lid[1:] != lid[:-1]) | (rid[1:] != rid[:-1])
    idx = np.nonzero(keep)[0]
    lid, rid, d2, lx, ly = (a[idx] for a in (lid, rid, d2, lx, ly))
    # rank within lid (rows already sorted by (lid, d2, rid))
    first = np.r_[True, lid[1:] != lid[:-1]]
    gidx = np.cumsum(first) - 1
    starts = np.nonzero(first)[0]
    rank = np.arange(len(lid)) - starts[gidx]
    top = rank < k
    lid, rid, d2, lx, ly, rank = (a[top] for a in
                                  (lid, rid, d2, lx, ly, rank))
    # per-left resolution
    first = np.r_[True, lid[1:] != lid[:-1]]
    gidx = np.cumsum(first) - 1
    cnt = np.bincount(gidx)
    lastrow = np.r_[np.nonzero(first)[0][1:], len(lid)] - 1
    dk = d2[lastrow]
    if not np.isfinite(bound2):
        ok = np.ones(len(cnt), dtype=bool)
    else:
        ok = (cnt >= k) & (dk < bound2)
    resolved = ok[gidx]
    return pa.table({
        "_lid": lid, "_rid": rid, "_d2": d2, "_lx": lx, "_ly": ly,
        "_rank": (rank + 1).astype(np.int64),
        "_done": resolved,
    })


def _tail_topk_pass(right_ds, tail_tbl: pa.Table, k: int,
                    exclude_same_id: bool, right_id: str, x: str, y: str):
    """Finish a SMALL unresolved tail exactly: broadcast the tail's
    (lid, x, y) once, ONE streaming scan of the rights computes each
    block's per-left top-k partial, a 16-way merge + final block rank
    the global top-k.  Replaces every remaining annulus round with one
    narrow full scan — the classic broadcast-small-side trade (the
    annulus loop remains the past-budget fallback)."""
    import ray

    from engine.rayds.bcast import cached

    lids = tail_tbl["_lid"].to_numpy(zero_copy_only=False)
    lxs = tail_tbl["_lx"].to_numpy(zero_copy_only=False)
    lys = tail_tbl["_ly"].to_numpy(zero_copy_only=False)
    ref = ray.put((lids, lxs, lys))

    def partial(batch: pa.Table) -> pa.Table:
        li, lx, ly = cached(ref)
        empty = pa.table({
            "_lid": pa.array([], type=pa.int64()),
            "_rid": pa.array([], type=pa.int64()),
            "_d2": pa.array([], type=pa.float64()),
            "_lx": pa.array([], type=pa.float64()),
            "_ly": pa.array([], type=pa.float64()),
        })
        if batch.num_rows == 0 or len(li) == 0:
            return empty
        rid = batch[right_id].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rx = batch[x].to_numpy(zero_copy_only=False)
        ry = batch[y].to_numpy(zero_copy_only=False)
        ro = np.argsort(rid, kind="stable")  # tie-break by rid
        rid, rx, ry = rid[ro], rx[ro], ry[ro]
        out_l, out_r, out_d, out_x, out_y = [], [], [], [], []
        for c0 in range(0, len(li), CHUNK):
            ls = slice(c0, c0 + CHUNK)
            dx = lx[ls][:, None] - rx[None, :]
            dy = ly[ls][:, None] - ry[None, :]
            d2 = dx * dx + dy * dy
            if exclude_same_id:
                d2 = np.where(li[ls][:, None] == rid[None, :], np.inf, d2)
            kk = min(k, d2.shape[1])
            part = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(part.shape[0]), kk)
            cols = part.ravel()
            dd = d2[rows, cols]
            keep = np.isfinite(dd)
            out_l.append(np.repeat(li[ls], kk)[keep])
            out_r.append(rid[cols][keep])
            out_d.append(dd[keep])
            out_x.append(np.repeat(lx[ls], kk)[keep])
            out_y.append(np.repeat(ly[ls], kk)[keep])
        if not out_l:
            return empty
        return pa.table({
            "_lid": np.concatenate(out_l).astype(np.int64),
            "_rid": np.concatenate(out_r).astype(np.int64),
            "_d2": np.concatenate(out_d),
            "_lx": np.concatenate(out_x),
            "_ly": np.concatenate(out_y),
        })

    def merge(batch: pa.Table) -> pa.Table:
        return _merge_topk(batch, k, np.inf).drop_columns(["_done"])

    part = right_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)

    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    return ray.data.from_arrow(tree_fold_refs(
        part, lambda tbls: merge(pa.concat_tables(tbls).combine_chunks())))


def knn_join(left_ds, right_ds, k: int = 4, cell: float = 2.0,
             left_id: str = "id", right_id: str = "id",
             x: str = "x", y: str = "y",
             exclude_same_id: bool = False, num_parts: int = 64,
             grid_hi: float | None = None,
             tail_budget: int = 100_000):
    """Exact distributed kNN join → Dataset (lid, rid, rank, d2).

    ``cell`` MUST be a power of two (exact bound arithmetic).  ``k``
    per left; ids must be int64.  ``grid_hi``: coordinate upper bound
    used to detect full-grid coverage (computed from the data when
    None — one metadata-cheap minmax pass)."""
    import ray.data

    from engine.rayds.shuffle import dataset_minmax, hash_exchange_groups

    if grid_hi is None:
        mm = dataset_minmax(right_ds, [x, y])
        grid_hi = max(abs(mm[x][0]), abs(mm[x][1]),
                      abs(mm[y][0]), abs(mm[y][1])) + cell
    max_r = int(np.ceil(grid_hi / cell)) + 1
    span = 4 * max_r + 4

    def tag_right(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False)
        ys = batch[y].to_numpy(zero_copy_only=False)
        cx = np.floor(xs / cell).astype(np.int64)
        cy = np.floor(ys / cell).astype(np.int64)
        return pa.table({
            "_cell": cx * np.int64(span) + cy,
            "_side": np.full(len(xs), 1, dtype=np.int8),
            "_id": batch[right_id].cast(pa.int64()),
            "_x": xs, "_y": ys,
        })

    rights = right_ds.map_batches(tag_right, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)

    def explode_left(lo: int, hi: int):
        def fn(batch: pa.Table) -> pa.Table:
            xs = batch[x].to_numpy(zero_copy_only=False)
            ys = batch[y].to_numpy(zero_copy_only=False)
            cx = np.floor(xs / cell).astype(np.int64)
            cy = np.floor(ys / cell).astype(np.int64)
            ridx, key = _cells_within(cx, cy, lo, hi, span)
            ids = batch[left_id].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "_cell": key,
                "_side": np.zeros(len(ridx), dtype=np.int8),
                "_id": ids[ridx],
                "_x": xs[ridx], "_y": ys[ridx],
            })
        return fn

    def explode_right_ring1(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False)
        ys = batch[y].to_numpy(zero_copy_only=False)
        cx = np.floor(xs / cell).astype(np.int64)
        cy = np.floor(ys / cell).astype(np.int64)
        ridx, key = _cells_within(cx, cy, -1, 1, span)
        ids = batch[right_id].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "_cell": key,
            "_side": np.full(len(ridx), 1, dtype=np.int8),
            "_id": ids[ridx],
            "_x": xs[ridx], "_y": ys[ridx],
        })

    lefts = left_ds
    carried = None  # Dataset of partial candidate rows
    resolved_parts = []
    prev_r, r = -1, 1  # (prev_r, r] Chebyshev annulus; -1 ⇒ home cell in
    while True:
        full_cover = r >= max_r
        bound2 = np.inf if full_cover else float((r * cell) * (r * cell))
        if prev_r < 0:
            # ROUND-1 FAST PATH: rights replicate to ring-1 and lefts
            # stay in their home cell, so every left sees its complete
            # Chebyshev-≤1 neighborhood in ONE exchange — candidate
            # top-k AND the resolution test run in the same map_groups,
            # no per-left merge exchange.  (Trade documented: 9× of the
            # narrow right tuples instead of a second all-to-all of
            # lefts × k candidate rows.)
            visit = lefts.map_batches(explode_left(-1, 0),
                                      batch_format="pyarrow",
                                      batch_size=None,
                                      zero_copy_batch=True)
            rrep = right_ds.map_batches(explode_right_ring1,
                                        batch_format="pyarrow",
                                        batch_size=None,
                                        zero_copy_batch=True)
            merged = hash_exchange_groups(
                visit.union(rrep), ["_cell"],
                lambda g: _merge_topk(
                    _cell_topk(g.drop_columns(["_part"]), k,
                               exclude_same_id), k, bound2),
                num_parts).materialize()
        else:
            visit = lefts.map_batches(explode_left(prev_r, r),
                                      batch_format="pyarrow",
                                      batch_size=None,
                                      zero_copy_batch=True)
            cand = hash_exchange_groups(
                visit.union(rights), ["_cell"],
                lambda g: _cell_topk(g.drop_columns(["_part"]), k,
                                     exclude_same_id),
                num_parts)
            if carried is not None:
                cand = cand.union(carried)
            merged = hash_exchange_groups(
                cand, ["_lid"],
                lambda g: _merge_topk(g.drop_columns(["_part"]), k, bound2),
                num_parts).materialize()

        import pyarrow.compute as pc

        done = merged.map_batches(
            lambda b: b.filter(b["_done"].combine_chunks()).drop_columns(
                ["_done"]),
            batch_format="pyarrow", batch_size=None)
        resolved_parts.append(done)
        if full_cover:
            break
        todo = merged.map_batches(
            lambda b: b.filter(pc.invert(b["_done"].combine_chunks()))
            .drop_columns(["_done", "_rank"]),
            batch_format="pyarrow", batch_size=None).materialize()
        if todo.count() == 0:
            break

        # next round's lefts: the distinct unresolved points
        def uniq_lefts(b: pa.Table) -> pa.Table:
            t = b.group_by(["_lid"]).aggregate(
                [("_lx", "min"), ("_ly", "min")])
            return t.rename_columns(["_lid", "_lx", "_ly"])

        tail = todo.map_batches(uniq_lefts, batch_format="pyarrow",
                                batch_size=None).materialize()
        if tail.count() <= tail_budget:
            # small tail → ONE broadcast full scan beats O(log grid)
            # more exchange rounds
            tt = pa.concat_tables(tail.iter_batches(batch_format="pyarrow"))
            resolved_parts.append(_tail_topk_pass(
                right_ds, tt, k, exclude_same_id, right_id, x, y))
            break
        carried = todo
        lefts = tail.map_batches(
            lambda b: b.rename_columns([left_id, x, y]),
            batch_format="pyarrow", batch_size=None)
        # ×4 radius growth: every annulus round costs a fixed ~seconds
        # of exchange overhead, so fewer/fatter rounds beat tight ones
        # (the explode volume only grows for the unresolved tail)
        prev_r, r = r, min(r * 4, max_r)

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.greater_equal(b["_rid"].combine_chunks(), 0))
        return pa.table({
            "lid": b["_lid"], "rid": b["_rid"],
            "nn_rank": b["_rank"], "d2": b["_d2"],
        })

    return out.map_batches(project, batch_format="pyarrow",
                           batch_size=None)
