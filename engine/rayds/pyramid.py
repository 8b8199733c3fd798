"""Quadtree tile PYRAMID — the multi-zoom web-map histogram
(z/x/y tile counts for every zoom level 0..zmax in one job).

Scale shape: ONE scan, ONE exchange.  Each block computes its
finest-level cell counts and folds them up through every coarser zoom
LOCALLY (parent = integer-halved child coords, counts summed with
bincount — narrow int64 arrays, no strings, no payloads), so the
exchange carries ≤ blocks × Σ_z occupied-cells(z) partial rows and the
input is scanned exactly once — never once per level (the
rollup_counts lesson: per-level rescans multiply fixed executor cost
by the level count).

Determinism / oracle parity: the finest-level cell is
``floor(x · 2^zmax / world)`` evaluated in that exact IEEE order, and
every coarser level derives from it by INTEGER halving —
``floor(floor(a)/2) == floor(a/2)``, so the SQL oracle reproduces all
levels from the same single float expression with ``>> (zmax − z)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def quad_pyramid(ds, x_col: str, y_col: str, zmax: int = 6,
                 world: float = 100.0, num_parts: int = 64,
                 plan: str | None = None):
    """→ Dataset (z, qx, qy, n): point counts per quadtree cell at every
    zoom 0..zmax over the [0, world)² plane.  Inputs must lie inside
    the world square (cells are not clamped, matching the oracle).

    ``plan``: the pyramid's total cell count is bounded by
    (4^(zmax+1)−1)/3, so for zmax ≤ 8 (≤ ~87k cells) the partials merge
    through a 16-way TREE fold (no all-to-all at all); deeper pyramids
    take the hash exchange.  Auto-chosen by zmax when not given."""
    from engine.rayds.shuffle import hash_shuffle_agg

    scale = float(1 << zmax)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"z": pa.array([], pa.int64()),
                          "qx": pa.array([], pa.int64()),
                          "qy": pa.array([], pa.int64()),
                          "_n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        cx = np.floor(x * scale / world).astype(np.int64)
        cy = np.floor(y * scale / world).astype(np.int64)
        key = (cx << zmax) | cy
        u, cn = np.unique(key, return_counts=True)
        cx, cy, cn = u >> zmax, u & ((1 << zmax) - 1), cn.astype(np.int64)
        zs, xs, ys, ns = [], [], [], []
        for z in range(zmax, -1, -1):
            zs.append(np.full(len(cx), z, dtype=np.int64))
            xs.append(cx)
            ys.append(cy)
            ns.append(cn)
            if z:
                pk = ((cx >> 1) << (z - 1)) | (cy >> 1)
                u2, inv = np.unique(pk, return_inverse=True)
                cn = np.bincount(inv, weights=cn).astype(np.int64)
                cx, cy = u2 >> (z - 1), u2 & ((1 << (z - 1)) - 1)
        return pa.table({"z": pa.array(np.concatenate(zs)),
                         "qx": pa.array(np.concatenate(xs)),
                         "qy": pa.array(np.concatenate(ys)),
                         "_n": pa.array(np.concatenate(ns))})

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    if plan is None:
        plan = "tree" if zmax <= 8 else "shuffle"
    if plan == "shuffle":
        return hash_shuffle_agg(part, ["z", "qx", "qy"], [("_n", "sum")],
                                ["n"], num_parts=num_parts)

    # bounded result (≤ (4^(zmax+1)−1)/3 cells) → raw-task tree fold;
    # the Repartition operator's fixed barrier costs seconds at any size
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        g = t.group_by(["z", "qx", "qy"]).aggregate([("_n", "sum")])
        return g.rename_columns(["z", "qx", "qy", "_n"])

    final = tree_fold_refs(part, combine)
    return ray.data.from_arrow(
        final.rename_columns(["z", "qx", "qy", "n"]))
