"""Empirical SEMIVARIOGRAM over a point set — the classic geospatial
spatial-dependence statistic: γ(h-bin) = Σ (v_i − v_j)² / (2·N_bin)
over all point pairs with distance ≤ ``max_lag``, binned by distance.

Distributed plan (the cell-join pattern reused as a PAIR GENERATOR):

1. cell size = ``max_lag`` → every qualifying pair sits in one cell or
   a ring-1 neighbor pair;
2. owners key to their own cell, replicas explode to the 3×3
   neighborhood (narrow (id, x, y, v) rows — ~9× replication of four
   columns, never payloads);
3. ONE hash exchange on the cell; per group a chunked owner×replica
   distance matrix emits pairs EXACTLY ONCE via the owner-of-smaller-id
   rule (pair (a, b) appears as owner=a only in a's cell and as
   owner=b only in b's — the id inequality keeps exactly one);
4. per-group partials are (bin, count, Σ dv²) with INTEGER dv² (the
   value column is integral by contract) — exact, mergeable, ≤ nbins
   rows per group — tree-folded driver-side; the single float division
   per bin happens once at the end (mirrored verbatim in the SQL
   oracle, so the doubles are bit-identical).

Reference: shapely has no variogram (engine addition per north_rule);
the estimator is the standard Matheron form from the public
geostatistics literature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# element budget per distance-matrix temporary: the chunk row count
# adapts to the cell's replica population (chunk_rows × n_replicas ≤
# budget), so a hot cell bounds BOTH matrix axes instead of only one
_PAIR_ELEMS = 1 << 21  # ~2M float64 elements ≈ 16 MB per temporary


def semivariogram(ds, x_col: str, y_col: str, v_col: str, id_col: str,
                  max_lag: float, nbins: int = 8, num_parts: int = 64):
    """γ per distance bin over pairs with 0 ≤ d ≤ max_lag (self-pairs
    excluded by id inequality).  Returns a pa.Table (bin, n_pairs,
    gamma) sorted by bin — bins with no pairs are absent, matching the
    SQL GROUP BY."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups, tree_fold_refs

    binw = float(max_lag) / nbins

    def owners(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy()
        y = t[y_col].to_numpy()
        return pa.table({
            "gx": pa.array(np.floor(x / max_lag).astype(np.int64)),
            "gy": pa.array(np.floor(y / max_lag).astype(np.int64)),
            "id": t[id_col].cast(pa.int64()),
            "x": pa.array(x), "y": pa.array(y),
            "v": t[v_col].cast(pa.int64()),
            "own": pa.array(np.ones(len(t), dtype=np.int64)),
        })

    def replicas(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy()
        y = t[y_col].to_numpy()
        cx = np.floor(x / max_lag).astype(np.int64)
        cy = np.floor(y / max_lag).astype(np.int64)
        n = len(t)
        reps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                reps.append((cx + dx, cy + dy))
        idx = np.tile(np.arange(n, dtype=np.int64), 9)
        ids = t[id_col].cast(pa.int64()).to_numpy()
        vs = t[v_col].cast(pa.int64()).to_numpy()
        return pa.table({
            "gx": pa.array(np.concatenate([r[0] for r in reps])),
            "gy": pa.array(np.concatenate([r[1] for r in reps])),
            "id": pa.array(ids[idx]),
            "x": pa.array(x[idx]), "y": pa.array(y[idx]),
            "v": pa.array(vs[idx]),
            "own": pa.array(np.zeros(9 * n, dtype=np.int64)),
        })

    both = ds.map_batches(owners, batch_format="pyarrow",
                          batch_size=None).union(
        ds.map_batches(replicas, batch_format="pyarrow",
                       batch_size=None))

    def group_fn(group: pa.Table) -> pa.Table:
        # the exchange delivers a whole HASH PARTITION (many cells) —
        # pair only within each (gx, gy) run, never across cells
        g = group.drop_columns(["_part"])
        empty = pa.table({"bin": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "ss": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        gx = g["gx"].to_numpy()
        gy = g["gy"].to_numpy()
        own_all = g["own"].to_numpy().astype(bool)
        xs = g["x"].to_numpy()
        ys = g["y"].to_numpy()
        ids = g["id"].to_numpy()
        vs = g["v"].to_numpy()
        order = np.lexsort((ids, own_all, gy, gx))
        gx, gy = gx[order], gy[order]
        own_all = own_all[order]
        xs, ys, ids, vs = xs[order], ys[order], ids[order], vs[order]
        new = np.r_[True, (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(gx)]
        cnt = np.zeros(nbins, dtype=np.int64)
        ss = np.zeros(nbins, dtype=np.int64)
        for a, b in zip(starts, ends):
            own = own_all[a:b]
            if not own.any() or own.all():
                continue
            ox, oy = xs[a:b][own], ys[a:b][own]
            oid, ov = ids[a:b][own], vs[a:b][own]
            rx, ry = xs[a:b][~own], ys[a:b][~own]
            rid, rv = ids[a:b][~own], vs[a:b][~own]
            step = max(1, _PAIR_ELEMS // max(len(rx), 1))
            for s in range(0, len(ox), step):
                e = min(s + step, len(ox))
                dx = ox[s:e, None] - rx[None, :]
                dy = oy[s:e, None] - ry[None, :]
                d = np.sqrt(dx * dx + dy * dy)
                ok = (d <= max_lag) & (oid[s:e, None] < rid[None, :])
                if not ok.any():
                    continue
                db = np.minimum((d[ok] / binw).astype(np.int64),
                                nbins - 1)
                dv = (ov[s:e, None] - rv[None, :])[ok]
                np.add.at(cnt, db, 1)
                np.add.at(ss, db, dv * dv)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz),
                         "cnt": pa.array(cnt[nz]),
                         "ss": pa.array(ss[nz])})

    partials = hash_exchange_groups(both, ["gx", "gy"], group_fn,
                                    num_parts)

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        if t.num_rows == 0:
            return t
        g = t.group_by(["bin"]).aggregate([("cnt", "sum"), ("ss", "sum")])
        return g.rename_columns(["bin", "cnt", "ss"])

    tot = tree_fold_refs(partials, fold)
    if tot.num_columns == 0 or tot.num_rows == 0:
        return pa.table({"bin": pa.array([], type=pa.int64()),
                         "n_pairs": pa.array([], type=pa.int64()),
                         "gamma": pa.array([], type=pa.float64())})
    b = tot["bin"].to_numpy()
    c = tot["cnt"].to_numpy()
    s = tot["ss"].to_numpy()
    order = np.argsort(b)
    b, c, s = b[order], c[order], s[order]
    gamma = s.astype(np.float64) / (2.0 * c.astype(np.float64))
    return pa.table({"bin": pa.array(b), "n_pairs": pa.array(c),
                     "gamma": pa.array(gamma)})
