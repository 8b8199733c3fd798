"""Per-entity TRAJECTORY statistics — the movement-analytics operator of
a geospatial event pipeline: order each entity's geotagged events by
time and reduce the ordered path to per-entity numbers (segment count,
travelled distance, net displacement).

Scale shape: ONE hash exchange on the entity key (the same shape as the
LAG window operator), then a fully vectorized per-partition pass —
lexsort by (key, order cols), masked segment diffs, bincount folds.
Per-key data is assumed to fit its partition (the hot-key pre-split of
``sessionize_split`` applies the same way if a single entity outgrows
one partition).

Exactness: distances stay in SQUARED INTEGER space (coordinates are
integer milli-units by the table's derivation), so every output is an
exact int64 and the SQL oracle matches bit-for-bit — no float sqrt, no
order-dependent float SUM anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def trajectory_stats(ds, key: str, order_cols: list[str],
                     ix_col: str, iy_col: str, num_parts: int = 64):
    """→ Dataset (key, n_points, path_d2, net_d2):

    - ``n_points``: events of the entity;
    - ``path_d2``: Σ over consecutive ordered segments of dx²+dy²;
    - ``net_d2``: (last−first) squared displacement.

    Ordering is by ``order_cols`` lexicographically (int-like; ties must
    be broken by the last column for determinism — pass the event id).
    """
    cols = [key] + order_cols + [ix_col, iy_col]

    def reduce_fn(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t[key].type),
                             "n_points": pa.array([], pa.int64()),
                             "path_d2": pa.array([], pa.int64()),
                             "net_d2": pa.array([], pa.int64())})
        k = t[key].to_numpy(zero_copy_only=False)
        ords = [
            o.view(np.int64) if o.dtype.kind in "mM" else o
            for o in (t[c].to_numpy(zero_copy_only=False)
                      for c in order_cols)
        ]
        ix = t[ix_col].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t[iy_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort(tuple(reversed(ords)) + (k,))
        k, ix, iy = k[order], ix[order], iy[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        gid = np.cumsum(new) - 1
        ngroups = int(gid[-1]) + 1
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], len(k)] - 1
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        seg_ok = ~new[1:]
        dx = ix[1:] - ix[:-1]
        dy = iy[1:] - iy[:-1]
        seg = dx * dx + dy * dy
        path = np.zeros(ngroups, dtype=np.int64)
        if seg_ok.any():
            np.add.at(path, gid[1:][seg_ok], seg[seg_ok])
        fx, fy = ix[starts], iy[starts]
        lx, ly = ix[ends], iy[ends]
        net = (lx - fx) ** 2 + (ly - fy) ** 2
        return pa.table({key: pa.array(k[starts], type=t[key].type),
                         "n_points": pa.array(n),
                         "path_d2": pa.array(path),
                         "net_d2": pa.array(net)})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], reduce_fn,
                                num_parts)
