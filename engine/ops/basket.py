"""Market-basket co-occurrence: all unordered item pairs within a group.

Training-data / analytics operator beyond the reference's geometry scope
(pinned by the DuckDB self-join oracle in ``__ray_entry__.oracle_sql``).

100-TB posture: ONE hash exchange on the group key co-locates each
group's items; the quadratic pair explode is bounded by the per-group
item count (basket sizes, not corpus size) and is pure offset
arithmetic — ``np.repeat`` + cumsum ranges, no Python loop over rows or
groups.  Downstream counting is combiner-first, so the all-to-all after
the explode moves (distinct pairs × partitions) rows, not every pair.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _intra_run_pairs(starts: np.ndarray, ends: np.ndarray,
                     total: int) -> tuple[np.ndarray, np.ndarray]:
    """(first, second) flat-index arrays of every ordered pair
    (i < j) inside each [start, end) run — vectorized."""
    k = ends - starts
    cnt = np.repeat(ends, k) - np.arange(total, dtype=np.int64) - 1
    csum = np.concatenate([[0], np.cumsum(cnt)])
    first = np.repeat(np.arange(total, dtype=np.int64), cnt)
    second = (np.arange(csum[-1], dtype=np.int64)
              - np.repeat(csum[:-1], cnt) + first + 1)
    return first, second


def cooccur_pairs(ds, group_col: str, item_col: str,
                  out_cols=("item1", "item2"), num_parts: int = 64):
    """Explode each group's DISTINCT items into unordered pairs
    (item1 < item2) — one row per (group, pair).  Items must be
    integral (partkeys, ids)."""

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({out_cols[0]: pa.array([], type=pa.int64()),
                             out_cols[1]: pa.array([], type=pa.int64())})
        k = g[group_col].to_numpy(zero_copy_only=False)
        it = g[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((it, k))
        k, it = k[order], it[order]
        # distinct (group, item): drop consecutive duplicates
        keep = np.r_[True, (k[1:] != k[:-1]) | (it[1:] != it[:-1])]
        k, it = k[keep], it[keep]
        total = len(k)
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], total)
        first, second = _intra_run_pairs(starts, ends, total)
        return pa.table({out_cols[0]: pa.array(it[first]),
                         out_cols[1]: pa.array(it[second])})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns([group_col, item_col]),
                                [group_col], part_fn, num_parts)
