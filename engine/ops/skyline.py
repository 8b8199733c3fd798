"""Distributed 2-D SKYLINE (Pareto frontier): rows not dominated by any
other row — maximize ``max_col``, minimize ``min_col``; a dominator is
≥/≤ on both with at least one strict.  Duplicated (max, min) pairs do
not dominate each other, so ALL copies of a frontier point survive
(matching the SQL NOT-EXISTS semantics).

Scale shape: skyline(∪ blocks) = skyline(∪ per-block skylines) — the
per-block combiner shrinks each block to its own frontier (expected
O(log n) rows for random data) BEFORE any data movement, then a 16-way
tree fold and one final frontier pass produce the result; no all-to-all
anywhere.  Worst case (input already a frontier) degenerates to the
input size — the final single-block pass is then the bound, which is
inherent to an exact skyline.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _frontier_mask(mx: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (maximize mx, minimize mn).

    Sorted by (mx desc, mn asc): a row is dominated iff
      min(mn over STRICTLY greater mx) ≤ mn   (≥ on mx is strict)
      or min(mn over EQUAL mx) < mn           (strictness from mn).
    Both prefix-mins are vectorized over the sorted order.
    """
    n = len(mx)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((mn, -mx))
    smx, smn = mx[order], mn[order]
    # prefix min of mn over all PRIOR price-groups (strictly greater mx)
    grp_start = np.r_[True, smx[1:] != smx[:-1]]
    gid = np.cumsum(grp_start) - 1
    # min mn within each group = first element (sorted mn asc inside)
    grp_min = smn[np.nonzero(grp_start)[0]]
    prior = np.minimum.accumulate(grp_min)
    m1 = np.r_[np.iinfo(np.int64).max if mn.dtype.kind in "iu" else np.inf,
               prior[:-1]][gid]  # strictly-greater-mx min date
    m2 = grp_min[gid]            # own-group min (≤ own mn always)
    keep_sorted = ~((m1 <= smn) | (m2 < smn))
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(ds, max_col: str, min_col: str, out_cols: list[str],
            num_parts_fold: int = 16):
    """→ Dataset of the non-dominated rows, columns ``out_cols``."""
    if max_col not in out_cols or min_col not in out_cols:
        raise ValueError("out_cols must include max_col and min_col "
                         "(the fold stages re-derive the frontier)")

    def block_frontier(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(out_cols)
        mx = batch[max_col].to_numpy(zero_copy_only=False)
        mn = batch[min_col].to_numpy(zero_copy_only=False)
        if mn.dtype.kind in "mM":
            mn = mn.view(np.int64)
        if mx.dtype.kind in "mM":
            mx = mx.view(np.int64)
        keep = _frontier_mask(mx, mn)
        return batch.select(out_cols).take(pa.array(np.nonzero(keep)[0]))

    part = ds.map_batches(block_frontier, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    # per-block frontiers are tiny (expected O(log n) rows) → raw-task
    # tree fold; Repartition's fixed barrier costs seconds at any size
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    def combine(tbls: list[pa.Table]) -> pa.Table:
        return block_frontier(pa.concat_tables(tbls).combine_chunks())

    return ray.data.from_arrow(tree_fold_refs(part, combine,
                                              width=num_parts_fold))
