"""Exact distributed order statistic (k-th smallest / median) by
iterative HISTOGRAM REFINEMENT over raw Ray task waves.

Why task waves, not Dataset rounds: each refinement round re-scans the
same (narrow, materialized) column — a fresh Dataset execution per
round costs ~0.7 s of fixed streaming-executor overhead (same finding
as the CC BSP and ``kmeans_full``); a task wave over the materialized
block refs costs milliseconds.

Algorithm: float64 keys map monotonically to uint64 (sign-flip
transform), each round histograms the next 16 bits of every in-range
key (per-block 65536-count vector, 64-way task fold → driver sees
≤ ⌈B/64⌉ vectors), the driver descends into the bucket containing rank
k, and once the candidate count is ≤ ``budget`` one final wave collects
the in-range values for an exact driver-side selection.  At most 4
rounds (64 bits / 16); each wave reads only the materialized column
blocks — zero shuffles, zero full-value collects.  The population size
n falls out of round 1's histogram for free, so quantile ranks need no
separate counting pass.

Scale contract: driver traffic per round is ≤ ⌈B/64⌉ folded 512 KiB
histograms; the final candidate collect is 64-way tree-concatenated and
≤ ``budget`` values by construction.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_BITS = 16
_NBUCKETS = 1 << _BITS


def _f64_to_u64(v: np.ndarray) -> np.ndarray:
    """Monotone map IEEE float64 → uint64 (total order; callers drop
    NaNs/nulls before calling)."""
    b = v.astype(np.float64).view(np.int64)
    flipped = np.where(b < 0, ~b, b | np.int64(np.uint64(1) << np.uint64(63)))
    return flipped.view(np.uint64)


def kth_smallest(ds, col: str, k: int | None = None, q: float = 0.5,
                 budget: int = 200_000) -> float:
    """EXACT k-th smallest (1-based, over the non-null non-NaN multiset)
    of a float64 column.  With ``k=None`` the rank is ``ceil(q·n)`` with
    n taken from round 1's histogram — exactly SQL
    ``quantile_disc(col, q)``."""
    import ray

    mat = ds.select_columns([col]).materialize()
    blocks = mat.to_arrow_refs()

    @ray.remote
    def hist(block: pa.Table, lo: int, hi: int, shift: int) -> np.ndarray:
        v = block[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        u = _f64_to_u64(v)
        m = (u >= np.uint64(lo)) & (u <= np.uint64(hi))
        idx = (u[m] - np.uint64(lo)) >> np.uint64(shift)
        return np.bincount(idx.astype(np.int64), minlength=_NBUCKETS).astype(
            np.int64)

    @ray.remote
    def fold(*parts):
        return sum(parts)

    @ray.remote
    def collect(block: pa.Table, lo: int, hi: int) -> np.ndarray:
        v = block[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        u = _f64_to_u64(v)
        return v[(u >= np.uint64(lo)) & (u <= np.uint64(hi))]

    @ray.remote
    def cat(*parts):
        return np.concatenate(parts)

    rank = None if k is None else int(k)
    lo, hi = 0, (1 << 64) - 1
    for shift in (48, 32, 16, 0):
        parts = [hist.remote(b, lo, hi, shift) for b in blocks]
        while len(parts) > 64:
            parts = [fold.remote(*parts[i:i + 64])
                     for i in range(0, len(parts), 64)]
        counts = sum(ray.get(parts))
        cum = np.cumsum(counts)
        total = int(cum[-1])
        if rank is None:  # round 1 counted the whole population
            rank = max(1, int(-(-total * q // 1)))  # ceil(q·n)
        if rank < 1 or rank > total:
            raise ValueError(f"rank {rank} outside population of {total}")
        b = int(np.searchsorted(cum, rank))
        rank -= int(cum[b - 1]) if b > 0 else 0
        width = np.uint64(1) << np.uint64(shift)
        lo = int(np.uint64(lo) + np.uint64(b) * width)
        hi = int(np.uint64(lo) + width - np.uint64(1))
        if int(counts[b]) <= budget or shift == 0:
            break
    parts = [collect.remote(b, lo, hi) for b in blocks]
    while len(parts) > 64:
        parts = [cat.remote(*parts[i:i + 64])
                 for i in range(0, len(parts), 64)]
    vals = np.concatenate(ray.get(parts)) if parts else np.empty(0)
    vals.sort()
    return float(vals[rank - 1])


def median(ds, col: str) -> pa.Table:
    """One-row table (med DOUBLE): the LOWER median — exactly SQL
    ``quantile_disc(col, 0.5)`` (rank = ceil(n/2))."""
    return pa.table({"med": pa.array([kth_smallest(ds, col, q=0.5)],
                                     type=pa.float64())})
