"""Exact distributed order statistics (k-th smallest / median /
interpolated quantiles) by iterative HISTOGRAM REFINEMENT over raw Ray
task waves.

Why task waves, not Dataset rounds: each refinement round re-scans the
same (narrow, materialized) column — a fresh Dataset execution per
round costs ~0.7 s of fixed streaming-executor overhead (same finding
as the CC BSP and ``kmeans_full``); a task wave over the materialized
block refs costs milliseconds.

Algorithm: float64 keys map monotonically to uint64 (sign-flip
transform).  Round 1 histograms the top 16 bits of the WHOLE population
once — the total count n falls out for free, so quantile ranks need no
separate counting pass, and EVERY requested rank descends from that one
shared histogram.  Later rounds refine the next 16 bits of each
still-unresolved rank's range in ONE shared task wave (per-block
(ranges × 65536) count matrix, 64-way task fold), and a single final
wave collects the ≤ ``budget`` candidate values of every resolved range
for exact driver-side selection.  ≤ 4 rounds total (64 bits / 16) for
ANY number of ranks.

Scale contract: driver traffic per round is ≤ ⌈B/64⌉ folded histogram
matrices; the final collect is 64-way tree-concatenated and ≤ budget
values per rank by construction.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_BITS = 16
_NBUCKETS = 1 << _BITS
_U64MAX = (1 << 64) - 1


def _f64_to_u64(v: np.ndarray) -> np.ndarray:
    """Monotone map IEEE float64 → uint64 (total order; callers drop
    NaNs/nulls before calling)."""
    b = v.astype(np.float64).view(np.int64)
    flipped = np.where(b < 0, ~b, b | np.int64(np.uint64(1) << np.uint64(63)))
    return flipped.view(np.uint64)


def _block_refs(ds, col: str):
    mat = ds.select_columns([col]).materialize()
    return mat.to_arrow_refs()


def _multi_kth(blocks, col: str, ranks_from_n, budget: int = 200_000):
    """Core: resolve every rank returned by ``ranks_from_n(n)`` (1-based
    k-th smallest) in shared waves.  Returns (dict k → value, n)."""
    import ray

    @ray.remote
    def hist_multi(block: pa.Table, ranges, shift: int) -> np.ndarray:
        v = block[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        u = _f64_to_u64(v)
        out = np.zeros((len(ranges), _NBUCKETS), dtype=np.int64)
        for i, (lo, hi) in enumerate(ranges):
            m = (u >= np.uint64(lo)) & (u <= np.uint64(hi))
            idx = (u[m] - np.uint64(lo)) >> np.uint64(shift)
            out[i] = np.bincount(idx.astype(np.int64), minlength=_NBUCKETS)
        return out

    @ray.remote
    def fold(*parts):
        return sum(parts)

    @ray.remote
    def collect_multi(block: pa.Table, ranges):
        v = block[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        u = _f64_to_u64(v)
        return [v[(u >= np.uint64(lo)) & (u <= np.uint64(hi))]
                for lo, hi in ranges]

    @ray.remote
    def cat_multi(*parts):
        return [np.concatenate(p) for p in zip(*parts)]

    def wave(fn, arg, extra=()):
        parts = [fn.remote(b, arg, *extra) for b in blocks]
        foldfn = fold if fn is hist_multi else cat_multi
        while len(parts) > 64:
            parts = [foldfn.remote(*parts[i:i + 64])
                     for i in range(0, len(parts), 64)]
        got = ray.get(parts)
        if fn is hist_multi:
            return sum(got)
        return [np.concatenate(p) for p in zip(*got)]

    # round 1: ONE full-range histogram shared by every rank
    counts0 = wave(hist_multi, [(0, _U64MAX)], (48,))[0]
    cum0 = np.cumsum(counts0)
    total = int(cum0[-1])
    ks = sorted(set(int(k) for k in ranks_from_n(total)))
    for k in ks:
        if k < 1 or k > total:
            raise ValueError(f"rank {k} outside population of {total}")

    def descend(counts, lo_base: int, rank: int, shift: int):
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank))
        new_rank = rank - (int(cum[b - 1]) if b > 0 else 0)
        width = np.uint64(1) << np.uint64(shift)
        lo = int(np.uint64(lo_base) + np.uint64(b) * width)
        hi = int(np.uint64(lo) + width - np.uint64(1))
        return lo, hi, new_rank, int(counts[b])

    pend_hist = []   # (k, lo, hi, rank) — needs another refinement round
    pend_col = []    # (k, lo, hi, rank) — candidate set ≤ budget
    for k in ks:
        lo, hi, rank, cnt = descend(counts0, 0, k, 48)
        (pend_col if cnt <= budget else pend_hist).append((k, lo, hi, rank))
    for shift in (32, 16, 0):
        if not pend_hist:
            break
        ranges = [(lo, hi) for _, lo, hi, _ in pend_hist]
        mats = wave(hist_multi, ranges, (shift,))
        nxt = []
        for (k, lo0, _, rank), counts in zip(pend_hist, mats):
            lo, hi, rank, cnt = descend(counts, lo0, rank, shift)
            if cnt <= budget or shift == 0:
                pend_col.append((k, lo, hi, rank))
            else:
                nxt.append((k, lo, hi, rank))
        pend_hist = nxt
    ranges = [(lo, hi) for _, lo, hi, _ in pend_col]
    valsets = wave(collect_multi, ranges)
    out = {}
    for (k, _, _, rank), vals in zip(pend_col, valsets):
        vals.sort()
        out[k] = float(vals[rank - 1])
    return out, total


def kth_smallest(ds, col: str, k: int | None = None, q: float = 0.5,
                 budget: int = 200_000) -> float:
    """EXACT k-th smallest (1-based, over the non-null non-NaN multiset)
    of a float64 column.  With ``k=None`` the rank is ``ceil(q·n)`` —
    exactly SQL ``quantile_disc(col, q)``."""
    def ranks(n):
        if k is not None:
            return [k]
        return [max(1, int(-(-n * q // 1)))]  # ceil(q·n)

    vals, _ = _multi_kth(_block_refs(ds, col), col, ranks, budget)
    return next(iter(vals.values()))


def median(ds, col: str) -> pa.Table:
    """One-row table (med DOUBLE): the LOWER median — exactly SQL
    ``quantile_disc(col, 0.5)`` (rank = ceil(n/2))."""
    return pa.table({"med": pa.array([kth_smallest(ds, col, q=0.5)],
                                     type=pa.float64())})


def quantiles_disc(ds, col: str, qs: list[float],
                   budget: int = 200_000) -> list[float]:
    """EXACT discrete quantiles for several ``q`` at once — each is SQL
    ``quantile_disc(col, q)`` (rank = ceil(q·n)); every rank resolves in
    the SAME shared refinement waves (one histogram pass + ≤3 refine
    rounds total, however many quantiles are asked for)."""
    state: dict[float, int] = {}

    def ranks(n):
        want = set()
        for q in qs:
            k = max(1, int(-(-n * q // 1)))  # ceil(q·n)
            state[q] = k
            want.add(k)
        return sorted(want)

    vals, _ = _multi_kth(_block_refs(ds, col), col, ranks, budget)
    return [vals[state[q]] for q in qs]


def quantiles_cont(ds, col: str, qs: list[float],
                   budget: int = 200_000) -> list[float]:
    """EXACT interpolated quantiles — bit-identical to SQL
    ``quantile_cont``: h = (n−1)·q, lower·(1−frac) + upper·frac (the
    exact double expression DuckDB evaluates).  All lower/upper ranks
    of every q resolve in the SAME shared refinement waves."""
    state = {}

    def ranks(n):
        want = set()
        for q in qs:
            h = (n - 1) * q
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            state[q] = (h, lo, hi)
            want.add(lo + 1)
            want.add(hi + 1)
        return sorted(want)

    vals, _ = _multi_kth(_block_refs(ds, col), col, ranks, budget)
    out = []
    for q in qs:
        h, lo, hi = state[q]
        frac = h - lo
        out.append(vals[lo + 1] * (1 - frac) + vals[hi + 1] * frac)
    return out
