"""Z-order (Morton) spatial locality keys — clustered layout for scans.

At 100 TB the dominant cost of a spatial workload is how much of the
table a bbox query must scan; writing the table CLUSTERED BY an
interleaved-bit key gives every downstream reader row-group locality in
BOTH dimensions (the standard lakehouse Z-ORDER optimization).  The
kernel here is the vectorized 2-D Morton encode; ``zorder_sorted``
composes it with Ray Data's native distributed sort (a range-partitioned
all-to-all — the one place the engine WANTS Ray's sort, since a sorted
write is inherently a global exchange).

The bit-spreading chain is the classic published magic-number sequence
(Morton 1966 dilation; see e.g. "Bit Twiddling Hacks"), expressible
1:1 in SQL integer arithmetic — the DuckDB oracle mirrors it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def _spread32(v: np.ndarray) -> np.ndarray:
    """Dilate the low 32 bits of each uint64: bit i → bit 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def morton2(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Interleave two non-negative integer grids (< 2^31 each) into the
    2-D Morton key: x takes the even bits, y the odd bits."""
    return (
        (_spread32(np.asarray(qx)) | (_spread32(np.asarray(qy)) << np.uint64(1)))
        .view(np.int64)
    )


def add_morton(x_col: str = "x", y_col: str = "y", scale: float = 1000.0,
               out_col: str = "morton"):
    """Stage: + Morton key from float coordinate columns, quantized at
    ``scale`` (grid step = 1/scale coordinate units)."""

    def fn(batch: pa.Table) -> pa.Table:
        qx = np.rint(batch[x_col].to_numpy() * scale).astype(np.int64)
        qy = np.rint(batch[y_col].to_numpy() * scale).astype(np.int64)
        return batch.append_column(out_col, pa.array(morton2(qx, qy)))

    return fn


def zorder_sorted(ds, x_col: str = "x", y_col: str = "y",
                  scale: float = 1000.0, tiebreak: str | None = None):
    """Dataset globally sorted by the Morton key of (x, y) — the
    clustered-write ordering.  ``tiebreak`` adds a deterministic second
    sort key (needed when quantized coordinates can collide)."""
    keyed = ds.map_batches(
        add_morton(x_col, y_col, scale), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    keys = ["morton"] if tiebreak is None else ["morton", tiebreak]
    return keyed.sort(keys)


def bbox_to_zranges(qx0: int, qx1: int, qy0: int, qy1: int,
                    bits: int, max_ranges: int = 512) -> list[tuple[int, int]]:
    """Decompose an inclusive integer bbox into disjoint, sorted,
    z-CONTIGUOUS Morton-key ranges by quadtree descent (the LITMAX /
    BIGMIN index-scan decomposition, expressed as prefix recursion):
    a quadtree node is exactly one contiguous z interval; nodes fully
    inside the query emit whole ranges, partial nodes split into their
    4 children.  ``max_ranges`` bounds the result — when the budget is
    hit, partial nodes emit their (conservative, superset) full range,
    so the scan stays CORRECT and only prunes less.  Driver-side pure
    integers; O(perimeter · bits) ranges in the exact case."""
    out: list[tuple[int, int]] = []
    budget = [max_ranges]

    def node(px: int, py: int, level: int):
        size = 1 << level
        x0, y0 = px, py
        x1, y1 = px + size - 1, py + size - 1
        if x1 < qx0 or x0 > qx1 or y1 < qy0 or y0 > qy1:
            return
        lo = int(morton2(np.array([x0]), np.array([y0]))[0])
        if (x0 >= qx0 and x1 <= qx1 and y0 >= qy0 and y1 <= qy1) \
                or level == 0 or budget[0] <= 0:
            out.append((lo, lo + (1 << (2 * level)) - 1))
            budget[0] -= 1
            return
        half = size >> 1
        # z order of children: (0,0) (1,0) (0,1) (1,1) — x is even bits
        node(px, py, level - 1)
        node(px + half, py, level - 1)
        node(px, py + half, level - 1)
        node(px + half, py + half, level - 1)

    node(0, 0, bits)
    out.sort()
    # merge adjacent ranges (children of a fully-covered node arrive
    # contiguous)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def zrange_member(z: np.ndarray, ranges: list[tuple[int, int]]) -> np.ndarray:
    """Vectorized membership of Morton keys in sorted disjoint ranges:
    one searchsorted over the starts + an end compare."""
    if not ranges:
        return np.zeros(len(z), dtype=bool)
    starts = np.array([r[0] for r in ranges], dtype=np.int64)
    ends = np.array([r[1] for r in ranges], dtype=np.int64)
    ix = np.searchsorted(starts, z, side="right") - 1
    ok = ix >= 0
    ixc = np.maximum(ix, 0)
    return ok & (z <= ends[ixc])
