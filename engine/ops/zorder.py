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
