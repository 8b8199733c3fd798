"""Spatial cell indexing: S2 cell ids, H3-style hex binning, planar grid.

These are the engine's partitioning / shuffle keys (SURVEY.md §1.2,
north_rule): every image row gets hierarchical cell ids in a batched
encode stage; polygon layers get covering cell sets; the two-phase join
prefilters on cell equality before exact refinement.

- ``s2_cell``: bit-exact implementation of the public S2 cell-id scheme
  (face cube projection + quadratic s/t + Hilbert curve position, 64-bit
  id with trailing-one level encoding), vectorized in numpy from the
  published algorithm (s2geometry docs).  Validated by structural
  invariants (prefix/parent containment, round-trip decode) — the C++
  library is not available in this sandbox for golden comparison.
- ``hex_cell``: H3-STYLE aperture-comparable hexagonal binning in axial
  coordinates with cube rounding.  NOT bit-compatible with Uber H3 (the
  122-entry icosahedron base-cell tables are not reproducible offline);
  provides the same partitioning semantics (hex cells, ring neighbors,
  multi-resolution) used for the h3_7/h3_8/h3_9 columns.
- ``grid_cell``: exact planar grid used for the join prefilter (its
  covering sets are trivially exact supersets) and for the DuckDB oracle
  (expressible as floor division — FIXTURES.md §6).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# planar grid
# ---------------------------------------------------------------------------

GRID_KEY = 1 << 20  # packs (ix, iy) into one int64; world of ±~5e8 cells


def grid_cell(x, y, cell_size: float) -> np.ndarray:
    """int64 cell id = floor(x/c) * 2^20 + floor(y/c) (oracle-SQL-safe)."""
    ix = np.floor(np.asarray(x, dtype=np.float64) / cell_size).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / cell_size).astype(np.int64)
    return ix * GRID_KEY + iy


def grid_cover(xmin, ymin, xmax, ymax, cell_size: float) -> np.ndarray:
    """All grid cell ids intersecting one bbox (exact superset cover)."""
    ix0 = int(np.floor(xmin / cell_size))
    ix1 = int(np.floor(xmax / cell_size))
    iy0 = int(np.floor(ymin / cell_size))
    iy1 = int(np.floor(ymax / cell_size))
    ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    return (ix[:, None] * GRID_KEY + iy[None, :]).reshape(-1)


def grid_cover_many(bounds: np.ndarray, cell_size: float):
    """Covering cells for (n,4) bboxes -> (row_idx, cell_id) arrays.

    Fully vectorized (segment arithmetic over per-row cover counts) —
    the explode runs inside map_batches on every input row at scale, so
    a per-row Python loop here would dominate the range-join map stage.
    """
    b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    valid = ~np.isnan(b[:, 0])
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ix0 = np.floor(b[idx, 0] / cell_size).astype(np.int64)
    iy0 = np.floor(b[idx, 1] / cell_size).astype(np.int64)
    ix1 = np.floor(b[idx, 2] / cell_size).astype(np.int64)
    iy1 = np.floor(b[idx, 3] / cell_size).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    cnt = nx * ny
    total = int(cnt.sum())
    rep = np.repeat(np.arange(len(idx), dtype=np.int64), cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    ny_rep = ny[rep]
    dx = within // ny_rep
    dy = within % ny_rep
    cids = (ix0[rep] + dx) * GRID_KEY + (iy0[rep] + dy)
    return idx[rep], cids


# ---------------------------------------------------------------------------
# S2 (public algorithm: cube face + quadratic s/t + Hilbert position)
# ---------------------------------------------------------------------------

_MAX_LEVEL = 30
_POS_BITS = 2 * _MAX_LEVEL + 1
_SWAP = 1
_INVERT = 2
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)

_LOOKUP_BITS = 4


def _build_lookup():
    # tables mapping (i4 << 6 | j4 << 2 | orientation) -> (pos8 << 2 | orientation)
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orient, orient, pos):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        for sub in range(4):
            ij = _POS_TO_IJ[orient][sub]
            init(
                level + 1,
                (i << 1) + (ij >> 1),
                (j << 1) + (ij & 1),
                orig_orient,
                orient ^ _POS_TO_ORIENT[sub],
                (pos << 2) + sub,
            )

    for o in range(4):
        init(0, 0, 0, o, o, 0)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _xyz_from_lonlat(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(lam), cos_phi * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),
            (lambda: -x / y, lambda: z / y, None),
            (lambda: -x / z, lambda: -y / z, None),
            (lambda: z / x, lambda: y / x, None),
            (lambda: z / y, lambda: -x / y, None),
            (lambda: -y / z, lambda: -x / z, None),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _st_from_uv(u):
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def s2_cell(lon, lat, level: int = 12) -> np.ndarray:
    """Vectorized S2 cell id (uint64 stored as int64) at ``level``."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    maxsize = 1 << _MAX_LEVEL
    i = np.clip((_st_from_uv(u) * maxsize).astype(np.int64), 0, maxsize - 1)
    j = np.clip((_st_from_uv(v) * maxsize).astype(np.int64), 0, maxsize - 1)
    # build the 61-bit Hilbert position 4 bits of i/j at a time
    n = np.zeros(len(np.atleast_1d(face)), dtype=np.uint64)
    face = np.atleast_1d(face)
    i = np.atleast_1d(i).astype(np.uint64)
    j = np.atleast_1d(j).astype(np.uint64)
    bits = (face & _SWAP).astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        i4 = (i >> np.uint64(k * _LOOKUP_BITS)) & mask
        j4 = (j >> np.uint64(k * _LOOKUP_BITS)) & mask
        key = (i4 << np.uint64(_LOOKUP_BITS + 2)) | (j4 << np.uint64(2)) | bits
        val = _LOOKUP_POS.view(np.uint64)[key.astype(np.int64)]
        n = (n << np.uint64(8)) | (val >> np.uint64(2))
        bits = val & np.uint64(3)
    # 64-bit id: face(3) + pos(2*30) + trailing 1
    cid = (face.astype(np.uint64) << np.uint64(_POS_BITS)) | (n << np.uint64(1)) | np.uint64(1)
    # truncate to level: zero low bits, set the level's trailing one
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    cid = (cid & ~(lsb - np.uint64(1)) & ~lsb) | lsb
    return cid.view(np.int64)


def s2_parent(cell_id, level: int) -> np.ndarray:
    """Parent cell at a coarser level (prefix truncation)."""
    cid = np.asarray(cell_id).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((cid & ~(lsb - np.uint64(1)) & ~lsb) | lsb).view(np.int64)


def s2_level(cell_id) -> np.ndarray:
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid  # lowest set bit
    return (_MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2)).astype(np.int64)


def s2_cell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Decode cell id -> (lon, lat) of the cell center (for validation)."""
    cid = np.atleast_1d(np.asarray(cell_id)).view(np.uint64)
    face = (cid >> np.uint64(_POS_BITS)).astype(np.int64)
    # position bits including the trailing 1, which naturally marks the
    # cell center for non-leaf cells (published ToFaceIJOrientation scheme)
    posbits = cid & np.uint64((1 << _POS_BITS) - 1)
    i = np.zeros(len(cid), dtype=np.uint64)
    j = np.zeros(len(cid), dtype=np.uint64)
    bits = (face.astype(np.uint64) & np.uint64(_SWAP))
    for k in range(7, -1, -1):
        nbits = _MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        p8 = (posbits >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & np.uint64(
            (1 << (2 * nbits)) - 1
        )
        key = (p8 << np.uint64(2)) | bits
        val = _LOOKUP_IJ.view(np.uint64)[key.astype(np.int64)]
        ij = val >> np.uint64(2)
        i |= (ij >> np.uint64(_LOOKUP_BITS)) << np.uint64(k * _LOOKUP_BITS)
        j |= (ij & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        bits = val & np.uint64(3)
    maxsize = 1 << _MAX_LEVEL
    s = (i.astype(np.float64) + 0.5) / maxsize
    t = (j.astype(np.float64) + 0.5) / maxsize
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    xyz = np.empty((len(cid), 3))
    table = [
        lambda u, v: (np.ones_like(u), u, v),
        lambda u, v: (-u, np.ones_like(u), v),
        lambda u, v: (-u, -v, np.ones_like(u)),
        lambda u, v: (-np.ones_like(u), -v, -u),
        lambda u, v: (v, -np.ones_like(u), -u),
        lambda u, v: (v, u, -np.ones_like(u)),
    ]
    for f in range(6):
        m = face == f
        if m.any():
            x, y, z = table[f](u[m], v[m])
            xyz[m] = np.column_stack([x, y, z])
    norm = np.sqrt((xyz**2).sum(axis=1))
    xyz /= norm[:, None]
    lat = np.degrees(np.arcsin(np.clip(xyz[:, 2], -1, 1)))
    lon = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
    return lon, lat


# ---------------------------------------------------------------------------
# H3-style hex binning (axial coords, cube rounding)
# ---------------------------------------------------------------------------

# planar hex sizes (circumradius, degrees) roughly mirroring the area
# ratio ladder of H3 res 7/8/9 (aperture-7: each res ~1/7 the area)
HEX_SIZES = {7: 0.02, 8: 0.02 / np.sqrt(7.0), 9: 0.02 / 7.0}
_HEX_KEY = 1 << 24


def hex_cell(x, y, res: int = 8) -> np.ndarray:
    """Hex cell id at resolution ``res`` (pointy-top axial coords)."""
    size = HEX_SIZES[res]
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    # cube rounding
    s = -q - r
    rq, rr, rs = np.round(q), np.round(r), np.round(s)
    dq, dr, ds = np.abs(rq - q), np.abs(rr - r), np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    qi = rq.astype(np.int64)
    ri = rr.astype(np.int64)
    return (np.int64(res) << np.int64(52)) | ((qi + _HEX_KEY) << np.int64(26)) | (ri + _HEX_KEY)


def hex_cell_decode(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cid = np.asarray(cell_id, dtype=np.int64)
    res = (cid >> np.int64(52)).astype(np.int64)
    q = ((cid >> np.int64(26)) & np.int64(_HEX_KEY * 2 - 1)) - _HEX_KEY
    r = (cid & np.int64(_HEX_KEY * 2 - 1)) - _HEX_KEY
    return res, q, r


def hex_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_cell_decode(cell_id)
    size = np.choose(
        np.clip(res - 7, 0, 2), [HEX_SIZES[7], HEX_SIZES[8], HEX_SIZES[9]]
    )
    x = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


def hex_neighbors(cell_id) -> np.ndarray:
    """The 6 ring-1 neighbors of each cell -> (n, 6) ids."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    res, q, r = hex_cell_decode(cid)
    dirs = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)
    qn = q[:, None] + dirs[None, :, 0]
    rn = r[:, None] + dirs[None, :, 1]
    return (res[:, None] << np.int64(52)) | ((qn + _HEX_KEY) << np.int64(26)) | (rn + _HEX_KEY)


def hex_cover(xmin, ymin, xmax, ymax, res: int = 8) -> np.ndarray:
    """Hex cells intersecting a bbox (superset cover via padded lattice)."""
    size = HEX_SIZES[res]
    pad = size  # circumradius pad guarantees the superset
    xs = np.arange(xmin - pad, xmax + pad + size, size * 0.75)
    ys = np.arange(ymin - pad, ymax + pad + size, size * 0.75)
    gx, gy = np.meshgrid(xs, ys)
    return np.unique(hex_cell(gx.reshape(-1), gy.reshape(-1), res))
