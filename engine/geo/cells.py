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
- ``hex_cell``: planar axial hexagonal binning with cube rounding — the
  cheap in-plane ladder.  The TRUE spherical hex index is
  ``engine.geo.hexsphere`` (icosahedral aperture-7, H3-class geometry:
  gnomonic faces, Eisenstein digit hierarchy, H3-style bit layout) —
  still NOT bit-compatible with Uber H3: the library's 122-entry
  base-cell orientation tables are lookup data, not derivable from the
  published algorithm, and cannot be regenerated or validated offline.
  See hexsphere.py's honesty note; joins treat hex ids purely as
  partitioning keys (superset covers + exact refinement), so either
  ladder gives exact join output.
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


def s2_decode_fij(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode cell id -> (face, i, j) leaf coordinates of the CELL CENTER.

    The trailing-one bit of the id naturally marks the center for
    non-leaf cells (published ToFaceIJOrientation scheme).
    """
    cid = np.atleast_1d(np.asarray(cell_id)).view(np.uint64)
    face = (cid >> np.uint64(_POS_BITS)).astype(np.int64)
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
    return face, i.astype(np.int64), j.astype(np.int64)


_FACE_XYZ = [
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
]


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(face, u, v) -> unnormalized xyz (n,3); published face axis table."""
    xyz = np.empty((len(face), 3))
    for f in range(6):
        m = face == f
        if m.any():
            x, y, z = _FACE_XYZ[f](u[m], v[m])
            xyz[m] = np.column_stack([x, y, z])
    return xyz


def s2_cell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Decode cell id -> (lon, lat) of the cell center (for validation)."""
    face, i, j = s2_decode_fij(cell_id)
    maxsize = 1 << _MAX_LEVEL
    s = (i.astype(np.float64) + 0.5) / maxsize
    t = (j.astype(np.float64) + 0.5) / maxsize
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    xyz = _face_uv_to_xyz(face, u, v)
    norm = np.sqrt((xyz**2).sum(axis=1))
    xyz /= norm[:, None]
    lat = np.degrees(np.arcsin(np.clip(xyz[:, 2], -1, 1)))
    lon = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
    return lon, lat


def s2_children(cell_id) -> np.ndarray:
    """The 4 children of each (non-leaf) cell -> (n, 4) int64 ids.

    Standard id arithmetic: children ids are ``id - lsb + lsb>>2 +
    k*(lsb>>1)`` for k in 0..3 (each child's trailing one is lsb>>2).
    """
    cid = np.atleast_1d(np.asarray(cell_id)).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    base = cid - lsb + (lsb >> np.uint64(2))
    step = lsb >> np.uint64(1)
    ks = np.arange(4, dtype=np.uint64)
    return (base[:, None] + ks[None, :] * step[:, None]).view(np.int64)


# level-0 face lat/lng bounds (degrees), published S2Cell::GetRectBound
# constants: equatorial faces span lat ±45°, quarter-lng windows; polar
# faces (2=+z north, 5=-z south) span full longitude down to
# asin(sqrt(1/3)) ≈ 35.264°.
_POLE_MIN_LAT = np.degrees(np.arcsin(np.sqrt(1.0 / 3.0))) - 1e-9
_FACE_RECTS = np.array(
    [
        # lat_lo, lat_hi, lon_lo, lon_hi, wraps(1)/full(2)
        [-45.0, 45.0, -45.0, 45.0, 0.0],
        [-45.0, 45.0, 45.0, 135.0, 0.0],
        [_POLE_MIN_LAT, 90.0, -180.0, 180.0, 2.0],
        [-45.0, 45.0, 135.0, -135.0, 1.0],
        [-45.0, 45.0, -135.0, -45.0, 0.0],
        [-90.0, -_POLE_MIN_LAT, -180.0, 180.0, 2.0],
    ]
)

_RECT_EPS = 1e-7  # conservative expansion (degrees) — superset is safe


def s2_rect_bound(cell_id):
    """Conservative lat/lng bound per cell (vectorized GetRectBound).

    Returns ``(lat_lo, lat_hi, lon_lo, lon_hi, kind)`` arrays in degrees;
    ``kind`` 0 = plain interval, 1 = wraps the antimeridian (the interval
    is lon_lo..180 ∪ -180..lon_hi), 2 = full longitude range.

    Published facts used (s2geometry S2Cell::GetRectBound): for cells at
    level ≥ 1 the latitude/longitude extremes are attained at the cell's
    uv-rect vertices; level-0 faces use fixed constants; cells containing
    a pole get full longitude (polar closure).  Bounds are expanded by a
    small epsilon so the rect is a guaranteed superset of the cell — the
    coverer only ever uses it to PRUNE (empty rect∩query ⟹ empty
    cell∩query), so over-coverage is safe, under-coverage impossible.
    """
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    level = s2_level(cid)
    face, ic, jc = s2_decode_fij(cid)
    n = len(cid)
    lat_lo = np.empty(n)
    lat_hi = np.empty(n)
    lon_lo = np.empty(n)
    lon_hi = np.empty(n)
    kind = np.zeros(n, dtype=np.int64)

    l0 = level == 0
    if l0.any():
        r = _FACE_RECTS[face[l0]]
        lat_lo[l0], lat_hi[l0] = r[:, 0], r[:, 1]
        lon_lo[l0], lon_hi[l0] = r[:, 2], r[:, 3]
        kind[l0] = r[:, 4].astype(np.int64)

    m = ~l0
    if m.any():
        lv = level[m]
        size = np.int64(1) << (np.int64(_MAX_LEVEL) - lv)
        i0 = ic[m] & ~(size - 1)
        j0 = jc[m] & ~(size - 1)
        maxsize = float(1 << _MAX_LEVEL)
        u0 = _uv_from_st(i0 / maxsize)
        u1 = _uv_from_st((i0 + size) / maxsize)
        v0 = _uv_from_st(j0 / maxsize)
        v1 = _uv_from_st((j0 + size) / maxsize)
        fa = face[m]
        # 4 corners -> lat/lon extremes (exact at vertices for level>=1)
        lats = np.empty((m.sum(), 4))
        lons = np.empty((m.sum(), 4))
        for k, (uu, vv) in enumerate([(u0, v0), (u0, v1), (u1, v0), (u1, v1)]):
            xyz = _face_uv_to_xyz(fa, uu, vv)
            nrm = np.sqrt((xyz**2).sum(axis=1))
            lats[:, k] = np.degrees(np.arcsin(np.clip(xyz[:, 2] / nrm, -1, 1)))
            lons[:, k] = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
        lat_lo[m] = lats.min(axis=1) - _RECT_EPS
        lat_hi[m] = lats.max(axis=1) + _RECT_EPS
        lo = lons.min(axis=1)
        hi = lons.max(axis=1)
        # antimeridian crossing: corner spread > 180° means the true
        # interval is the complement arc (cells at level>=1 span < 90°)
        wraps = (hi - lo) > 180.0
        llo = np.where(wraps, hi, lo) - _RECT_EPS
        lhi = np.where(wraps, lo, hi) + _RECT_EPS
        # wrapping case: interval = [max_corner_lon, 180] ∪ [-180, min>..]
        if wraps.any():
            # recompute precisely: the wrap interval endpoints are the
            # smallest corner > 0 side; using sorted corners: take the
            # positive lons' min as start and negative lons' max as end
            wl = np.where(wraps)[0]
            for t in wl:
                pos = lons[t][lons[t] >= 0]
                neg = lons[t][lons[t] < 0]
                llo[t] = (pos.min() if len(pos) else 180.0) - _RECT_EPS
                lhi[t] = (neg.max() if len(neg) else -180.0) + _RECT_EPS
        lon_lo[m] = llo
        lon_hi[m] = lhi
        kind[m] = wraps.astype(np.int64)
        # polar closure: a cell whose uv-rect contains the face center of
        # a polar face contains that pole -> full longitude
        pole_n = m.copy()
        pole_n[m] = (fa == 2) & (u0 <= 0) & (u1 >= 0) & (v0 <= 0) & (v1 >= 0)
        pole_s = m.copy()
        pole_s[m] = (fa == 5) & (u0 <= 0) & (u1 >= 0) & (v0 <= 0) & (v1 >= 0)
        if pole_n.any():
            lat_hi[pole_n] = 90.0
            kind[pole_n] = 2
        if pole_s.any():
            lat_lo[pole_s] = -90.0
            kind[pole_s] = 2
    return lat_lo, lat_hi, lon_lo, lon_hi, kind


def _rect_relation(bound, qlat_lo, qlat_hi, qlon_lo, qlon_hi):
    """(intersects, contained) bool arrays for cell bounds vs query rect.

    ``contained`` uses the conservative bound, so True ⟹ the cell is
    truly inside the query; ``intersects`` False ⟹ truly disjoint.
    The query rect must be non-wrapping (lon_lo <= lon_hi) — all rects in
    this engine come from the planar world mapping.
    """
    lat_lo, lat_hi, lon_lo, lon_hi, kind = bound
    lat_ok = (lat_lo <= qlat_hi) & (lat_hi >= qlat_lo)
    plain = kind == 0
    wrapped = kind == 1
    full = kind == 2
    lon_int = np.where(
        full,
        True,
        np.where(
            wrapped,
            (qlon_hi >= lon_lo) | (qlon_lo <= lon_hi),
            (lon_lo <= qlon_hi) & (lon_hi >= qlon_lo),
        ),
    )
    inter = lat_ok & lon_int
    cont = (
        plain
        & (lat_lo >= qlat_lo)
        & (lat_hi <= qlat_hi)
        & (lon_lo >= qlon_lo)
        & (lon_hi <= qlon_hi)
    )
    return inter, cont


def s2_cover_rect(
    lon_lo: float,
    lat_lo: float,
    lon_hi: float,
    lat_hi: float,
    max_cells: int = 16,
    max_level: int = 12,
    max_level_span: int = 3,
) -> np.ndarray:
    """Hierarchical S2 cell-union cover of a lat/lng rect (TRUE coverer).

    Children-walk BFS from the 6 face cells: expand the coarsest
    frontier cell (deterministic (level, id) order) into its
    query-intersecting children until expansion would exceed
    ``max_cells``, a cell is fully inside the query, or ``max_level`` is
    reached.  The budget is a pure stopping point on a
    budget-independent expansion sequence, so the covered region shrinks
    MONOTONICALLY as ``max_cells`` grows (tested property).

    Post-passes: coarsen so at most ``max_level_span`` distinct levels
    remain (bounds the point-side ancestor-key replication in the
    cell-partitioned join), then drop any cell that has an ancestor in
    the set — the result is a disjoint cell union, so a point can match
    at most ONE cover cell (no pair-dedupe exchange needed downstream).

    Guarantees: output cells are genuine S2 ids at mixed levels, their
    union covers the full query rect (conservative rect-bound pruning
    can only over-cover, never under-cover).
    """
    faces = np.arange(6, dtype=np.uint64)
    face_ids = (
        (faces << np.uint64(_POS_BITS)) | np.uint64(1 << (_POS_BITS - 1))
    ).view(np.int64)
    inter, cont = _rect_relation(
        s2_rect_bound(face_ids), lat_lo, lat_hi, lon_lo, lon_hi
    )
    terminal: list[int] = [int(c) for c in face_ids[inter & cont]]
    frontier: list[tuple[int, int]] = sorted(
        (0, int(c)) for c in face_ids[inter & ~cont]
    )
    while frontier:
        lv, cell = frontier.pop(0)
        if lv >= max_level:
            terminal.append(cell)
            continue
        kids = s2_children(np.array([cell]))[0]
        ki, kc = _rect_relation(
            s2_rect_bound(kids), lat_lo, lat_hi, lon_lo, lon_hi
        )
        keep = kids[ki]
        kcont = kc[ki]
        if len(terminal) + len(frontier) + len(keep) > max_cells:
            # budget exhausted: keep this cell and everything queued coarse
            terminal.append(cell)
            terminal.extend(c for _, c in frontier)
            break
        for cc, is_cont in zip(keep, kcont):
            if is_cont or lv + 1 >= max_level:
                terminal.append(int(cc))
            else:
                frontier.append((lv + 1, int(cc)))
        frontier.sort()
    ids = np.asarray(sorted(set(terminal)), dtype=np.int64)
    if len(ids) == 0:
        return ids
    # bound the number of distinct levels (coarsen the finest cells)
    levels = s2_level(ids)
    used = np.unique(levels)
    if len(used) > max_level_span:
        cap = int(used[max_level_span - 1])
        fine = levels > cap
        ids = np.concatenate([ids[~fine], np.asarray(s2_parent(ids[fine], cap))])
        ids = np.unique(ids)
        levels = s2_level(ids)
    # normalize: drop cells that have an ancestor in the set (keeps the
    # union identical while restoring disjointness)
    idset = set(int(c) for c in ids)
    keep_mask = np.ones(len(ids), dtype=bool)
    for t in range(len(ids)):
        lv = int(levels[t])
        for anc_lv in np.unique(levels[levels < lv]):
            if int(s2_parent(np.array([ids[t]]), int(anc_lv))[0]) in idset:
                keep_mask[t] = False
                break
    return ids[keep_mask]


# Published S2 quadratic-projection cell metrics (s2geometry
# S2::kMinWidth / kMaxDiag derivatives, radians at level 0; level-L
# value = deriv / 2^L): the sampling cover below relies only on
#   min cell inradius ≥ MIN_WIDTH/2 / 2^L   (grid step bound)
#   max cell circumradius ≤ MAX_DIAG/2 / 2^L (pad bound)
_S2_MIN_WIDTH = 0.942809  # 2·√2/3
_S2_MAX_DIAG = 2.438654


def s2_level_for_rects(bounds: np.ndarray, max_cells: int = 16,
                       max_level: int = 12) -> np.ndarray:
    """Vectorized single-level choice per lon/lat rect (degrees,
    (n, 4) = lon_lo, lat_lo, lon_hi, lat_hi): the finest level whose
    count of rect-intersecting cells stays ≈ ``max_cells``.  NaN rows
    get level -1."""
    b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    lat0 = np.radians(b[:, 1])
    lat1 = np.radians(b[:, 3])
    lat_span = np.maximum(lat1 - lat0, 0.0)
    spans0 = (lat0 <= 0.0) & (lat1 >= 0.0)
    maxcos = np.where(spans0, 1.0,
                      np.cos(np.minimum(np.abs(lat0), np.abs(lat1))))
    lon_span = np.maximum(np.radians(b[:, 2] - b[:, 0]), 0.0) * maxcos
    span = np.maximum(np.maximum(lat_span, lon_span), 1e-9)
    k = np.sqrt(float(max_cells))
    with np.errstate(invalid="ignore", divide="ignore"):
        lv = np.floor(np.log2(k * _S2_MIN_WIDTH / span))
    lv = np.clip(np.nan_to_num(lv, nan=0.0), 0, max_level).astype(np.int64)
    lv[np.isnan(b[:, 0])] = -1
    return lv


def s2_cover_rects_many(bounds: np.ndarray, levels: np.ndarray):
    """All level-``levels[i]`` S2 cells intersecting lon/lat rect ``i``
    → ``(row_idx, cell_id)`` arrays — the VECTORIZED cover-explode
    (replaces a per-rect children-walk coverer in the join hot path).

    Construction: a padded sample grid per rect, one batched
    ``s2_cell`` call per level group, then a rect-bound post-filter.
    Correctness: any cell intersecting the rect has its center within
    one circumradius of the rect, i.e. inside the padded region; the
    grid's half-diagonal (step·√2/2 = 0.21/2^L) is under the minimum
    cell inradius (0.47/2^L), so the center's inradius disc contains a
    sample → EVERY intersecting cell is sampled (true superset).  The
    post-filter (conservative ``s2_rect_bound`` vs the rect) then
    drops pad-only cells, so the output ≈ the minimal intersecting
    set.  Cells per rect are single-level → disjoint per rect."""
    b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    levels = np.asarray(levels, dtype=np.int64)
    valid = (~np.isnan(b[:, 0])) & (levels >= 0)
    rows_out: list[np.ndarray] = []
    ids_out: list[np.ndarray] = []
    for L in np.unique(levels[valid]):
        sel = np.nonzero(valid & (levels == L))[0]
        step = 0.30 / float(1 << int(L))  # rad; √2/2·step < min inradius
        pad = 1.25 / float(1 << int(L))   # rad; > max circumradius
        step_deg = np.degrees(step)
        pad_deg = np.degrees(pad)
        lon0, lat0 = b[sel, 0], b[sel, 1]
        lon1, lat1 = b[sel, 2], b[sel, 3]
        plat0 = np.clip(lat0 - pad_deg, -89.95, 89.95)
        plat1 = np.clip(lat1 + pad_deg, -89.95, 89.95)
        maxabs = np.maximum(np.abs(plat0), np.abs(plat1))
        lon_pad = pad_deg / np.maximum(np.cos(np.radians(maxabs)), 0.02)
        plon0 = lon0 - lon_pad
        plon1 = lon1 + lon_pad
        # lon spacing: Δlon·cos φ ≤ step must hold at the band's
        # largest cos (smallest |lat|)
        spans0 = (plat0 <= 0.0) & (plat1 >= 0.0)
        maxcos = np.where(spans0, 1.0, np.cos(np.radians(
            np.minimum(np.abs(plat0), np.abs(plat1)))))
        lon_step = step_deg / np.maximum(maxcos, 1e-4)
        # padded span caps at one full wrap — beyond that samples repeat
        nx = (np.floor(np.clip(plon1 - plon0, 0.0, 360.0) / lon_step)
              .astype(np.int64) + 2)
        ny = (np.floor(np.maximum(plat1 - plat0, 0.0) / step_deg)
              .astype(np.int64) + 2)
        cnt = nx * ny
        total = int(cnt.sum())
        if total == 0:
            continue
        rep = np.repeat(np.arange(len(sel), dtype=np.int64), cnt)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt))
        ny_rep = ny[rep]
        dx = within // ny_rep
        dy = within % ny_rep
        # WRAP (not clip) pad samples crossing ±180 so seam-crossing
        # cells centered on the far side are still sampled
        lons = plon0[rep] + dx * lon_step[rep]
        lons = np.clip(((lons + 180.0) % 360.0) - 180.0,
                       -179.999999, 179.999999)
        lats = np.clip(plat0[rep] + dy * step_deg, -89.95, 89.95)
        ids = np.asarray(s2_cell(lons, lats, int(L)))
        # per-rect dedupe (adjacent after the lexsort)
        order = np.lexsort((ids, rep))
        rs, cs = rep[order], ids[order]
        uniq = np.r_[True, (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])]
        rs, cs = rs[uniq], cs[uniq]
        # post-filter: drop pad-only cells (bound is conservative, so
        # truly intersecting cells always survive)
        inter, _ = _rect_relation(s2_rect_bound(cs), lat0[rs], lat1[rs],
                                  lon0[rs], lon1[rs])
        rows_out.append(sel[rs[inter]])
        ids_out.append(cs[inter])
    if not rows_out:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(rows_out), np.concatenate(ids_out)


def s2_cover_contains(cover: np.ndarray, lon, lat) -> np.ndarray:
    """Bool per point: does any cover cell contain the point?  (test
    helper — ancestor-at-cover-level membership, fully vectorized per
    level.)"""
    cover = np.asarray(cover, dtype=np.int64)
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    out = np.zeros(len(lon), dtype=bool)
    if len(cover) == 0:
        return out
    levels = s2_level(cover)
    for lv in np.unique(levels):
        keys = np.asarray(s2_cell(lon, lat, int(lv)))
        out |= np.isin(keys, cover[levels == lv])
    return out


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
