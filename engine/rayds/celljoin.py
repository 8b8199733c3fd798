"""Cell-partitioned (big-big) spatial join — SURVEY §2.4 second shape.

When the polygon layer is too large to broadcast, both sides are
co-partitioned by planar grid cell and joined inside each cell group:

  points:   cell = grid_cell(x, y)                       (1 row each)
  polygons: flat-map exploded to their COVERING cell set (≥1 row each),
            carrying the ragged ring geometry as a binary blob
  union → groupby(cell) → map_groups: bbox prefilter + EXACT refinement
  (PreparedPolygons point-in-polygon kernel) → pair table

The only all-to-all moves (cell, narrow columns + ring blobs) — never
image payloads.  The in-group refinement is the same vectorized kernel
as the broadcast path (prepared.py), so the two physical plans produce
identical results for ARBITRARY polygons (both oracle-checked against
the same SQL for the box layer; the dense-polygon parity test covers the
general case).

Skew: every cell key is salted — points get a deterministic per-batch
round-robin salt, polygons are replicated across the salt range — so a
hot cell's candidate work lands on ``salt`` reducers instead of one
straggler (north_rule: "skewed hot cells split via salted
groupby-aggregate shuffles").  Pass ``hot_cells`` (e.g. from
``shuffle.detect_hot_keys`` on the encoded points) to restrict
replication to the known-hot cells when the layer side is too large to
replicate uniformly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.geo import cells
from engine.geo.prepared import PreparedPolygons
from engine.geo.ragged import PolygonArray
from engine.rayds.imagetab import Layer
from engine.rayds.shuffle import hash_exchange_fine_groups

# partition granularity: groups ≈ 4-16 per reducer slot.  12.5 over the
# [0,100)² world → 8×8 = 64 base cells (×salt → 128 groups), i.e. 4 per
# slot at 32 local CPUs (measured optimum: sweep at sf0.1 put 6.25-50.0
# all within noise once salted; 12.5/2 minimized).  At cluster scale
# shrink PART_CELL so groups stay ≥4× total reducer slots.
PART_CELL = 12.5
SALT = 2


def _poly_blobs(layer: Layer) -> list[bytes]:
    """Per-polygon ring serialization: n_rings, ring lengths, coords."""
    polys = layer.polys
    out = []
    for i in range(len(polys)):
        r0, r1 = polys.poly_offsets[i], polys.poly_offsets[i + 1]
        ring_lens = (
            polys.ring_offsets[r0 + 1 : r1 + 1] - polys.ring_offsets[r0:r1]
        ).astype(np.int64)
        c0 = polys.ring_offsets[r0]
        c1 = polys.ring_offsets[r1]
        coords = polys.coords[c0:c1]
        header = np.concatenate([[len(ring_lens)], ring_lens]).astype(np.int64)
        out.append(header.tobytes() + np.ascontiguousarray(coords).tobytes())
    return out


def _polys_from_blobs(blobs) -> PolygonArray:
    """Rebuild a PolygonArray from per-polygon blobs (group-local)."""
    coords_parts = []
    ring_off = [0]
    poly_off = [0]
    n = 0
    for blob in blobs:
        buf = memoryview(blob)
        n_rings = int(np.frombuffer(buf[:8], dtype=np.int64)[0])
        ring_lens = np.frombuffer(buf[8 : 8 * (1 + n_rings)], dtype=np.int64)
        coords = np.frombuffer(buf[8 * (1 + n_rings) :], dtype=np.float64).reshape(-1, 2)
        coords_parts.append(coords)
        for rl in ring_lens:
            n += int(rl)
            ring_off.append(n)
        poly_off.append(len(ring_off) - 1)
    c = np.vstack(coords_parts) if coords_parts else np.empty((0, 2))
    return PolygonArray(c, np.asarray(ring_off), np.asarray(poly_off))


def _points_with_cell(salt: int, hot_cells=None):
    def fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        cell = cells.grid_cell(x, y, PART_CELL)
        if salt > 1:
            s = np.arange(len(x), dtype=np.int64) % salt
            if hot_cells is not None:
                s = np.where(np.isin(cell, hot_cells), s, 0)
            key = cell * np.int64(64) + s
        else:
            key = cell * np.int64(64)
        return pa.table(
            {
                "cell": pa.array(key),
                "image_id": batch["image_id"],
                "x": x,
                "y": y,
                "poly_id": pa.nulls(len(batch), type=pa.int64()),
                "geom": pa.nulls(len(batch), type=pa.binary()),
            }
        )

    return fn


def _layer_cover_table(layer: Layer, salt: int, hot_cells=None) -> pa.Table:
    """Polygon side, exploded to covering cells × salt replicas."""
    rows, cids = cells.grid_cover_many(layer.bounds, PART_CELL)
    blobs = _poly_blobs(layer)
    if salt > 1:
        if hot_cells is not None:
            hot = np.isin(cids, hot_cells)
            reps = np.where(hot, salt, 1).astype(np.int64)
        else:
            reps = np.full(len(cids), salt, dtype=np.int64)
        rows2 = np.repeat(rows, reps)
        cids2 = np.repeat(cids, reps)
        # salt index within each replicated run: 0..reps-1
        starts = np.cumsum(reps) - reps
        sidx = np.arange(reps.sum(), dtype=np.int64) - np.repeat(starts, reps)
        key = cids2 * np.int64(64) + sidx
        rows = rows2
    else:
        key = cids * np.int64(64)
    return pa.table(
        {
            "cell": pa.array(key),
            "image_id": pa.nulls(len(rows), type=pa.string()),
            "x": pa.nulls(len(rows), type=pa.float64()),
            "y": pa.nulls(len(rows), type=pa.float64()),
            "poly_id": pa.array(layer.poly_ids[rows]),
            "geom": pa.array([blobs[i] for i in rows], type=pa.binary()),
        }
    )


def _join_cell_group(predicate: str):
    """Inside one (cell, salt) group: rebuild the co-located polygons,
    run the EXACT prepared point-in-polygon kernel on the co-located
    points (same kernel family as the broadcast path)."""

    def fn(group: pa.Table) -> pa.Table:
        is_poly = group["poly_id"].is_valid()
        polys_t = group.filter(is_poly)
        pts = group.filter(pc.invert(is_poly))
        if len(polys_t) == 0 or len(pts) == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "poly_id": pa.array([], type=pa.int64())})
        x = pts["x"].to_numpy()
        y = pts["y"].to_numpy()
        parr = _polys_from_blobs(polys_t["geom"].to_pylist())
        pp = PreparedPolygons(parr)
        pt, pl = pp.query_points(x, y, predicate)
        return pa.table(
            {
                "image_id": pts["image_id"].take(pa.array(pt)),
                "poly_id": polys_t["poly_id"].take(pa.array(pl)),
            }
        )

    return fn


# --------------------------------------------------------- S2 / hex keying
#
# The north-rule keys: every row carries S2 + hex cell ids; these joins
# actually SHUFFLE on them.
#
# S2 polygon covers are TRUE hierarchical cell unions: a children-walk
# region coverer (cells.s2_cover_rect) produces disjoint mixed-level S2
# cells whose union covers each polygon's lat/lng bbox (conservative
# rect-bound pruning — provably a superset).  The point side emits its
# ANCESTOR cell id at each level the covers actually use (≤
# S2_COVER_LEVEL_SPAN distinct levels, enforced by the coverer), so
# point-key ∈ polygon-cover holds exactly and — because a cover is a
# DISJOINT cell union — each (point, polygon) pair forms in at most one
# group: no pair-dedupe exchange.
#
# Hex covers still compose a planar quantizer with the hex id of the
# quantizer cell's center (documented superset construction) — the hex
# ladder is H3-STYLE, not bit-exact H3, see engine/geo/cells.py.
S2_SNAP = 6.25  # planar quantizer for the HEX cover path
S2_COVER_MAX_CELLS = 24
S2_COVER_MAX_LEVEL = 12
S2_COVER_LEVEL_SPAN = 3


def _lonlat(x: np.ndarray, y: np.ndarray):
    return x * 3.6 - 180.0, y * 1.6 - 80.0


def _snap_centers(x, y, c: float):
    return (np.floor(x / c) + 0.5) * c, (np.floor(y / c) + 0.5) * c


def _hex_key(x: np.ndarray, y: np.ndarray, res: int = 7) -> np.ndarray:
    cx, cy = _snap_centers(x, y, S2_SNAP)
    return np.asarray(cells.hex_cell(cx, cy, res))


def _cover_keys_bbox(bounds: np.ndarray, key_fn):
    """(row_idx, key) for every planar quantizer cell touching each bbox."""
    rows, keys = [], []
    c = S2_SNAP
    for i, (xmin, ymin, xmax, ymax) in enumerate(bounds):
        if np.isnan(xmin):
            continue
        xs = (np.arange(int(np.floor(xmin / c)), int(np.floor(xmax / c)) + 1) + 0.5) * c
        ys = (np.arange(int(np.floor(ymin / c)), int(np.floor(ymax / c)) + 1) + 0.5) * c
        gx, gy = np.meshgrid(xs, ys)
        k = np.unique(key_fn(gx.reshape(-1), gy.reshape(-1)))
        rows.append(np.full(len(k), i, dtype=np.int64))
        keys.append(k)
    if not rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(rows), np.concatenate(keys)


def _keyed_pairs(sf_dir: str, key_fn, layer: Layer | None = None,
                 predicate: str = "covers", ds=None):
    """Generic cell-keyed big-big join: both sides keyed by ``key_fn``
    over snapped planar coordinates, exact refinement per group."""
    import ray.data

    from engine.rayds.imagetab import image_dataset, load_layer

    layer = layer or load_layer(sf_dir)

    def pts_fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        return pa.table(
            {
                "cell": pa.array(key_fn(x, y)),
                "image_id": batch["image_id"],
                "x": x,
                "y": y,
                "poly_id": pa.nulls(len(batch), type=pa.int64()),
                "geom": pa.nulls(len(batch), type=pa.binary()),
            }
        )

    rows, keys = _cover_keys_bbox(layer.bounds, key_fn)
    blobs = _poly_blobs(layer)
    cover = pa.table(
        {
            "cell": pa.array(keys),
            "image_id": pa.nulls(len(rows), type=pa.string()),
            "x": pa.nulls(len(rows), type=pa.float64()),
            "y": pa.nulls(len(rows), type=pa.float64()),
            "poly_id": pa.array(layer.poly_ids[rows]),
            "geom": pa.array([blobs[i] for i in rows], type=pa.binary()),
        }
    )
    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        pts_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    both = pts.union(ray.data.from_arrow(cover))
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))


def s2_layer_cover(layer: Layer, max_cells: int = S2_COVER_MAX_CELLS,
                   max_level: int = S2_COVER_MAX_LEVEL):
    """True S2 region covers for every polygon bbox in the layer.

    Returns ``(rows, keys, used_levels)`` — the flat-map explode of the
    polygon side plus the sorted distinct levels the covers use (the
    point side must emit ancestor keys at exactly these levels).
    Driver-side over the (small) layer; at cluster scale this runs once
    per layer load, not per batch.
    """
    per_poly: list[tuple[int, np.ndarray]] = []
    lv_seen: set[int] = set()
    for i, (xmin, ymin, xmax, ymax) in enumerate(np.asarray(layer.bounds)):
        if np.isnan(xmin):
            continue
        lon0, lat0 = _lonlat(np.float64(xmin), np.float64(ymin))
        lon1, lat1 = _lonlat(np.float64(xmax), np.float64(ymax))
        ids = cells.s2_cover_rect(
            float(lon0), float(lat0), float(lon1), float(lat1),
            max_cells=max_cells, max_level=max_level,
            max_level_span=S2_COVER_LEVEL_SPAN,
        )
        per_poly.append((i, ids))
        lv_seen.update(int(v) for v in cells.s2_level(ids))
    if not per_poly:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), [])
    # GLOBAL level window: the point side replicates once per level in
    # the UNION of all covers' levels — a layer mixing continent- and
    # block-sized polygons would otherwise union into an unbounded level
    # set and silently multiply the point exchange.  Clamp every cover
    # into [gmin, gmin + span - 1]: coarsening a cell to its ancestor
    # only GROWS the cover (superset stays safe; the per-group PIP
    # refinement keeps the join exact), and re-normalizing preserves
    # disjointness (a point still matches ≤1 cover cell per polygon).
    levels = sorted(lv_seen)
    gmax = levels[0] + S2_COVER_LEVEL_SPAN - 1
    if levels[-1] > gmax:
        lv_seen = set()
        clamped = []
        for i, ids in per_poly:
            lv = np.asarray(cells.s2_level(ids))
            fine = lv > gmax
            if fine.any():
                ids = ids.copy()
                ids[fine] = cells.s2_parent(ids[fine], gmax)
                ids = np.unique(ids)
                lv = np.asarray(cells.s2_level(ids))
                # drop cells whose ancestor (at any coarser used level)
                # is also in the set — keeps the union disjoint
                keep = np.ones(len(ids), dtype=bool)
                for L in sorted(set(int(v) for v in lv))[:-1]:
                    at_l = set(ids[lv == L].tolist())
                    finer = lv > L
                    if at_l and finer.any():
                        anc = np.asarray(cells.s2_parent(ids[finer], L))
                        keep[finer] &= ~np.isin(
                            anc, np.fromiter(at_l, dtype=np.int64))
                ids = ids[keep]
            clamped.append((i, ids))
            lv_seen.update(int(v) for v in cells.s2_level(ids))
        per_poly = clamped
    rows_l = [np.full(len(ids), i, dtype=np.int64) for i, ids in per_poly]
    keys_l = [ids for _, ids in per_poly]
    return np.concatenate(rows_l), np.concatenate(keys_l), sorted(lv_seen)


def s2part_pairs(sf_dir: str, layer: Layer | None = None,
                 predicate: str = "covers", ds=None):
    """Big-big join SHUFFLED ON TRUE S2 CELL IDS (mixed-level covers).

    Polygon side: flat-map exploded to its region-coverer cell union.
    Point side: replicated once per cover-used level (≤3), emitting the
    point's S2 ancestor id at that level.  A point matches at most one
    cover cell per polygon (covers are disjoint cell unions), so the
    per-group exact refinement emits each pair at most once — no dedupe
    exchange.  The narrow point row rides the shuffle ≤3×; ring blobs
    ride once per cover cell.
    """
    import ray.data

    from engine.rayds.imagetab import image_dataset, load_layer

    layer = layer or load_layer(sf_dir)
    rows, keys, used_levels = s2_layer_cover(layer)
    blobs = _poly_blobs(layer)
    cover = pa.table(
        {
            "cell": pa.array(keys),
            "image_id": pa.nulls(len(rows), type=pa.string()),
            "x": pa.nulls(len(rows), type=pa.float64()),
            "y": pa.nulls(len(rows), type=pa.float64()),
            "poly_id": pa.array(layer.poly_ids[rows]),
            "geom": pa.array([blobs[i] for i in rows], type=pa.binary()),
        }
    )

    def pts_fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        lon, lat = _lonlat(x, y)
        n = len(x)
        key = np.concatenate(
            [np.asarray(cells.s2_cell(lon, lat, lv)) for lv in used_levels]
        ) if used_levels else np.empty(0, dtype=np.int64)
        reps = len(used_levels)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), reps))
        return pa.table(
            {
                "cell": pa.array(key),
                "image_id": batch["image_id"].take(idx),
                "x": np.tile(x, reps),
                "y": np.tile(y, reps),
                "poly_id": pa.nulls(n * reps, type=pa.int64()),
                "geom": pa.nulls(n * reps, type=pa.binary()),
            }
        )

    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        pts_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    both = pts.union(ray.data.from_arrow(cover))
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))


def hexpart_pairs(sf_dir: str, layer: Layer | None = None,
                  predicate: str = "covers", res: int = 7, ds=None):
    """Big-big join SHUFFLED ON HEX (H3-style res-7) CELL IDS."""
    return _keyed_pairs(sf_dir, lambda x, y: _hex_key(x, y, res), layer,
                        predicate, ds)


def boxpart_pairs(sf_dir: str, layer: Layer | None = None, ds=None):
    """RANGE JOIN (bbox × bbox intersects) — the both-sides-exploded
    shape: every image footprint covers ≥1 cell, every polygon bbox
    covers ≥1 cell, so a pair can form in MULTIPLE cell groups and a
    pair-dedupe exchange is REQUIRED (the case ``cellpart_pairs``'s
    single-cell point side avoids).  Footprint side = a square of planar
    half-extent w/512 centred on the geotag (deterministic from the
    row, mirrored in the SQL oracle)."""
    import ray.data

    from engine.rayds.imagetab import image_dataset, load_layer
    from engine.rayds.shuffle import hash_shuffle_agg

    layer = layer or load_layer(sf_dir)

    def img_boxes(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        h = batch["w"].to_numpy().astype(np.float64) / 512.0
        xmin, ymin, xmax, ymax = x - h, y - h, x + h, y + h
        bounds = np.column_stack([xmin, ymin, xmax, ymax])
        rows, cids = cells.grid_cover_many(bounds, PART_CELL)
        ids = batch["image_id"].take(pa.array(rows))
        return pa.table(
            {
                "cell": pa.array(cids),
                "image_id": ids,
                "ixmin": pa.array(xmin[rows]),
                "iymin": pa.array(ymin[rows]),
                "ixmax": pa.array(xmax[rows]),
                "iymax": pa.array(ymax[rows]),
                "poly_id": pa.nulls(len(rows), type=pa.int64()),
                "pxmin": pa.nulls(len(rows), type=pa.float64()),
                "pymin": pa.nulls(len(rows), type=pa.float64()),
                "pxmax": pa.nulls(len(rows), type=pa.float64()),
                "pymax": pa.nulls(len(rows), type=pa.float64()),
            }
        )

    rows, cids = cells.grid_cover_many(layer.bounds, PART_CELL)
    b = layer.bounds[rows]
    polys_t = pa.table(
        {
            "cell": pa.array(cids),
            "image_id": pa.nulls(len(rows), type=pa.string()),
            "ixmin": pa.nulls(len(rows), type=pa.float64()),
            "iymin": pa.nulls(len(rows), type=pa.float64()),
            "ixmax": pa.nulls(len(rows), type=pa.float64()),
            "iymax": pa.nulls(len(rows), type=pa.float64()),
            "poly_id": pa.array(layer.poly_ids[rows]),
            "pxmin": pa.array(b[:, 0]),
            "pymin": pa.array(b[:, 1]),
            "pxmax": pa.array(b[:, 2]),
            "pymax": pa.array(b[:, 3]),
        }
    )

    def join_group(group: pa.Table) -> pa.Table:
        is_poly = group["poly_id"].is_valid()
        polys = group.filter(is_poly)
        imgs = group.filter(pc.invert(is_poly))
        if len(polys) == 0 or len(imgs) == 0:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "poly_id": pa.array([], type=pa.int64())})
        ix0 = imgs["ixmin"].to_numpy(zero_copy_only=False)
        iy0 = imgs["iymin"].to_numpy(zero_copy_only=False)
        ix1 = imgs["ixmax"].to_numpy(zero_copy_only=False)
        iy1 = imgs["iymax"].to_numpy(zero_copy_only=False)
        px0 = polys["pxmin"].to_numpy(zero_copy_only=False)
        py0 = polys["pymin"].to_numpy(zero_copy_only=False)
        px1 = polys["pxmax"].to_numpy(zero_copy_only=False)
        py1 = polys["pymax"].to_numpy(zero_copy_only=False)
        # chunk the image side so the candidate matrix stays bounded
        # (a hot cell with 20k×20k members would otherwise allocate
        # n_i×n_p bools in one shot)
        CHUNK = max(1, (4 << 20) // max(len(px0), 1))
        outs_i, outs_p = [], []
        for s in range(0, len(ix0), CHUNK):
            e = s + CHUNK
            hit = (
                (ix0[s:e, None] <= px1[None, :]) & (ix1[s:e, None] >= px0[None, :])
                & (iy0[s:e, None] <= py1[None, :]) & (iy1[s:e, None] >= py0[None, :])
            )
            ii, pi = np.nonzero(hit)
            outs_i.append(ii + s)
            outs_p.append(pi)
        ii = np.concatenate(outs_i)
        pi = np.concatenate(outs_p)
        return pa.table(
            {
                "image_id": imgs["image_id"].take(pa.array(ii)),
                "poly_id": polys["poly_id"].take(pa.array(pi)),
            }
        )

    imgs_ds = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        img_boxes, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    both = imgs_ds.union(ray.data.from_arrow(polys_t))
    pairs = hash_exchange_fine_groups(both, ["cell"], join_group)
    # BOTH sides were range-exploded → dedupe (image_id, poly_id)
    deduped = hash_shuffle_agg(
        pairs.map_batches(
            lambda t: t.append_column("_one", pa.array(np.ones(len(t), dtype=np.int64))),
            batch_format="pyarrow", batch_size=None,
        ),
        ["image_id", "poly_id"], [("_one", "min")], ["_one"],
    )
    return deduped.select_columns(["image_id", "poly_id"])


def cellpart_pairs(sf_dir: str, layer: Layer | None = None,
                   predicate: str = "covers", salt: int = SALT,
                   hot_cells=None, ds=None):
    """Big-big join: co-partition by (cell, salt), exact-join per group.

    NO pair-dedupe pass is needed: only the POLYGON side is exploded to
    covering cells (and salt replicas) — each point lives in exactly one
    (cell, salt) group, so a (point, polygon) pair can form in at most
    one group.  (A dedupe ``groupby((image_id, poly_id))`` becomes
    necessary only when BOTH sides are range-exploded, e.g. bbox×bbox
    joins.)"""
    import ray.data

    from engine.rayds.imagetab import image_dataset, load_layer

    layer = layer or load_layer(sf_dir)
    if hot_cells is not None:
        hot_cells = np.asarray(sorted(hot_cells), dtype=np.int64)
    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        _points_with_cell(salt, hot_cells), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    polys = ray.data.from_arrow(_layer_cover_table(layer, salt, hot_cells))
    both = pts.union(polys)
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))
