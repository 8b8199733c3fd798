"""Cell-partitioned (big-big) spatial join — SURVEY §2.4 second shape.

When the polygon layer is too large to broadcast, both sides are
co-partitioned by planar grid cell and joined inside each cell group:

  points:   cell = grid_cell(x, y)                       (1 row each)
  polygons: flat-map exploded to their COVERING cell set (≥1 row each),
            carrying the ragged ring geometry as a binary blob
  union → groupby(cell) → map_groups: bbox prefilter + EXACT refinement
  (PreparedPolygons point-in-polygon kernel) → pair table

BOTH sides are lazy Datasets: the polygon side is a poly-row Dataset
(imagetab.layer_dataset / dense_layer_dataset schema) whose
cover-explode + blob handling runs inside ``map_batches`` on workers —
the driver never materializes the layer, so a 10M-footprint layer costs
the driver O(1).  The only all-to-all moves (cell, narrow columns + ring
blobs) — never image payloads.  The in-group refinement is the same
vectorized kernel as the broadcast path (prepared.py), so the two
physical plans produce identical results for ARBITRARY polygons (both
oracle-checked against the same SQL for the box layer; the dense-polygon
parity test covers the general case).

Partition granularity AUTO-TUNES from the layer: a one-row-per-block
stats pass (count, global bounds, mean side) sizes the grid cell so the
join lands ≥4 groups per reducer slot without exploding the polygon
replication factor (``choose_part_cell``) — the same code self-tunes on
a real cluster where slot count and layer extent differ.

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

# fallback partition granularity when the layer stats pass is skipped:
# 12.5 over the [0,100)² world → 8×8 = 64 base cells (×salt → 128
# groups), i.e. 4 per slot at 32 local CPUs (measured optimum: sweep at
# sf0.1 put 6.25-50.0 all within noise once salted).  The default path
# derives the granularity from the layer instead — see choose_part_cell.
PART_CELL = 12.5
SALT = 2
TARGET_GROUPS_PER_SLOT = 4


# ------------------------------------------------------------ layer side


def _resolve_layer(sf_dir, layer=None, layer_ds=None):
    """The polygon side: ``(poly_row_dataset, in_memory_layer_or_None)``.

    Priority: explicit Dataset (the BIG-LAYER scale path — driver stays
    O(1); stats/levels come from distributed one-row-per-block passes)
    > in-memory Layer > the sf_dir testdata layer via ``load_layer``
    (small by construction).  When the Layer is in memory anyway, the
    tuning passes run driver-side on its arrays — each avoided Dataset
    execution saves ~0.5 s of fixed executor overhead per join call."""
    if layer_ds is not None:
        return layer_ds, None
    import ray.data

    from engine.rayds.imagetab import layer_rows_table, load_layer

    layer = layer if layer is not None else load_layer(sf_dir)
    return ray.data.from_arrow(layer_rows_table(layer)), layer


def _resolve_layer_ds(sf_dir, layer=None, layer_ds=None):
    return _resolve_layer(sf_dir, layer, layer_ds)[0]


def layer_stats_local(layer: Layer) -> dict:
    """Driver-side stats of an in-memory Layer (same shape as
    ``layer_stats``)."""
    b = np.asarray(layer.bounds)
    ok = ~np.isnan(b[:, 0])
    if not ok.any():
        return {"n": 0, "bounds": (0.0, 0.0, 100.0, 100.0), "mean_side": 1.0}
    return {
        "n": int(ok.sum()),
        "bounds": (float(b[ok, 0].min()), float(b[ok, 1].min()),
                   float(b[ok, 2].max()), float(b[ok, 3].max())),
        "mean_side": float(np.asarray(layer.sides)[ok].mean()),
    }


def layer_stats(layer_ds) -> dict:
    """One cheap pass over the poly-row Dataset: per-block 1-row partials
    (count, bbox, side sum) folded on the driver — O(blocks) driver data."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "xmin": pa.array([], type=pa.float64()),
                             "ymin": pa.array([], type=pa.float64()),
                             "xmax": pa.array([], type=pa.float64()),
                             "ymax": pa.array([], type=pa.float64()),
                             "side_sum": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "xmin": pa.array([pc.min(batch["xmin"]).as_py()]),
                "ymin": pa.array([pc.min(batch["ymin"]).as_py()]),
                "xmax": pa.array([pc.max(batch["xmax"]).as_py()]),
                "ymax": pa.array([pc.max(batch["ymax"]).as_py()]),
                "side_sum": pa.array([pc.sum(batch["side"]).as_py()]),
            }
        )

    rows = layer_ds.select_columns(
        ["xmin", "ymin", "xmax", "ymax", "side"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=None).take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return {"n": 0, "bounds": (0.0, 0.0, 100.0, 100.0), "mean_side": 1.0}
    return {
        "n": n,
        "bounds": (
            min(r["xmin"] for r in rows),
            min(r["ymin"] for r in rows),
            max(r["xmax"] for r in rows),
            max(r["ymax"] for r in rows),
        ),
        "mean_side": sum(r["side_sum"] for r in rows) / n,
    }


def choose_part_cell(stats: dict, slots: int | None = None,
                     groups_per_slot: int = TARGET_GROUPS_PER_SLOT) -> float:
    """Grid granularity from layer extent + reducer slots.

    Pick the coarsest cell giving ≥``groups_per_slot`` groups per slot
    (cell = sqrt(area / (gps·slots))), then clamp:
      · cell ≥ mean_side/2 — finer would replicate every polygon across
        ≥9 cells (cover factor (1+side/cell)²) for no extra parallelism;
      · cell ≤ extent/2 — at least a 2×2 grid even for tiny layers.
    """
    if slots is None:
        try:
            import ray

            slots = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            slots = 8
    x0, y0, x1, y1 = stats["bounds"]
    w = max(x1 - x0, 1e-9)
    h = max(y1 - y0, 1e-9)
    cell = float(np.sqrt((w * h) / max(groups_per_slot * slots, 1)))
    cell = max(cell, float(stats["mean_side"]) / 2.0, 1e-9)
    cell = min(cell, max(w, h) / 2.0)
    return cell


def _empty_pairs() -> pa.Table:
    return pa.table({"image_id": pa.array([], type=pa.string()),
                     "poly_id": pa.array([], type=pa.int64())})


def _points_with_cell(part_cell: float, salt: int, hot_cells=None):
    def fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        cell = cells.grid_cell(x, y, part_cell)
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
                "geom": pa.nulls(len(batch), type=pa.large_binary()),
            }
        )

    return fn


def _poly_cover_fn(part_cell: float, salt: int, hot_cells=None):
    """map_batches kernel over POLY ROWS: explode each polygon to its
    covering cells × salt replicas, geometry blob riding along."""

    def fn(batch: pa.Table) -> pa.Table:
        bounds = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        rows, cids = cells.grid_cover_many(bounds, part_cell)
        if salt > 1:
            if hot_cells is not None:
                hot = np.isin(cids, hot_cells)
                reps = np.where(hot, salt, 1).astype(np.int64)
            else:
                reps = np.full(len(cids), salt, dtype=np.int64)
            rows2 = np.repeat(rows, reps)
            cids2 = np.repeat(cids, reps)
            starts = np.cumsum(reps) - reps
            sidx = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
            key = cids2 * np.int64(64) + sidx
            rows = rows2
        else:
            key = cids * np.int64(64)
        take = pa.array(rows)
        return pa.table(
            {
                "cell": pa.array(key),
                "image_id": pa.nulls(len(rows), type=pa.string()),
                "x": pa.nulls(len(rows), type=pa.float64()),
                "y": pa.nulls(len(rows), type=pa.float64()),
                "poly_id": batch["poly_id"].take(take),
                "geom": pc.cast(batch["geom"], pa.large_binary()).take(take),
            }
        )

    return fn


def _join_cell_group(predicate: str):
    """Inside one (cell, salt) group: rebuild the co-located polygons,
    run the EXACT prepared point-in-polygon kernel on the co-located
    points (same kernel family as the broadcast path)."""

    def fn(group: pa.Table) -> pa.Table:
        is_poly = group["poly_id"].is_valid()
        polys_t = group.filter(is_poly)
        pts = group.filter(pc.invert(is_poly))
        if len(polys_t) == 0 or len(pts) == 0:
            return _empty_pairs()
        x = pts["x"].to_numpy()
        y = pts["y"].to_numpy()
        parr = PolygonArray.from_blobs(polys_t["geom"])
        pp = PreparedPolygons(parr)
        pt, pl = pp.query_points(x, y, predicate)
        return pa.table(
            {
                "image_id": pts["image_id"].take(pa.array(pt)),
                "poly_id": polys_t["poly_id"].take(pa.array(pl)),
            }
        )

    return fn


def cellpart_pairs(sf_dir: str, layer: Layer | None = None,
                   predicate: str = "covers", salt: int = SALT,
                   hot_cells=None, ds=None, layer_ds=None,
                   part_cell: float | None = None):
    """Big-big join: co-partition by (cell, salt), exact-join per group.

    NO pair-dedupe pass is needed: only the POLYGON side is exploded to
    covering cells (and salt replicas) — each point lives in exactly one
    (cell, salt) group, so a (point, polygon) pair can form in at most
    one group.  (A dedupe ``groupby((image_id, poly_id))`` becomes
    necessary only when BOTH sides are range-exploded, e.g. bbox×bbox
    joins.)

    ``part_cell=None`` auto-tunes the grid from the layer stats pass;
    pass it explicitly when ``hot_cells`` were detected at a known
    granularity."""
    from engine.rayds.imagetab import image_dataset

    polys_ds, mem_layer = _resolve_layer(sf_dir, layer, layer_ds)
    if part_cell is None:
        stats = (layer_stats_local(mem_layer) if mem_layer is not None
                 else layer_stats(polys_ds))
        part_cell = choose_part_cell(stats)
    if hot_cells is not None:
        hot_cells = np.asarray(sorted(hot_cells), dtype=np.int64)
    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        _points_with_cell(part_cell, salt, hot_cells), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    polys = polys_ds.map_batches(
        _poly_cover_fn(part_cell, salt, hot_cells), batch_format="pyarrow",
        batch_size=None,
    )
    both = pts.union(polys)
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))


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
# S2_COVER_LEVEL_SPAN distinct levels, enforced by a global level
# window), so point-key ∈ polygon-cover holds exactly and — because a
# cover is a DISJOINT cell union — each (point, polygon) pair forms in
# at most one group: no pair-dedupe exchange.
#
# Hex covers compose a planar quantizer with the hex id of the
# quantizer cell's center (documented superset construction) — see
# engine/geo/cells.py for the hex ladder's H3 relationship.
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


def _bbox_cover_keys(bounds: np.ndarray, key_fn):
    """(row_idx, key) for every planar quantizer cell touching each bbox
    (runs per-batch inside the polygon-side map_batches kernel).

    Fully vectorized — segment arithmetic enumerates all quantizer cell
    centers across all bboxes at once, ``key_fn`` runs ONCE per batch,
    and per-row dedupe is one lexsort (the per-polygon Python loop was
    the polygon-side bottleneck at dense layers)."""
    c = S2_SNAP
    b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    valid = ~np.isnan(b[:, 0])
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ix0 = np.floor(b[idx, 0] / c).astype(np.int64)
    iy0 = np.floor(b[idx, 1] / c).astype(np.int64)
    nx = np.floor(b[idx, 2] / c).astype(np.int64) - ix0 + 1
    ny = np.floor(b[idx, 3] / c).astype(np.int64) - iy0 + 1
    cnt = nx * ny
    total = int(cnt.sum())
    rep = np.repeat(np.arange(len(idx), dtype=np.int64), cnt)
    within = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(cnt) - cnt, cnt))
    ny_rep = ny[rep]
    cx = (ix0[rep] + within // ny_rep + 0.5) * c
    cy = (iy0[rep] + within % ny_rep + 0.5) * c
    k = np.asarray(key_fn(cx, cy))
    rows = idx[rep]
    order = np.lexsort((k, rows))
    rs, ks = rows[order], k[order]
    uniq = np.r_[True, (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])]
    return rs[uniq], ks[uniq]


def _keyed_pairs(sf_dir: str, key_fn, layer: Layer | None = None,
                 predicate: str = "covers", ds=None, layer_ds=None):
    """Generic cell-keyed big-big join: both sides keyed by ``key_fn``
    over snapped planar coordinates, exact refinement per group.  The
    polygon cover-explode runs inside map_batches on the poly-row
    Dataset."""
    from engine.rayds.imagetab import image_dataset

    polys_ds = _resolve_layer_ds(sf_dir, layer, layer_ds)

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
                "geom": pa.nulls(len(batch), type=pa.large_binary()),
            }
        )

    def cover_fn(batch: pa.Table) -> pa.Table:
        bounds = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        rows, keys = _bbox_cover_keys(bounds, key_fn)
        take = pa.array(rows)
        return pa.table(
            {
                "cell": pa.array(keys),
                "image_id": pa.nulls(len(rows), type=pa.string()),
                "x": pa.nulls(len(rows), type=pa.float64()),
                "y": pa.nulls(len(rows), type=pa.float64()),
                "poly_id": batch["poly_id"].take(take),
                "geom": pc.cast(batch["geom"], pa.large_binary()).take(take),
            }
        )

    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        pts_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    polys = polys_ds.map_batches(cover_fn, batch_format="pyarrow", batch_size=None)
    both = pts.union(polys)
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))


def _s2_rects_levels(bounds: np.ndarray,
                     max_cells: int = S2_COVER_MAX_CELLS,
                     max_level: int = S2_COVER_MAX_LEVEL):
    """Planar (n, 4) bboxes → (lon/lat rects, per-poly cover level).

    The lon/lat transform + world-edge clamping (tiny pad so world-edge
    point keys stay covered) vectorized, plus the deterministic single-level choice
    (``cells.s2_level_for_rects``) shared by BOTH passes of the
    distributed keying — pass 1's global min and pass 2's clamped
    covers must see identical levels (and thus identical
    max_cells/max_level)."""
    b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
    lon0, lat0 = _lonlat(b[:, 0], b[:, 1])
    lon1, lat1 = _lonlat(b[:, 2], b[:, 3])
    pad = 1e-6
    rects = np.column_stack([
        np.maximum(lon0 - pad, -180.0), np.maximum(lat0 - pad, -89.9),
        np.minimum(lon1 + pad, 180.0), np.minimum(lat1 + pad, 89.9),
    ])
    rects[np.isnan(b[:, 0])] = np.nan
    return rects, cells.s2_level_for_rects(rects, max_cells, max_level)


def s2_global_min_level(layer_ds) -> int:
    """Pass 1 of the distributed S2 keying: the GLOBAL minimum cover
    level across all polygons, from one-row-per-block partials.  The
    level window [gmin, gmin+span-1] bounds point-side replication — a
    layer mixing continent- and block-sized polygons would otherwise
    union into an unbounded level set and silently multiply the point
    exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        b = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        _rects, lv = _s2_rects_levels(b)
        lv = lv[lv >= 0]
        if not len(lv):
            return pa.table({"mn": pa.array([], type=pa.int64())})
        return pa.table({"mn": pa.array([int(lv.min())], type=pa.int64())})

    rows = layer_ds.select_columns(["xmin", "ymin", "xmax", "ymax"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not rows:
        return 0
    return min(r["mn"] for r in rows)


def s2_layer_cover(layer: Layer, max_cells: int = S2_COVER_MAX_CELLS,
                   max_level: int = S2_COVER_MAX_LEVEL):
    """S2 cell covers for every polygon bbox in an in-memory Layer —
    driver-side mirror of the distributed two-pass path (test /
    small-layer use).  Returns ``(rows, keys, used_levels)``: per-poly
    single-level covers, levels clamped into the global
    ``S2_COVER_LEVEL_SPAN`` window (coarsening only grows the covered
    area, so the clamp is superset-safe)."""
    rects, lv = _s2_rects_levels(np.asarray(layer.bounds), max_cells,
                                 max_level)
    valid = lv >= 0
    if not valid.any():
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), [])
    gmin = int(lv[valid].min())
    gmax = gmin + S2_COVER_LEVEL_SPAN - 1
    lvc = np.where(valid, np.clip(lv, gmin, gmax), -1)
    rows, keys = cells.s2_cover_rects_many(rects, lvc)
    used = sorted(int(v) for v in np.unique(lvc[lvc >= 0]))
    return rows, keys, used


def s2part_pairs(sf_dir: str, layer: Layer | None = None,
                 predicate: str = "covers", ds=None, layer_ds=None):
    """Big-big join SHUFFLED ON TRUE S2 CELL IDS (mixed-level covers).

    Two distributed passes over the poly-row Dataset:
      1. ``s2_global_min_level`` — tiny per-block partials fix the
         global level window [gmin, gmax].
      2. cover-explode inside map_batches: per-polygon region cover,
         locally clamped into the window, blobs riding along.
    Point side: replicated once per window level (≤3), emitting the
    point's S2 ancestor id at that level.  A point matches at most one
    cover cell per polygon (covers are disjoint cell unions), so the
    per-group exact refinement emits each pair at most once — no dedupe
    exchange.  The narrow point row rides the shuffle ≤3×; ring blobs
    ride once per cover cell.
    """
    from engine.rayds.imagetab import image_dataset

    polys_ds, mem_layer = _resolve_layer(sf_dir, layer, layer_ds)
    if mem_layer is not None:
        _rects, lvs = _s2_rects_levels(np.asarray(mem_layer.bounds))
        gmin = int(lvs[lvs >= 0].min()) if (lvs >= 0).any() else 0
    else:
        gmin = s2_global_min_level(polys_ds)
    gmax = gmin + S2_COVER_LEVEL_SPAN - 1
    used_levels = list(range(gmin, gmax + 1))

    def cover_fn(batch: pa.Table) -> pa.Table:
        b = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        # VECTORIZED cover-explode: per-poly single-level covers at the
        # deterministic level clamped into the global window (coarsening
        # = superset; single level per poly keeps covers disjoint, so a
        # pair still forms in at most one group)
        rects, lv = _s2_rects_levels(b)
        lvc = np.where(lv >= 0, np.clip(lv, gmin, gmax), -1)
        rows, keys = cells.s2_cover_rects_many(rects, lvc)
        take = pa.array(rows)
        return pa.table(
            {
                "cell": pa.array(keys),
                "image_id": pa.nulls(len(rows), type=pa.string()),
                "x": pa.nulls(len(rows), type=pa.float64()),
                "y": pa.nulls(len(rows), type=pa.float64()),
                "poly_id": batch["poly_id"].take(take),
                "geom": pc.cast(batch["geom"], pa.large_binary()).take(take),
            }
        )

    def pts_fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        lon, lat = _lonlat(x, y)
        # lon = ±180 wraps to the opposite face edge in s2_cell; clip
        # into the open interval so a world-edge point keys to the cell
        # its (padded) covers actually contain
        lon = np.clip(lon, -180.0 + 1e-7, 180.0 - 1e-7)
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
                "geom": pa.nulls(n * reps, type=pa.large_binary()),
            }
        )

    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        pts_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    polys = polys_ds.map_batches(cover_fn, batch_format="pyarrow", batch_size=None)
    both = pts.union(polys)
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))


def hexpart_pairs(sf_dir: str, layer: Layer | None = None,
                  predicate: str = "covers", res: int = 7, ds=None,
                  layer_ds=None):
    """Big-big join SHUFFLED ON HEX (H3 res-7) CELL IDS."""
    return _keyed_pairs(sf_dir, lambda x, y: _hex_key(x, y, res), layer,
                        predicate, ds, layer_ds)


def boxpart_pairs(sf_dir: str, layer: Layer | None = None, ds=None,
                  layer_ds=None):
    """RANGE JOIN (bbox × bbox intersects) — the both-sides-exploded
    shape: every image footprint covers ≥1 cell, every polygon bbox
    covers ≥1 cell, so a pair can form in MULTIPLE cell groups and a
    pair-dedupe exchange is REQUIRED (the case ``cellpart_pairs``'s
    single-cell point side avoids).  Footprint side = a square of planar
    half-extent w/512 centred on the geotag (deterministic from the
    row, mirrored in the SQL oracle)."""
    from engine.rayds.imagetab import image_dataset
    from engine.rayds.shuffle import hash_shuffle_agg

    polys_ds = _resolve_layer_ds(sf_dir, layer, layer_ds)

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

    def poly_boxes(batch: pa.Table) -> pa.Table:
        b = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        rows, cids = cells.grid_cover_many(b, PART_CELL)
        take = pa.array(rows)
        bb = b[rows]
        return pa.table(
            {
                "cell": pa.array(cids),
                "image_id": pa.nulls(len(rows), type=pa.string()),
                "ixmin": pa.nulls(len(rows), type=pa.float64()),
                "iymin": pa.nulls(len(rows), type=pa.float64()),
                "ixmax": pa.nulls(len(rows), type=pa.float64()),
                "iymax": pa.nulls(len(rows), type=pa.float64()),
                "poly_id": batch["poly_id"].take(take),
                "pxmin": pa.array(bb[:, 0]),
                "pymin": pa.array(bb[:, 1]),
                "pxmax": pa.array(bb[:, 2]),
                "pymax": pa.array(bb[:, 3]),
            }
        )

    def join_group(group: pa.Table) -> pa.Table:
        is_poly = group["poly_id"].is_valid()
        polys = group.filter(is_poly)
        imgs = group.filter(pc.invert(is_poly))
        if len(polys) == 0 or len(imgs) == 0:
            return _empty_pairs()
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
    polys = polys_ds.map_batches(poly_boxes, batch_format="pyarrow", batch_size=None)
    both = imgs_ds.union(polys)
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


def h3x_res_for_side(mean_side: float, res_cap: int = 8) -> int:
    """Finest h3x res whose cell circumradius still covers the mean
    polygon side (planar units → the wider lon-degree mapping): covers
    then stay O(1) cells per polygon while the grid is as fine (=
    parallel) as that allows.  A fixed res would make small-polygon
    layers sample and replicate ~7× per res step too coarse."""
    from engine.geo import hexsphere as HX

    side_deg = max(float(mean_side), 1e-6) * 3.6
    res = 0
    while res < res_cap and HX.cell_size_deg(res + 1) >= side_deg:
        res += 1
    return res


def h3xpart_pairs(sf_dir: str, layer: Layer | None = None,
                  predicate: str = "covers", res: int | None = None,
                  ds=None, layer_ds=None):
    """Big-big join SHUFFLED ON SPHERICAL ICOSAHEDRAL HEX CELL IDS
    (engine.geo.hexsphere — the aperture-7 H3-class index).

    Point side: one h3x cell per point.  Polygon side: padded superset
    cover of each bbox's lon/lat rect (``h3x_cover_rects_many``) —
    covers are supersets and the per-group refinement is exact, so
    per-face lattice seams cost only extra candidates, never
    correctness.  Single-cell point side ⇒ no pair-dedupe exchange.
    ``res=None`` (default) AUTO-TUNES from the layer's mean polygon
    side (driver-side for an in-memory layer; one one-row-per-block
    stats pass for a lazy layer Dataset) — both sides must key at the
    SAME res, fixed before the pipeline builds."""
    from engine.geo import hexsphere as HX
    from engine.rayds.imagetab import image_dataset

    polys_ds, mem_layer = _resolve_layer(sf_dir, layer, layer_ds)
    if res is None:
        stats = (layer_stats_local(mem_layer) if mem_layer is not None
                 else layer_stats(polys_ds))
        res = h3x_res_for_side(stats["mean_side"])

    def pts_fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        lon, lat = _lonlat(x, y)
        lon = np.clip(lon, -179.999999, 179.999999)
        lat = np.clip(lat, -89.9, 89.9)
        return pa.table(
            {
                "cell": pa.array(HX.h3x_cell(lon, lat, res)),
                "image_id": batch["image_id"],
                "x": x,
                "y": y,
                "poly_id": pa.nulls(len(batch), type=pa.int64()),
                "geom": pa.nulls(len(batch), type=pa.large_binary()),
            }
        )

    def cover_fn(batch: pa.Table) -> pa.Table:
        b = np.column_stack(
            [batch[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")]
        )
        # VECTORIZED cover-explode (h3x_cover_rects_many): all rects'
        # padded sample grids in one flat pass, one 20-face loop per
        # chunk instead of per polygon
        lon0, lat0 = _lonlat(b[:, 0], b[:, 1])
        lon1, lat1 = _lonlat(b[:, 2], b[:, 3])
        rects = np.column_stack([lon0, lat0, lon1, lat1])
        rects[np.isnan(b[:, 0])] = np.nan
        rows, keys = HX.h3x_cover_rects_many(rects, res)
        take = pa.array(rows)
        return pa.table(
            {
                "cell": pa.array(keys),
                "image_id": pa.nulls(len(rows), type=pa.string()),
                "x": pa.nulls(len(rows), type=pa.float64()),
                "y": pa.nulls(len(rows), type=pa.float64()),
                "poly_id": batch["poly_id"].take(take),
                "geom": pc.cast(batch["geom"], pa.large_binary()).take(take),
            }
        )

    pts = (ds if ds is not None else image_dataset(sf_dir)).map_batches(
        pts_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    polys = polys_ds.map_batches(cover_fn, batch_format="pyarrow", batch_size=None)
    both = pts.union(polys)
    return hash_exchange_fine_groups(both, ["cell"],
                                     _join_cell_group(predicate))
