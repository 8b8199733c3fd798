"""Ray Data stages: cell encode, two-phase join refinement, tiling, kNN.

These realize the reference's bulk-query machinery as Dataset transforms
(SURVEY.md §3.2): ``STRtree(polys).query(points, predicate=...)``
(reference strtree.py:108, src/strtree.c:305-451) becomes a broadcast
``ray.put`` of the polygon layer + an actor-pool ``map_batches`` whose
``__init__`` builds the prepared index ONCE per worker (the actor form of
``shapely.prepare``, creation.py:735) and whose ``__call__`` streams
zero-copy Arrow batches through fully vectorized kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.geo import cells
from engine.geo.prepared import PreparedPolygons
from engine.rayds.imagetab import CELL_SIZE, TILE_N, Layer


# --------------------------------------------------------------- cell encode
def cell_encode(batch: pa.Table) -> pa.Table:
    """Append partition/shuffle keys to image rows (north_rule encode stage).

    cell   — planar grid id at CELL_SIZE (exact, oracle-expressible)
    s2_id  — S2 level-12 cell of the lon/lat mapping of (x, y)
    hex7/8/9 — hierarchical hex cells (planar axial ladder)
    h3x7/8/9 — SPHERICAL icosahedral aperture-7 hex cells
               (engine.geo.hexsphere; H3-class geometry)
    """
    from engine.geo import hexsphere as HX

    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    lon = x * 3.6 - 180.0
    lat = y * 1.6 - 80.0
    lon_c = np.clip(lon, -179.999999, 179.999999)
    lat_c = np.clip(lat, -89.9, 89.9)
    return batch.append_column(
        "cell", pa.array(cells.grid_cell(x, y, CELL_SIZE))
    ).append_column("s2_id", pa.array(cells.s2_cell(lon, lat, level=12))).append_column(
        "hex7", pa.array(cells.hex_cell(x, y, 7))
    ).append_column("hex8", pa.array(cells.hex_cell(x, y, 8))).append_column(
        "hex9", pa.array(cells.hex_cell(x, y, 9))
    ).append_column("h3x9", pa.array(h3x9 := HX.h3x_cell(lon_c, lat_c, 9))).append_column(
        # coarser ids by PARENT TRUNCATION of the res-9 id (pure bit op;
        # the canonical hierarchical-key derivation — one encode, not 3)
        "h3x8", pa.array(HX.h3x_parent(h3x9, 8))
    ).append_column("h3x7", pa.array(HX.h3x_parent(h3x9, 7)))


def _resolve(layer_ref) -> Layer:
    import ray

    return ray.get(layer_ref) if isinstance(layer_ref, ray.ObjectRef) else layer_ref


# Per-worker-process cache of prepared indexes, keyed by broadcast object
# ref.  Plain map_batches TASKS using this get prepared-geometry semantics
# (index built once per worker, creation.py:735) while staying elastic —
# the streaming executor shares the whole CPU pool across stages instead
# of pinning a fixed actor count.  Long-lived task workers also keep their
# memory arenas warm (first-touch page faults in this sandbox cost
# ~200µs/page — a fresh actor process pays seconds of faulting before its
# first batch).
_PP_CACHE: dict = {}


def _prepared_for(layer_ref) -> tuple:
    key = layer_ref.hex() if hasattr(layer_ref, "hex") else id(layer_ref)
    hit = _PP_CACHE.get(key)
    if hit is None:
        layer = _resolve(layer_ref)
        hit = (PreparedPolygons(layer.polys), layer)
        _PP_CACHE[key] = hit
    return hit


def make_join_fn(layer_ref, predicate: str = "covers", keep_cols=("image_id",)):
    """Task-based join refinement with per-worker cached prepared index."""
    keep = list(keep_cols)

    def join_fn(batch: pa.Table) -> pa.Table:
        pp, layer = _prepared_for(layer_ref)
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        pt, pl = pp.query_points(x, y, predicate)
        out = {c: batch[c].take(pa.array(pt)) for c in keep}
        out["x"] = pa.array(x[pt])
        out["y"] = pa.array(y[pt])
        out["poly_id"] = pa.array(layer.poly_ids[pl])
        out["_poly_row"] = pa.array(pl)
        return pa.table(out)

    return join_fn


def make_dwithin_fn(layer_ref, distance: float, keep_cols=("image_id",)):
    keep = list(keep_cols)
    d = float(distance)

    def dwithin_fn(batch: pa.Table) -> pa.Table:
        pp, layer = _prepared_for(layer_ref)
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        pt, pl = pp.query_points_dwithin(x, y, d)
        out = {c: batch[c].take(pa.array(pt)) for c in keep}
        out["poly_id"] = pa.array(layer.poly_ids[pl])
        return pa.table(out)

    return dwithin_fn


class JoinRefiner:
    """Actor-pool stage: point×polygon-layer inner spatial join.

    __init__ (once per actor): fetch the broadcast layer from the object
    store and build ``PreparedPolygons`` — grid-cell prefilter index +
    flat edge tables (prepared-geometry semantics, SURVEY.md §2.3).
    __call__ (per batch): candidate cells → bbox filter → vectorized
    ray-cast refinement; emits the pair table.  Output mirrors
    ``STRtree.query`` "effectively an inner join" (strtree.py:229-234).
    """

    def __init__(self, layer_ref, predicate: str = "covers", keep_cols=("image_id",)):
        layer = _resolve(layer_ref)
        self.pp = PreparedPolygons(layer.polys)
        self.poly_ids = layer.poly_ids
        self.predicate = predicate
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        pt, pl = self.pp.query_points(x, y, self.predicate)
        out = {c: batch[c].take(pa.array(pt)) for c in self.keep_cols}
        out["x"] = pa.array(x[pt])
        out["y"] = pa.array(y[pt])
        out["poly_id"] = pa.array(self.poly_ids[pl])
        out["_poly_row"] = pa.array(pl)
        return pa.table(out)


class DwithinRefiner:
    """Actor-pool stage for ``STRtree.query(predicate="dwithin")``
    (reference strtree.py:247-262: bbox expanded ±d, exact distance
    refine, src/strtree.c:951-1165)."""

    def __init__(self, layer_ref, distance: float, keep_cols=("image_id",)):
        layer = _resolve(layer_ref)
        self.pp = PreparedPolygons(layer.polys)
        self.poly_ids = layer.poly_ids
        self.distance = float(distance)
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        pt, pl = self.pp.query_points_dwithin(x, y, self.distance)
        out = {c: batch[c].take(pa.array(pt)) for c in self.keep_cols}
        out["poly_id"] = pa.array(self.poly_ids[pl])
        return pa.table(out)


class NearestStage:
    """Actor-pool stage for ``STRtree.nearest`` (strtree.py:268-348).

    One nearest polygon per input row; ties broken by LOWEST layer index
    (documented deviation from the reference's visit-order
    nondeterminism, strtree.py:276-279 — deterministic for the oracle).
    """

    def __init__(self, layer_ref, keep_cols=("image_id",)):
        layer = _resolve(layer_ref)
        self.pp = PreparedPolygons(layer.polys)
        self.poly_ids = layer.poly_ids
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        # boxes: exact nearest via centre distance is NOT the semantics —
        # nearest uses true geometry distance (0 inside). nearest_poly
        # implements exact point→rings distance with the 0-shortcut.
        idx, dist = self.pp.nearest_poly(x, y)
        out = {c: batch[c] for c in self.keep_cols}
        out["poly_id"] = pa.array(self.poly_ids[idx])
        out["dist"] = pa.array(dist)
        return pa.table(out)


class NearestCenterStage:
    """kNN to polygon layer CENTROIDS (brute-force vs broadcast centre
    matrix — the ANN-baseline pattern; ties by lowest poly_id, matching
    the SQL oracle's ``ORDER BY dist2, poly_id``)."""

    def __init__(self, layer_ref, keep_cols=("image_id",)):
        layer = _resolve(layer_ref)
        b = layer.bounds
        order = np.argsort(layer.poly_ids, kind="stable")
        self.cx = ((b[:, 0] + b[:, 2]) / 2.0)[order]
        self.cy = ((b[:, 1] + b[:, 3]) / 2.0)[order]
        self.poly_ids = layer.poly_ids[order]
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        dx = x[:, None] - self.cx[None, :]
        dy = y[:, None] - self.cy[None, :]
        d2 = dx * dx + dy * dy
        nearest = np.argmin(d2, axis=1)  # first (lowest poly_id) on ties
        out = {c: batch[c] for c in self.keep_cols}
        out["poly_id"] = pa.array(self.poly_ids[nearest])
        return pa.table(out)


def make_fused_tiles_partial_fn(layer_ref, predicate: str = "covers",
                                batch_rows: int = 16384):
    """MANUALLY FUSED hot path: image rows → join → tile assign → partial
    tile counts, all inside one task with no framework batch hand-offs.

    Ray Data's auto-fused operator chain re-slices/rebuilds batches at
    every stage boundary; measured ~7× overhead vs composing the kernels
    in-task on this workload.  The engine therefore fuses its own hot
    chain (classic operator fusion) and lets Ray provide distribution,
    scheduling and the reduce.  Emits (poly_id, tile_id, _pcnt) partials
    ready for ``shuffle.merge_partial_counts``.
    """
    from engine.rayds.imagetab import TILE_N

    def fused(batch: pa.Table) -> pa.Table:
        pp, layer = _prepared_for(layer_ref)
        xmin = layer.bounds[:, 0]
        ymin = layer.bounds[:, 1]
        sides = layer.sides
        x_all = batch["x"].to_numpy()
        y_all = batch["y"].to_numpy()
        parts = []
        for s in range(0, len(x_all), batch_rows):
            x = x_all[s : s + batch_rows]
            y = y_all[s : s + batch_rows]
            pt, pl = pp.query_points(x, y, predicate)
            side4 = sides[pl] / TILE_N
            tix = np.minimum(np.floor((x[pt] - xmin[pl]) / side4), TILE_N - 1)
            tiy = np.minimum(np.floor((y[pt] - ymin[pl]) / side4), TILE_N - 1)
            tile_id = (tiy * TILE_N + tix).astype(np.int64)
            parts.append(
                pa.table(
                    {"poly_id": pa.array(layer.poly_ids[pl]), "tile_id": pa.array(tile_id)}
                )
            )
        allt = pa.concat_tables(parts) if parts else pa.table(
            {"poly_id": pa.array([], type=pa.int64()), "tile_id": pa.array([], type=pa.int64())}
        )
        g = allt.group_by(["poly_id", "tile_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["poly_id", "tile_id", "_pcnt"])

    return fused


# -------------------------------------------------------------------- tiling
def make_tile_assign(layer: Layer):
    """Stateless tile-assignment kernel over pair rows.

    tile index = floor((coord - min) / (side / TILE_N)), clamped to
    TILE_N-1 at the far edge — a pure function of (poly bounds, point),
    reproducible in SQL (LEAST/floor) so tile assignments "match the
    reference exactly" in the oracle sense (north_rule).
    Emits the tile's clip rect too (clip_by_rect, constructive.py:380).
    """
    xmin = layer.bounds[:, 0].copy()
    ymin = layer.bounds[:, 1].copy()
    sides = layer.sides.copy()

    def tile_assign(batch: pa.Table) -> pa.Table:
        pl = batch["_poly_row"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        side4 = sides[pl] / TILE_N
        tix = np.minimum(np.floor((x - xmin[pl]) / side4), TILE_N - 1).astype(np.int64)
        tiy = np.minimum(np.floor((y - ymin[pl]) / side4), TILE_N - 1).astype(np.int64)
        tile_id = tiy * TILE_N + tix
        out = batch.drop_columns(["_poly_row"])
        out = out.append_column("tile_id", pa.array(tile_id))
        out = out.append_column("tile_xmin", pa.array(xmin[pl] + tix * side4))
        out = out.append_column("tile_ymin", pa.array(ymin[pl] + tiy * side4))
        return out

    return tile_assign
