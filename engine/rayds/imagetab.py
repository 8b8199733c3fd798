"""The image+caption table (input_hint schema) and the polygon layer.

``BASELINE.json`` ``input_hint`` prescribes a Lance table with columns
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` whose geotags drive the spatial join.  The
sandbox testdata has no such table, so we DERIVE it deterministically
from ``events.parquet`` with pure integer arithmetic — the same formulas
are emitted as SQL (``sql_images`` / ``sql_layer``) so the DuckDB oracle
reproduces join/tile results bit-exactly (IEEE ops in identical order on
both sides).

Geotag derivation (planar world [0,100)²; quasi-random low-discrepancy
spread from the event key):

    x = ((event_id * 9973) % 100000) / 1000.0
    y = ((event_id * 7919) % 100000) / 1000.0

Polygon layer = 25 nation boxes (13×13, gridded with gaps) + 5 region
boxes (25×25, diagonal, overlapping the nation boxes) → points can match
0, 1 or several polygons, exercising multi-match dedupe and tiling.
Boxes keep the oracle exact (bbox predicates == exact predicates for
axis-aligned rectangles); general-polygon predicate correctness is
covered by the shapely-conformance pytest corpus instead
(tests/test_strtree_conformance.py, tests/test_predicates.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from engine.geo.ragged import PolygonArray

# --- derivation constants (mirrored in SQL below; keep in sync) -----------
X_MULT, Y_MULT, COORD_MOD, COORD_DIV = 9973, 7919, 100_000, 1000.0
NATION_SIDE = 13.0
REGION_SIDE = 25.0
TILE_N = 4  # tiles per axis inside a matched polygon (4×4 grid)
CELL_SIZE = 5.0  # planar grid prefilter/partition cell (oracle-expressible)
GRID_KEY = 1 << 20  # must match engine.geo.cells.GRID_KEY


def derive_xy(event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    eid = np.asarray(event_id, dtype=np.int64)
    x = ((eid * X_MULT) % COORD_MOD) / COORD_DIV
    y = ((eid * Y_MULT) % COORD_MOD) / COORD_DIV
    return x, y


def derive_batch(batch: pa.Table) -> pa.Table:
    """events(event_id, event_type) → image rows (no payload bytes).

    Stateless `map_batches` kernel, zero-copy Arrow in/out.  ``bytes`` is
    deliberately absent here: wide payloads never ride through join
    stages (SURVEY.md §7 "Wide rows"); see payload_batch for the codec
    path.
    """
    eid = batch["event_id"].to_numpy()
    x, y = derive_xy(eid)
    etype = batch["event_type"]
    image_id = pa.compute.binary_join_element_wise(
        pa.array(["img"] * len(batch)), pa.compute.cast(batch["event_id"], pa.string()), ""
    )
    caption = pa.compute.binary_join_element_wise(
        etype, pa.compute.cast(batch["event_id"], pa.string()), " #"
    )
    w = (32 + (eid % 4) * 16).astype(np.int32)
    h = (32 + (eid % 3) * 16).astype(np.int32)
    # format mix: lossless raw/png + the LOSSY qraw branch (so the
    # input_hint "PSNR≥40dB for lossy" invariant is actually exercised)
    fmt = np.where(eid % 2 == 0, "raw", np.where(eid % 4 == 1, "qraw", "png"))
    return pa.table(
        {
            "image_id": image_id,
            "x": x,
            "y": y,
            "w": pa.array(w),
            "h": pa.array(h),
            "fmt": pa.array(fmt),
            "caption": caption,
        }
    )


def image_dataset(sf_dir: str, parallelism: int = -1):
    """Narrow image table as a lazy Dataset (projection pushed to the read).

    Reads ONLY (event_id, event_type) from storage — the engine-level
    "prune at the read" rule; the Lance reader swap-in point is here
    (lance not installed in this sandbox; parquet carries the schema).
    """
    import ray
    import ray.data

    # explicit block count: Ray's file-size heuristic under-parallelizes
    # small-but-row-dense inputs (and every fused downstream stage with it)
    nblocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"],
        override_num_blocks=nblocks,
    )
    return ds.map_batches(derive_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


# --- polygon layer --------------------------------------------------------


@dataclass
class Layer:
    """Small broadcast side of the join: ids + bounds + ragged polygons."""

    poly_ids: np.ndarray  # int64
    bounds: np.ndarray  # (P,4) xmin,ymin,xmax,ymax
    sides: np.ndarray  # float64 box side length (tile sizing)
    polys: PolygonArray = field(default=None)

    def __post_init__(self):
        if self.polys is None:
            b = self.bounds
            self.polys = PolygonArray.from_bounds(b[:, 0], b[:, 1], b[:, 2], b[:, 3])


def load_layer(sf_dir: str) -> Layer:
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
    nk = nation["n_nationkey"].to_numpy().astype(np.int64)
    rk = region["r_regionkey"].to_numpy().astype(np.int64)
    n_xmin = (nk % 5).astype(np.float64) * 20.0 + 1.5
    n_ymin = np.floor(nk / 5.0) * 20.0 + 1.5
    r_xmin = rk.astype(np.float64) * 17.0 + 1.0
    r_ymin = rk.astype(np.float64) * 13.0 + 2.0
    ids = np.concatenate([nk, 100 + rk])
    xmin = np.concatenate([n_xmin, r_xmin])
    ymin = np.concatenate([n_ymin, r_ymin])
    sides = np.concatenate(
        [np.full(len(nk), NATION_SIDE), np.full(len(rk), REGION_SIDE)]
    )
    bounds = np.column_stack([xmin, ymin, xmin + sides, ymin + sides])
    return Layer(poly_ids=ids, bounds=bounds, sides=sides)


def make_dense_layer(n_polys: int = 4000, verts: int = 32, radius: float = 1.5,
                     seed: int = 7) -> Layer:
    """Deterministic dense polygon layer for benchmarking (no SQL oracle
    needed — bench only).  Regular ``verts``-gon footprints centred on a
    jittered grid over the [0,100)² world; ~n_polys·πr²/10⁴ matches per
    point, so the vectorized PIP refinement (not Ray plumbing) dominates
    the join — representative of real building/footprint layers."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_polys)))
    gx, gy = np.meshgrid(np.arange(side), np.arange(side))
    centers = (
        np.column_stack([gx.reshape(-1), gy.reshape(-1)])[:n_polys] + 0.5
    ) * (100.0 / side)
    centers += rng.uniform(-0.2, 0.2, size=centers.shape) * (100.0 / side)
    ang = np.linspace(0.0, 2 * np.pi, verts, endpoint=False)
    ring = np.column_stack([np.cos(ang), np.sin(ang)]) * radius
    coords = (centers[:, None, :] + ring[None, :, :]).reshape(-1, 2)
    # close each ring
    closed = np.empty((n_polys, verts + 1, 2))
    closed[:, :verts] = coords.reshape(n_polys, verts, 2)
    closed[:, verts] = closed[:, 0]
    polys = PolygonArray(
        closed.reshape(-1, 2),
        np.arange(n_polys + 1, dtype=np.int64) * (verts + 1),
        np.arange(n_polys + 1, dtype=np.int64),
    )
    b = polys.bounds()
    return Layer(
        poly_ids=np.arange(n_polys, dtype=np.int64),
        bounds=b,
        sides=b[:, 2] - b[:, 0],
        polys=polys,
    )


# --- polygon layer as a DATASET (big-layer path) ---------------------------
#
# The cell-partitioned joins (celljoin.py) take the polygon side as a
# ``ray.data.Dataset`` of POLY ROWS — one row per polygon, geometry as a
# self-contained blob (PolygonArray.to_blobs wire format) — so the
# cover-explode + blob-serialize work runs inside ``map_batches`` on
# workers and the driver stays O(1) regardless of layer size.  Schema:
#   poly_id:int64, xmin/ymin/xmax/ymax:float64, side:float64,
#   geom:large_binary


def layer_rows_table(layer: Layer) -> pa.Table:
    """Serialize an in-memory Layer to the poly-row schema (test /
    small-layer path; the big-layer path never builds a Layer at all)."""
    b = layer.bounds
    return pa.table(
        {
            "poly_id": pa.array(layer.poly_ids.astype(np.int64)),
            "xmin": pa.array(b[:, 0]),
            "ymin": pa.array(b[:, 1]),
            "xmax": pa.array(b[:, 2]),
            "ymax": pa.array(b[:, 3]),
            "side": pa.array(np.asarray(layer.sides, dtype=np.float64)),
            "geom": layer.polys.to_blobs(),
        }
    )


def _nation_rows(batch: pa.Table) -> pa.Table:
    nk = batch["n_nationkey"].to_numpy().astype(np.int64)
    xmin = (nk % 5).astype(np.float64) * 20.0 + 1.5
    ymin = np.floor(nk / 5.0) * 20.0 + 1.5
    sides = np.full(len(nk), NATION_SIDE)
    polys = PolygonArray.from_bounds(xmin, ymin, xmin + sides, ymin + sides)
    return pa.table(
        {
            "poly_id": pa.array(nk),
            "xmin": pa.array(xmin),
            "ymin": pa.array(ymin),
            "xmax": pa.array(xmin + sides),
            "ymax": pa.array(ymin + sides),
            "side": pa.array(sides),
            "geom": polys.to_blobs(),
        }
    )


def _region_rows(batch: pa.Table) -> pa.Table:
    rk = batch["r_regionkey"].to_numpy().astype(np.int64)
    xmin = rk.astype(np.float64) * 17.0 + 1.0
    ymin = rk.astype(np.float64) * 13.0 + 2.0
    sides = np.full(len(rk), REGION_SIDE)
    polys = PolygonArray.from_bounds(xmin, ymin, xmin + sides, ymin + sides)
    return pa.table(
        {
            "poly_id": pa.array(100 + rk),
            "xmin": pa.array(xmin),
            "ymin": pa.array(ymin),
            "xmax": pa.array(xmin + sides),
            "ymax": pa.array(ymin + sides),
            "side": pa.array(sides),
            "geom": polys.to_blobs(),
        }
    )


def layer_dataset(sf_dir: str):
    """The testdata polygon layer as a lazy poly-row Dataset — the same
    layer ``load_layer`` builds, but derived inside ``map_batches`` from
    the nation/region parquet reads (nothing layer-sized on the driver)."""
    import ray.data

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(_nation_rows, batch_format="pyarrow", batch_size=None)
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey"]
    ).map_batches(_region_rows, batch_format="pyarrow", batch_size=None)
    return nat.union(reg)


def _dense_params(idx: np.ndarray, n_polys: int, verts: int, radius: float,
                  seed: int):
    """Order-independent per-index center derivation (hash jitter) so any
    blocking of the index range generates the identical layer."""
    side = int(np.ceil(np.sqrt(n_polys)))
    step = 100.0 / side
    cx = (idx % side + 0.5) * step
    cy = (idx // side + 0.5) * step
    # deterministic per-index jitter in ±0.2·step (Weyl-sequence hash)
    jx = (((idx * 2654435761 + seed * 97) % 1_000_003) / 1_000_003.0 - 0.5) * 0.4 * step
    jy = (((idx * 1597334677 + seed * 31) % 999_983) / 999_983.0 - 0.5) * 0.4 * step
    return cx + jx, cy + jy


def _dense_polys(idx: np.ndarray, n_polys: int, verts: int, radius: float,
                 seed: int) -> PolygonArray:
    cx, cy = _dense_params(idx, n_polys, verts, radius, seed)
    ang = np.linspace(0.0, 2 * np.pi, verts, endpoint=False)
    ring = np.column_stack([np.cos(ang), np.sin(ang)]) * radius
    n = len(idx)
    closed = np.empty((n, verts + 1, 2))
    closed[:, :verts, 0] = cx[:, None] + ring[None, :, 0]
    closed[:, :verts, 1] = cy[:, None] + ring[None, :, 1]
    closed[:, verts] = closed[:, 0]
    return PolygonArray(
        closed.reshape(-1, 2),
        np.arange(n + 1, dtype=np.int64) * (verts + 1),
        np.arange(n + 1, dtype=np.int64),
    )


def dense_layer_dataset(n_polys: int = 4000, verts: int = 32,
                        radius: float = 1.5, seed: int = 7,
                        parallelism: int = -1):
    """Arbitrarily large synthetic polygon layer as a lazy Dataset —
    ``ray.data.range`` → per-batch polygon generation, so a 10M-footprint
    layer never exists in one place (the ≥160k-poly bench path)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy().astype(np.int64)
        polys = _dense_polys(idx, n_polys, verts, radius, seed)
        b = polys.bounds()
        return pa.table(
            {
                "poly_id": pa.array(idx),
                "xmin": pa.array(b[:, 0]),
                "ymin": pa.array(b[:, 1]),
                "xmax": pa.array(b[:, 2]),
                "ymax": pa.array(b[:, 3]),
                "side": pa.array(b[:, 2] - b[:, 0]),
                "geom": polys.to_blobs(),
            }
        )

    kw = {"override_num_blocks": parallelism} if parallelism > 0 else {}
    return ray.data.range(n_polys, **kw).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


def dense_layer_collect(n_polys: int = 4000, verts: int = 32,
                        radius: float = 1.5, seed: int = 7) -> Layer:
    """Driver-side Layer identical to ``dense_layer_dataset``'s rows
    (parity-test / broadcast-path mirror of the same formulas)."""
    idx = np.arange(n_polys, dtype=np.int64)
    polys = _dense_polys(idx, n_polys, verts, radius, seed)
    b = polys.bounds()
    return Layer(poly_ids=idx, bounds=b, sides=b[:, 2] - b[:, 0], polys=polys)


# --- SQL mirrors (DuckDB oracle) -----------------------------------------

SQL_IMAGES = """
SELECT 'img' || CAST(event_id AS VARCHAR) AS image_id,
       ((event_id * 9973) % 100000) / 1000.0 AS x,
       ((event_id * 7919) % 100000) / 1000.0 AS y,
       event_type || ' #' || CAST(event_id AS VARCHAR) AS caption
FROM events
"""

SQL_LAYER = """
SELECT n_nationkey AS poly_id,
       (n_nationkey % 5) * 20.0 + 1.5 AS xmin,
       floor(n_nationkey / 5.0) * 20.0 + 1.5 AS ymin,
       (n_nationkey % 5) * 20.0 + 1.5 + 13.0 AS xmax,
       floor(n_nationkey / 5.0) * 20.0 + 1.5 + 13.0 AS ymax,
       13.0 AS side
FROM nation
UNION ALL
SELECT 100 + r_regionkey,
       r_regionkey * 17.0 + 1.0,
       r_regionkey * 13.0 + 2.0,
       r_regionkey * 17.0 + 1.0 + 25.0,
       r_regionkey * 13.0 + 2.0 + 25.0,
       25.0
FROM region
"""
