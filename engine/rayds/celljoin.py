"""Cell-partitioned (big-big) spatial join — SURVEY §2.4 second shape.

When the polygon layer is too large to broadcast, both sides are
co-partitioned by planar grid cell and joined inside each cell group:

  points:   cell = grid_cell(x, y)                       (1 row each)
  polygons: flat-map exploded to their COVERING cell set (≥1 row each)
  union → groupby(cell) → map_groups vectorized bbox refinement
  → pair table → pair-level dedupe (a pair can match in several cells)

The only all-to-all moves (cell, narrow columns) — never payloads.  The
refinement inside a group is the same vectorized kernel family as the
broadcast path, so the two physical plans produce identical results
(both are oracle-checked against the same SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.geo import cells
from engine.rayds.imagetab import Layer

# partition granularity: coarser than the prefilter cell — each group is
# one shuffle task, so group count trades scheduling overhead against
# candidate-set width (the in-group bbox refine is vectorized and cheap;
# at cluster scale pick ~4-16 groups per reducer slot)
PART_CELL = 20.0


def _points_with_cell(batch: pa.Table) -> pa.Table:
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    return pa.table(
        {
            "cell": pa.array(cells.grid_cell(x, y, PART_CELL)),
            "image_id": batch["image_id"],
            "x": x,
            "y": y,
            # tag: 0 = point row; polygon columns null
            "poly_id": pa.nulls(len(batch), type=pa.int64()),
            "xmin": pa.nulls(len(batch), type=pa.float64()),
            "ymin": pa.nulls(len(batch), type=pa.float64()),
            "xmax": pa.nulls(len(batch), type=pa.float64()),
            "ymax": pa.nulls(len(batch), type=pa.float64()),
        }
    )


def _layer_cover_table(layer: Layer) -> pa.Table:
    """Polygon side, exploded to covering cells (flat_map equivalent)."""
    rows, cids = cells.grid_cover_many(layer.bounds, PART_CELL)
    b = layer.bounds[rows]
    return pa.table(
        {
            "cell": pa.array(cids),
            "image_id": pa.nulls(len(rows), type=pa.string()),
            "x": pa.nulls(len(rows), type=pa.float64()),
            "y": pa.nulls(len(rows), type=pa.float64()),
            "poly_id": pa.array(layer.poly_ids[rows]),
            "xmin": pa.array(b[:, 0]),
            "ymin": pa.array(b[:, 1]),
            "xmax": pa.array(b[:, 2]),
            "ymax": pa.array(b[:, 3]),
        }
    )


def _join_cell_group(group: pa.Table) -> pa.Table:
    """Inside one cell: candidate pairs = points × co-located polygons,
    refined by the covers bbox test (vectorized)."""
    is_poly = group["poly_id"].is_valid()
    polys = group.filter(is_poly)
    pts = group.filter(pa.compute.invert(is_poly))
    if len(polys) == 0 or len(pts) == 0:
        return pa.table({"image_id": pa.array([], type=pa.string()),
                         "poly_id": pa.array([], type=pa.int64())})
    x = pts["x"].to_numpy()
    y = pts["y"].to_numpy()
    xmin = polys["xmin"].to_numpy(zero_copy_only=False)
    ymin = polys["ymin"].to_numpy(zero_copy_only=False)
    xmax = polys["xmax"].to_numpy(zero_copy_only=False)
    ymax = polys["ymax"].to_numpy(zero_copy_only=False)
    hit = (
        (x[:, None] >= xmin[None, :])
        & (x[:, None] <= xmax[None, :])
        & (y[:, None] >= ymin[None, :])
        & (y[:, None] <= ymax[None, :])
    )
    pi, qi = np.nonzero(hit)
    return pa.table(
        {
            "image_id": pts["image_id"].take(pa.array(pi)),
            "poly_id": polys["poly_id"].take(pa.array(qi)),
        }
    )


def cellpart_pairs(sf_dir: str, layer: Layer | None = None):
    """Big-big join: co-partition by cell, join per group.

    NO pair-dedupe pass is needed: only the POLYGON side is exploded to
    covering cells — each point lives in exactly one cell, so a
    (point, polygon) pair can form in at most one group.  (A dedupe
    `groupby((image_id, poly_id))` becomes necessary only when BOTH
    sides are range-exploded, e.g. bbox×bbox joins.)"""
    import ray.data

    from engine.rayds.imagetab import image_dataset, load_layer

    layer = layer or load_layer(sf_dir)
    pts = image_dataset(sf_dir).map_batches(
        _points_with_cell, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    polys = ray.data.from_arrow(_layer_cover_table(layer))
    both = pts.union(polys)
    return both.groupby("cell").map_groups(_join_cell_group, batch_format="pyarrow")
