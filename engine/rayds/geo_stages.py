"""Ray Data stages exposing the geo kernel families over Arrow columns.

Each stage is a stateless zero-copy `map_batches` kernel (SURVEY §2
"Ray Data mapping" column): serialization (WKB round trip, vectorized
point fast path), affine transform over raw coordinate columns, ragged
polygon measures, and tile clip-rect geometry."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.geo import wkb as wkb_mod
from engine.geo.constructive import clip_by_rect
from engine.geo.geom import Geom
from engine.geo.measure import area as geo_area
from engine.rayds.imagetab import TILE_N, Layer


def wkb_point_encode(batch: pa.Table) -> pa.Table:
    """+ wkb: fixed_size_binary(21) little-endian point WKB (vectorized)."""
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    buf = wkb_mod.points_to_wkb_np(x, y)
    arr = pa.Array.from_buffers(pa.binary(21), len(x), [None, pa.py_buffer(buf.tobytes())])
    return batch.append_column("wkb", arr)


def wkb_point_decode(batch: pa.Table) -> pa.Table:
    """wkb column → x/y columns (vectorized decode; drops the wkb)."""
    col = batch["wkb"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    raw = np.frombuffer(col.buffers()[1], dtype=np.uint8, count=n * 21).reshape(n, 21)
    x, y = wkb_mod.points_from_wkb_np(raw)
    out = batch.drop_columns(["wkb"])
    if "x" in out.column_names:
        out = out.drop_columns(["x"])
    if "y" in out.column_names:
        out = out.drop_columns(["y"])
    return out.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def wkb_pointz_encode(batch: pa.Table) -> pa.Table:
    """+ wkb: fixed_size_binary(29) POINT Z WKB from (x, y, z) columns
    (vectorized; the Z data-plane sibling of wkb_point_encode)."""
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    z = batch["z"].to_numpy()
    buf = wkb_mod.points_to_wkb_z_np(x, y, z)
    arr = pa.Array.from_buffers(
        pa.binary(29), len(x), [None, pa.py_buffer(buf.tobytes())]
    )
    return batch.append_column("wkb", arr)


def wkb_pointz_decode(batch: pa.Table) -> pa.Table:
    """wkb POINT Z column → x/y/z columns (vectorized decode)."""
    col = batch["wkb"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    raw = np.frombuffer(col.buffers()[1], dtype=np.uint8, count=n * 29).reshape(n, 29)
    x, y, z = wkb_mod.points_from_wkb_z_np(raw)
    out = batch.drop_columns(["wkb"])
    for c in ("x", "y", "z"):
        if c in out.column_names:
            out = out.drop_columns([c])
    return (
        out.append_column("x", pa.array(x))
        .append_column("y", pa.array(y))
        .append_column("z", pa.array(z))
    )


def affine_xy(a=1.0, b=0.0, d=0.0, e=1.0, xoff=0.0, yoff=0.0):
    """Stateless affine stage over raw x/y columns (affinity.py:12
    equations, vectorized columnar form)."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        nx = a * x + b * y + xoff
        ny = d * x + e * y + yoff
        out = batch.drop_columns(["x", "y"])
        return out.append_column("x", pa.array(nx)).append_column("y", pa.array(ny))

    return fn


def layer_tile_clip_areas(layer: Layer) -> pa.Table:
    """(poly_id, tile_id, clip_area) for every polygon × 4×4 tile rect,
    computed with the REAL clip_by_rect kernel (constructive.py:380) —
    driver-side small table; the DuckDB oracle recomputes the areas with
    rectangle-intersection arithmetic."""
    rows_p, rows_t, rows_a = [], [], []
    for i, pid in enumerate(layer.poly_ids):
        b = layer.bounds[i]
        side4 = layer.sides[i] / TILE_N
        g = Geom.box(b[0], b[1], b[2], b[3])
        for ty in range(TILE_N):
            for tx in range(TILE_N):
                rect = (
                    b[0] + tx * side4,
                    b[1] + ty * side4,
                    b[0] + (tx + 1) * side4,
                    b[1] + (ty + 1) * side4,
                )
                clipped = clip_by_rect(g, *rect)
                a = 0.0 if clipped.is_empty else float(geo_area(clipped))
                rows_p.append(int(pid))
                rows_t.append(ty * TILE_N + tx)
                rows_a.append(a)
    return pa.table(
        {
            "poly_id": pa.array(rows_p, type=pa.int64()),
            "tile_id": pa.array(rows_t, type=pa.int64()),
            "clip_area": pa.array(rows_a),
        }
    )
