"""Per-cell raster tile materialization (north_rule: "raster tiles are
materialized per cell").

Pipeline: join pairs (carrying the image payload) → groupby
(poly_id, tile_id) → `map_groups` mosaic builder — each tile renders an
8×8-per-image grid mosaic PNG from its member images' decoded pixels,
plus membership metadata.  Wide `bytes` columns enter ONLY here, after
the narrow join decided membership (SURVEY §7 "Wide rows"): the payload
is attached by re-deriving from image_id (deterministic synth), exactly
how a production pipeline would re-join bytes by key at the edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.img import codec
from engine.rayds.imagetab import TILE_N, Layer


MAX_MEMBERS = 64  # mosaic shows at most 8×8 members (smallest image_ids)


def _mosaic_partial(batch: pa.Table) -> pa.Table:
    """COMBINER stage over join-pair batches: per (poly, tile) emit the
    ≤64 smallest member ids (candidate rows, _pcnt=0) plus one partial
    count row (image_id null, _pcnt=n).  The global 64 smallest are a
    subset of the union of per-batch 64 smallest, so the shuffle moves
    O(64 × groups × blocks) narrow rows instead of every pair — and the
    finalize stage synthesizes payloads only for actual mosaic members.

    Per-group top-K via ONE lexsort + run-slice ranks (the same
    lexsort-slice bucket primitive the LSH stages use) — no pandas."""
    pid = batch["poly_id"].to_numpy()
    tid = batch["tile_id"].to_numpy()
    iid = batch["image_id"].to_numpy(zero_copy_only=False)
    n = len(pid)
    # combined group key: tile_id is a small per-polygon index (< 64)
    k = pid * np.int64(64) + tid
    order = np.lexsort((iid, k))
    ks = k[order]
    new = np.ones(n, dtype=bool)
    new[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(new)[0]
    runlen = np.diff(np.append(starts, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen)
    cand_idx = order[rank < MAX_MEMBERS]
    heads = order[starts]
    return pa.table(
        {
            "poly_id": pa.array(np.concatenate([pid[cand_idx], pid[heads]])),
            "tile_id": pa.array(np.concatenate([tid[cand_idx], tid[heads]])),
            "image_id": pa.concat_arrays(
                [
                    batch["image_id"].take(pa.array(cand_idx)).combine_chunks(),
                    pa.nulls(len(heads), type=pa.string()),
                ]
            ),
            "_pcnt": pa.array(
                np.concatenate(
                    [np.zeros(len(cand_idx), dtype=np.int64), runlen.astype(np.int64)]
                )
            ),
        }
    )


def _mosaic_finalize(group: pa.Table) -> pa.Table:
    """One (poly_id, tile_id) group of partials → one mosaic row.

    Mosaic = k×k grid (k = ceil(sqrt(n)), capped 8) of 8×8 mean-color
    patches, PNG-encoded.  Deterministic: members sorted by image_id."""
    if group.num_rows == 0:
        return pa.table({
            "poly_id": pa.array([], type=pa.int64()),
            "tile_id": pa.array([], type=pa.int64()),
            "n_images": pa.array([], type=pa.int64()),
            "mosaic_png": pa.array([], type=pa.binary()),
            "mosaic_w": pa.array([], type=pa.int32()),
            "mosaic_h": pa.array([], type=pa.int32()),
        })
    poly_id = int(group["poly_id"][0].as_py())
    tile_id = int(group["tile_id"][0].as_py())
    n = int(np.sum(group["_pcnt"].to_numpy()))
    ids = sorted(i for i in group["image_id"].to_pylist() if i is not None)
    k = min(8, int(np.ceil(np.sqrt(n))))
    cells = k * k
    patch = 8
    mosaic = np.zeros((k * patch, k * patch, 3), dtype=np.uint8)
    members = ids[:cells]
    if members:
        imgs = codec.synth_image_batch(members, 16, 16)  # re-derived by key
        means = imgs.reshape(len(members), -1, 3).mean(axis=1).astype(np.uint8)
        for i in range(len(members)):
            r, c = divmod(i, k)
            mosaic[r * patch : (r + 1) * patch, c * patch : (c + 1) * patch] = means[i]
    png = codec.png_encode(mosaic)
    return pa.table(
        {
            "poly_id": pa.array([poly_id], type=pa.int64()),
            "tile_id": pa.array([tile_id], type=pa.int64()),
            "n_images": pa.array([n], type=pa.int64()),
            "mosaic_png": pa.array([png], type=pa.binary()),
            "mosaic_w": pa.array([k * patch], type=pa.int32()),
            "mosaic_h": pa.array([k * patch], type=pa.int32()),
        }
    )


def tile_mosaics(sf_dir: str, layer: Layer | None = None):
    """Lazy Dataset of one mosaic per (poly_id, tile_id): combiner-first
    (per-batch top-64 member + count partials), then a small groupby
    finalize that renders the PNG from ≤64 synthesized patches."""
    from engine.rayds import pipeline

    tiles = pipeline.tiles_dataset(sf_dir, layer=layer).select_columns(
        ["image_id", "poly_id", "tile_id"]
    )
    partial = tiles.map_batches(
        _mosaic_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(partial, ["poly_id", "tile_id"],
                                     _mosaic_finalize)


def write_tile_mosaics(sf_dir: str, out_dir: str) -> int:
    """Materialize mosaics as parquet partitioned by poly_id (resumable
    layout: one directory per polygon)."""
    ds = tile_mosaics(sf_dir)
    ds.write_parquet(out_dir, partition_cols=["poly_id"])
    import os

    return sum(len(files) for _, _, files in os.walk(out_dir))


# ------------------------------------------------- raster -> vector
def _region_vectorize(layer_lookup):
    """Per-polygon group fn: lit-tile RASTER (n_images >= 0.9 x the
    polygon's own mean — scale-free threshold) → VECTOR union polygon
    via the overlay engine → integer invariants re-derived FROM the
    vector form (area / edge-length quantization), so the output proves
    the raster→vector path ran."""

    def fn(group: pa.Table) -> pa.Table:
        from engine.geo.set_operations import union_all
        from engine.geo.geom import Geom

        if group.num_rows == 0:
            return pa.table({
                "poly_id": pa.array([], type=pa.int64()),
                "n_lit": pa.array([], type=pa.int64()),
                "boundary_edges": pa.array([], type=pa.int64()),
            })
        poly_id = int(group["poly_id"][0].as_py())
        tid = group["tile_id"].to_numpy()
        n = group["n_images"].to_numpy()
        mu = n.mean()
        lit = tid[n >= 0.9 * mu]
        xmin, ymin, side = layer_lookup(poly_id)
        s4 = side / TILE_N
        tx = lit % TILE_N
        ty = lit // TILE_N
        boxes = [
            Geom.box(xmin + x * s4, ymin + y * s4,
                     xmin + (x + 1) * s4, ymin + (y + 1) * s4)
            for x, y in zip(tx, ty)
        ]
        u = union_all(boxes)
        n_lit = int(round(u.area / (s4 * s4)))
        boundary_edges = int(round(u.length / s4))
        return pa.table(
            {
                "poly_id": pa.array([poly_id], type=pa.int64()),
                "n_lit": pa.array([n_lit], type=pa.int64()),
                "boundary_edges": pa.array([boundary_edges], type=pa.int64()),
            }
        )

    return fn


def tile_region_vectors(sf_dir: str, layer: Layer | None = None):
    """RASTER→VECTOR (north_rule "raster↔vector"): vectorize each
    polygon's lit-tile raster into its union polygon (holes and
    multi-part regions fall out of the overlay), reporting integer
    invariants measured on the vector form.

    Scale shape: rides the combiner-first tile counts (output ≤ P×16
    narrow rows), broadcast layer for tile-box geometry, one ≤16-box
    union per group."""
    import ray

    from engine.rayds import bcast, pipeline
    from engine.rayds.imagetab import load_layer

    layer = layer or load_layer(sf_dir)
    ref = ray.put(
        {int(p): (float(b[0]), float(b[1]), float(s))
         for p, b, s in zip(layer.poly_ids, layer.bounds, layer.sides)}
    )
    counts = pipeline.tile_counts(sf_dir)

    def lookup(poly_id):
        return bcast.cached(ref)[poly_id]

    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(counts, ["poly_id"],
                                     _region_vectorize(lookup))
