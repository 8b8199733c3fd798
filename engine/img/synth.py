"""Standalone synthetic image-table generator (input_hint schema).

Writes a parquet file with the full Lance-schema columns
``(image_id, bytes, w, h, fmt, caption, phash)`` plus the geotag
``(x, y)``, deterministic in (rows, seed); cached under /tmp keyed by
(rows, seed) so repeated verify/bench runs reuse the file.  This is the
no-testdata entry point — the driver pipelines normally derive the same
table from ``events.parquet`` (engine/rayds/imagetab.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from engine.img import codec
from engine.rayds.imagetab import derive_xy


def generate_table(rows: int = 10_000, seed: int = 42,
                   cache_dir: str = "/tmp/ray_geo_synth") -> str:
    """Generate (or reuse) the synthetic image table; returns the path."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"images_r{rows}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    eid = rng.permutation(rows).astype(np.int64)
    x, y = derive_xy(eid)
    w = (32 + (eid % 4) * 16).astype(np.int32)
    h = (32 + (eid % 3) * 16).astype(np.int32)
    fmt = np.where(eid % 2 == 0, "raw", "png")
    kinds = np.array(["aerial", "street", "satellite", "drone"])
    ids = [f"img{e}" for e in eid]
    captions = [f"{kinds[e % 4]} scene #{e}" for e in eid]
    payloads = [None] * rows
    hashes = np.empty(rows, dtype=np.int64)
    from engine.rayds.imgstage import _wh_groups

    for idx, wi, hi in _wh_groups(w, h):
        imgs = codec.synth_image_batch([ids[i] for i in idx], wi, hi)
        hashes[idx] = codec.phash64_batch(imgs)
        for j, i in enumerate(idx):
            payloads[i] = (
                imgs[j].tobytes() if fmt[i] == "raw" else codec.png_encode(imgs[j])
            )
    table = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(w),
            "h": pa.array(h),
            "fmt": pa.array(fmt.tolist(), type=pa.string()),
            "caption": pa.array(captions, type=pa.string()),
            "phash": pa.array(hashes, type=pa.int64()),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    import sys

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    print(generate_table(rows))
