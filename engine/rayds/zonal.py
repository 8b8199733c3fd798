"""Zonal statistics (raster × vector analytics): per-polygon aggregates
over the DECODED pixels of every image whose geotag the polygon covers —
the classic raster-analytics op of a tiling engine (mean reflectance per
district, cloud fraction per admin area, ...).

Scale shape (the 100-TB decomposition):

1. **Pixel stats per image** — payload-bounded decode batches
   (``PAYLOAD_BATCH`` rows so bytes × concurrency fits worker heaps)
   reduce each image to 4 narrow int64 numbers; the payload bytes never
   leave the decode stage, and never ride a shuffle.
2. **Pairs** (image_id, poly_id) from the standard two-phase
   cell-prefilter + exact PIP join (`engine/rayds/pipeline.py`).
3. **Pairs ⋈ stats** on image_id via the adaptive equi-join — narrow
   rows only.
4. **Combiner-first grouped_agg per poly_id** (sum/min/max partials →
   tree fold; a layer's polygon count is small by definition, so the
   final merge is one tiny block — NO all-to-all anywhere past the
   join's own exchange).

Zonal mean = sum(px_sum) / sum(px_cnt): one fixed float division per
polygon over exact int64 sums, so the result is partitioning- and
order-invariant (no float accumulation anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.img import codec
from engine.rayds.imgstage import PAYLOAD_BATCH, _binary_views, _wh_groups


class PixelStats:
    """bytes → decode → (px_sum, px_cnt, px_min, px_max) per image.

    Decode runs per (w, h) group so the PSNR-grade kernels stay batched;
    the zlib inflate stays per-payload (inherent to the codec).  Stats
    are exact int64 — safe for any image size up to 2^55 pixels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"]
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        data = _binary_views(batch["bytes"])
        n = batch.num_rows
        s = np.zeros(n, dtype=np.int64)
        c = np.zeros(n, dtype=np.int64)
        lo = np.zeros(n, dtype=np.int64)
        hi = np.zeros(n, dtype=np.int64)
        for idx, w, h in _wh_groups(ws, hs):
            imgs = np.stack(
                [codec.decode_payload(data[i], w, h, fmts[i]) for i in idx]
            )
            flat = imgs.reshape(len(idx), -1).astype(np.int64)
            s[idx] = flat.sum(axis=1)
            c[idx] = flat.shape[1]
            lo[idx] = flat.min(axis=1)
            hi[idx] = flat.max(axis=1)
        return pa.table({"image_id": ids, "px_sum": pa.array(s),
                         "px_cnt": pa.array(c), "px_min": pa.array(lo),
                         "px_max": pa.array(hi)})


def _pixel_stats_fn(batch: pa.Table) -> pa.Table:
    return _STATS(batch)


_STATS = PixelStats()


def zonal_stats(sf_dir: str, predicate: str = "covers", concurrency=None):
    """→ Dataset (poly_id, n_images, n_px, sum_px, min_px, max_px,
    mean_px) — one row per polygon that covers ≥1 image geotag."""
    from engine.rayds import pipeline
    from engine.rayds.imgstage import payload_dataset
    from engine.rayds.shuffle import equi_join, grouped_agg

    if concurrency is not None:
        stats = payload_dataset(sf_dir, concurrency).map_batches(
            PixelStats, batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    else:
        stats = payload_dataset(sf_dir).map_batches(
            _pixel_stats_fn, batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
        )
    pairs = pipeline.pairs_dataset(sf_dir, predicate).select_columns(
        ["image_id", "poly_id"]
    )
    joined = equi_join(pairs, stats, "image_id", "image_id",
                       ["poly_id"], ["px_sum", "px_cnt", "px_min", "px_max"])

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    agg = grouped_agg(
        joined.map_batches(one, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True),
        ["poly_id"],
        [("_one", "sum"), ("px_cnt", "sum"), ("px_sum", "sum"),
         ("px_min", "min"), ("px_max", "max")],
        ["n_images", "n_px", "sum_px", "min_px", "max_px"],
        plan="tree",
    )

    def mean(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("mean_px", pa.array([], pa.float64()))
        m = (batch["sum_px"].to_numpy(zero_copy_only=False)
             / batch["n_px"].to_numpy(zero_copy_only=False).astype(np.float64))
        return batch.append_column("mean_px", pa.array(m))

    return agg.map_batches(mean, batch_format="pyarrow", batch_size=None)
