"""WebDataset-style tar shard sink/source for the image+caption table.

The training-data packaging format: each shard is a POSIX tar whose
members follow the WebDataset key convention — ``{image_id}.{fmt}`` for
the payload bytes and ``{image_id}.txt`` for the caption.  Payload
bytes go straight from the codec stage to the tar sink (they never ride
a shuffle); shards publish atomically (``.tmp`` + rename) so a
re-run/restart overwrites, never duplicates.

Two entry points:
- ``write_shards`` / ``read_shard_stats``: the streaming sink+source
  pair the ``wds_shards`` query uses (one tar per payload batch).
- ``run_wds_checkpointed``: the RESUMABLE export — key-range shards
  (``event_id % num_shards``) with per-shard lineage manifests through
  ``engine.rayds.ckpt``; a restarted run recomputes only shards whose
  manifest is missing or stale.  This is the north_rule's
  "checkpointed per-partition with lineage + metrics" contract for the
  packaging sink (the parquet pipelines have their own in
  ``pipeline.run_*_checkpointed``).
"""

from __future__ import annotations

import io
import os
import tarfile
import time

import numpy as np
import pyarrow as pa


def write_shard_batch(t: pa.Table, out_dir: str) -> pa.Table:
    """One payload batch → one atomic tar shard + one manifest row."""
    if t.num_rows == 0:
        return pa.table({"shard": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    ids = t["image_id"].to_pylist()
    caps = t["caption"].to_pylist()
    fmts = t["fmt"].to_pylist()
    pays = t["bytes"].to_pylist()
    keynum = min(int(i[3:]) for i in ids)
    path = f"{out_dir}/shard-{keynum:012d}.tar"
    with tarfile.open(path + ".tmp", "w") as tf:
        for i, c, f, p in zip(ids, caps, fmts, pays):
            for name, data in ((f"{i}.{f}", p), (f"{i}.txt", c.encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
    os.replace(path + ".tmp", path)  # atomic publish (resume-safe)
    return pa.table({"shard": pa.array([path]),
                     "n": pa.array([t.num_rows], type=pa.int64())})


def read_shard_stats(path: str) -> pa.Table:
    """Stream one shard's members back into per-format caption stats."""
    caps: dict[str, int] = {}
    fmt_of: dict[str, str] = {}
    with tarfile.open(path) as tf:
        for mem in tf:
            key, ext = mem.name.rsplit(".", 1)
            if ext == "txt":
                caps[key] = mem.size
            else:
                fmt_of[key] = ext
    fmts = sorted(set(fmt_of.values()))
    return pa.table({
        "fmt": pa.array(fmts),
        "n_images": pa.array(
            [sum(1 for v in fmt_of.values() if v == f) for f in fmts],
            type=pa.int64()),
        "sum_caption_chars": pa.array(
            [sum(c for k, c in caps.items() if fmt_of[k] == f)
             for f in fmts], type=pa.int64())})


def run_wds_checkpointed(sf_dir: str, out_dir: str,
                         num_shards: int = 4) -> dict:
    """Resumable tar export over KEY-RANGE shards with lineage manifests.

    Shard ``i`` owns images with ``event_id % num_shards == i`` — a pure
    function of the key, so shard contents are deterministic at any
    parallelism and the union of shard outputs is exactly the full
    export.  Per shard: filter at the derive stage (narrow columns),
    attach payload bytes, write one tar per payload batch into
    ``shard=<i>/``, then publish a manifest (fingerprint = input files
    + slice; metrics = rows, tars, wall seconds).  Returns
    {"computed": [...], "skipped": [...]}.
    """
    from engine.rayds import ckpt
    from engine.rayds.imgstage import PAYLOAD_BATCH

    fingerprint_paths = [f"{sf_dir}/events.parquet"]
    base_fp = ckpt.shard_fingerprint(fingerprint_paths)
    computed, skipped = [], []
    for i in range(num_shards):
        fp = f"{base_fp}:{i}/{num_shards}:wds"
        if ckpt.shard_done(out_dir, i, fp):
            skipped.append(i)
            continue
        t0 = time.perf_counter()
        dest = os.path.join(out_dir, f"shard={i}")
        import shutil

        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest, exist_ok=True)

        import ray.data

        from engine.rayds.imagetab import derive_batch
        from engine.rayds.imgstage import _add_payload_fn

        def in_range(t: pa.Table, i=i) -> pa.Table:
            eid = t["event_id"].to_numpy()
            return t.filter(pa.array(eid % num_shards == i))

        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "event_type"])
        manifest = ev.map_batches(
            in_range, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).map_batches(
            derive_batch, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).map_batches(
            _add_payload_fn, batch_format="pyarrow",
            batch_size=PAYLOAD_BATCH,
        ).map_batches(
            lambda t, d=dest: write_shard_batch(t, d),
            batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
        ).take_all()
        rows = int(sum(r["n"] for r in manifest))
        ckpt.write_manifest(
            out_dir, i, fp, rows, time.perf_counter() - t0,
            extra={"inputs": fingerprint_paths,
                   "slice": [i, num_shards],
                   "tars": len([r for r in manifest if r["n"]])})
        computed.append(i)
    return {"computed": computed, "skipped": skipped}
