"""Actor-pool image payload stages (multimodal column plumbing).

The image ``bytes`` column is OPAQUE to the join (never shuffled,
SURVEY.md §7 "Wide rows"); these stages attach / decode / validate it at
the pipeline edges.  Codec work is per-image Python (zlib) — exactly the
kind of stateful, CPU-bound work an actor pool exists for: small
``batch_size`` (payload-width-bounded, not row-bounded), ``concurrency``
sized to cores, setup in ``__init__``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from engine.img import codec

PAYLOAD_BATCH = 256  # bytes-carrying batches stay small (MB budget, not rows)


def _binary_views(col) -> list:
    """Zero-copy per-row memoryviews of a binary column (no bytes-object
    copies; zlib/np.frombuffer accept the buffer protocol directly)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return []
    wide = pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type)
    odt = np.int64 if wide else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt,
                         count=len(col) + 1,
                         offset=col.offset * np.dtype(odt).itemsize)
    data = memoryview(col.buffers()[2]).cast("B")  # unsigned: so slice
    # content comparisons against bytes literals behave like bytes
    o = offs.tolist()  # python ints: numpy-scalar slice indices are slow
    return [data[o[i]: o[i + 1]] for i in range(len(o) - 1)]


_WH_CHUNK = 64  # images per vectorized chunk: keeps the float64
# intermediates (gray/integral ~0.5 MB per 32×80×80 chunk) cache-resident
# instead of streaming multi-MB arrays through DRAM


def _wh_groups(ws: np.ndarray, hs: np.ndarray):
    """Row indices grouped by (w, h) — the image table has only a few
    distinct sizes, so per-group batched numpy beats per-image Python.
    Yields (idx, w, h) chunks (≤ _WH_CHUNK rows) in ascending row order."""
    key = ws.astype(np.int64) * 100_000 + hs.astype(np.int64)
    for k in np.unique(key):
        idx = np.nonzero(key == k)[0]
        w, h = int(ws[idx[0]]), int(hs[idx[0]])
        for s in range(0, len(idx), _WH_CHUNK):
            yield idx[s : s + _WH_CHUNK], w, h


class AddPayload:
    """image rows → + (bytes, phash): completes the input_hint schema.

    Synth + phash run batched per (w, h) group (vectorized over all
    images of one size); only the per-payload zlib encode stays a loop."""

    def __init__(self):
        pass  # codec is stateless; __init__ kept for actor-pool symmetry

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        payloads = [None] * len(ids)
        hashes = np.empty(len(ids), dtype=np.int64)
        for idx, w, h in _wh_groups(ws, hs):
            imgs = codec.synth_image_batch([ids[i] for i in idx], w, h)
            hashes[idx] = codec.phash64_batch(imgs)
            for j, i in enumerate(idx):
                f = fmts[i]
                if f == "raw":
                    payloads[i] = imgs[j].tobytes()
                elif f == "png":
                    payloads[i] = codec.png_encode(imgs[j])
                else:
                    payloads[i] = codec.qraw_encode(imgs[j])
        return batch.append_column("bytes", pa.array(payloads, type=pa.binary())) \
                    .append_column("phash", pa.array(hashes))


class DecodeValidate:
    """bytes → decode → per-row PSNR vs the reference pixels.

    Implements the input_hint per-row invariant (decoded-pixel allclose;
    PSNR≥40dB for lossy): our codecs are lossless so psnr_ok is exact.
    Unknown formats raise NotImplementedError (documented codec stub).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        data = _binary_views(batch["bytes"])
        ok = np.zeros(len(ids), dtype=bool)
        mean_px = np.zeros(len(ids))
        for idx, w, h in _wh_groups(ws, hs):
            # zlib decode stays per-payload; ref synth + PSNR + mean batch
            imgs = np.empty((len(idx), h, w, 3), dtype=np.uint8)
            for j, i in enumerate(idx):
                imgs[j] = codec.decode_payload(data[i], w, h, fmts[i])
            refs = codec.synth_image_batch([ids[i] for i in idx], w, h)
            ok[idx] = codec.psnr_batch(imgs, refs) >= 40.0
            mean_px[idx] = imgs.reshape(len(idx), -1).mean(axis=1)
        return batch.drop_columns(["bytes"]).append_column(
            "psnr_ok", pa.array(ok)
        ).append_column("mean_px", pa.array(mean_px))


class ResizeExtract:
    """Actor-pool stage: decode → nearest-neighbour resize to a fixed
    thumbnail → feature columns (phash of the thumbnail, mean px).

    The resize itself is pure numpy index striding (no image lib); at
    scale this is the standard decode→resize→featurize preprocessing
    stage with batch_size bounded by payload bytes."""

    def __init__(self, thumb: int = 16):
        self.thumb = int(thumb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        data = _binary_views(batch["bytes"])
        t = self.thumb
        hashes = np.empty(len(ids), dtype=np.int64)
        means = np.empty(len(ids))
        gsums = np.empty(len(ids), dtype=np.int64)
        for idx, w, h in _wh_groups(ws, hs):
            imgs = np.empty((len(idx), h, w, 3), dtype=np.uint8)
            for j, i in enumerate(idx):
                imgs[j] = codec.decode_payload(data[i], w, h, fmts[i])
            yi = (np.arange(t) * h // t).clip(0, h - 1)
            xi = (np.arange(t) * w // t).clip(0, w - 1)
            thumbs = imgs[:, yi[:, None], xi[None, :]]
            hashes[idx] = codec.phash64_batch(thumbs)
            means[idx] = thumbs.reshape(len(idx), -1).mean(axis=1)
            # integer-exact grayscale sum (299R+587G+114B per pixel):
            # the SQL-oracle-checkable feature (no float summation order)
            gsums[idx] = (
                thumbs.astype(np.int64)
                @ np.array([299, 587, 114], dtype=np.int64)
            ).reshape(len(idx), -1).sum(axis=1)
        return batch.drop_columns(["bytes"]).append_column(
            "thumb_phash", pa.array(hashes)
        ).append_column("thumb_mean", pa.array(means)).append_column(
            "thumb_gray_sum", pa.array(gsums)
        )


class Transcode:
    """Actor-pool stage: decode → re-encode every payload in ``to_fmt``.

    The round-trip stage that makes the input_hint per-row invariant
    testable end-to-end: decoded pixels of the transcoded payload must
    stay allclose / PSNR≥40dB vs the original, and every non-payload
    column (caption included) passes through byte-identical."""

    def __init__(self, to_fmt: str = "qraw"):
        self.to_fmt = to_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        data = _binary_views(batch["bytes"])
        out = []
        for w, h, fmt, raw in zip(ws, hs, fmts, data):
            img = codec.decode_payload(raw, int(w), int(h), fmt)
            if self.to_fmt == "png":
                out.append(codec.png_encode(img))
            elif self.to_fmt == "qraw":
                out.append(codec.qraw_encode(img))
            elif self.to_fmt == "raw":
                out.append(img.tobytes())
            else:
                raise NotImplementedError(f"codec {self.to_fmt!r}")
        i = batch.schema.get_field_index("bytes")
        t = batch.set_column(i, "bytes", pa.array(out, type=pa.binary()))
        j = t.schema.get_field_index("fmt")
        return t.set_column(j, "fmt", pa.array([self.to_fmt] * len(t)))


def transcode_dataset(sf_dir: str, to_fmt: str = "qraw", concurrency=None):
    """payload table → transcoded payload table (same schema)."""
    base = payload_dataset(sf_dir, concurrency)
    if concurrency is not None:
        return base.map_batches(
            Transcode, fn_constructor_kwargs={"to_fmt": to_fmt},
            batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    tc = Transcode(to_fmt)
    return base.map_batches(
        lambda b: tc(b), batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


class AddVideo:
    """image rows → + (video_bytes, n_frames): attaches the deterministic
    fake video container (codec.synth_video) — the video sibling of
    AddPayload.  n_frames derives from the row key so the downstream
    frame-sampling output is SQL-oracle-checkable."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        nf = batch["n_frames"].to_numpy()
        # one batched synth for EVERY frame of every row, then split
        frame_ids = [f"{iid}#f{i}" for iid, n in zip(ids, nf) for i in range(int(n))]
        frames = codec.synth_image_batch(frame_ids, 8, 8)
        ends = np.cumsum(nf.astype(np.int64))
        payloads = [
            codec.video_encode(frames[s:e])
            for s, e in zip(np.concatenate([[0], ends[:-1]]), ends)
        ]
        return batch.append_column("video_bytes", pa.array(payloads, type=pa.binary()))


class FrameSample:
    """Actor-pool stage: decode the (fake) video container, sample every
    ``every_n``-th frame, emit one row per sampled frame with its phash.
    The decode is a deterministic fake (no video codec in this sandbox,
    documented); the Ray-side plumbing — payload-bounded batches, per-row
    explode, per-frame featurization — is real and tested."""

    def __init__(self, every_n: int = 3):
        self.every_n = int(every_n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        data = _binary_views(batch["video_bytes"])
        out_id, out_idx, sampled = [], [], []
        for iid, raw in zip(ids, data):
            frames = codec.video_decode(raw, 8, 8)
            sel = range(0, len(frames), self.every_n)
            out_id.extend([iid] * len(sel))
            out_idx.extend(sel)
            sampled.append(frames[:: self.every_n])
        phashes = (
            codec.phash64_batch(np.concatenate(sampled))
            if sampled
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "image_id": pa.array(out_id, type=pa.string()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_phash": pa.array(phashes),
            }
        )


def video_dataset(sf_dir: str, use_cache: bool = True):
    """(image_id, n_frames, video_bytes) — the video container table.

    Like ``payload_dataset``, the deterministic synth containers are the
    pipeline's INPUT (a storage read at real scale), so they materialize
    once per sf_dir under /tmp and read back on later executions."""
    import ray.data

    from engine.rayds.imagetab import image_dataset

    if use_cache:
        cache = _payload_cache_dir(sf_dir) + ".video"
        if not os.path.isdir(cache):
            tmp = f"{cache}.build{os.getpid()}"
            video_dataset(sf_dir, use_cache=False).write_parquet(tmp)
            try:
                os.rename(tmp, cache)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        return ray.data.read_parquet(cache)

    def add_nframes(batch: pa.Table) -> pa.Table:
        import numpy as _np

        eid = pa.compute.utf8_slice_codeunits(batch["image_id"], 3, 32)
        n = _np.asarray(pa.compute.cast(eid, pa.int64()).to_numpy(
            zero_copy_only=False
        ))
        return batch.append_column(
            "n_frames", pa.array((4 + n % 5).astype(_np.int64))
        )

    _addv = AddVideo()
    return (
        image_dataset(sf_dir)
        .select_columns(["image_id"])
        .map_batches(add_nframes, batch_format="pyarrow", batch_size=None)
        .map_batches(lambda b: _addv(b), batch_format="pyarrow",
                     batch_size=PAYLOAD_BATCH)
    )


def frames_dataset(sf_dir: str, every_n: int = 3):
    """videos → frame-sample explode (lazy; container table cached)."""
    _fs = FrameSample(every_n)
    return video_dataset(sf_dir).map_batches(
        lambda b: _fs(b), batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


_ADD = AddPayload()
_VALIDATE = DecodeValidate()
_RESIZE = ResizeExtract()


def _resize_fn(batch: pa.Table) -> pa.Table:
    return _RESIZE(batch)


def features_dataset(sf_dir: str, concurrency=None):
    """payload → decode → resize → features (task-based by default)."""
    base = payload_dataset(sf_dir, concurrency)
    if concurrency is not None:
        return base.map_batches(
            ResizeExtract, batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    return base.map_batches(
        _resize_fn, batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


def _add_payload_fn(batch: pa.Table) -> pa.Table:
    return _ADD(batch)


def _validate_fn(batch: pa.Table) -> pa.Table:
    return _VALIDATE(batch)


# Bump whenever the synth/derive/payload code or the cached schema
# changes — the version is part of the cache key, so stale caches from
# older code are simply never looked up again (they age out of /tmp).
PAYLOAD_FORMAT_VERSION = "v5-md5seed-phash64"
_PAYLOAD_SCHEMA_FP = (
    "image_id:i64,w:i32,h:i32,fmt:str,label:str,bytes:bin,phash:i64"
)


def _cache_root() -> str:
    """Per-user cache root (not a world-shared fixed path): a
    pre-existing directory created by another uid at a predictable
    name can't be trusted as our cache."""
    import getpass
    import tempfile

    try:
        user = getpass.getuser()
    except Exception:
        user = f"uid{os.getuid()}"
    return os.path.join(
        tempfile.gettempdir(), f"ray_geo_payload_cache_{user}"
    )


def _payload_cache_dir(sf_dir: str) -> str:
    """Cache key = (sf_dir realpath, events mtime, payload code version,
    cached schema fingerprint) — code/schema changes invalidate it."""
    real = os.path.realpath(sf_dir)
    try:
        mt = int(os.path.getmtime(os.path.join(real, "events.parquet")))
    except OSError:
        mt = 0
    key = hashlib.md5(
        f"{real}:{mt}:{PAYLOAD_FORMAT_VERSION}:{_PAYLOAD_SCHEMA_FP}".encode()
    ).hexdigest()[:16]
    return os.path.join(_cache_root(), key)


def payload_dataset(sf_dir: str, concurrency=None, use_cache: bool = True):
    """Full input_hint table (with bytes) as a lazy Dataset.

    The payload bytes are the pipeline's INPUT — at real scale they are
    read from the Lance table, not synthesized per query — so the
    deterministic synth output is materialized ONCE per sf_dir as
    partitioned parquet under /tmp and read back on every later
    execution (an atomic dir-rename publishes the cache; concurrent
    builders race benignly).  ``use_cache=False`` forces the generate
    path (the actor-pool demo and the cache builder itself use it).

    Task-based by default (the codec is stateless; elastic task pool
    beats a fixed actor count); pass ``concurrency`` for the actor-pool
    form (the shape a model-loading stage would use)."""
    import ray.data

    from engine.rayds.imagetab import image_dataset

    if use_cache and concurrency is None:
        cache = _payload_cache_dir(sf_dir)
        if not os.path.isdir(cache):
            tmp = f"{cache}.build{os.getpid()}"
            payload_dataset(sf_dir, use_cache=False).write_parquet(tmp)
            try:
                os.rename(tmp, cache)
            except OSError:  # another builder won the race
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        return ray.data.read_parquet(cache)
    if concurrency is not None:
        return image_dataset(sf_dir).map_batches(
            AddPayload, batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    return image_dataset(sf_dir).map_batches(
        _add_payload_fn, batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


def validate_dataset(sf_dir: str, concurrency=None):
    base = payload_dataset(sf_dir, concurrency)
    if concurrency is not None:
        return base.map_batches(
            DecodeValidate, batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
            concurrency=concurrency,
        )
    return base.map_batches(
        _validate_fn, batch_format="pyarrow", batch_size=PAYLOAD_BATCH
    )


def phash_dataset(sf_dir: str):
    """(image_id, phash) only — the lean fingerprint stage for image
    near-dup.  The materialized payload table already carries the phash
    column; read JUST those two columns from it (parquet column pruning —
    at real scale this is the Lance projection, not a recompute).  The
    synth-recompute kernel below remains for explicit no-cache use."""
    import ray.data

    payload_dataset(sf_dir)  # ensure the table is materialized
    return ray.data.read_parquet(
        _payload_cache_dir(sf_dir), columns=["image_id", "phash"]
    )


def _phash_recompute_dataset(sf_dir: str):
    from engine.rayds.imagetab import image_dataset

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        hashes = np.empty(len(ids), dtype=np.int64)
        for idx, w, h in _wh_groups(ws, hs):
            imgs = codec.synth_image_batch([ids[i] for i in idx], w, h)
            hashes[idx] = codec.phash64_batch(imgs)
        return pa.table({"image_id": batch["image_id"],
                         "phash": pa.array(hashes)})

    return image_dataset(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=PAYLOAD_BATCH,
        zero_copy_batch=True)
