"""Image payload codec: deterministic synth, raw/PNG codec, PSNR, phash.

``input_hint`` requires per-row "decoded-pixel allclose (PSNR≥40dB for
lossy) + caption equality".  No image library ships in this sandbox, so
the codec is self-contained: a complete (encode+decode, filters 0–4)
8-bit RGB PNG implementation over stdlib ``zlib``/``struct`` + numpy,
a trivial ``raw`` format, and a deterministic per-image synthesizer
seeded by image_id — both codecs are lossless, so the PSNR check is
exact (∞ dB ≥ 40 dB).  JPEG-style lossy decode is STUBBED
(NotImplementedError) with the Ray-side plumbing (schema, actor stage,
batch sizing) real and tested.

phash = 64-bit average-hash (aHash): 8×8 mean-downsampled grayscale
thresholded at its mean — deterministic, vectorizable, Hamming-friendly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """8-bit RGB (h, w, 3) → PNG bytes (filter 0 rows, zlib deflate)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per row
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter_row(f: int, cur: np.ndarray, prev: np.ndarray, bpp: int = 3) -> np.ndarray:
    """Undo one PNG row filter.  Types 0/2 are vectorized; 1 (Sub) uses a
    per-channel-lane modular cumsum; 3/4 carry a true left dependency and
    fall back to a pixel scan (we never emit them; decode-only)."""
    n = len(cur)
    if f == 0:
        return cur.copy()
    if f == 2:  # Up
        return cur + prev
    if f == 1:  # Sub: out[i] = cur[i] + out[i-bpp]  → lane-wise cumsum mod 256
        out = cur.copy()
        for lane in range(bpp):
            out[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.uint64).astype(np.uint8)
        return out
    out = np.zeros(n, dtype=np.uint8)
    for i in range(n):
        a = int(out[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if f == 3:  # Average
            out[i] = (int(cur[i]) + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            p = a + b - c
            pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            out[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8.  Supports 8-bit RGB, filters 0–4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, _h, bit, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit != 8 or color != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(
        zlib.decompress(idat[0] if len(idat) == 1 else b"".join(idat)),
        dtype=np.uint8,
    )
    rows = raw.reshape(-1, 1 + w * 3)
    h = rows.shape[0]
    filters = rows[:, 0]
    if not filters.any():
        # all-filter-0 fast path (everything our own encoder emits):
        # the pixel data is just the row bytes — zero per-row Python
        return np.ascontiguousarray(rows[:, 1:]).reshape(h, w, 3)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for r in range(h):
        prev = out[r - 1] if r > 0 else np.zeros(w * 3, dtype=np.uint8)
        out[r] = _unfilter_row(int(filters[r]), rows[r, 1:], prev)
    return out.reshape(h, w, 3)


_SYNTH_MIX = np.uint64(0x9E3779B97F4A7C15)


def _synth_hash(seed: int, n: int, lo: int, hi: int) -> np.ndarray:
    """Deterministic pseudo-random uint8 stream from a seed (SplitMix64
    lane mix — ~10× cheaper than spinning up a PCG per image, which
    dominated the per-frame video path)."""
    x = np.arange(n, dtype=np.uint64)
    x += np.uint64(seed)
    x *= _SYNTH_MIX
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x %= np.uint64(hi - lo)
    out = x.astype(np.uint8)
    out += np.uint8(lo)
    return out


def synth_image(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB image from the image_id (stable across runs).

    Seed rule = the md5 digest's top 32 bits (first 8 hex chars) — the
    one 32-bit id hash both numpy (vhash) and a SQL oracle (DuckDB
    ``md5()`` prefix cast) can reproduce bit-exactly, which makes
    integer features of synth pixels oracle-checkable end-to-end."""
    import hashlib

    seed = int(hashlib.md5(image_id.encode()).hexdigest()[:8], 16)
    base = _synth_hash(seed, 48, 0, 224).reshape(4, 4, 3)
    # upsample a 4×4 palette to (h, w) — structured, compressible content
    yi = (np.arange(h) * 4 // max(h, 1)).clip(0, 3)
    xi = (np.arange(w) * 4 // max(w, 1)).clip(0, 3)
    img = base[yi[:, None], xi[None, :]]
    noise = _synth_hash(seed ^ 0x5A5A5A5A, h * w, 0, 32).reshape(h, w, 1)
    # base < 224 and noise < 32 ⇒ the sum fits uint8 with no clipping —
    # pure uint8 arithmetic (the int32 temp + clip dominated this stage)
    img += noise
    return img


def synth_seeds(image_ids) -> np.ndarray:
    """md5-top-32 seeds for a list of image_ids (the scalar synth seed
    rule, vectorized via the numpy MD5 kernel)."""
    import pyarrow as pa

    from engine.ops.vhash import md5_digest_words

    w = md5_digest_words(pa.array(list(image_ids), type=pa.string()))
    u = ((w[:, 1].astype(np.uint64) << np.uint64(32)) | w[:, 0].astype(np.uint64))
    return u.byteswap() >> np.uint64(32)


def _synth_hash_batch(seeds: np.ndarray, n: int, lo: int, hi: int) -> np.ndarray:
    """(k,) seeds → (k, n) uint8 streams; bit-identical to _synth_hash
    per row (same SplitMix64 lane arithmetic, vectorized over images)."""
    x = np.arange(n, dtype=np.uint64)[None, :] + seeds[:, None]
    x *= _SYNTH_MIX
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x %= np.uint64(hi - lo)
    out = x.astype(np.uint8)
    out += np.uint8(lo)
    return out


def synth_image_batch(image_ids, w: int, h: int) -> np.ndarray:
    """Batched synth_image for images sharing one (w, h): (k, h, w, 3).

    Bit-identical to stacking synth_image per id — the per-image loops in
    the payload stages group rows by (w, h) (only a handful of distinct
    sizes) and call this instead."""
    seeds = synth_seeds(image_ids)
    base = _synth_hash_batch(seeds, 48, 0, 224).reshape(-1, 4, 4, 3)
    yi = (np.arange(h) * 4 // max(h, 1)).clip(0, 3)
    xi = (np.arange(w) * 4 // max(w, 1)).clip(0, 3)
    img = base[:, yi[:, None], xi[None, :]]
    noise = _synth_hash_batch(
        seeds ^ np.uint64(0x5A5A5A5A), h * w, 0, 32
    ).reshape(-1, h, w, 1)
    # base < 224, noise < 32 ⇒ uint8-safe sum, no clip (see synth_image)
    img += noise
    return img


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(k,h,w,3) vs (k,h,w,3) → (k,) PSNR dB (inf where identical).

    Integer path: per-pixel squared diffs fit int32 and their per-image
    sums fit int64 exactly, and every partial sum is < 2^53, so the
    float64 mse equals the float path bit for bit at 1/4 the memory
    traffic."""
    d = a.astype(np.int16) - b.astype(np.int16)
    d32 = d.astype(np.int32)
    k = d32.shape[0]
    sums = (d32 * d32).reshape(k, -1).sum(axis=1, dtype=np.int64)
    mse = sums / float(d32[0].size if k else 1)
    out = np.full(k, np.inf)
    nz = mse > 0
    out[nz] = 10.0 * np.log10(255.0 * 255.0 / mse[nz])
    return out


def phash64_batch(imgs: np.ndarray) -> np.ndarray:
    """Batched phash64 over (k, h, w, 3) same-size images → (k,) int64.

    Identical arithmetic to the scalar (per-image cumsum rows are
    independent, mean order per image unchanged)."""
    k, h, w, _ = imgs.shape
    gray = imgs.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    ys = np.linspace(0, h, 9).astype(np.int64)
    xs = np.linspace(0, w, 9).astype(np.int64)
    ys2 = np.maximum(ys[1:], ys[:-1] + 1)
    xs2 = np.maximum(xs[1:], xs[:-1] + 1)
    # block sums via the integral image, cumsum kept in gray's buffer
    # shape (no (h+1, w+1) zero-padded copy — the old allocation + two
    # out-of-place cumsums dominated the stage)
    np.cumsum(gray, axis=1, out=gray)
    np.cumsum(gray, axis=2, out=gray)

    def at(yy, xx):
        """integral-image value I[yy, xx] with virtual zero row/col 0."""
        out = np.zeros((k, len(yy), len(xx)))
        ym = yy > 0
        xm = xx > 0
        if ym.any() and xm.any():
            sub = gray[:, (yy[ym] - 1)[:, None], (xx[xm] - 1)[None, :]]
            out[:, np.ix_(ym, xm)[0], np.ix_(ym, xm)[1]] = sub
        return out

    s = at(ys2, xs2) - at(ys[:-1], xs2) - at(ys2, xs[:-1]) + at(ys[:-1], xs[:-1])
    area = (ys2 - ys[:-1])[:, None] * (xs2 - xs[:-1])[None, :]
    grid = s / area
    bits = grid > grid.mean(axis=(1, 2), keepdims=True)
    vals = bits.reshape(k, 64).astype(np.uint64) @ (
        np.uint64(1) << np.arange(64, dtype=np.uint64)
    )
    return vals.view(np.int64)


def qraw_encode(img: np.ndarray, bits: int = 6) -> bytes:
    """LOSSY toy codec: uniform quantization to ``bits`` bits/channel +
    deflate.  With 6 bits the reconstruction error is ≤2/channel
    (MSE = 1.5 → PSNR ≈ 46.4 dB), so the input_hint "PSNR≥40dB for
    lossy" branch is exercised by a real lossy round-trip."""
    shift = 8 - bits
    q = (np.ascontiguousarray(img, dtype=np.uint8) >> shift)
    return zlib.compress(q.tobytes(), 6)


def qraw_decode(data: bytes, w: int, h: int, bits: int = 6) -> np.ndarray:
    shift = 8 - bits
    q = np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w, 3)
    # mid-rise reconstruction: centre of each quantization bin.  With
    # bits=6 the max is (63<<2)+2 = 254, so pure uint8 arithmetic is
    # exact and clip-free (the int32 temp dominated the decode loop).
    out = q << np.uint8(shift)
    out += np.uint8(1 << (shift - 1))
    return out


def encode_payload(image_id: str, w: int, h: int, fmt: str) -> bytes:
    img = synth_image(image_id, w, h)
    if fmt == "raw":
        return img.tobytes()
    if fmt == "png":
        return png_encode(img)
    if fmt == "qraw":
        return qraw_encode(img)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def decode_payload(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "png":
        return png_decode(data)
    if fmt == "qraw":
        return qraw_decode(data, w, h)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def synth_video(image_id: str, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic fake video: (n_frames, h, w, 3) of per-frame synth
    images keyed by (image_id, frame index) — no real video codec ships
    in this sandbox, so the FRAME-SAMPLING plumbing runs on this
    deterministic stand-in (task brief: multimodal decode may be a
    deterministic fake; the Ray-side schema/stage shape is real)."""
    return np.stack(
        [synth_image(f"{image_id}#f{i}", w, h) for i in range(n_frames)]
    )


def video_encode(frames: np.ndarray) -> bytes:
    """Fake video container: deflate of the raw frame stack."""
    return zlib.compress(np.ascontiguousarray(frames, dtype=np.uint8).tobytes(), 1)


def video_decode(data: bytes, w: int, h: int) -> np.ndarray:
    raw = np.frombuffer(zlib.decompress(data), dtype=np.uint8)
    return raw.reshape(-1, h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash64(img: np.ndarray) -> int:
    """64-bit average-hash of an RGB image (8×8 grayscale mean grid).

    Vectorized: the 64 block means come from a prefix-sum (integral
    image) in four gathers; bit packing via a dot product."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(np.int64)
    xs = np.linspace(0, w, 9).astype(np.int64)
    # degenerate tiny images: ensure non-empty blocks like the loop did
    ys2 = np.maximum(ys[1:], ys[:-1] + 1)
    xs2 = np.maximum(xs[1:], xs[:-1] + 1)
    integ = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=integ[1:, 1:])
    s = (
        integ[ys2][:, xs2]
        - integ[ys[:-1]][:, xs2]
        - integ[ys2][:, xs[:-1]]
        + integ[ys[:-1]][:, xs[:-1]]
    )
    area = (ys2 - ys[:-1])[:, None] * (xs2 - xs[:-1])[None, :]
    grid = s / area
    bits = (grid > grid.mean()).reshape(-1)
    val = np.uint64(np.dot(bits.astype(np.uint64), 1 << np.arange(64, dtype=np.uint64)))
    return int(val.view(np.int64))  # signed 64-bit (Arrow int64 column)
