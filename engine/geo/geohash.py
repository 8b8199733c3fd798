"""Geohash cell ids (the public base-32 standard), fully vectorized.

Geohash interleaves the binary bisection bits of longitude (first) and
latitude into 5-bit groups mapped through the standard alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.  The n-bit bisection prefix of a
coordinate equals the single-multiply quantization
``floor((v - lo) / range · 2^n)`` (binary expansion of the fraction),
so the whole encode is two quantizations + one Morton bit-dilation +
a fixed-width byte gather — no per-row loop, and every step is plain
integer/IEEE arithmetic a SQL oracle can reproduce verbatim (the same
magic-mask dilation chain as engine/ops/zorder.py).

Validated against the published reference vector
(57.64911, 10.40744) → "u4pruydqqvj" (en.wikipedia.org/wiki/Geohash)
at every precision 1..11, plus prefix-nesting property tests.  This is
the engine's bit-exact PUBLIC cell-id standard alongside the genuine
S2 ids (engine/geo/cells.py); the H3 ladder remains H3-STYLE (the
Uber-H3 base-cell tables aren't reproducible offline — documented)."""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_BYTES = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def dilate2(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def geohash_code(lat: np.ndarray, lng: np.ndarray,
                 precision: int) -> np.ndarray:
    """Integer geohash code (the 5·precision interleaved bits) as
    int64.  Longitude's first bisection bit is the code's MSB (the
    standard starts with a longitude bisection and alternates)."""
    nbits = 5 * precision
    nlng = (nbits + 1) // 2
    nlat = nbits // 2
    lngq = np.floor((np.asarray(lng, dtype=np.float64) + 180.0)
                    / 360.0 * float(1 << nlng)).astype(np.int64)
    latq = np.floor((np.asarray(lat, dtype=np.float64) + 90.0)
                    / 180.0 * float(1 << nlat)).astype(np.int64)
    np.clip(lngq, 0, (1 << nlng) - 1, out=lngq)
    np.clip(latq, 0, (1 << nlat) - 1, out=latq)
    # the code's MSB (bit nbits−1) is always longitude's first bisection
    # bit: odd nbits → lng at even positions from the LSB; even nbits →
    # lng at odd positions
    if nbits % 2:
        code = dilate2(lngq.astype(np.uint64)) | (
            dilate2(latq.astype(np.uint64)) << np.uint64(1))
    else:
        code = (dilate2(lngq.astype(np.uint64)) << np.uint64(1)) | \
            dilate2(latq.astype(np.uint64))
    return code.view(np.int64)


def geohash_encode(lat: np.ndarray, lng: np.ndarray,
                   precision: int = 5) -> np.ndarray:
    """Geohash strings (numpy unicode array) at the given precision."""
    code = geohash_code(lat, lng, precision).view(np.uint64)
    n = len(code)
    out = np.empty((n, precision), dtype=np.uint8)
    for i in range(precision):  # loop over CHARS (≤12), not rows
        shift = np.uint64(5 * (precision - 1 - i))
        out[:, i] = _ALPHA_BYTES[
            ((code >> shift) & np.uint64(31)).astype(np.int64)]
    return (np.ascontiguousarray(out).view(f"S{precision}")
            .reshape(n).astype(f"U{precision}"))
