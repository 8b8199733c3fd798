"""WKB encode/decode (reference: shapely/io.py:119 `to_wkb`, :313
`from_wkb`; C kernels src/ufuncs.c:1736,1934).

Implements the OGC WKB spec for the 8 2-D geometry types, both byte
orders, hex output, and the reference's flavor distinction:
- "iso": type codes are base + 1000*Z + 2000*M (+3000 for ZM);
- "extended": EWKB flag bits (Z=0x80000000, M=0x40000000) — identical to
  "iso" for 2-D SRID-less output, differing exactly when Z/M present
  (io.py:157-164).  Both variants (and the EWKB SRID flag) are accepted
  on read.

POINT EMPTY is written as POINT (NaN NaN) exactly like the reference
(io.py:144-148); on read a NaN-NaN point becomes POINT EMPTY.
"""

from __future__ import annotations

import struct

import numpy as np

from engine.geo.geom import Geom, GeomType

_TYPES_WITH_COORDSEQ = (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING)


def _encode_geom(g: Geom, order: str, flavor: str = "iso",
                 srid: int | None = None) -> bytes:
    bo = "<" if order == "little" else ">"
    lead = b"\x01" if order == "little" else b"\x00"
    t = g.type_id
    dim = 2 + int(g.has_z) + int(g.has_m)

    def type_code(base: int) -> int:
        if flavor == "extended":
            # EWKB flag bits (PostGIS): Z=0x80000000, M=0x40000000,
            # SRID=0x20000000 (top-level only)
            code = base
            if g.has_z:
                code |= 0x80000000
            if g.has_m:
                code |= 0x40000000
            if srid is not None:
                code |= 0x20000000
            return code
        # ISO offsets: +1000 Z, +2000 M, +3000 ZM (io.py:157 flavor note)
        return base + 1000 * int(g.has_z) + 2000 * int(g.has_m)

    def u32(v):
        return struct.pack(bo + "I", v)

    srid_body = u32(srid) if srid is not None else b""

    def coords(c: np.ndarray) -> bytes:
        arr = np.ascontiguousarray(c, dtype=np.float64)
        if order == "big":
            arr = arr.astype(">f8")
        return arr.tobytes()

    if t == GeomType.POINT:
        xy = g.xys if len(g.xys) else np.full((1, dim), np.nan)
        return lead + u32(type_code(1)) + srid_body + coords(xy[0])
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return lead + u32(type_code(2)) + srid_body + u32(len(g.xys)) + coords(g.xys)
    if t == GeomType.POLYGON:
        rings = [r for r in g.rings]
        body = u32(len(rings))
        for r in rings:
            body += u32(len(r)) + coords(r)
        return lead + u32(type_code(3)) + srid_body + body
    if t in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON,
             GeomType.GEOMETRYCOLLECTION):
        code = {GeomType.MULTIPOINT: 4, GeomType.MULTILINESTRING: 5,
                GeomType.MULTIPOLYGON: 6, GeomType.GEOMETRYCOLLECTION: 7}[t]
        body = u32(len(g.parts))
        for p in g.parts:
            body += _encode_geom(p, order, flavor)
        return lead + u32(type_code(code)) + srid_body + body
    raise ValueError(f"cannot encode {t}")


def _decode_geom(buf: memoryview, pos: int) -> tuple[Geom, int]:
    order = "<" if buf[pos] == 1 else ">"
    (raw_code,) = struct.unpack_from(order + "I", buf, pos + 1)
    pos += 5
    # EWKB flag bits (Z/M/SRID) or ISO +1000/+2000/+3000 offsets
    has_z = bool(raw_code & 0x80000000)
    has_m = bool(raw_code & 0x40000000)
    srid = None
    if raw_code & 0x20000000:  # EWKB SRID flag: read srid
        (srid,) = struct.unpack_from(order + "I", buf, pos)
        pos += 4
    base = raw_code & 0x1FFFFFFF
    if base >= 1000:  # ISO offsets: 1000=Z, 2000=M, 3000=ZM
        iso = base // 1000
        has_z = has_z or iso in (1, 3)
        has_m = has_m or iso in (2, 3)
        base = base % 1000
    code = base
    dim = 2 + int(has_z) + int(has_m)

    def read_coords(n):
        nonlocal pos
        arr = np.frombuffer(buf, dtype=order + "f8", count=n * dim, offset=pos)
        pos += n * dim * 8
        return np.ascontiguousarray(arr.reshape(n, dim), dtype=np.float64)

    def u32():
        nonlocal pos
        (v,) = struct.unpack_from(order + "I", buf, pos)
        pos += 4
        return v

    if code == 1:
        c = read_coords(1)
        if np.all(np.isnan(c)):
            return Geom(GeomType.POINT, has_z=has_z, has_m=has_m), pos
        return Geom(GeomType.POINT, xys=c, has_z=has_z, has_m=has_m), pos
    if code == 2:
        n = u32()
        g = (
            Geom(GeomType.LINESTRING, xys=read_coords(n), has_z=has_z, has_m=has_m)
            if n
            else Geom(GeomType.LINESTRING, has_z=has_z, has_m=has_m)
        )
        return g, pos
    if code == 3:
        nrings = u32()
        rings = []
        for _ in range(nrings):
            rings.append(read_coords(u32()))
        g = (
            Geom(GeomType.POLYGON, rings=rings, has_z=has_z, has_m=has_m)
            if rings
            else Geom(GeomType.POLYGON, has_z=has_z, has_m=has_m)
        )
        return g, pos
    if code in (4, 5, 6, 7):
        t = {4: GeomType.MULTIPOINT, 5: GeomType.MULTILINESTRING,
             6: GeomType.MULTIPOLYGON, 7: GeomType.GEOMETRYCOLLECTION}[code]
        n = u32()
        parts = []
        for _ in range(n):
            p, pos = _decode_geom(buf, pos)
            parts.append(p)
        if not parts:
            return Geom(t, has_z=has_z, has_m=has_m), pos
        return Geom(t, parts=parts,
                    has_z=any(p.has_z for p in parts),
                    has_m=any(p.has_m for p in parts)), pos
    raise ValueError(f"unsupported WKB type code {raw_code}")


def points_to_wkb_z_np(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Vectorized little-endian ISO WKB for POINT Z columns → (n, 29)
    uint8 (type code 1001) — the 3-D sibling of points_to_wkb_np."""
    x = np.ascontiguousarray(x, dtype="<f8")
    y = np.ascontiguousarray(y, dtype="<f8")
    z = np.ascontiguousarray(z, dtype="<f8")
    n = len(x)
    buf = np.empty((n, 29), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1001), dtype=np.uint8)
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    buf[:, 21:29] = z.view(np.uint8).reshape(n, 8)
    return buf


def points_from_wkb_z_np(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of points_to_wkb_z_np for (n, 29) POINT Z WKB."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8).reshape(-1, 29)
    if len(buf) and not (buf[0, 0] == 1 and int.from_bytes(buf[0, 1:5].tobytes(), "little") == 1001):
        raise ValueError("not little-endian POINT Z WKB")
    x = buf[:, 5:13].copy().view("<f8").reshape(-1)
    y = buf[:, 13:21].copy().view("<f8").reshape(-1)
    z = buf[:, 21:29].copy().view("<f8").reshape(-1)
    return x.astype(np.float64), y.astype(np.float64), z.astype(np.float64)


def points_to_wkb_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized little-endian WKB for point columns → (n, 21) uint8.

    The batch hot path of the `from_wkt`/`to_wkb` family (SURVEY §2.1):
    no per-row Python, just byte views — feed to
    ``pa.Array.from_buffers(pa.binary(21), …)`` for a zero-copy Arrow
    fixed-size-binary column."""
    x = np.ascontiguousarray(x, dtype="<f8")
    y = np.ascontiguousarray(y, dtype="<f8")
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    return buf


def points_from_wkb_np(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of points_to_wkb_np for (n, 21) little-endian point WKB."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8).reshape(-1, 21)
    if len(buf) and not (buf[0, 0] == 1 and buf[0, 1] == 1):
        raise ValueError("not little-endian point WKB")
    x = buf[:, 5:13].copy().view("<f8").reshape(-1)
    y = buf[:, 13:21].copy().view("<f8").reshape(-1)
    return x.astype(np.float64), y.astype(np.float64)


def to_wkb(geometry, hex: bool = False, byte_order: int = 1, flavor: str = "iso",
           include_srid: bool = False):
    """Geometry (or array) → WKB bytes (io.py:119 semantics).

    byte_order: 1 = little (default, io.py:131), 0 = big, -1 = native.
    For 2-D SRID-less data "iso" and "extended" emit identical bytes.
    include_srid=True (requires flavor="extended", io.py:167) writes the
    EWKB SRID flag + value from the geometry's set_srid metadata.
    """
    if flavor not in ("iso", "extended"):
        raise ValueError(f"invalid flavor: {flavor!r}")
    if include_srid and flavor != "extended":
        raise ValueError("include_srid requires flavor='extended'")
    order = {1: "little", 0: "big", -1: "little"}[byte_order]

    def enc(g):
        if g is None:
            return None
        srid = None
        if include_srid:
            srid = int(getattr(g, "_srid", 0))
        b = _encode_geom(g, order, flavor, srid)
        return b.hex().upper() if hex else b

    if isinstance(geometry, Geom) or geometry is None:
        return enc(geometry)
    return np.array([enc(g) for g in geometry], dtype=object)


def from_wkb(data, on_invalid: str = "raise"):
    """WKB bytes/hex (or array) → geometry (io.py:313 semantics)."""
    if on_invalid not in ("raise", "warn", "ignore"):
        raise ValueError(f"invalid on_invalid: {on_invalid!r}")

    def dec(b):
        if b is None:
            return None
        try:
            if isinstance(b, str):
                b = bytes.fromhex(b)
            mv = memoryview(b)
            g, _ = _decode_geom(mv, 0)
            if g is not None and len(b) >= 9:
                (code,) = struct.unpack_from(
                    ("<" if b[0] == 1 else ">") + "I", b, 1
                )
                if code & 0x20000000:
                    (srid,) = struct.unpack_from(
                        ("<" if b[0] == 1 else ">") + "I", b, 5
                    )
                    g._srid = int(srid)  # noqa: SLF001 (engine metadata)
            return g
        except Exception:
            if on_invalid == "raise":
                raise
            if on_invalid == "warn":
                import warnings

                warnings.warn("invalid WKB skipped")
            return None

    if isinstance(data, (bytes, str)) or data is None:
        return dec(data)
    return np.array([dec(b) for b in data], dtype=object)
