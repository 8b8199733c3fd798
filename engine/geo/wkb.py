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
    if base in (8, 9, 10, 11, 12):  # CircularString..MultiSurface
        raise NotImplementedError(
            "Nonlinear geometry types are not currently supported"
        )
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


def _slice_geom(g: Geom, odim: int) -> Geom:
    """Drop Z/M columns beyond output_dimension (GEOS writer rule:
    3 keeps Z, or M when there is no Z; 4 keeps everything)."""
    keep_z = g.has_z and odim >= 3
    keep_m = g.has_m and (odim >= 4 or (odim >= 3 and not g.has_z))
    if keep_z == g.has_z and keep_m == g.has_m:
        return g

    def cols(c):
        idx = [0, 1]
        w = c.shape[1]
        if keep_z and w > 2:
            idx.append(2)
        if keep_m and w > 2:
            idx.append(w - 1)
        return np.ascontiguousarray(c[:, idx])

    if g.parts:
        return Geom(g.type_id, parts=[_slice_geom(p, odim) for p in g.parts],
                    has_z=keep_z, has_m=keep_m)
    if g.rings:
        return Geom(g.type_id, rings=[cols(r) for r in g.rings],
                    has_z=keep_z, has_m=keep_m)
    return Geom(g.type_id, xys=cols(g.xys) if len(g.xys) else g.xys,
                has_z=keep_z, has_m=keep_m)


def to_wkb(geometry, hex: bool = False, output_dimension: int | None = None,
           byte_order: int = -1, include_srid: bool = False,
           flavor: str = "extended"):
    """Geometry (or array) → WKB bytes (io.py:119 semantics).

    byte_order: 1 = little, 0 = big, -1 = native (little here).
    flavor "extended" (default, EWKB flag bits) or "iso" (+1000/+2000
    type offsets) — identical bytes for 2-D SRID-less data.
    include_srid=True (requires flavor="extended", io.py:167) writes the
    EWKB SRID flag + value from the geometry's set_srid metadata.
    output_dimension (default 4) slices Z/M like the GEOS writer.
    """
    from engine.geo.errors import GEOSException

    if flavor not in ("iso", "extended"):
        raise ValueError(f"invalid flavor: {flavor!r}")
    if include_srid and flavor != "extended":
        raise ValueError(
            "flavor='iso' and include_srid=True cannot be used together"
        )
    if output_dimension is None:
        output_dimension = 4
    if output_dimension not in (2, 3, 4):
        raise GEOSException("Output dimension must be 2, 3 or 4")
    order = {1: "little", 0: "big", -1: "little"}[byte_order]

    def enc(g):
        if g is None:
            return None
        if not isinstance(g, Geom):
            raise TypeError(
                f"Expected a Geometry, got {type(g).__name__}"
            )
        srid = None
        if include_srid:
            srid = int(getattr(g, "_srid", 0))
        b = _encode_geom(_slice_geom(g, output_dimension), order, flavor, srid)
        return b.hex().upper() if hex else b

    if isinstance(geometry, Geom) or geometry is None:
        return enc(geometry)
    if not isinstance(geometry, (list, tuple, np.ndarray)):
        return enc(geometry)  # raises the TypeError with the right name
    return np.array([enc(g) for g in geometry], dtype=object)


def from_wkb(data, on_invalid: str = "raise"):
    """WKB bytes/hex (or array) → geometry (io.py:313 semantics).

    on_invalid: raise | warn | ignore | fix — same structure rules as
    the WKT reader (unclosed rings close under "fix", raise otherwise).
    """
    from engine.geo.errors import GEOSException
    from engine.geo.geom import _wkt_validate

    if on_invalid not in ("raise", "warn", "ignore", "fix"):
        raise ValueError(
            f"{on_invalid!r} is not a valid option for on_invalid: must be "
            "one of 'raise', 'warn', 'ignore' or 'fix'"
        )

    def dec(b):
        if b is None:
            return None
        if not isinstance(b, (bytes, str)):
            raise TypeError(
                f"Expected bytes or string, got {type(b).__name__}"
            )
        try:
            if isinstance(b, str):
                if b == "":
                    raise GEOSException(
                        "ParseException: Unexpected EOF parsing WKB"
                    )
                b = bytes.fromhex(b)
            elif len(b) and b[0] not in (0, 1):
                # hex passed as ASCII bytes (GEOS sniffs the first byte)
                try:
                    b = bytes.fromhex(b.decode("ascii"))
                except (UnicodeDecodeError, ValueError):
                    pass
            if len(b) == 0:
                raise GEOSException(
                    "ParseException: Unexpected EOF parsing WKB"
                )
            mv = memoryview(b)
            try:
                g, _ = _decode_geom(mv, 0)
            except (struct.error, ValueError, IndexError) as e:
                raise GEOSException(f"ParseException: {e}") from e
            out = _wkt_validate(g, fix=(on_invalid == "fix"))
            if out is not None and len(b) >= 9:
                # assign AFTER validation: ring/collection validation
                # rebuilds the object and would drop the metadata slot
                (code,) = struct.unpack_from(
                    ("<" if b[0] == 1 else ">") + "I", b, 1
                )
                if code & 0x20000000:
                    (srid,) = struct.unpack_from(
                        ("<" if b[0] == 1 else ">") + "I", b, 5
                    )
                    out._srid = int(srid)  # noqa: SLF001 (engine metadata)
            return out
        except NotImplementedError:
            raise
        except Exception as e:
            if on_invalid == "raise":
                raise
            if on_invalid == "warn":
                import warnings

                warnings.warn(
                    f"Invalid WKB: {e}", RuntimeWarning, stacklevel=3
                )
            return None

    if isinstance(data, (bytes, str)) or data is None:
        return dec(data)
    if not isinstance(data, (list, tuple, np.ndarray)):
        return dec(data)  # raises the TypeError with the right name
    return np.array([dec(b) for b in data], dtype=object)


def _from_wkb_linearring(data):
    """Unpickle helper: restore ring-ness lost in WKB (no LINEARRING
    type code exists); keeps the SRID metadata slot."""
    g = from_wkb(data)
    from engine.geo.geom import Geom, GeomType

    out = Geom(GeomType.LINEARRING, xys=g.xys, has_z=g.has_z,
               has_m=g.has_m)
    srid = getattr(g, "_srid", 0)
    if srid:
        out._srid = int(srid)
    return out
