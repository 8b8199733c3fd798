"""Scalar geometry objects + WKT I/O.

A lightweight, GEOS-free analogue of the reference's scalar layer
(`shapely/geometry/base.py:98`): a `Geom` is a type id plus numpy coord
arrays.  Used by the conformance suite and by the STRtree refinement path;
the batch hot path operates on ragged columns directly and never builds
scalars (see `engine.geo.prepared` / `engine.geo.vector`).

Type ids mirror `shapely/_geometry.py:42-54` exactly.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field

import numpy as np

from engine.geo import core


class GeomType(enum.IntEnum):
    MISSING = -1
    POINT = 0
    LINESTRING = 1
    LINEARRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7


_WKT_NAMES = {
    GeomType.POINT: "POINT",
    GeomType.LINESTRING: "LINESTRING",
    GeomType.LINEARRING: "LINEARRING",
    GeomType.POLYGON: "POLYGON",
    GeomType.MULTIPOINT: "MULTIPOINT",
    GeomType.MULTILINESTRING: "MULTILINESTRING",
    GeomType.MULTIPOLYGON: "MULTIPOLYGON",
    GeomType.GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}
_NAME_TO_TYPE = {v: k for k, v in _WKT_NAMES.items()}


class CoordinateSequence:
    """Reference coords.py:10 surface: iterable/indexable sequence of
    coordinate tuples with an ``.xy`` array-pair accessor."""

    def __init__(self, coords: np.ndarray):
        self._coords = np.asarray(coords, dtype=np.float64)

    def __len__(self):
        return int(self._coords.shape[0])

    def __iter__(self):
        for row in self._coords:
            yield tuple(float(v) for v in row)

    def __getitem__(self, key):
        if isinstance(key, (int, np.integer)):
            return tuple(float(v) for v in self._coords[key])
        if not isinstance(key, slice):
            raise TypeError("key must be an index or slice")
        return [tuple(float(v) for v in row) for row in self._coords[key]]

    def __array__(self, dtype=None, copy=None):
        a = self._coords
        return a.astype(dtype) if dtype is not None else a

    @property
    def xy(self):
        import array as _array

        return (
            _array.array("d", self._coords[:, 0]),
            _array.array("d", self._coords[:, 1]),
        )

    def __repr__(self):
        return f"<CoordinateSequence {list(self)!r}>"


def _as_coords(coords) -> np.ndarray:
    """Normalize input to (n, w) float64 with w ∈ {2, 3, 4}; flat input
    is interpreted as xy pairs (historical 2-D contract)."""
    c = np.asarray(coords, dtype=np.float64)
    if c.ndim != 2:
        return c.reshape(-1, 2)
    if c.shape[1] < 2 or c.shape[1] > 4:
        raise ValueError(f"coordinates must have 2-4 columns, got {c.shape}")
    return c


def _dims_flags(c: np.ndarray, has_z=None, has_m=None) -> tuple[bool, bool]:
    """Infer (has_z, has_m) from coord width: 3 → XYZ (XYM only when
    has_m is forced, matching WKT 'M' qualifiers), 4 → XYZM."""
    w = c.shape[1] if c.ndim == 2 else 2
    if w == 2:
        return False, False
    if w == 3:
        if has_m and not has_z:
            return False, True
        return True, False
    return True, True


@dataclass(eq=False)
class Geom:
    """Scalar geometry.

    - POINT: ``coords`` shape (1,w), or (0,w) for EMPTY
    - LINESTRING / LINEARRING: ``coords`` shape (n,w)
    - POLYGON: ``rings`` = list of closed (n,w) rings (first == last);
      rings[0] is the shell, the rest holes.  Empty polygon: ``rings=[]``.
    - MULTI* / GEOMETRYCOLLECTION: ``parts`` = list of Geom.

    Coordinate width w = 2 + has_z + has_m with column order x, y, [z],
    [m] (XYM stores m in column 2 with has_z=False).  The ANALYSIS
    decomposition (point_parts/line_parts/polygon_parts/all_coords)
    always yields 2-D xy views — predicates/overlays/measures are planar,
    matching the reference's GEOS semantics (shapely _geometry.py:274-362
    exposes Z/M through accessors and IO, not through predicates).
    """

    type_id: GeomType
    xys: np.ndarray = field(default_factory=lambda: np.empty((0, 2)))
    rings: list = field(default_factory=list)
    parts: list = field(default_factory=list)
    has_z: bool = False
    has_m: bool = False

    @property
    def _geom_prepared(self) -> int:
        """Reference exposes the prepared-GEOS pointer as an int attribute
        (0 = not prepared); user code and tests introspect it."""
        return 1 if getattr(self, "_prepared", False) else 0

    # -- constructors -----------------------------------------------------
    @staticmethod
    def point(x: float, y: float, z: float | None = None,
              m: float | None = None) -> "Geom":
        row = [x, y]
        if z is not None:
            row.append(z)
        if m is not None:
            if z is None:
                row.append(m)  # XYM: m in column 2
            else:
                row.append(m)
        return Geom(
            GeomType.POINT, np.array([row], dtype=np.float64),
            has_z=z is not None, has_m=m is not None,
        )

    @staticmethod
    def linestring(coords, has_z=None, has_m=None) -> "Geom":
        c = _as_coords(coords)
        hz, hm = _dims_flags(c, has_z, has_m)
        return Geom(GeomType.LINESTRING, c, has_z=hz, has_m=hm)

    @staticmethod
    def linearring(coords, has_z=None, has_m=None) -> "Geom":
        c = _as_coords(coords)
        hz, hm = _dims_flags(c, has_z, has_m)
        if len(c) and not np.array_equal(c[0], c[-1]):
            c = np.vstack([c, c[:1]])  # auto-close, as creation.py:236
        return Geom(GeomType.LINEARRING, c, has_z=hz, has_m=hm)

    @staticmethod
    def polygon(shell, holes=(), has_z=None, has_m=None) -> "Geom":
        def close(r):
            r = _as_coords(r)
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            return r

        rings = [close(shell)] + [close(h) for h in holes]
        hz, hm = _dims_flags(rings[0], has_z, has_m) if rings else (False, False)
        return Geom(GeomType.POLYGON, rings=rings, has_z=hz, has_m=hm)

    @staticmethod
    def box(xmin, ymin, xmax, ymax, ccw: bool = True) -> "Geom":
        """Axis-aligned rectangle (reference: creation.py:448)."""
        if ccw:
            ring = [(xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin), (xmax, ymin)]
        else:
            ring = [(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)]
        return Geom(GeomType.POLYGON, rings=[np.asarray(ring, dtype=np.float64)])

    @staticmethod
    def multi(type_id: GeomType, parts: list) -> "Geom":
        parts = list(parts)
        hz = any(p.has_z for p in parts if p is not None)
        hm = any(p.has_m for p in parts if p is not None)
        return Geom(type_id, parts=parts, has_z=hz, has_m=hm)

    @staticmethod
    def collection(parts: list) -> "Geom":
        parts = list(parts)
        hz = any(p.has_z for p in parts if p is not None)
        hm = any(p.has_m for p in parts if p is not None)
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts, has_z=hz, has_m=hm)

    @staticmethod
    def empty(type_id: GeomType = GeomType.GEOMETRYCOLLECTION) -> "Geom":
        return Geom(type_id)

    # -- identity (reference src/pygeom.c:240-300: __eq__ is
    # equals_identical — same type/dims/coords in order, NaN == NaN;
    # __hash__ is the WKB hash, so geometries work in sets/dicts) -------
    def __eq__(self, other):
        if not isinstance(other, Geom):
            return NotImplemented
        if self.type_id == other.type_id and self.is_empty and other.is_empty:
            # reference base.py:1135 — empty comparisons ignore Z/M flags
            # (an empty coordinate sequence equals an empty sequence)
            return True
        if self.has_z != other.has_z or self.has_m != other.has_m:
            return False
        from engine.geo.predicates import equals_identical

        return bool(equals_identical(self, other))

    def __hash__(self):
        from engine.geo.wkb import to_wkb

        return hash(to_wkb(self)) ^ 374761393

    def __reduce__(self):
        """geometry/base.py:190 — pickle as EWKB bytes (LinearRings via
        a ring-restoring loader; WKB has no LINEARRING type)."""
        from engine.geo.wkb import _from_wkb_linearring, from_wkb, to_wkb

        payload = to_wkb(self, flavor="extended", include_srid=True)
        if self.type_id == GeomType.LINEARRING:
            return (_from_wkb_linearring, (payload,))
        return (from_wkb, (payload,))

    def __setstate__(self, state):
        """src/pygeom.c:304 — accept shapely<2.0 pickles (ctor + WKB
        bytes state) with the compatibility UserWarning."""
        if isinstance(state, dict):
            self.__dict__.update(state)
            return
        if not isinstance(state, (bytes, bytearray)):
            raise TypeError(
                f"Expected bytes, found {type(state).__name__}")
        import warnings

        warnings.warn(
            "Unpickling a shapely <2.0 geometry object. Please save the "
            "pickle again as this compatibility may be removed in a "
            "future version of shapely.", UserWarning, stacklevel=2,
        )
        from engine.geo.wkb import from_wkb

        g = from_wkb(bytes(state))
        if (self.type_id == GeomType.LINEARRING
                and g.type_id == GeomType.LINESTRING):
            # pygeom.c:326 restores ring-ness from the class registry
            g = Geom(GeomType.LINEARRING, xys=g.xys, has_z=g.has_z,
                     has_m=g.has_m)
        for f in ("type_id", "xys", "rings", "parts", "has_z", "has_m"):
            object.__setattr__(self, f, getattr(g, f))

    def __bool__(self):
        return not self.is_empty

    def __str__(self):
        return to_wkt(self)

    def __repr__(self):
        """Reference geometry/base.py:171 — ``<WKT>`` capped at 80 chars."""
        try:
            w = to_wkt(self)
        except (ValueError, TypeError):
            return f"<shapely.{self.__class__.__name__} Exception in WKT writer>"
        if len(w) > 78:
            return f"<{w[:75]}...>"
        return f"<{w}>"

    # -- basic properties -------------------------------------------------
    @property
    def is_empty(self) -> bool:
        if self.type_id == GeomType.POLYGON:
            return len(self.rings) == 0
        if self.type_id in (
            GeomType.MULTIPOINT,
            GeomType.MULTILINESTRING,
            GeomType.MULTIPOLYGON,
            GeomType.GEOMETRYCOLLECTION,
        ):
            return len(self.parts) == 0 or all(p.is_empty for p in self.parts)
        return len(self.xys) == 0

    @property
    def dimension(self) -> int:
        """Topological dimension (-1 empty, 0 point, 1 line, 2 area)."""
        t = self.type_id
        if t == GeomType.POINT or t == GeomType.MULTIPOINT:
            return -1 if self.is_empty else 0
        if t in (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING):
            return -1 if self.is_empty else 1
        if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
            return -1 if self.is_empty else 2
        if t == GeomType.GEOMETRYCOLLECTION:
            return max((p.dimension for p in self.parts), default=-1)
        return -1

    @property
    def bounds(self) -> tuple:
        """(xmin, ymin, xmax, ymax) TUPLE like the reference base.py:377
        property; NaN for empty (measurement.py:85)."""
        cs = self.all_coords()
        return tuple(float(v) for v in core.bbox_of(cs))

    @property
    def coords(self) -> "CoordinateSequence":
        """Reference base.py:329 ``.coords``: coordinate sequence of a
        Point/LineString/LinearRing; polygons raise (their rings have
        sequences, the polygon does not)."""
        if self.type_id not in (
            GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING
        ):
            raise NotImplementedError(
                "Component rings have coordinate sequences, "
                "but the polygon does not"
            )
        # GEOS 3.12+ coordinate sequences carry M as well (XYM → (x, y,
        # m), XYZM → (x, y, z, m))
        w = 2 + (1 if self.has_z else 0) + (1 if self.has_m else 0)
        return CoordinateSequence(self.xys[:, :w])

    def all_coords(self) -> np.ndarray:
        """(n,2) xy coordinates (analysis view; Z/M stripped)."""
        if self.type_id == GeomType.POLYGON:
            return (
                np.vstack([r[:, :2] for r in self.rings])
                if self.rings
                else np.empty((0, 2))
            )
        if self.parts:
            arrs = [p.all_coords() for p in self.parts]
            arrs = [a for a in arrs if len(a)]
            return np.vstack(arrs) if arrs else np.empty((0, 2))
        if self.type_id in (
            GeomType.MULTIPOINT,
            GeomType.MULTILINESTRING,
            GeomType.MULTIPOLYGON,
            GeomType.GEOMETRYCOLLECTION,
        ):
            return np.empty((0, 2))
        return self.xys[:, :2]

    # -- flattened views (decomposition used by relate + measures; always
    # 2-D xy views — predicates/overlays are planar like GEOS) -----------
    def point_parts(self) -> np.ndarray:
        """(k,2) coordinates of all point components."""
        if self.type_id == GeomType.POINT:
            return self.xys[:, :2]
        out = []
        if self.type_id in (GeomType.MULTIPOINT, GeomType.GEOMETRYCOLLECTION):
            for p in self.parts:
                pp = p.point_parts()
                if len(pp):
                    out.append(pp)
        return np.vstack(out) if out else np.empty((0, 2))

    def line_parts(self) -> list[np.ndarray]:
        """List of (n,2) polylines (linestrings/rings-as-lines)."""
        if self.type_id in (GeomType.LINESTRING, GeomType.LINEARRING):
            return [self.xys[:, :2]] if len(self.xys) else []
        out = []
        if self.type_id in (GeomType.MULTILINESTRING, GeomType.GEOMETRYCOLLECTION):
            for p in self.parts:
                out.extend(p.line_parts())
        return out

    def polygon_parts(self) -> list[list[np.ndarray]]:
        """List of polygons; each polygon = list of closed (n,2) rings."""
        if self.type_id == GeomType.POLYGON:
            return [[r[:, :2] for r in self.rings]] if self.rings else []
        out = []
        if self.type_id in (GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION):
            for p in self.parts:
                out.extend(p.polygon_parts())
        return out

    # -- measures ---------------------------------------------------------
    @property
    def area(self) -> float:
        """Unsigned area (measurement.py:24); holes subtract."""
        total = 0.0
        for rings in self.polygon_parts():
            if not rings:
                continue
            total += abs(core.ring_signed_area(rings[0]))
            for h in rings[1:]:
                total -= abs(core.ring_signed_area(h))
        return total

    @property
    def length(self) -> float:
        """Sum of line lengths + polygon ring perimeters (measurement.py:167)."""
        total = sum(core.polyline_length(line) for line in self.line_parts())
        for rings in self.polygon_parts():
            for r in rings:
                total += core.polyline_length(r)
        return total

    @property
    def centroid(self) -> "Geom":
        """Area-weighted centroid; falls back to lines then points.

        Replicates GEOS behavior used by constructive.py:347: highest
        dimension present wins.
        """
        polys = self.polygon_parts()
        if polys:
            asum = 0.0
            cx = cy = 0.0
            for rings in polys:
                for i, r in enumerate(rings):
                    a = core.ring_signed_area(r)
                    sign = 1.0 if i == 0 else -1.0
                    a = abs(a) * sign
                    x, y = r[:-1, 0], r[:-1, 1]
                    x2, y2 = r[1:, 0], r[1:, 1]
                    cross = x * y2 - x2 * y
                    if i > 0:
                        cross = -np.abs(cross) * np.sign(core.ring_signed_area(r) or 1)
                    # use signed shoelace consistently: centroid contribution
                    s = core.ring_signed_area(r)
                    if s == 0:
                        continue
                    f = 1.0 / (6.0 * s)
                    gx = f * np.sum((x + x2) * (x * y2 - x2 * y))
                    gy = f * np.sum((y + y2) * (x * y2 - x2 * y))
                    w = abs(s) * sign
                    cx += gx * w
                    cy += gy * w
                    asum += w
            if asum != 0:
                return Geom.point(cx / asum, cy / asum)
        lines = self.line_parts() + [r for rings in polys for r in rings]
        if lines:
            wsum = 0.0
            cx = cy = 0.0
            for line in lines:
                if len(line) < 2:
                    continue
                mid = (line[:-1] + line[1:]) / 2.0
                d = np.diff(line, axis=0)
                w = np.sqrt((d * d).sum(axis=1))
                cx += float((mid[:, 0] * w).sum())
                cy += float((mid[:, 1] * w).sum())
                wsum += float(w.sum())
            if wsum > 0:
                return Geom.point(cx / wsum, cy / wsum)
        pts = self.all_coords()
        if len(pts):
            return Geom.point(float(pts[:, 0].mean()), float(pts[:, 1].mean()))
        return Geom(GeomType.POINT)

    def segments(self) -> np.ndarray:
        """(m,4) array of all segments (ax,ay,bx,by) of lines and rings."""
        segs = []
        for line in self.line_parts():
            if len(line) >= 2:
                segs.append(np.hstack([line[:-1], line[1:]]))
        for rings in self.polygon_parts():
            for r in rings:
                if len(r) >= 2:
                    segs.append(np.hstack([r[:-1], r[1:]]))
        return np.vstack(segs) if segs else np.empty((0, 4))

    def _representative_xy(self) -> tuple[float, float]:
        """A point guaranteed in the interior (for areal) / on the geometry.

        Analogue of point_on_surface (constructive.py:822): scanline at a
        y strictly between ring vertex ys, midpoint of the first inside
        interval.
        """
        polys = self.polygon_parts()
        if polys:
            rings = polys[0]
            ys = np.unique(np.concatenate([r[:, 1] for r in rings]))
            if len(ys) == 1:
                y = ys[0]
            else:
                # pick midpoint of the pair of distinct ys bracketing the bbox middle
                ymid = 0.5 * (ys[0] + ys[-1])
                idx = int(np.searchsorted(ys, ymid))
                idx = max(1, min(idx, len(ys) - 1))
                y = 0.5 * (ys[idx - 1] + ys[idx])
                if y == ys[idx - 1]:  # degenerate float collapse
                    y = np.nextafter(ys[idx - 1], ys[idx])
            xs = []
            for r in rings:
                ax, ay = r[:-1, 0], r[:-1, 1]
                bx, by = r[1:, 0], r[1:, 1]
                cond = (ay > y) != (by > y)
                if cond.any():
                    xi = ax[cond] + (y - ay[cond]) * (bx[cond] - ax[cond]) / (by[cond] - ay[cond])
                    xs.append(xi)
            if xs:
                xs = np.sort(np.concatenate(xs))
                if len(xs) >= 2:
                    return (float((xs[0] + xs[1]) / 2.0), float(y))
        lines = self.line_parts()
        if lines:
            line = lines[0]
            mid = (line[0] + line[1]) / 2.0 if len(line) >= 2 else line[0]
            return (float(mid[0]), float(mid[1]))
        pts = self.all_coords()
        if len(pts):
            return (float(pts[0, 0]), float(pts[0, 1]))
        raise ValueError("empty geometry has no representative point")

# ---------------------------------------------------------------------------
# WKT I/O  (reference: shapely/io.py:33 to_wkt, io.py:269 from_wkt)
# ---------------------------------------------------------------------------

_token_re = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


def _tokenize(s: str):
    pos = 0
    toks = []
    while pos < len(s):
        m = _token_re.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad WKT at {s[pos:pos+20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")


def _parse_coords(p: _P, want: int | None) -> np.ndarray:
    """Parse a parenthesized coordinate list.  ``want`` = declared vertex
    width from a Z/M/ZM qualifier (None → infer from the first vertex,
    matching GEOS "POINT (1 2 3)" → XYZ)."""
    p.expect("(")
    pts = []
    w = want
    inferred = want is None
    while True:
        xs = []
        while p.peek() not in (",", ")"):
            xs.append(float(p.next()))
        if w is None:
            w = min(max(len(xs), 2), 4)
        if inferred and len(xs) != w:
            # GEOS >= 3.12 rejects mixed dimensionality inside one
            # coordinate list (shapely#1541)
            from engine.geo.errors import GEOSException

            raise GEOSException(
                "ParseException: Inconsistent coordinate dimensionality"
            )
        if len(xs) < w:
            raise ValueError(f"vertex has {len(xs)} ordinates, expected {w}")
        pts.append(xs[:w])
        if p.next() == ")":
            break
    return np.asarray(pts, dtype=np.float64).reshape(-1, w or 2)


def _flags_of(c: np.ndarray, hz: bool, hm: bool, had_tag: bool) -> tuple[bool, bool]:
    if had_tag:
        return hz, hm
    w = c.shape[1]
    return (w >= 3, w == 4)


def _parse_geom(p: _P) -> Geom | None:
    name = p.next().upper()
    if name in ("Z", "M", "ZM"):
        name = p.next().upper()
    # dimension qualifiers follow the name: "POINT Z (...)"
    hz = hm = had_tag = False
    while p.peek() is not None and p.peek().upper() in ("Z", "M", "ZM"):
        q = p.next().upper()
        had_tag = True
        hz |= "Z" in q
        hm |= "M" in q
    t = _NAME_TO_TYPE[name]
    want = (2 + hz + hm) if had_tag else None

    def mk(tt, coords=None, rings=None, parts=None):
        c0 = coords if coords is not None else (rings[0] if rings else None)
        if c0 is not None:
            fz, fm = _flags_of(c0, hz, hm, had_tag)
        elif parts:
            fz = any(pp.has_z for pp in parts)
            fm = any(pp.has_m for pp in parts)
        else:
            fz, fm = (hz, hm)
        return Geom(
            tt,
            xys=coords if coords is not None else np.empty((0, 2)),
            rings=rings or [],
            parts=parts or [],
            has_z=fz,
            has_m=fm,
        )

    if p.peek() is not None and p.peek().upper() == "EMPTY":
        p.next()
        return mk(t)
    if t == GeomType.POINT:
        return mk(t, coords=_parse_coords(p, want))
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return mk(t, coords=_parse_coords(p, want))
    if t == GeomType.POLYGON:
        p.expect("(")
        rings = []
        while True:
            rings.append(_parse_coords(p, want))
            if p.next() == ")":
                break
        return mk(t, rings=rings)
    if t == GeomType.MULTIPOINT:
        p.expect("(")
        parts = []
        while True:
            if p.peek() == "(":
                c = _parse_coords(p, want)
                parts.append(mk(GeomType.POINT, coords=c))
            elif p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(mk(GeomType.POINT))
            else:
                xs = []
                while p.peek() not in (",", ")"):
                    xs.append(float(p.next()))
                w = want or min(max(len(xs), 2), 4)
                if want is None and parts and len(parts[0].xys) and (
                    parts[0].xys.shape[1] != w
                ):
                    # GEOS >= 3.12 rejects mixed member dimensionality
                    # in the bare MULTIPOINT form (shapely#1541)
                    from engine.geo.errors import GEOSException

                    raise GEOSException(
                        "ParseException: Inconsistent coordinate "
                        "dimensionality"
                    )
                parts.append(
                    mk(GeomType.POINT,
                       coords=np.asarray([xs[:w]], dtype=np.float64))
                )
            if p.next() == ")":
                break
        return mk(t, parts=parts)
    if t == GeomType.MULTILINESTRING:
        p.expect("(")
        parts = []
        while True:
            if p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(mk(GeomType.LINESTRING))
            else:
                parts.append(mk(GeomType.LINESTRING, coords=_parse_coords(p, want)))
            if p.next() == ")":
                break
        return mk(t, parts=parts)
    if t == GeomType.MULTIPOLYGON:
        p.expect("(")
        parts = []
        while True:
            if p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(mk(GeomType.POLYGON))
            else:
                p.expect("(")
                rings = []
                while True:
                    rings.append(_parse_coords(p, want))
                    if p.next() == ")":
                        break
                parts.append(mk(GeomType.POLYGON, rings=rings))
            if p.next() == ")":
                break
        return mk(t, parts=parts)
    if t == GeomType.GEOMETRYCOLLECTION:
        p.expect("(")
        parts = []
        while True:
            parts.append(_parse_geom(p))
            if p.next() == ")":
                break
        return mk(t, parts=parts)
    raise ValueError(f"unsupported WKT type {name}")


_NONLINEAR_WKT = {
    "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE",
    "MULTISURFACE",
}


def _wkt_validate(g: Geom, fix: bool) -> Geom | None:
    """GEOS WKT reader structure checks (io.py:269 on_invalid):

    strict: unclosed ring -> GEOSException; closed ring < 4 coords ->
    GEOSException "Invalid number of points"; 1-coord linestring ->
    GEOSException.  fix (GEOS fix_structure): unclosed rings are closed
    (any resulting length >= 3 accepted); unfixable parts make the whole
    geometry None.
    """
    from engine.geo.errors import GEOSException

    t = g.type_id
    if t == GeomType.LINESTRING and len(g.xys) == 1:
        if fix:
            return None
        raise GEOSException(
            "IllegalArgumentException: point array must contain 0 or >1 "
            "elements"
        )
    if t in (GeomType.LINEARRING, GeomType.POLYGON):
        rings = [g.xys] if t == GeomType.LINEARRING else g.rings
        fixed = []
        for r in rings:
            if len(r) == 0:
                fixed.append(r)
                continue
            closed = bool(np.array_equal(r[0], r[-1]))
            if not closed:
                if fix:
                    r = np.vstack([r, r[:1]])
                    if len(r) < 3:
                        return None
                else:
                    raise GEOSException(
                        "IllegalArgumentException: Points of LinearRing do "
                        "not form a closed linestring"
                    )
            elif len(r) < 4:
                if fix:
                    return None
                raise GEOSException(
                    f"IllegalArgumentException: Invalid number of points in "
                    f"LinearRing found {len(r)} - must be 0 or >= 4"
                )
            fixed.append(r)
        if t == GeomType.LINEARRING:
            return Geom(t, xys=fixed[0], has_z=g.has_z, has_m=g.has_m)
        return Geom(t, rings=fixed, has_z=g.has_z, has_m=g.has_m)
    if g.parts:
        parts = [_wkt_validate(p, fix) for p in g.parts]
        if any(p is None for p in parts):
            return None
        return Geom(t, parts=parts, has_z=g.has_z, has_m=g.has_m)
    return g


def from_wkt(geometry, on_invalid: str = "raise"):
    """Parse WKT (io.py:269 semantics; None passes through; arrays map
    elementwise).  on_invalid: raise | warn | ignore | fix."""
    from engine.geo.errors import GEOSException

    if on_invalid not in ("raise", "warn", "ignore", "fix"):
        raise ValueError(
            f"{on_invalid!r} is not a valid option for on_invalid: must be "
            "one of 'raise', 'warn', 'ignore' or 'fix'"
        )

    def parse(s):
        if s is None:
            return None
        if isinstance(s, bytes):
            s = s.decode("utf-8")
        if not isinstance(s, str):
            raise TypeError(
                f"Expected bytes or string, got {type(s).__name__}"
            )
        try:
            toks = _tokenize(s)
            if not toks:
                raise GEOSException(
                    "ParseException: Expected word but encountered end of "
                    "stream"
                )
            head = toks[0].upper()
            if head in _NONLINEAR_WKT:
                raise NotImplementedError(
                    "Nonlinear geometry types are not currently supported"
                )
            if head not in _NAME_TO_TYPE:
                raise GEOSException(
                    f"ParseException: Unknown type: '{toks[0]}'"
                )
            g = _parse_geom(_P(toks))
            return _wkt_validate(g, fix=(on_invalid == "fix"))
        except NotImplementedError:
            raise
        except (GEOSException, ValueError, KeyError, TypeError,
                IndexError) as e:
            if on_invalid == "raise":
                if isinstance(e, GEOSException):
                    raise
                raise GEOSException(
                    f"ParseException: malformed WKT {s[:60]!r}: {e}"
                ) from e
            if on_invalid == "warn":
                import warnings

                warnings.warn(
                    f"Invalid WKT: {e}", RuntimeWarning, stacklevel=3
                )
            return None

    if geometry is None or isinstance(geometry, (str, bytes)):
        return parse(geometry)
    if not isinstance(geometry, (list, tuple, np.ndarray)):
        return parse(geometry)  # raises the TypeError with the right name
    arr = np.asarray(geometry, dtype=object)
    out = np.empty(arr.shape, dtype=object)
    for idx in np.ndindex(arr.shape):
        out[idx] = parse(arr[idx])
    return out


def _fmt_num(v: float) -> str:
    if v != v:
        return "NaN"  # GEOS WKT writer spelling
    if v in (float("inf"), float("-inf")):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(c: np.ndarray) -> str:
    return "(" + ", ".join(" ".join(_fmt_num(v) for v in row) for row in c) + ")"


def _wkt_tag(g: Geom) -> str:
    """' Z' / ' M' / ' ZM' dimension qualifier (GEOS ISO WKT writer)."""
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_z:
        return " Z"
    if g.has_m:
        return " M"
    return ""


def _wkt_one(g: Geom, fmt, odim: int, old_3d: bool) -> str:
    """Write one geometry with GEOS writer options (io.py:33):
    ``output_dimension`` slices Z/M, ``old_3d`` drops the dimension tag
    while keeping the ordinates."""
    keep_z = g.has_z and odim >= 3
    keep_m = g.has_m and (odim >= 4 or (odim >= 3 and not g.has_z))

    def cols(c: np.ndarray) -> np.ndarray:
        idx = [0, 1]
        w = c.shape[1]
        if keep_z and w > 2:
            idx.append(2)
        if keep_m and w > 2:
            idx.append(w - 1)
        return c[:, idx]

    if old_3d:
        tag = " M" if (keep_m and not keep_z) else ""
    elif keep_z and keep_m:
        tag = " ZM"
    elif keep_z:
        tag = " Z"
    elif keep_m:
        tag = " M"
    else:
        tag = ""
    name = _WKT_NAMES[g.type_id] + tag

    def coords_str(c: np.ndarray) -> str:
        c = cols(c)
        return "(" + ", ".join(
            " ".join(fmt(v) for v in row) for row in c
        ) + ")"

    if g.is_empty:
        return f"{name} EMPTY"
    t = g.type_id
    if t == GeomType.POINT:
        return f"{name} ({' '.join(fmt(v) for v in cols(g.xys)[0])})"
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return f"{name} {coords_str(g.xys)}"
    if t == GeomType.POLYGON:
        return f"{name} (" + ", ".join(coords_str(r) for r in g.rings) + ")"
    if t == GeomType.MULTIPOINT:
        # modern per-point parens, matching the reference's GEOS writer
        # (creation.py:536 docstring: MULTIPOINT ((1 1), (2 2)))
        return f"{name} (" + ", ".join(
            f"({' '.join(fmt(v) for v in cols(p.xys)[0])})"
            if len(p.xys)
            else "EMPTY"
            for p in g.parts
        ) + ")"
    if t == GeomType.MULTILINESTRING:
        return f"{name} (" + ", ".join(coords_str(p.xys) for p in g.parts) + ")"
    if t == GeomType.MULTIPOLYGON:
        return f"{name} (" + ", ".join(
            "(" + ", ".join(coords_str(r) for r in p.rings) + ")"
            for p in g.parts
        ) + ")"
    if t == GeomType.GEOMETRYCOLLECTION:
        return f"{name} (" + ", ".join(
            _wkt_one(p, fmt, odim, old_3d) for p in g.parts
        ) + ")"
    raise ValueError(str(t))


def to_wkt(g, rounding_precision: int = 6, trim: bool = True,
           output_dimension: int | None = None, old_3d: bool = False):
    """Write WKT (io.py:33 semantics; None passes through; arrays map
    elementwise).  trim=True writes shortest representations; trim=False
    fixed decimals (rounding_precision, default 6)."""
    if output_dimension is None:
        output_dimension = 4
    if output_dimension not in (2, 3, 4):
        from engine.geo.errors import GEOSException

        raise GEOSException("Output dimension must be 2, 3 or 4")
    if trim:
        if rounding_precision >= 0:
            def fmt(v, _p=rounding_precision):
                return _fmt_num(round(float(v), _p))
        else:
            fmt = _fmt_num
    else:
        p = rounding_precision if rounding_precision >= 0 else 16
        def fmt(v, _p=p):
            s = f"{float(v):.{_p}f}"
            # GEOS 3.13+ normalizes negative zero after rounding
            if s.lstrip("-").strip("0.") == "" and s.startswith("-"):
                s = s[1:]
            return s

    def one(gg):
        if gg is None:
            return None
        if not isinstance(gg, Geom):
            raise TypeError(
                f"Expected a Geometry, got {type(gg).__name__}"
            )
        return _wkt_one(gg, fmt, output_dimension, old_3d)

    if g is None or isinstance(g, Geom):
        return one(g)
    if not isinstance(g, (list, tuple, np.ndarray)):
        raise TypeError(f"Expected a Geometry, got {type(g).__name__}")
    arr = np.asarray(g, dtype=object)
    out = np.empty(arr.shape, dtype=object)
    for idx in np.ndindex(arr.shape):
        out[idx] = one(arr[idx])
    return out
