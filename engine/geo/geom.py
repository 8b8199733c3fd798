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


@dataclass
class Geom:
    """Scalar geometry.

    - POINT: ``coords`` shape (1,2), or (0,2) for EMPTY
    - LINESTRING / LINEARRING: ``coords`` shape (n,2)
    - POLYGON: ``rings`` = list of closed (n,2) rings (first == last);
      rings[0] is the shell, the rest holes.  Empty polygon: ``rings=[]``.
    - MULTI* / GEOMETRYCOLLECTION: ``parts`` = list of Geom.
    """

    type_id: GeomType
    coords: np.ndarray = field(default_factory=lambda: np.empty((0, 2)))
    rings: list = field(default_factory=list)
    parts: list = field(default_factory=list)

    # -- constructors -----------------------------------------------------
    @staticmethod
    def point(x: float, y: float) -> "Geom":
        return Geom(GeomType.POINT, np.array([[x, y]], dtype=np.float64))

    @staticmethod
    def linestring(coords) -> "Geom":
        return Geom(GeomType.LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))

    @staticmethod
    def linearring(coords) -> "Geom":
        c = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        if len(c) and not np.array_equal(c[0], c[-1]):
            c = np.vstack([c, c[:1]])  # auto-close, as creation.py:236
        return Geom(GeomType.LINEARRING, c)

    @staticmethod
    def polygon(shell, holes=()) -> "Geom":
        def close(r):
            r = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            return r

        rings = [close(shell)] + [close(h) for h in holes]
        return Geom(GeomType.POLYGON, rings=rings)

    @staticmethod
    def box(xmin, ymin, xmax, ymax, ccw: bool = True) -> "Geom":
        """Axis-aligned rectangle (reference: creation.py:448)."""
        if ccw:
            ring = [(xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin), (xmax, ymin)]
        else:
            ring = [(xmax, ymin), (xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin)]
        return Geom(GeomType.POLYGON, rings=[np.asarray(ring, dtype=np.float64)])

    @staticmethod
    def multi(type_id: GeomType, parts: list) -> "Geom":
        return Geom(type_id, parts=list(parts))

    @staticmethod
    def collection(parts: list) -> "Geom":
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=list(parts))

    @staticmethod
    def empty(type_id: GeomType = GeomType.GEOMETRYCOLLECTION) -> "Geom":
        return Geom(type_id)

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
        return len(self.coords) == 0

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

    def bounds(self) -> np.ndarray:
        """(xmin, ymin, xmax, ymax); NaN for empty (measurement.py:85)."""
        cs = self.all_coords()
        return core.bbox_of(cs)

    def all_coords(self) -> np.ndarray:
        if self.type_id == GeomType.POLYGON:
            return np.vstack(self.rings) if self.rings else np.empty((0, 2))
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
        return self.coords

    # -- flattened views (decomposition used by relate + measures) --------
    def point_parts(self) -> np.ndarray:
        """(k,2) coordinates of all point components."""
        if self.type_id == GeomType.POINT:
            return self.coords
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
            return [self.coords] if len(self.coords) else []
        out = []
        if self.type_id in (GeomType.MULTILINESTRING, GeomType.GEOMETRYCOLLECTION):
            for p in self.parts:
                out.extend(p.line_parts())
        return out

    def polygon_parts(self) -> list[list[np.ndarray]]:
        """List of polygons; each polygon = list of closed rings."""
        if self.type_id == GeomType.POLYGON:
            return [self.rings] if self.rings else []
        out = []
        if self.type_id in (GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION):
            for p in self.parts:
                out.extend(p.polygon_parts())
        return out

    # -- measures ---------------------------------------------------------
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

    def length(self) -> float:
        """Sum of line lengths + polygon ring perimeters (measurement.py:167)."""
        total = sum(core.polyline_length(line) for line in self.line_parts())
        for rings in self.polygon_parts():
            for r in rings:
                total += core.polyline_length(r)
        return total

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

    def representative_point(self) -> tuple[float, float]:
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

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Geom {to_wkt(self)}>"


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


def _parse_coords(p: _P) -> np.ndarray:
    p.expect("(")
    pts = []
    while True:
        xs = []
        while p.peek() not in (",", ")"):
            xs.append(float(p.next()))
        pts.append(xs[:2])  # analysis is 2-D (geometry/base.py:1-7); drop Z/M
        if p.next() == ")":
            break
    return np.asarray(pts, dtype=np.float64)


def _parse_geom(p: _P) -> Geom | None:
    name = p.next().upper()
    if name in ("Z", "M", "ZM"):
        name = p.next().upper()
    # dimension qualifiers may follow the name too: "POINT Z (...)"
    while p.peek() is not None and p.peek().upper() in ("Z", "M", "ZM"):
        p.next()
    t = _NAME_TO_TYPE[name]
    if p.peek() is not None and p.peek().upper() == "EMPTY":
        p.next()
        return Geom(t)
    if t == GeomType.POINT:
        c = _parse_coords(p)
        return Geom(t, c)
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return Geom(t, _parse_coords(p))
    if t == GeomType.POLYGON:
        p.expect("(")
        rings = []
        while True:
            rings.append(_parse_coords(p))
            if p.next() == ")":
                break
        return Geom(t, rings=rings)
    if t == GeomType.MULTIPOINT:
        p.expect("(")
        parts = []
        while True:
            if p.peek() == "(":
                c = _parse_coords(p)
                parts.append(Geom(GeomType.POINT, c))
            elif p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(Geom(GeomType.POINT))
            else:
                xs = []
                while p.peek() not in (",", ")"):
                    xs.append(float(p.next()))
                parts.append(Geom.point(xs[0], xs[1]))
            if p.next() == ")":
                break
        return Geom(t, parts=parts)
    if t == GeomType.MULTILINESTRING:
        p.expect("(")
        parts = []
        while True:
            if p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(Geom(GeomType.LINESTRING))
            else:
                parts.append(Geom(GeomType.LINESTRING, _parse_coords(p)))
            if p.next() == ")":
                break
        return Geom(t, parts=parts)
    if t == GeomType.MULTIPOLYGON:
        p.expect("(")
        parts = []
        while True:
            if p.peek() is not None and p.peek().upper() == "EMPTY":
                p.next()
                parts.append(Geom(GeomType.POLYGON))
            else:
                p.expect("(")
                rings = []
                while True:
                    rings.append(_parse_coords(p))
                    if p.next() == ")":
                        break
                parts.append(Geom(GeomType.POLYGON, rings=rings))
            if p.next() == ")":
                break
        return Geom(t, parts=parts)
    if t == GeomType.GEOMETRYCOLLECTION:
        p.expect("(")
        parts = []
        while True:
            parts.append(_parse_geom(p))
            if p.next() == ")":
                break
        return Geom(t, parts=parts)
    raise ValueError(f"unsupported WKT type {name}")


def from_wkt(s: str | None) -> Geom | None:
    """Parse a WKT string (io.py:269 semantics; None passes through)."""
    if s is None:
        return None
    try:
        return _parse_geom(_P(_tokenize(s)))
    except ValueError:
        raise
    except (KeyError, TypeError, IndexError) as e:
        raise ValueError(f"malformed WKT {s[:60]!r}: {e}") from e


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(c: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in c) + ")"


def to_wkt(g: Geom | None) -> str | None:
    """Write WKT (io.py:33 semantics, trim mode; None passes through)."""
    if g is None:
        return None
    name = _WKT_NAMES[g.type_id]
    if g.is_empty:
        return f"{name} EMPTY"
    t = g.type_id
    if t == GeomType.POINT:
        return f"POINT ({_fmt_num(g.coords[0,0])} {_fmt_num(g.coords[0,1])})"
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return f"{name} {_fmt_coords(g.coords)}"
    if t == GeomType.POLYGON:
        return "POLYGON (" + ", ".join(_fmt_coords(r) for r in g.rings) + ")"
    if t == GeomType.MULTIPOINT:
        # modern per-point parens, matching the reference's GEOS writer
        # (creation.py:536 docstring: MULTIPOINT ((1 1), (2 2)))
        return "MULTIPOINT (" + ", ".join(
            f"({_fmt_num(p.coords[0, 0])} {_fmt_num(p.coords[0, 1])})"
            if len(p.coords)
            else "EMPTY"
            for p in g.parts
        ) + ")"
    if t == GeomType.MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(_fmt_coords(p.coords) for p in g.parts) + ")"
    if t == GeomType.MULTIPOLYGON:
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_fmt_coords(r) for r in p.rings) + ")" for p in g.parts
        ) + ")"
    if t == GeomType.GEOMETRYCOLLECTION:
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(p) for p in g.parts) + ")"
    raise ValueError(str(t))
