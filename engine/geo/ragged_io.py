"""to_ragged_array / from_ragged_array — the reference's GeoArrow
interchange (shapely/_ragged_array.py:159 / :417).

Returns (GeomType, coords, offsets-tuple) with the exact layout rules:
point → 0 offset arrays (:51-55, empty point = NaN row :55-61);
(multi)linestring / multipoint → 1; (multi)polygon → 2/3 (:86-156);
mixed single/multi of one family promoted to multi (:309-318);
GeometryCollections unsupported (:214, raises ValueError).
Offsets are int32 when possible, int64 for >2^31 coords (:66-73).
"""

from __future__ import annotations

import numpy as np

from engine.geo.geom import Geom, GeomType


def _off_dtype(n: int):
    return np.int64 if n > np.iinfo(np.int32).max else np.int32


def _offsets(counts: list[int], total: int) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(counts, dtype=np.int64)]).astype(_off_dtype(total))


def to_ragged_array(geometries, include_z=None, include_m=None):
    """Geometry array → (geometry_type, coords(n,2|3|4), offsets tuple).

    ``include_z``/``include_m`` default to "any input geometry has that
    dimension" (:279-285); geometries lacking a requested dimension get
    NaN, and XYM m-columns land in the last output column."""
    geoms = [g for g in geometries]
    if include_z is None:
        include_z = any(
            g is not None and not g.is_empty and g.has_z for g in geoms
        )
    if include_m is None:
        include_m = any(
            g is not None and not g.is_empty and g.has_m for g in geoms
        )
    width = 2 + int(include_z) + int(include_m)

    def conv(g, c):
        """Native block → (n, width) with NaN-padding for absent dims."""
        if width == 2:
            return np.ascontiguousarray(c[:, :2])
        out = np.full((len(c), width), np.nan)
        out[:, :2] = c[:, :2]
        if include_z and g.has_z:
            out[:, 2] = c[:, 2]
        if include_m and g.has_m:
            out[:, 2 + int(include_z)] = c[:, 2 + int(g.has_z)]
        return out
    types = {g.type_id for g in geoms if g is not None and not g.is_empty}
    # empties participate in type inference like the reference
    types |= {g.type_id for g in geoms if g is not None}
    if GeomType.LINEARRING in types:
        raise ValueError("LinearRings are not supported")
    if not types:
        types = {GeomType.POINT}
    if GeomType.GEOMETRYCOLLECTION in types:
        raise ValueError("geometry collections are not supported")
    family = {
        GeomType.POINT: 0, GeomType.MULTIPOINT: 0,
        GeomType.LINESTRING: 1, GeomType.MULTILINESTRING: 1,
        GeomType.POLYGON: 2, GeomType.MULTIPOLYGON: 2,
    }
    fams = {family[t] for t in types}
    if len(fams) > 1:
        raise ValueError(f"mixed geometry families: {sorted(types)}")
    fam = fams.pop()
    multi = any(
        t in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON)
        for t in types
    ) or len(types) > 1 and fam == 0  # mixed point/multipoint promotes

    def parts_of(g):
        if g.type_id in (GeomType.MULTIPOINT, GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON):
            return g.parts
        return [] if g.is_empty and fam != 0 else [g]

    if fam == 0 and not multi and all(
        (g is None) or g.type_id == GeomType.POINT for g in geoms
    ):
        coords = np.full((len(geoms), width), np.nan)
        for i, g in enumerate(geoms):
            if g is not None and not g.is_empty:
                coords[i] = conv(g, g.xys[:1])[0]
        return GeomType.POINT, coords, ()

    if fam == 0:
        blocks, counts = [], []
        for g in geoms:
            ps = [] if g is None else parts_of(g)
            pts = [conv(p, p.xys[:1])[0] for p in ps if not p.is_empty]
            counts.append(len(pts))
            blocks.extend(pts)
        coords = np.vstack(blocks) if blocks else np.empty((0, width))
        return GeomType.MULTIPOINT, coords, (_offsets(counts, len(coords)),)

    if fam == 1:
        multi = multi or any(
            g is not None and g.type_id == GeomType.MULTILINESTRING for g in geoms
        )
        if not multi:
            # one linestring per input; None/EMPTY entries repeat the
            # running offset (zero-length — arrow-null semantics)
            blocks, line_counts = [], []
            for g in geoms:
                if g is None or g.is_empty:
                    line_counts.append(0)
                    continue
                line_counts.append(len(g.xys))
                blocks.append(conv(g, g.xys))
            coords = np.vstack(blocks) if blocks else np.empty((0, width))
            return GeomType.LINESTRING, coords, (_offsets(line_counts, len(coords)),)
        blocks, line_counts, geom_counts = [], [], []
        for g in geoms:
            ps = [] if g is None else parts_of(g)
            lines = [(p, p.xys) for p in ps if not p.is_empty]
            geom_counts.append(len(lines))
            for p, c in lines:
                line_counts.append(len(c))
                blocks.append(conv(p, c))
        coords = np.vstack(blocks) if blocks else np.empty((0, width))
        line_off = _offsets(line_counts, len(coords))
        return GeomType.MULTILINESTRING, coords, (line_off, _offsets(geom_counts, len(line_off) - 1))

    multi = multi or any(
        g is not None and g.type_id == GeomType.MULTIPOLYGON for g in geoms
    )
    if not multi:
        blocks, ring_counts, poly_counts = [], [], []
        for g in geoms:
            if g is None or g.is_empty:
                poly_counts.append(0)
                continue
            poly_counts.append(len(g.rings))
            for r in g.rings:
                ring_counts.append(len(r))
                blocks.append(conv(g, r))
        coords = np.vstack(blocks) if blocks else np.empty((0, width))
        ring_off = _offsets(ring_counts, len(coords))
        return GeomType.POLYGON, coords, (ring_off, _offsets(poly_counts, len(ring_off) - 1))
    blocks, ring_counts, poly_counts, geom_counts = [], [], [], []
    for g in geoms:
        ps = [] if g is None else parts_of(g)
        polys = [p for p in ps if not p.is_empty]
        geom_counts.append(len(polys))
        for p in polys:
            poly_counts.append(len(p.rings))
            for r in p.rings:
                ring_counts.append(len(r))
                blocks.append(conv(p, r))
    coords = np.vstack(blocks) if blocks else np.empty((0, width))
    ring_off = _offsets(ring_counts, len(coords))
    poly_off = _offsets(poly_counts, len(ring_off) - 1)
    return GeomType.MULTIPOLYGON, coords, (ring_off, poly_off, _offsets(geom_counts, len(poly_off) - 1))


def from_ragged_array(geometry_type, coords, offsets=()):
    """(type, coords, offsets) → object array of Geom (:417).  Coords may
    be (n,2), (n,3) (XYZ) or (n,4) (XYZM)."""
    t = GeomType(geometry_type)
    coords = np.asarray(coords, dtype=np.float64)
    if coords.ndim != 2:
        coords = coords.reshape(-1, 2)
    hz = coords.shape[1] >= 3
    hm = coords.shape[1] == 4
    offs = [np.asarray(o, dtype=np.int64) for o in (offsets or ())]
    _N_OFFSETS = {
        GeomType.POINT: 0, GeomType.MULTIPOINT: 1, GeomType.LINESTRING: 1,
        GeomType.MULTILINESTRING: 2, GeomType.POLYGON: 2,
        GeomType.MULTIPOLYGON: 3,
    }
    need = _N_OFFSETS.get(t)
    if need is not None:
        if need and len(offs) < need:
            raise ValueError(
                f"'offsets' must be provided for geometry type {t.name} "
                f"({need} levels expected)"
            )
        if need == 0 and len(offs):
            raise ValueError(
                f"'offsets' should not be provided for geometry type {t.name}"
            )
        offs = offs[:need]
    # bounds validation (segfault guards of the reference 2.1.1)
    if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        ring_o = offs[0]
        part_o = offs[1]
        if len(part_o) and part_o[-1] > len(ring_o) - 1:
            which = "geometry" if t == GeomType.POLYGON else "part"
            raise ValueError(
                f"Number of rings indicated by the {which} offsets "
                f"({int(part_o[-1])}) exceeds the ring offsets "
                f"({len(ring_o) - 1})"
            )
        if t == GeomType.MULTIPOLYGON and len(offs[2]) and \
                offs[2][-1] > len(part_o) - 1:
            raise ValueError(
                "Number of geometry parts indicated by the geometry "
                f"offsets ({int(offs[2][-1])}) exceeds the part offsets "
                f"({len(part_o) - 1})"
            )
    if t in (GeomType.LINESTRING, GeomType.MULTILINESTRING, GeomType.POLYGON,
             GeomType.MULTIPOLYGON):
        lin_o = offs[0]
        if len(lin_o) and lin_o[-1] > len(coords):
            raise ValueError(
                f"Number of coordinates indicated by the linear offsets "
                f"({int(lin_o[-1])}) exceeds the coordinates ({len(coords)})"
            )

    def _check_ring(c):
        """GEOS ring rules on read (tests/test_ragged_array.py:540+)."""
        from engine.geo.errors import GEOSException

        if len(c) == 0:
            return c
        if not np.array_equal(c[0], c[-1]):
            if not np.isfinite(c[0]).all():
                raise GEOSException(
                    "IllegalArgumentException: Points of LinearRing do not "
                    "form a closed linestring"
                )
            c = np.vstack([c, c[:1]])  # auto-close (GEOS reader)
        if len(c) < 4:
            raise ValueError(
                "A linearring requires at least 4 coordinates."
            )
        return c

    def mkpoint(row):
        return Geom(GeomType.POINT, xys=np.asarray([row]), has_z=hz, has_m=hm)

    if t == GeomType.POINT:
        out = []
        for row in coords:
            if np.isnan(row).all():
                out.append(Geom(GeomType.POINT, has_z=hz, has_m=hm))
            else:
                out.append(mkpoint(row))
        return np.array(out, dtype=object)

    if t == GeomType.MULTIPOINT:
        (o,) = offs
        out = []
        for i in range(len(o) - 1):
            pts = coords[o[i]: o[i + 1]]
            if len(pts) == 0:
                out.append(Geom.empty(GeomType.MULTIPOINT))
            else:
                out.append(Geom(GeomType.MULTIPOINT,
                                parts=[mkpoint(row) for row in pts],
                                has_z=hz, has_m=hm))
        return np.array(out, dtype=object)

    if t == GeomType.LINESTRING:
        (o,) = offs
        out = []
        for i in range(len(o) - 1):
            c = coords[o[i]: o[i + 1]]
            out.append(Geom.empty(t) if len(c) == 0 else Geom.linestring(c))
        return np.array(out, dtype=object)

    if t == GeomType.MULTILINESTRING:
        line_off, geom_off = offs
        out = []
        for i in range(len(geom_off) - 1):
            parts = []
            for j in range(geom_off[i], geom_off[i + 1]):
                parts.append(Geom.linestring(coords[line_off[j]: line_off[j + 1]]))
            out.append(
                Geom(t, parts=parts, has_z=hz, has_m=hm) if parts else Geom.empty(t)
            )
        return np.array(out, dtype=object)

    def poly(ring_off, j0, j1):
        rings = [
            _check_ring(coords[ring_off[j]: ring_off[j + 1]])
            for j in range(j0, j1)
        ]
        if not rings:
            return Geom.empty(GeomType.POLYGON)
        return Geom(GeomType.POLYGON, rings=rings, has_z=hz, has_m=hm)

    if t == GeomType.POLYGON:
        ring_off, poly_off = offs
        return np.array(
            [poly(ring_off, poly_off[i], poly_off[i + 1]) for i in range(len(poly_off) - 1)],
            dtype=object,
        )

    if t == GeomType.MULTIPOLYGON:
        ring_off, poly_off, geom_off = offs
        out = []
        for i in range(len(geom_off) - 1):
            parts = [
                poly(ring_off, poly_off[j], poly_off[j + 1])
                for j in range(geom_off[i], geom_off[i + 1])
            ]
            out.append(Geom(t, parts=parts, has_z=hz, has_m=hm) if parts else Geom.empty(t))
        return np.array(out, dtype=object)

    raise ValueError(f"unsupported ragged type {t}")
