"""Vectorized constructors (reference shapely/creation.py, 837 LoC).

points:54 (handle_nan allow/skip/error), linestrings:142,
linearrings:236 (auto-close), polygons:334 (+holes), box:448 (ccw),
multipoints:500, multilinestrings:585, multipolygons:641,
geometrycollections:696, empty:805.  Offsets built with the
bincount→cumsum pattern of _ragged_array.py:66-84.
"""

from __future__ import annotations

import numpy as np

from engine.geo.geom import Geom, GeomType


def _coerce(coords) -> np.ndarray:
    return np.asarray(coords, dtype=np.float64)


def points(coords, y=None, z=None, indices=None, handle_nan: str = "allow"):
    """creation.py:54 — coords may be (n,2), (n,3) XYZ, or (n,4) XYZM;
    ``indices`` scatters point i to output slot indices[i] (reference
    creation.py:58-120 indices form, one coord per output slot)."""
    if indices is not None:
        base = points(coords, y=y, z=z, handle_nan=handle_nan)
        base = np.atleast_1d(base)
        idx = np.asarray(indices, dtype=np.int64)
        out = np.full(int(idx.max()) + 1 if len(idx) else 0, None, dtype=object)
        out[idx] = base
        return out
    scalar = False
    if y is not None:
        scalar = np.asarray(coords).ndim == 0
        cols = [np.asarray(coords, dtype=np.float64), np.asarray(y, dtype=np.float64)]
        if z is not None:
            cols.append(np.asarray(z, dtype=np.float64))
        coords = np.column_stack(cols)
    c = _coerce(coords)
    if c.ndim == 1:
        c = c[None, :]
        scalar = True
    hz = c.shape[1] >= 3
    hm = c.shape[1] == 4
    out = []
    for row in c:
        isnan = np.isnan(row).any()
        if isnan:
            if handle_nan == "error":
                raise ValueError("NaN coordinate")
            if handle_nan == "skip":
                out.append(None)
                continue
            if np.isnan(row).all():
                out.append(Geom(GeomType.POINT, has_z=hz, has_m=hm))
                continue
        out.append(Geom(GeomType.POINT, xys=np.asarray([row]), has_z=hz, has_m=hm))
    if scalar:
        return out[0]
    return np.array(out, dtype=object)


def linestrings(coords, y=None, indices=None):
    """creation.py:142 — (N, m, 2) stack or flat coords + indices."""
    if y is not None:
        coords = np.column_stack([np.asarray(coords, dtype=np.float64), np.asarray(y, dtype=np.float64)])
    c = _coerce(coords)
    if indices is not None:
        idx = np.asarray(indices, dtype=np.int64)
        out = []
        for i in range(idx.max() + 1 if len(idx) else 0):
            out.append(Geom.linestring(c[idx == i]))
        return np.array(out, dtype=object)
    if c.ndim == 2:
        return Geom.linestring(c)
    return np.array([Geom.linestring(block) for block in c], dtype=object)


def linearrings(coords, y=None, indices=None):
    """creation.py:236 — auto-closes unclosed input."""
    if y is not None:
        coords = np.column_stack([np.asarray(coords, dtype=np.float64), np.asarray(y, dtype=np.float64)])
    c = _coerce(coords)

    def ring(block):
        return Geom.linearring(block)

    if indices is not None:
        idx = np.asarray(indices, dtype=np.int64)
        return np.array(
            [ring(c[idx == i]) for i in range(idx.max() + 1 if len(idx) else 0)],
            dtype=object,
        )
    if c.ndim == 2:
        return ring(c)
    return np.array([ring(block) for block in c], dtype=object)


def polygons(shells, holes=None, indices=None):
    """creation.py:334 — from rings (Geom LinearRings or coord arrays)."""

    def ring_coords(r):
        if isinstance(r, Geom):
            return r.xys
        return _coerce(r)

    if isinstance(shells, Geom) or (
        isinstance(shells, np.ndarray) and shells.ndim == 2
    ):
        hs = [ring_coords(h) for h in (holes or [])]
        return Geom.polygon(ring_coords(shells), hs)
    shells = list(shells)
    if indices is not None:
        idx = np.asarray(indices, dtype=np.int64)
        holes = list(holes) if holes is not None else []
        out = []
        for i, sh in enumerate(shells):
            hs = [ring_coords(holes[j]) for j in np.flatnonzero(idx == i)]
            out.append(Geom.polygon(ring_coords(sh), hs))
        return np.array(out, dtype=object)
    if holes is None:
        return np.array([Geom.polygon(ring_coords(s)) for s in shells], dtype=object)
    return np.array(
        [Geom.polygon(ring_coords(s), [ring_coords(h) for h in hs]) for s, hs in zip(shells, holes)],
        dtype=object,
    )


def box(xmin, ymin, xmax, ymax, ccw: bool = True):
    """creation.py:448."""
    scalars = np.isscalar(xmin)
    xmin, ymin, xmax, ymax = (np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in (xmin, ymin, xmax, ymax))
    out = [Geom.box(a, b, c, d, ccw=ccw) for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
    return out[0] if scalars else np.array(out, dtype=object)


def _zm(parts):
    """Z/M flags of a collection follow its members (GEOS GEOSHasZ
    semantics: any member with the dimension marks the collection)."""
    return dict(
        has_z=any(p.has_z for p in parts), has_m=any(p.has_m for p in parts)
    )


def _multi(type_id, sub_ctor):
    def ctor(geometries, indices=None):
        if indices is not None:
            idx = np.asarray(indices, dtype=np.int64)
            gs = list(geometries)
            out = []
            for i in range(idx.max() + 1 if len(idx) else 0):
                ps = [gs[j] for j in np.flatnonzero(idx == i)]
                out.append(Geom(type_id, parts=ps, **_zm(ps)))
            return np.array(out, dtype=object)
        parts = [g if isinstance(g, Geom) else sub_ctor(g) for g in geometries]
        if not parts:
            return Geom.empty(type_id)
        return Geom(type_id, parts=parts, **_zm(parts))

    return ctor


multipoints = _multi(GeomType.MULTIPOINT, lambda c: points(c))
multilinestrings = _multi(GeomType.MULTILINESTRING, lambda c: linestrings(c))
multipolygons = _multi(GeomType.MULTIPOLYGON, lambda c: Geom.polygon(_coerce(c)))
geometrycollections = _multi(GeomType.GEOMETRYCOLLECTION, lambda c: c)


def empty(shape=None, geom_type=GeomType.GEOMETRYCOLLECTION):
    """creation.py:805 — missing-filled array (None), matching the
    reference's default of returning None entries."""
    if shape is None:
        return None
    return np.full(shape, None, dtype=object)
