"""Coordinate accessors & transforms (reference shapely/coordinates.py,
461 LoC + shapely/_geometry.py accessors).

transform:28 applies a user function to the (N, 2) coord block — exactly
the engine's map_batches shape (SURVEY.md §2.15 UDF hook).
get_coordinates:324 (+return_index), set_coordinates:398,
count_coordinates:289, and the explode accessors get_parts
(_geometry.py:646, +return_index) / get_rings (:717).
"""

from __future__ import annotations

import numpy as np

from engine.geo.geom import Geom, GeomType


def _walk_blocks(g: Geom):
    """Yield mutable coord blocks of a geometry in canonical order."""
    t = g.type_id
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        if len(g.coords):
            yield g.coords
    elif t == GeomType.POLYGON:
        for r in g.rings:
            yield r
    else:
        for p in g.parts:
            yield from _walk_blocks(p)


def count_coordinates(geometry) -> int:
    """coordinates.py:289 — TOTAL coordinate pairs (array input sums
    over all geometries, like the reference's C counter)."""

    def one(g):
        if g is None:
            return 0
        return sum(len(b) for b in _walk_blocks(g))

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return int(sum(one(g) for g in geometry))


def get_coordinates(geometry, return_index: bool = False):
    """coordinates.py:324 — (N, 2) coords of all input geometries, with
    optional source-geometry index (the ragged offsets!)."""
    geoms = [geometry] if isinstance(geometry, Geom) or geometry is None else list(geometry)
    blocks = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        for b in _walk_blocks(g):
            blocks.append(b)
            idx.append(np.full(len(b), i, dtype=np.int64))
    coords = np.vstack(blocks) if blocks else np.empty((0, 2))
    if return_index:
        return coords, (np.concatenate(idx) if idx else np.empty(0, dtype=np.int64))
    return coords


def _rebuild(g: Geom, it) -> Geom:
    t = g.type_id
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        if not len(g.coords):
            return g
        n = len(g.coords)
        return Geom(t, coords=next_block(it, n))
    if t == GeomType.POLYGON:
        return Geom(t, rings=[next_block(it, len(r)) for r in g.rings])
    return Geom(t, parts=[_rebuild(p, it) for p in g.parts])


def next_block(it, n):
    out = np.empty((n, 2))
    for k in range(n):
        out[k] = next(it)
    return out


def set_coordinates(geometry, coordinates):
    """coordinates.py:398 — new geometries with coords replaced."""
    coords = np.asarray(coordinates, dtype=np.float64).reshape(-1, 2)
    it = iter(coords)
    if isinstance(geometry, Geom):
        return _rebuild(geometry, it)
    return np.array([None if g is None else _rebuild(g, it) for g in geometry], dtype=object)


def transform(geometry, transformation, include_z: bool = False):
    """coordinates.py:28 — apply f((N,2)) -> (N,2) to every geometry's
    coord block (the user-extension surface, ops.py:216)."""

    def one(g):
        if g is None:
            return None
        c = get_coordinates(g)
        out = np.asarray(transformation(c), dtype=np.float64)
        return set_coordinates(g, out)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def transform_coordseq(geometry, transformation):
    """coordinates.py:177 — like transform, but the function is applied
    per coordinate SEQUENCE (one ring / one line at a time) instead of
    one flat block per geometry."""

    def one(g):
        if g is None:
            return None
        from engine.geo.geom import Geom, GeomType

        t = g.type_id
        if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
            if not len(g.coords):
                return g
            return Geom(t, coords=np.asarray(transformation(g.coords), dtype=np.float64))
        if t == GeomType.POLYGON:
            return Geom(t, rings=[np.asarray(transformation(r), dtype=np.float64) for r in g.rings])
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    from engine.geo.geom import Geom

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def get_parts(geometry, return_index: bool = False):
    """_geometry.py:646 — explode multi-parts one level (the Arrow list
    flatten of SURVEY.md §2.12)."""
    geoms = [geometry] if isinstance(geometry, Geom) or geometry is None else list(geometry)
    parts = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        if g.type_id in (
            GeomType.MULTIPOINT,
            GeomType.MULTILINESTRING,
            GeomType.MULTIPOLYGON,
            GeomType.GEOMETRYCOLLECTION,
        ):
            for p in g.parts:
                parts.append(p)
                idx.append(i)
        elif not g.is_empty:
            parts.append(g)
            idx.append(i)
    out = np.array(parts, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def get_rings(geometry, return_index: bool = False):
    """_geometry.py:717 — rings of polygons as linearrings."""
    geoms = [geometry] if isinstance(geometry, Geom) or geometry is None else list(geometry)
    rings = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None or g.type_id != GeomType.POLYGON:
            continue
        for r in g.rings:
            rings.append(Geom(GeomType.LINEARRING, coords=r.copy()))
            idx.append(i)
    out = np.array(rings, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def get_num_coordinates(geometry):
    return count_coordinates(geometry)


def get_x(point):
    def one(g):
        return np.nan if (g is None or g.is_empty) else float(g.coords[0, 0])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_y(point):
    def one(g):
        return np.nan if (g is None or g.is_empty) else float(g.coords[0, 1])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_type_id(geometry):
    """_geometry.py:60 — -1 for missing."""

    def one(g):
        return -1 if g is None else int(g.type_id)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=np.int64)


def get_num_geometries(geometry):
    """_geometry.py:790 — part count (1 for simple non-empty)."""

    def one(g):
        if g is None:
            return 0
        if g.parts:
            return len(g.parts)
        return 0 if g.is_empty else 1

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=np.int64)


def get_exterior_ring(polygon):
    """_geometry.py:482."""

    def one(g):
        if g is None or g.type_id != GeomType.POLYGON or g.is_empty:
            return None
        return Geom(GeomType.LINEARRING, coords=g.rings[0].copy())

    if isinstance(polygon, Geom) or polygon is None:
        return one(polygon)
    return np.array([one(g) for g in polygon], dtype=object)


def get_interior_ring(polygon, index):
    """_geometry.py:510."""

    def one(g, i):
        if g is None or g.type_id != GeomType.POLYGON:
            return None
        holes = g.rings[1:]
        if i < 0 or i >= len(holes):
            return None
        return Geom(GeomType.LINEARRING, coords=holes[i].copy())

    if isinstance(polygon, Geom) or polygon is None:
        return one(polygon, index)
    return np.array([one(g, index) for g in polygon], dtype=object)


def get_num_interior_rings(polygon):
    def one(g):
        if g is None or g.type_id != GeomType.POLYGON:
            return 0
        return max(0, len(g.rings) - 1)

    if isinstance(polygon, Geom) or polygon is None:
        return one(polygon)
    return np.array([one(g) for g in polygon], dtype=np.int64)
