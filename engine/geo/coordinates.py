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
        if len(g.xys):
            yield g.xys
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


def get_coordinates(geometry, include_z: bool = False,
                    return_index: bool = False, include_m: bool = False):
    """coordinates.py:324 — (N, 2|3|4) coords of all input geometries,
    with optional source-geometry index (the ragged offsets!).  With
    ``include_z``/``include_m``, geometries lacking that dimension yield
    NaN (reference behavior)."""
    geoms = [geometry] if isinstance(geometry, Geom) or geometry is None else list(geometry)
    width = 2 + int(include_z) + int(include_m)
    blocks = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        for b in _walk_blocks(g):
            if width == 2:
                out = b[:, :2]
            else:
                out = np.full((len(b), width), np.nan)
                out[:, :2] = b[:, :2]
                zcol = 2 if g.has_z else None
                mcol = (2 + int(g.has_z)) if g.has_m else None
                if include_z and zcol is not None and b.shape[1] > zcol:
                    out[:, 2] = b[:, zcol]
                if include_m and mcol is not None and b.shape[1] > mcol:
                    out[:, 2 + int(include_z)] = b[:, mcol]
            blocks.append(out)
            idx.append(np.full(len(b), i, dtype=np.int64))
    coords = np.vstack(blocks) if blocks else np.empty((0, width))
    if return_index:
        return coords, (np.concatenate(idx) if idx else np.empty(0, dtype=np.int64))
    return coords


def _rebuild(g: Geom, it, w: int) -> Geom:
    t = g.type_id

    def block(n, old):
        new = next_block(it, n, w)
        if w == 2 and old.shape[1] > 2:
            # xy-only replacement keeps the original Z/M columns
            out = old.copy()
            out[:, :2] = new
            return out
        return new

    hz = g.has_z if w == 2 else (w >= 3)
    hm = g.has_m if w == 2 else (w == 4)
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        if not len(g.xys):
            return g
        return Geom(t, xys=block(len(g.xys), g.xys), has_z=hz, has_m=hm)
    if t == GeomType.POLYGON:
        return Geom(t, rings=[block(len(r), r) for r in g.rings], has_z=hz, has_m=hm)
    parts = [_rebuild(p, it, w) for p in g.parts]
    return Geom(t, parts=parts,
                has_z=any(p.has_z for p in parts),
                has_m=any(p.has_m for p in parts))


def next_block(it, n, w: int = 2):
    out = np.empty((n, w))
    for k in range(n):
        out[k] = next(it)[:w]
    return out


def set_coordinates(geometry, coordinates):
    """coordinates.py:398 — new geometries with coords replaced.  (n,2)
    input replaces xy (keeping existing Z/M); (n,3|4) input replaces the
    full coordinate tuple and forces that dimensionality."""
    coords = np.asarray(coordinates, dtype=np.float64)
    if coords.ndim != 2:
        coords = coords.reshape(-1, 2)
    w = coords.shape[1]
    it = iter(coords)
    if isinstance(geometry, Geom):
        return _rebuild(geometry, it, w)
    return np.array(
        [None if g is None else _rebuild(g, it, w) for g in geometry], dtype=object
    )


def transform(geometry, transformation, include_z: bool = False):
    """coordinates.py:28 — apply f((N,2|3)) -> (N,2|3) to every
    geometry's coord block (the user-extension surface, ops.py:216).
    include_z=False discards any third dimension (reference :37-40);
    include_z=True feeds (N,3) (NaN z for 2-D inputs) and preserves each
    input's dimensionality."""

    def one(g):
        if g is None:
            return None
        if include_z:
            c = get_coordinates(g, include_z=True)
            out = np.asarray(transformation(c), dtype=np.float64)
            if not g.has_z:
                out = out[:, :2]
            res = set_coordinates(g, out)
        else:
            from engine.geo.ops import force_2d

            c = get_coordinates(g)
            out = np.asarray(transformation(c), dtype=np.float64)
            res = set_coordinates(force_2d(g), out)
        if res is g:
            # transform always returns a NEW geometry (reference
            # coordinates.py:28 — prepare-with-copy idioms rely on it)
            import copy as _copy

            res = _copy.copy(g)
            res._prepared = False
        return res

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
            if not len(g.xys):
                return g
            return Geom(t, xys=np.asarray(transformation(g.xys), dtype=np.float64))
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
            rings.append(Geom(GeomType.LINEARRING, xys=r.copy()))
            idx.append(i)
    out = np.array(rings, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def get_num_coordinates(geometry):
    return count_coordinates(geometry)


def get_x(point):
    """_geometry.py:274 — x of a point; nan for non-points/missing."""

    def one(g):
        if g is None or g.is_empty or g.type_id != GeomType.POINT:
            return np.nan
        return float(g.xys[0, 0])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_y(point):
    """_geometry.py:302 — y of a point; nan for non-points/missing."""

    def one(g):
        if g is None or g.is_empty or g.type_id != GeomType.POINT:
            return np.nan
        return float(g.xys[0, 1])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_z(point):
    """_geometry.py:330 — z of a point; nan for non-points, missing
    geometries, and 2-D / XYM points."""

    def one(g):
        if g is None or g.is_empty or g.type_id != GeomType.POINT or not g.has_z:
            return np.nan
        return float(g.xys[0, 2])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_m(point):
    """_geometry.py:362 — m of a point; nan unless the point has M
    (column 2 for XYM, column 3 for XYZM)."""

    def one(g):
        if g is None or g.is_empty or g.type_id != GeomType.POINT or not g.has_m:
            return np.nan
        return float(g.xys[0, 2 + int(g.has_z)])

    if isinstance(point, Geom) or point is None:
        return one(point)
    return np.array([one(g) for g in point])


def get_coordinate_dimension(geometry):
    """_geometry.py:136 — 2 (XY), 3 (XYZ or XYM), 4 (XYZM), -1 missing."""

    def one(g):
        if g is None:
            return -1
        return 2 + int(g.has_z) + int(g.has_m)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=np.int64)


def get_dimensions(geometry):
    """_geometry.py:100 — inherent (topological) dimension: 0 points,
    1 lines, 2 polygons; collections take the max; empty collections and
    None → -1."""

    def one(g):
        if g is None:
            return -1
        t = g.type_id
        if t == GeomType.POINT or t == GeomType.MULTIPOINT:
            return 0
        if t in (GeomType.LINESTRING, GeomType.LINEARRING, GeomType.MULTILINESTRING):
            return 1
        if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
            return 2
        return max((one(p) for p in g.parts), default=-1)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=np.int64)


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
        return Geom(GeomType.LINEARRING, xys=g.rings[0].copy())

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
        return Geom(GeomType.LINEARRING, xys=holes[i].copy())

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
