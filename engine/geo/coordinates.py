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


def get_coordinates(geometry, *args, include_z: bool = False,
                    return_index: bool = False, include_m: bool = False):
    """coordinates.py:324 — (N, 2|3|4) coords of all input geometries,
    with optional source-geometry index (the ragged offsets!).  With
    ``include_z``/``include_m``, geometries lacking that dimension yield
    NaN (reference behavior).  N-D geometry arrays flatten in C order."""
    if args:
        import warnings

        names = ["`include_z`", "`return_index`"][: len(args)]
        if len(names) == 1:
            msg = (f"positional argument {names[0]} for `get_coordinates` "
                   "is deprecated.")
        else:
            msg = (f"positional arguments {' and '.join(names)} for "
                   "`get_coordinates` are deprecated.")
        warnings.warn(msg, DeprecationWarning, stacklevel=2)
        include_z = args[0]
        if len(args) > 1:
            return_index = args[1]
        if len(args) > 2:
            include_m = args[2]
    if isinstance(geometry, Geom) or geometry is None:
        geoms = [geometry]
    else:
        geoms = list(np.asarray(geometry, dtype=object).ravel())
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


def _rebuild(g: Geom, it, w: int, keep_dims: bool) -> Geom:
    """Rebuild one geometry from the coordinate iterator.

    Reference set_coordinates rule (coordinates.py:398-404): width-2
    input makes every output 2-D; width-3 input preserves each
    geometry's own dimensionality.  ``keep_dims`` is the engine-internal
    variant (snap/set_precision) that patches xy in place and keeps
    existing Z/M columns.
    """
    from engine.geo.errors import GEOSException

    t = g.type_id

    def block(n, old):
        new = next_block(it, n, w)
        if keep_dims and old.shape[1] > 2:
            out = old.copy()
            out[:, :2] = new[:, :2]
            return out
        if w == 2:
            return new
        if not g.has_z and not g.has_m:
            return np.ascontiguousarray(new[:, :2])
        own_w = 2 + int(g.has_z) + int(g.has_m)
        return np.ascontiguousarray(new[:, :own_w])

    if keep_dims:
        hz, hm = g.has_z, g.has_m
    elif w == 2:
        hz = hm = False
    else:
        hz, hm = g.has_z, g.has_m
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        if not len(g.xys):
            return Geom(t, has_z=hz, has_m=hm)
        c = block(len(g.xys), g.xys)
        if t == GeomType.LINEARRING and len(c) and not np.array_equal(
            c[0], c[-1]
        ):
            raise GEOSException(
                "IllegalArgumentException: Points of LinearRing do not "
                "form a closed linestring"
            )
        return Geom(t, xys=c, has_z=hz, has_m=hm)
    if t == GeomType.POLYGON:
        rings = []
        for r in g.rings:
            c = block(len(r), r)
            if len(c) and not np.array_equal(c[0], c[-1]):
                raise GEOSException(
                    "IllegalArgumentException: Points of LinearRing do not "
                    "form a closed linestring"
                )
            rings.append(c)
        return Geom(t, rings=rings, has_z=hz, has_m=hm)
    parts = [_rebuild(p, it, w, keep_dims) for p in g.parts]
    return Geom(t, parts=parts,
                has_z=any(p.has_z for p in parts),
                has_m=any(p.has_m for p in parts))


def next_block(it, n, w: int = 2):
    out = np.empty((n, w))
    for k in range(n):
        row = next(it)
        out[k] = row[:w] if len(row) >= w else list(row) + [np.nan] * (w - len(row))
    return out


def set_coordinates(geometry, coordinates, _keep_dims: bool = False):
    """coordinates.py:398 — new geometries with coords replaced.  (n,2)
    input makes all outputs 2-D; (n,3) input preserves each geometry's
    own dimensionality.  0-d array input returns a 0-d array."""
    coords = np.asarray(coordinates, dtype=np.float64)
    if coords.ndim != 2:
        coords = coords.reshape(-1, 2)
    w = coords.shape[1]
    it = iter(coords)
    if isinstance(geometry, Geom):
        return _rebuild(geometry, it, w, _keep_dims)
    arr = np.asarray(geometry, dtype=object)
    out = np.empty(arr.shape, dtype=object)
    for idx in np.ndindex(arr.shape):
        g = arr[idx]
        out[idx] = None if g is None else _rebuild(g, it, w, _keep_dims)
    return out


def _apply_transformation(coords, transformation, interleaved):
    if interleaved:
        new = transformation(coords)
    else:
        new = np.asarray(transformation(*coords.T), dtype=np.float64).T
    if not isinstance(new, np.ndarray) or new.ndim != 2:
        raise ValueError(
            "The provided transformation did not return a two-dimensional "
            "numpy array"
        )
    if new.dtype != np.float64:
        raise ValueError(
            "The provided transformation returned an array with an "
            f"unexpected dtype ({new.dtype})"
        )
    if new.shape != coords.shape:
        raise ValueError(
            "The provided transformation returned an array with an "
            f"unexpected shape ({new.shape})"
        )
    return new


def transform(geometry, transformation, *args, include_z: bool = False,
              interleaved: bool = True):
    """coordinates.py:28 — gather ALL coordinates of the input (ONE
    call to the transformation for the whole array — the map_batches
    shape), then scatter back.  include_z=False → 2-D outputs;
    True → (N,3) with NaN z, dims preserved; None → inferred per
    geometry via has_z (two passes).  interleaved=False calls
    f(x, y[, z]) with 1-D arrays and expects a tuple back."""
    if args:
        import warnings

        warnings.warn(
            "positional argument `include_z` for `transform` is "
            "deprecated. Please use a keyword argument instead.",
            DeprecationWarning, stacklevel=2,
        )
        include_z = args[0]
    arr = np.array(geometry, dtype=object)  # copy, like the reference
    if include_z is None:
        from engine.geo.coverage import has_z as _has_z

        flat = arr.ravel()
        out = np.empty(flat.shape, dtype=object)
        hz = np.array([g is not None and g.has_z for g in flat], dtype=bool)
        for mask, inc in ((hz, True), (~hz, False)):
            if mask.any():
                out[mask] = np.atleast_1d(transform(
                    flat[mask], transformation, include_z=inc,
                    interleaved=interleaved,
                ))
        result = out.reshape(arr.shape)
    else:
        flat = arr.ravel()
        coords = get_coordinates(flat, include_z=include_z)
        new = _apply_transformation(coords, transformation, interleaved)
        res_flat = np.empty(flat.shape, dtype=object)
        it = iter(new)
        w = new.shape[1]
        for i, g in enumerate(flat):
            if g is None:
                res_flat[i] = None
                continue
            res = _rebuild(g, it, w, False)
            if res is g:
                import copy as _copy

                res = _copy.copy(g)
                res._prepared = False
            res_flat[i] = res
        result = res_flat.reshape(arr.shape)
    if result.ndim == 0 and not isinstance(geometry, np.ndarray):
        return result.item()
    return result


def transform_coordseq(geom, transformation, *, include_z: bool = False,
                       interleaved: bool = True):
    """coordinates.py:177 — like transform, but the function is applied
    per coordinate SEQUENCE (one ring / one line at a time) and may
    change the number of coordinates."""
    if include_z is None:
        include_z = bool(geom is not None and geom.has_z)

    def seq(c, hz, hm):
        width = 3 if include_z else 2
        block = np.full((len(c), width), np.nan)
        block[:, :2] = c[:, :2]
        if include_z and hz and c.shape[1] > 2:
            block[:, 2] = c[:, 2]
        # coordseq transformations may return lists and change N
        if interleaved:
            new = np.asarray(transformation(block), dtype=np.float64)
        else:
            new = np.asarray(
                transformation(*block.T), dtype=np.float64
            ).T
        if new.ndim != 2:
            raise ValueError(
                "The provided transformation did not return a "
                "two-dimensional array"
            )
        if include_z and hz:
            return new, True
        return np.ascontiguousarray(new[:, :2]), False

    def one(g):
        if g is None:
            return None
        t = g.type_id
        if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
            if not len(g.xys):
                return Geom(t, has_z=g.has_z and bool(include_z))
            c, hz = seq(g.xys, g.has_z, g.has_m)
            return Geom(t, xys=c, has_z=hz)
        if t == GeomType.POLYGON:
            rings = [seq(r, g.has_z, g.has_m) for r in g.rings]
            return Geom(t, rings=[r for r, _ in rings],
                        has_z=any(hz for _, hz in rings))
        if g.parts:
            parts = [one(p) for p in g.parts]
            return Geom(t, parts=parts,
                        has_z=any(p.has_z for p in parts),
                        has_m=any(p.has_m for p in parts))
        return Geom(t, has_z=g.has_z and bool(include_z))

    if geom is not None and not isinstance(geom, Geom):
        raise TypeError("transform_coordseq only accepts scalar geometries")
    return one(geom)


def _explode_input(geometry, func_name):
    if isinstance(geometry, Geom) or geometry is None:
        return [geometry]
    arr = np.asarray(geometry, dtype=object)
    if arr.ndim == 0:
        raise TypeError(
            "One of the arguments is of incorrect type. "
            "Please provide only Geometry objects."
        )
    if arr.ndim != 1:
        raise ValueError("Array should be one dimensional")
    for g in arr:
        if g is not None and not isinstance(g, Geom):
            raise TypeError(
                "One of the arguments is of incorrect type. "
                "Please provide only Geometry objects."
            )
    return list(arr)


def get_parts(geometry, *args, return_index: bool = False):
    """_geometry.py:646 — explode multi-parts one level (the Arrow list
    flatten of SURVEY.md §2.12).  Simple geometries (including EMPTY)
    pass through; only 1-D arrays are accepted."""
    if args:
        import warnings

        warnings.warn(
            "positional argument `return_index` for `get_parts` is "
            "deprecated. Please use a keyword argument instead.",
            DeprecationWarning, stacklevel=2,
        )
        return_index = args[0]
    geoms = _explode_input(geometry, "get_parts")
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
        else:
            parts.append(g)
            idx.append(i)
    out = np.array(parts, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def get_rings(geometry, *args, return_index: bool = False):
    """_geometry.py:717 — rings of polygons as linearrings."""
    if args:
        import warnings

        warnings.warn(
            "positional argument `return_index` for `get_rings` is "
            "deprecated. Please use a keyword argument instead.",
            DeprecationWarning, stacklevel=2,
        )
        return_index = args[0]
    geoms = _explode_input(geometry, "get_rings")
    rings = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None or g.type_id != GeomType.POLYGON:
            continue
        for r in g.rings:
            rings.append(Geom(GeomType.LINEARRING, xys=r.copy(),
                              has_z=g.has_z, has_m=g.has_m))
            idx.append(i)
    out = np.array(rings, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def get_num_coordinates(geometry):
    """_geometry.py:163 — PER-GEOMETRY coordinate counts (unlike
    count_coordinates, which totals over the whole input)."""

    def one(g):
        if g is None:
            return 0
        return sum(len(b) for b in _walk_blocks(g))

    if isinstance(geometry, Geom) or geometry is None:
        return np.int64(one(geometry))
    return np.array([one(g) for g in geometry], dtype=np.int64)


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
        return np.int64(one(geometry))  # numpy scalar (ufunc parity)
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

    _MULTI = (GeomType.MULTIPOINT, GeomType.MULTILINESTRING,
              GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION)

    def one(g):
        if g is None:
            return 0
        if g.type_id in _MULTI:
            return len(g.parts)
        return 1  # simple types count 1 even when EMPTY (GEOS)

    if isinstance(geometry, Geom) or geometry is None:
        return np.int64(one(geometry))
    return np.array([one(g) for g in geometry], dtype=np.int64)


def get_exterior_ring(polygon):
    """_geometry.py:482."""

    def one(g):
        if g is None or g.type_id != GeomType.POLYGON or g.is_empty:
            return None
        return Geom(GeomType.LINEARRING, xys=g.rings[0].copy(),
                    has_z=g.has_z, has_m=g.has_m)

    if isinstance(polygon, Geom) or polygon is None:
        return one(polygon)
    return np.array([one(g) for g in polygon], dtype=object)


def get_interior_ring(polygon, index):
    """_geometry.py:510."""

    def one(g, i):
        if g is None or g.type_id != GeomType.POLYGON:
            return None
        i = int(i)
        holes = g.rings[1:]
        n = len(holes)
        if i < -n or i >= n:
            return None
        return Geom(GeomType.LINEARRING, xys=holes[i].copy(),
                    has_z=g.has_z, has_m=g.has_m)

    from engine.geo.ops import _broadcast_geom_index

    return _broadcast_geom_index(one, polygon, index)


def get_num_interior_rings(polygon):
    def one(g):
        if g is None or g.type_id != GeomType.POLYGON:
            return 0
        return max(0, len(g.rings) - 1)

    if isinstance(polygon, Geom) or polygon is None:
        return one(polygon)
    return np.array([one(g) for g in polygon], dtype=np.int64)
