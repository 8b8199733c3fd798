"""Vectorized constructors (reference shapely/creation.py, 837 LoC, and
the _geometry_helpers.pyx grouping kernels).

points:54 (handle_nan allow/skip/error), linestrings:142,
linearrings:236 (auto-close), polygons:334 (+holes), box:448 (ccw),
multipoints:500, multilinestrings:585, multipolygons:641,
geometrycollections:696, empty:805.  The ``indices`` forms implement
simple_geometries_1d / collections_1d semantics
(_geometry_helpers.pyx:131,300): sorted indices, bincount grouping,
missing-index ValueError unless ``out`` is supplied, None members
skipped, member-type checks.
"""

from __future__ import annotations

import numpy as np

from engine.geo.errors import GEOSException
from engine.geo.geom import Geom, GeomType

_NAN_MSG = (
    "A NaN, Inf or -Inf coordinate was supplied. Remove the "
    "coordinate or adapt the 'handle_nan' parameter."
)
_HANDLE_NAN = {"allow": 0, "skip": 1, "error": 2, 0: 0, 1: 1, 2: 2}


def _coerce(coords) -> np.ndarray:
    return np.asarray(coords, dtype=np.float64)


def _handle_nan_value(handle_nan):
    try:
        return _HANDLE_NAN[handle_nan]
    except (KeyError, TypeError):
        raise ValueError(f"Invalid handle_nan value: {handle_nan!r}") from None


def _check_width(w: int) -> None:
    if w not in (2, 3):
        raise ValueError(
            f"The ordinate (last) dimension should be 2 or 3, got {w}"
        )


def _check_out_array(out, size: int) -> np.ndarray:
    """_geometry_helpers.pyx:49 — validate a user-supplied out array."""
    if out is None:
        return np.empty(shape=(size,), dtype=object)
    if not isinstance(out, np.ndarray):
        raise TypeError("out array must be of numpy.ndarray type")
    if not out.flags.writeable:
        raise TypeError("out array must be writeable")
    if out.dtype != object:
        raise TypeError("out array dtype must be object")
    if out.ndim != 1:
        raise TypeError("out must be a one-dimensional array.")
    if out.shape[0] < size:
        raise ValueError(f"out array is too small ({out.shape[0]} < {size})")
    return out


def _simple_1d(coords, indices, typ: GeomType, handle_nan, out=None):
    """simple_geometries_1d (_geometry_helpers.pyx:131): group sorted
    indices via bincount; each group's coordinate run becomes one
    point/linestring/linearring."""
    hn = _handle_nan_value(handle_nan)
    coords = np.asarray(coords, dtype=np.float64, order="C")
    if coords.ndim != 2:
        raise TypeError("coordinates must be a two-dimensional array.")
    indices = np.asarray(indices, dtype=np.intp)
    if indices.ndim != 1:
        raise TypeError("indices must be a one-dimensional array.")
    if coords.shape[0] != indices.shape[0]:
        raise ValueError("geometries and indices do not have equal size.")
    if coords.shape[1] not in (2, 3):
        raise ValueError("coordinates should be N by 2 or N by 3.")
    if coords.shape[0] == 0:
        return np.empty(shape=(0,), dtype=object)
    if np.any(indices[1:] < indices[:-1]):
        raise ValueError("The indices must be sorted.")
    counts = np.bincount(indices)  # raises ValueError on negatives
    allow_missing = out is not None
    out = _check_out_array(out, len(counts))
    pos = 0
    for i, n in enumerate(counts):
        if n == 0:
            if allow_missing:
                continue
            raise ValueError(f"Index {i} is missing from the input indices.")
        out[i] = _simple_one(coords[pos:pos + n], typ, hn)
        pos += n
    return out


def _simple_one(c: np.ndarray, typ: GeomType, hn: int) -> Geom:
    """Build one point/linestring/linearring from a (n, 2|3) block,
    applying handle_nan and the GEOS size rules."""
    bad = ~np.isfinite(c).all(axis=1)
    if bad.any():
        if hn == 2:
            raise ValueError(_NAN_MSG)
        if hn == 1:
            c = c[~bad]
    has_z = c.shape[1] >= 3
    if typ == GeomType.POINT:
        if len(c) == 0 or (hn != 0 and bad.all() and len(c) == 0):
            return Geom(GeomType.POINT, has_z=has_z)
        if len(c) > 1:
            raise GEOSException(
                "IllegalArgumentException: point array must contain 0 or 1 "
                "elements"
            )
        return Geom(GeomType.POINT, xys=c.copy(), has_z=has_z)
    if typ == GeomType.LINESTRING:
        if len(c) == 0:
            return Geom(GeomType.LINESTRING, has_z=has_z)
        if len(c) == 1:
            raise GEOSException(
                "IllegalArgumentException: point array must contain 0 or >1 "
                "elements"
            )
        return Geom(GeomType.LINESTRING, xys=c.copy(), has_z=has_z)
    # LINEARRING: auto-close on the first coordinate (also when closed
    # but under 4 coords), then the GEOS 0-or->=4 size rule
    if len(c) == 0:
        return Geom(GeomType.LINEARRING, has_z=has_z)
    if not np.array_equal(c[0], c[-1]) or len(c) < 4:
        if not np.isfinite(c[0]).all():
            raise GEOSException(
                "IllegalArgumentException: Points of LinearRing do not form "
                "a closed linestring"
            )
        c = np.vstack([c, c[:1]])
    if 0 < len(c) < 4:
        raise ValueError("A linearring requires at least 4 coordinates.")
    return Geom(GeomType.LINEARRING, xys=c.copy(), has_z=has_z)




def _positional_indices(func_name, args, indices):
    """Reference 2.1 deprecates passing ``indices`` positionally
    (decorators.deprecate_positional); accept it with a warning."""
    if not args:
        return indices
    if len(args) > 1 or indices is not None:
        raise TypeError(f"{func_name}() got multiple values for 'indices'")
    import warnings

    warnings.warn(
        f"positional argument `indices` for `{func_name}` is deprecated. "
        "It will need to be passed as a keyword argument in a future "
        "release.", DeprecationWarning, stacklevel=3,
    )
    return args[0]

def points(coords, y=None, z=None, *args, indices=None,
           handle_nan="allow", out=None):
    """creation.py:54 — scalar for a single (x, y[, z]); arrays map over
    the leading axes.  Width must be 2 or 3 (XYZM points come from
    WKT/WKB, matching the reference)."""
    indices = _positional_indices("points", args, indices)
    hn = _handle_nan_value(handle_nan)
    scalar = False
    if y is not None:
        arrs = [np.asarray(coords, dtype=np.float64),
                np.asarray(y, dtype=np.float64)]
        if z is not None:
            arrs.append(np.asarray(z, dtype=np.float64))
        scalar = all(a.ndim == 0 for a in arrs)
        coords = np.stack(np.broadcast_arrays(*arrs), axis=-1)
    if indices is not None:
        return _simple_1d(coords, indices, GeomType.POINT, handle_nan, out)
    c = _coerce(coords)
    if c.ndim == 1:
        c = c[None, :]
        scalar = True
    _check_width(c.shape[-1])
    flat = c.reshape(-1, c.shape[-1])
    res = np.empty(len(flat), dtype=object)
    for i, row in enumerate(flat):
        res[i] = _simple_one(row[None, :], GeomType.POINT, hn)
    if scalar:
        return res[0]
    res = res.reshape(c.shape[:-1])
    if out is not None:
        out[...] = res
        return out
    return res


def _simple_many(coords, typ: GeomType, hn: int, out=None):
    """Shared array path for linestrings/linearrings: (n, w) is ONE
    geometry, (k, n, w) is k geometries."""
    c = _coerce(coords)
    if c.ndim == 1:
        raise ValueError(
            "coordinates must be at least two-dimensional "
            "(an array of coordinate pairs)"
        )
    _check_width(c.shape[-1])
    if c.ndim == 2:
        return _simple_one(c, typ, hn)
    flat = c.reshape(-1, *c.shape[-2:])
    res = np.empty(len(flat), dtype=object)
    for i, block in enumerate(flat):
        res[i] = _simple_one(block, typ, hn)
    res = res.reshape(c.shape[:-2])
    if out is not None:
        out[...] = res
        return out
    return res


def linestrings(coords, y=None, z=None, *args, indices=None,
                handle_nan="allow", out=None):
    """creation.py:142 — (n, 2|3) = one linestring, (k, n, 2|3) = k."""
    indices = _positional_indices("linestrings", args, indices)
    hn = _handle_nan_value(handle_nan)
    if y is not None:
        arrs = [np.asarray(coords, dtype=np.float64),
                np.asarray(y, dtype=np.float64)]
        if z is not None:
            arrs.append(np.asarray(z, dtype=np.float64))
        coords = np.stack(np.broadcast_arrays(*arrs), axis=-1)
    if indices is not None:
        return _simple_1d(coords, indices, GeomType.LINESTRING, handle_nan, out)
    return _simple_many(coords, GeomType.LINESTRING, hn, out)


def linearrings(coords, y=None, z=None, *args, indices=None,
                handle_nan="allow", out=None):
    """creation.py:236 — auto-closes unclosed input (first coordinate)."""
    indices = _positional_indices("linearrings", args, indices)
    hn = _handle_nan_value(handle_nan)
    if y is not None:
        arrs = [np.asarray(coords, dtype=np.float64),
                np.asarray(y, dtype=np.float64)]
        if z is not None:
            arrs.append(np.asarray(z, dtype=np.float64))
        coords = np.stack(np.broadcast_arrays(*arrs), axis=-1)
    if indices is not None:
        return _simple_1d(coords, indices, GeomType.LINEARRING, handle_nan, out)
    return _simple_many(coords, GeomType.LINEARRING, hn, out)


def _ring_of(g) -> np.ndarray | None:
    """Ring coordinates of a member passed to polygons()."""
    if g is None:
        return None
    if isinstance(g, Geom):
        if g.type_id != GeomType.LINEARRING:
            raise TypeError(
                f"One of the arguments has unexpected geometry type "
                f"{int(g.type_id)}."
            )
        if g.is_empty:
            return None
        return g.xys
    raise TypeError(
        "One of the arguments is of incorrect type. "
        "Please provide only Geometry objects."
    )


def _close_ring(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    if 0 < len(r) < 4:
        raise ValueError("A linearring requires at least 4 coordinates.")
    return r


def polygons(geometries, holes=None, *args, indices=None, out=None):
    """creation.py:334 — from rings (Geom rings or coordinate arrays);
    ``indices`` groups rings into polygons (first non-None ring of each
    group is the shell, the rest are holes)."""
    indices = _positional_indices("polygons", args, indices)
    if indices is not None:
        if holes is not None:
            raise TypeError(
                "Cannot specify separate holes array when using indices."
            )
        rings = np.asarray(geometries, dtype=object)
        if rings.ndim != 1:
            raise TypeError("geometries must be a one-dimensional array.")
        idx = np.asarray(indices, dtype=np.intp)
        if idx.ndim != 1:
            raise TypeError("indices must be a one-dimensional array.")
        if rings.shape[0] != idx.shape[0]:
            raise ValueError("geometries and indices do not have equal size.")
        if rings.shape[0] == 0:
            return np.empty(shape=(0,), dtype=object)
        if np.any(idx[1:] < idx[:-1]):
            raise ValueError("The indices should be sorted.")
        counts = np.bincount(idx)
        allow_missing = out is not None
        out = _check_out_array(out, len(counts))
        pos = 0
        for i, n in enumerate(counts):
            if n == 0:
                if allow_missing:
                    continue
                raise ValueError(
                    f"Index {i} is missing from the input indices."
                )
            members = [_ring_of(g) for g in rings[pos:pos + n]]
            members = [m for m in members if m is not None]
            pos += n
            if not members:
                out[i] = Geom.empty(GeomType.POLYGON)
            else:
                out[i] = Geom(
                    GeomType.POLYGON,
                    rings=[_close_ring(m) for m in members],
                    has_z=members[0].shape[1] >= 3,
                )
        return out

    if geometries is None:
        return Geom.empty(GeomType.POLYGON)

    def one(shell, hs):
        if shell is None:
            return Geom.empty(GeomType.POLYGON)
        if isinstance(shell, Geom):
            sh = _ring_of(shell)
            if sh is None:
                return Geom.empty(GeomType.POLYGON)
        else:
            sh = _coerce(shell)
            _check_width(sh.shape[-1])
        ring_list = [_close_ring(sh)]
        for h in hs or ():
            hr = _ring_of(h) if (h is None or isinstance(h, Geom)) else _coerce(h)
            if hr is None or len(hr) == 0:
                continue
            ring_list.append(_close_ring(hr))
        return Geom(GeomType.POLYGON, rings=ring_list,
                    has_z=ring_list[0].shape[1] >= 3)

    if isinstance(geometries, Geom):
        return one(geometries, holes)
    if not (isinstance(geometries, np.ndarray)
            and geometries.dtype == object):
        try:
            arr = np.asarray(geometries, dtype=np.float64)
        except (TypeError, ValueError):
            arr = None
        if arr is not None:
            if arr.ndim == 1:
                raise ValueError(
                    "coordinates must be at least two-dimensional "
                    "(an array of coordinate pairs)"
                )
            _check_width(arr.shape[-1])
            if arr.ndim == 2:
                return one(arr, holes)
            flat = arr.reshape(-1, *arr.shape[-2:])
            hole_rows = _broadcast_holes(holes, len(flat))
            res = np.empty(len(flat), dtype=object)
            for i, block in enumerate(flat):
                res[i] = one(block, hole_rows[i])
            res = res.reshape(arr.shape[:-2])
            if out is not None:
                out[...] = res
                return out
            return res
    shells = list(geometries)
    hole_rows = _broadcast_holes(holes, len(shells))
    res = np.empty(len(shells), dtype=object)
    for i, s in enumerate(shells):
        res[i] = one(s, hole_rows[i])
    if out is not None:
        out[...] = res
        return out
    return res


def _broadcast_holes(holes, n):
    """holes may be one hole-list shared by every shell or one per shell."""
    if holes is None:
        return [None] * n
    holes = list(holes)
    if holes and (
        isinstance(holes[0], Geom) or holes[0] is None
        or (np.asarray(holes[0]).ndim == 2)
    ):
        return [holes] * n
    if len(holes) != n:
        raise ValueError("Holes and shells have incompatible lengths.")
    return holes


def box(xmin, ymin, xmax, ymax, *args, ccw: bool = True, **kwargs):
    """creation.py:448 — NaN input produces None (GEOS parity)."""
    if args:
        import warnings

        warnings.warn(
            "positional argument `ccw` for `box` is deprecated",
            DeprecationWarning, stacklevel=2,
        )
        ccw = args[0]
    scalars = all(
        np.asarray(v, dtype=np.float64).ndim == 0
        for v in (xmin, ymin, xmax, ymax)
    ) and np.asarray(ccw).ndim == 0
    xmin, ymin, xmax, ymax, ccw_arr = np.broadcast_arrays(*(
        np.atleast_1d(np.asarray(v))
        for v in (xmin, ymin, xmax, ymax, ccw)
    ))
    out = [
        None if not np.isfinite(
            np.array([a, b, c, d], dtype=np.float64)).all()
        else Geom.box(float(a), float(b), float(c), float(d), ccw=bool(w))
        for a, b, c, d, w in zip(xmin, ymin, xmax, ymax, ccw_arr)
    ]
    return out[0] if scalars else np.array(out, dtype=object)


_MEMBER_TYPES = {
    GeomType.MULTIPOINT: (GeomType.POINT,),
    GeomType.MULTILINESTRING: (GeomType.LINESTRING, GeomType.LINEARRING),
    GeomType.MULTIPOLYGON: (GeomType.POLYGON,),
    GeomType.GEOMETRYCOLLECTION: None,
}


def _zm(parts):
    """Z/M flags of a collection follow its members (GEOS GEOSHasZ
    semantics: any member with the dimension marks the collection)."""
    return dict(
        has_z=any(p.has_z for p in parts), has_m=any(p.has_m for p in parts)
    )


def _one_collection(members, type_id: GeomType) -> Geom:
    """create_collection semantics: None skipped, member types checked."""
    expected = _MEMBER_TYPES[type_id]
    parts = []
    for g in members:
        if g is None:
            continue
        if not isinstance(g, Geom):
            raise TypeError(
                "One of the arguments is of incorrect type. "
                "Please provide only Geometry objects."
            )
        if expected is not None and g.type_id not in expected:
            raise TypeError(
                f"One of the arguments has unexpected geometry type "
                f"{int(g.type_id)}."
            )
        parts.append(g)
    if not parts:
        return Geom.empty(type_id)
    return Geom(type_id, parts=parts, **_zm(parts))


def _collections_1d(geometries, indices, type_id: GeomType, out=None):
    """collections_1d (_geometry_helpers.pyx:300)."""
    geoms = np.asarray(geometries, dtype=object)
    if geoms.ndim != 1:
        raise TypeError("geometries must be a one-dimensional array.")
    idx = np.asarray(indices, dtype=np.intp)
    if idx.ndim != 1:
        raise TypeError("indices must be a one-dimensional array.")
    if geoms.shape[0] != idx.shape[0]:
        raise ValueError("geometries and indices do not have equal size.")
    if geoms.shape[0] == 0:
        return np.empty(shape=(0,), dtype=object)
    if np.any(idx[1:] < idx[:-1]):
        raise ValueError("The indices should be sorted.")
    counts = np.bincount(idx)
    allow_missing = out is not None
    out = _check_out_array(out, len(counts))
    pos = 0
    for i, n in enumerate(counts):
        if n == 0:
            if allow_missing:
                continue
            raise ValueError(f"Index {i} is missing from the input indices.")
        out[i] = _one_collection(geoms[pos:pos + n], type_id)
        pos += n
    return out


def _multi(type_id, numeric_ctor, func_name):
    def ctor(geometries, *args, indices=None, out=None):
        indices = _positional_indices(func_name, args, indices)
        if indices is not None:
            g = np.asarray(geometries) if not isinstance(geometries, Geom) \
                else geometries
            if isinstance(g, np.ndarray) and g.dtype != object and \
                    np.issubdtype(g.dtype, np.number):
                g = numeric_ctor(g)
                g = np.atleast_1d(g)
            return _collections_1d(g, indices, type_id, out=out)
        if isinstance(geometries, Geom):
            raise TypeError("Expected an array of geometries or coordinates")
        arr = np.asarray(geometries)
        if arr.dtype != object and np.issubdtype(arr.dtype, np.number):
            arr = np.atleast_1d(numeric_ctor(arr))
        else:
            arr = np.asarray(geometries, dtype=object)
        if arr.ndim == 1:
            res = _one_collection(arr, type_id)
            if out is not None:
                out[...] = res
                return out
            return res
        flat = arr.reshape(-1, arr.shape[-1])
        res = np.empty(len(flat), dtype=object)
        for i in range(len(flat)):
            res[i] = _one_collection(flat[i], type_id)
        res = res.reshape(arr.shape[:-1])
        if out is not None:
            out[...] = res
            return out
        return res

    return ctor


multipoints = _multi(GeomType.MULTIPOINT, lambda c: points(c),
                     "multipoints")
multilinestrings = _multi(GeomType.MULTILINESTRING, lambda c: linestrings(c),
                          "multilinestrings")
multipolygons = _multi(GeomType.MULTIPOLYGON, lambda c: polygons(c),
                       "multipolygons")
geometrycollections = _multi(GeomType.GEOMETRYCOLLECTION, lambda c: c,
                             "geometrycollections")


def empty(shape, geom_type=None, order="C"):
    """creation.py:805 — None-filled, or filled with typed EMPTY
    geometries when geom_type is given."""
    if geom_type is None:
        return np.empty(shape, dtype=object, order=order)
    geom_type = GeomType(geom_type)
    if geom_type is GeomType.MISSING:
        return np.empty(shape, dtype=object, order=order)
    fill = Geom.empty(geom_type)
    return np.full(shape, fill, dtype=object, order=order)
