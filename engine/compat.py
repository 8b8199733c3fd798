"""shapely-compatible flat namespace (the switch-over façade).

``import engine.compat as shapely`` exposes the reference's top-level
API names (shapely/__init__.py surface) mapped onto this engine's
implementations, so pipelines written against the reference's module
layout port by changing one import.  Scalar classes are constructor
functions returning the engine's Geom (which carries the OO sugar:
.area, .buffer(), .intersects(), operators — geometry/base.py:197-209).
"""

from __future__ import annotations

import numpy as np

from engine.geo.affinity import (  # noqa: F401
    affine_transform, rotate, scale, skew, translate,
)
from engine.geo.constructive import (  # noqa: F401
    boundary, buffer, centroid, clip_by_rect, convex_hull, envelope,
    extract_unique_points, minimum_bounding_circle, minimum_rotated_rectangle,
    normalize, offset_curve, orient_polygons, oriented_envelope,
    point_on_surface, remove_repeated_points, reverse, segmentize, simplify,
)
from engine.geo.coordinates import (  # noqa: F401
    count_coordinates, get_coordinate_dimension, get_coordinates,
    get_dimensions, get_exterior_ring, get_interior_ring, get_m,
    get_num_coordinates, get_num_geometries, get_num_interior_rings, get_parts,
    get_rings, get_type_id, get_x, get_y, get_z, set_coordinates, transform,
    transform_coordseq,
)
from engine.geo.coverage import (  # noqa: F401
    coverage_invalid_edges, coverage_is_valid, coverage_simplify, get_srid,
    has_m, has_z, set_srid,
)
from engine.geo.creation import (  # noqa: F401
    box, empty, geometrycollections, linearrings, linestrings, multilinestrings,
    multipoints, multipolygons, points, polygons,
)
from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt  # noqa: F401

# reference enum surface (constructive.py:53,72; _geometry.py:42) —
# GeometryType is the reference's name for the type-id enum
GeometryType = GeomType


from engine.geo.constructive import BufferCapStyle, BufferJoinStyle  # noqa: F401,E402
from engine.geo.io import from_geojson, to_geojson  # noqa: F401
from engine.geo.linear import (  # noqa: F401
    line_interpolate_point, line_locate_point, line_merge, shortest_line,
    substring,
)
from engine.geo.linework import (  # noqa: F401
    build_area, minimum_clearance_line, minimum_width, node, polygonize,
    polygonize_full, shared_paths, snap,
)
from engine.geo.measure import (  # noqa: F401
    area, bounds, distance, frechet_distance, hausdorff_distance, length,
    minimum_bounding_radius, minimum_clearance, total_bounds,
)
from engine.geo.ops import (  # noqa: F401
    force_2d, force_3d, get_geometry, get_num_points, get_point,
    get_precision, get_segments, maximum_inscribed_circle, nearest_points,
    set_precision, split,
)
from engine.geo.predicates import (  # noqa: F401
    contains, contains_properly, contains_xy, covered_by, covers, crosses,
    destroy_prepared, disjoint, dwithin, equals, equals_exact, equals_identical,
    intersects, intersects_xy, is_ccw, is_closed, is_empty, is_geometry,
    is_missing, is_prepared, is_ring, is_simple, is_valid, is_valid_input,
    is_valid_reason, overlaps, prepare, relate, relate_pattern, touches, within,
)
from engine.geo.ragged_io import from_ragged_array, to_ragged_array  # noqa: F401
from engine.geo.set_operations import (  # noqa: F401
    coverage_union, coverage_union_all, difference, disjoint_subset_union,
    disjoint_subset_union_all, intersection, intersection_all,
    symmetric_difference, symmetric_difference_all, unary_union, union,
    union_all,
)
from engine.geo.strtree import STRtree  # noqa: F401
from engine.geo.triangulate import (  # noqa: F401
    concave_hull, constrained_delaunay_triangles, delaunay_triangles,
    voronoi_polygons,
)
from engine.geo.validation import explain_validity, make_valid  # noqa: F401
from engine.geo.wkb import from_wkb, to_wkb  # noqa: F401


# ---------------------------------------------------------- scalar classes
def _Point_ctor(*args):
    """shapely.Point(x, y[, z]) / Point((x, y[, z])) / Point(Point) /
    Point(np.array) / Point() empty — reference geometry/point.py:40-85
    accepted forms (incl. 1-size-vector args, shapely-1.8 compat)."""
    if len(args) == 0:
        return Geom.empty(GeomType.POINT)
    if len(args) > 3:
        raise TypeError(f"Point() takes at most 3 arguments ({len(args)} given)")
    if len(args) == 1:
        ob = args[0]
        if isinstance(ob, Geom):
            if ob.type_id != GeomType.POINT:
                raise ValueError("Invalid values passed to Point constructor")
            return ob
        if hasattr(ob, "__array__"):
            ob = np.asarray(ob)
        coords = np.atleast_1d(np.asarray(list(ob) if not isinstance(ob, np.ndarray) else ob, dtype=np.float64))
        if coords.ndim == 2:
            if coords.shape[0] != 1:
                raise ValueError(
                    "Point() takes only scalar or 1-size vector arguments"
                )
            coords = coords[0]
        args = tuple(coords.tolist())
    else:
        vals = []
        for a in args:
            arr = np.asarray(a, dtype=np.float64)
            if arr.ndim > 0:
                if arr.size != 1:
                    raise ValueError(
                        "Point() takes only scalar or 1-size vector arguments"
                    )
                arr = arr.reshape(())
            vals.append(float(arr))
        args = tuple(vals)
    if len(args) < 2:
        raise ValueError("Invalid values passed to Point constructor")
    z = float(args[2]) if len(args) > 2 else None
    return Geom.point(float(args[0]), float(args[1]), z)


def _line_coords(coords):
    """Reference linestring.py:54-69 input adaptation: LineString /
    LinearRing passthrough, numeric ndarray, or per-element Point/tuple."""
    if hasattr(coords, "__array__") and not isinstance(coords, Geom):
        coords = np.asarray(coords)
    if isinstance(coords, np.ndarray) and np.issubdtype(coords.dtype, np.number):
        coords = np.asarray(coords, dtype=np.float64)
        if coords.ndim == 2 and coords.shape[1] not in (2, 3):
            raise ValueError(
                "The ordinate (last) dimension should be 2 or 3, got "
                f"{coords.shape[1]}"
            )
        return coords

    def one(o):
        if isinstance(o, Geom):
            if o.type_id != GeomType.POINT:
                raise ValueError("sequence elements must be points or coordinates")
            return tuple(o.coords[0])
        return tuple(float(c) for c in o)

    out = np.asarray([one(o) for o in coords], dtype=np.float64)
    if out.ndim == 2 and out.shape[1] not in (2, 3):
        # creation ufunc parity (_geometry_helpers.pyx)
        raise ValueError(
            "The ordinate (last) dimension should be 2 or 3, got "
            f"{out.shape[1]}"
        )
    return out


def _LineString_ctor(coords=None):
    if coords is None:
        return Geom.empty(GeomType.LINESTRING)
    if isinstance(coords, Geom):
        if coords.type_id == GeomType.LINESTRING:
            return coords
        if coords.type_id == GeomType.LINEARRING:
            return Geom.linestring(coords.xys.copy(), has_z=coords.has_z,
                                   has_m=coords.has_m)
        raise ValueError("Invalid values passed to LineString constructor")
    c = _line_coords(coords)
    if len(c) == 0:
        return Geom.empty(GeomType.LINESTRING)
    if len(c) == 1:
        # GEOS: IllegalArgumentException (test_linestring.py:104)
        raise GEOSException(
            "IllegalArgumentException: point array must contain 0 or >1 "
            "elements"
        )
    return Geom.linestring(c)


def _LinearRing_ctor(coords=None):
    if coords is None:
        return Geom.empty(GeomType.LINEARRING)
    if isinstance(coords, Geom):
        if coords.type_id == GeomType.LINEARRING:
            return coords
        if coords.type_id == GeomType.LINESTRING:
            # polygon.py:72 — an input LineString must be valid
            from engine.geo.errors import TopologicalError
            from engine.geo.predicates import is_valid as _isv

            if not _isv(coords):
                raise TopologicalError("An input LineString must be valid.")
            coords = coords.xys.copy()
        else:
            raise ValueError("Invalid values passed to LinearRing constructor")
    c = _line_coords(coords)
    if len(c) == 0:
        return Geom.empty(GeomType.LINEARRING)
    closed = len(c) > 1 and bool(np.all(c[0] == c[-1]))
    n_closed = len(c) if closed else len(c) + 1
    if n_closed < 4:
        # _geometry_helpers.pyx:123 / src/geos.h:141
        raise ValueError("A linearring requires at least 4 coordinates.")
    return Geom.linearring(c)


def _Polygon_ctor(shell=None, holes=None):
    if shell is None:
        return Geom.empty(GeomType.POLYGON)
    if isinstance(shell, Geom):
        if shell.type_id == GeomType.POLYGON:
            if holes is None:
                return shell
            shell = shell.rings[0]
        elif shell.type_id in (GeomType.LINEARRING, GeomType.LINESTRING):
            shell = shell.xys.copy()
        else:
            raise ValueError("Invalid values passed to Polygon constructor")
    else:
        shell = _line_coords(shell)
    if len(shell) == 0:
        return Geom.empty(GeomType.POLYGON)
    closed = len(shell) > 1 and bool(np.all(shell[0] == shell[-1]))
    distinct = len(np.unique(np.asarray(shell, dtype=np.float64), axis=0))
    if (len(shell) if closed else len(shell) + 1) < 4 and distinct > 1:
        # all-identical degenerate rings ARE accepted (GEOS closes and
        # pads them; legacy/test_singularity.py pins this)
        raise ValueError("A linearring requires at least 4 coordinates.")
    hs = []
    for h in holes or ():
        if isinstance(h, Geom):
            hs.append(h.xys.copy())
        else:
            hs.append(_line_coords(h))
    return Geom.polygon(shell, hs)


def _MultiPoint_ctor(points=None):
    """multipoint.py:44 — accepted forms incl. MultiPoint passthrough;
    empty components rejected with EmptyPartError."""
    from engine.geo.errors import EmptyPartError

    if points is None:
        return Geom.empty(GeomType.MULTIPOINT)
    if isinstance(points, Geom) and points.type_id == GeomType.MULTIPOINT:
        return points
    points = list(points)
    if len(points) == 0:
        return Geom.empty(GeomType.MULTIPOINT)
    parts = []
    for item in points:
        p = Point(item)
        if p.is_empty:
            raise EmptyPartError(
                "Can't create MultiPoint with empty component")
        if p.type_id != GeomType.POINT:
            raise ValueError("Invalid values passed to MultiPoint constructor")
        parts.append(p)
    return _collection(GeomType.MULTIPOINT, parts)


def _collection(type_id, parts):
    if not parts:
        return Geom.empty(type_id)
    return Geom(type_id, parts=parts,
                has_z=any(p.has_z for p in parts),
                has_m=any(p.has_m for p in parts))


def _MultiLineString_ctor(lines=None):
    """multilinestring.py:38 — MultiLineString passthrough, .geoms
    unwrapping, per-item LineString adaptation, EmptyPartError."""
    from engine.geo.errors import EmptyPartError

    if lines is None:
        return Geom.empty(GeomType.MULTILINESTRING)
    if isinstance(lines, Geom):
        if lines.type_id == GeomType.MULTILINESTRING:
            return lines
        lines = getattr(lines, "geoms", lines)
    items = list(lines)
    if len(items) == 0:
        return Geom.empty(GeomType.MULTILINESTRING)
    parts = []
    for item in items:
        line = LineString(item)
        if line.is_empty:
            raise EmptyPartError(
                "Can't create MultiLineString with empty component")
        parts.append(line)
    return _collection(GeomType.MULTILINESTRING, parts)


def _MultiPolygon_ctor(polygons=None):
    """multipolygon.py:48 — MultiPolygon passthrough, None/empty parts
    dropped, (shell, holes) tuples, typed ValueErrors."""
    if polygons is None:
        return Geom.empty(GeomType.MULTIPOLYGON)
    if isinstance(polygons, Geom):
        if polygons.type_id == GeomType.MULTIPOLYGON:
            return polygons
        polygons = getattr(polygons, "geoms", [polygons])
    polygons = [p for p in polygons if p is not None and
                not (isinstance(p, Geom) and p.is_empty)]
    if len(polygons) == 0:
        return Geom.empty(GeomType.MULTIPOLYGON)
    if any(isinstance(p, Geom) and p.type_id == GeomType.MULTIPOLYGON
           for p in polygons):
        raise ValueError("Sequences of multi-polygons are not valid arguments")
    parts = []
    for ob in polygons:
        if isinstance(ob, Geom):
            if ob.type_id != GeomType.POLYGON:
                raise ValueError(
                    "Input must be valid Polygon objects or sequences of "
                    f"(shell, holes) tuples, got a {ob.geom_type}"
                )
            parts.append(ob)
        else:
            shell = ob[0]
            holes = ob[1] if len(ob) > 1 else None
            parts.append(_Polygon_ctor(shell, holes))
    return _collection(GeomType.MULTIPOLYGON, parts)


def _GeometryCollection_ctor(geoms=None):
    """collection.py:34 — a passed geometry contributes its .geoms
    (multi-part split) or itself."""
    if geoms is None:
        return Geom.empty(GeomType.GEOMETRYCOLLECTION)
    if isinstance(geoms, Geom):
        geoms = list(geoms.parts) if geoms.parts else [geoms]
    return _collection(GeomType.GEOMETRYCOLLECTION, list(geoms))


# ------------------------- geometry classes (isinstance-capable surface)
# The reference's Point/LineString/... are classes; user code does
# ``isinstance(geom, LineString)``.  Engine geometries are plain Geom
# instances, so the classes use a metaclass whose __instancecheck__
# matches on type_id (LinearRing counts as a LineString, like the
# reference subclassing).  Calling the class still runs the constructor.
class _GeomTypeMeta(type):
    def __instancecheck__(cls, obj):
        return isinstance(obj, Geom) and obj.type_id in cls._type_ids

    def __subclasscheck__(cls, sub):
        ids = getattr(sub, "_type_ids", None)
        if ids is None:
            return sub is Geom
        return set(ids) <= set(cls._type_ids)


class Point(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.POINT,)

    def __new__(cls, *args):
        return _Point_ctor(*args)


class LineString(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.LINESTRING, GeomType.LINEARRING)

    def __new__(cls, coords=None):
        return _LineString_ctor(coords)


class LinearRing(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.LINEARRING,)

    def __new__(cls, coords=None):
        return _LinearRing_ctor(coords)


class Polygon(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.POLYGON,)

    def __new__(cls, shell=None, holes=None):
        return _Polygon_ctor(shell, holes)

    @classmethod
    def from_bounds(cls, xmin, ymin, xmax, ymax):
        """polygon.py:317 — CCW ring consistent with shapely.box()."""
        return cls([(xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)])


class MultiPoint(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.MULTIPOINT,)

    def __new__(cls, points=None):
        return _MultiPoint_ctor(points)


class MultiLineString(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.MULTILINESTRING,)

    def __new__(cls, lines=None):
        return _MultiLineString_ctor(lines)


class MultiPolygon(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.MULTIPOLYGON,)

    def __new__(cls, polygons=None):
        return _MultiPolygon_ctor(polygons)


class GeometryCollection(metaclass=_GeomTypeMeta):
    _type_ids = (GeomType.GEOMETRYCOLLECTION,)

    def __new__(cls, geoms=None):
        return _GeometryCollection_ctor(geoms)



# --------------------------------------------- OO sugar on the scalar type
# (geometry/base.py methods + operator overloads :197-209, installed here
# so engine.geo stays a pure-kernel package)
def _geoms_of(self):
    """Reference: only multi-part types expose .geoms (base.py
    GeometrySequence); plain geometries raise AttributeError so
    hasattr-based dispatch works."""
    if self.type_id not in (
        GeomType.MULTIPOINT, GeomType.MULTILINESTRING,
        GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION,
    ):
        raise AttributeError(
            f"{self.type_id.name} has no attribute 'geoms'"
        )
    return list(self.parts)


def _install_oo():
    from engine.geo import constructive as _c
    from engine.geo import measure as _m
    from engine.geo import predicates as _p
    from engine.geo import set_operations as _s
    from engine.geo.geom import to_wkt as _to_wkt

    def _oo_buffer(self, distance, quad_segs=16, cap_style="round",
                   join_style="round", mitre_limit=5.0, single_sided=False,
                   **kwargs):
        """geometry/base.py:500 — OO buffer with the reference's
        deprecation shims and argument validation."""
        import warnings

        quadsegs = kwargs.pop("quadsegs", None)
        if quadsegs is not None:
            warnings.warn(
                "The `quadsegs` argument is deprecated. Use `quad_segs` "
                "instead.", FutureWarning, stacklevel=2,
            )
            quad_segs = quadsegs
        resolution = kwargs.pop("resolution", None)
        if resolution is not None:
            warnings.warn(
                "The 'resolution' argument is deprecated. Use 'quad_segs' "
                "instead", DeprecationWarning, stacklevel=2,
            )
            quad_segs = resolution
        if kwargs:
            kwarg = list(kwargs.keys())[0]
            raise TypeError(
                f"buffer() got an unexpected keyword argument '{kwarg}'"
            )
        if mitre_limit == 0.0:
            raise ValueError(
                "Cannot compute offset from zero-length line segment"
            )
        if not np.isfinite(distance).all():
            raise ValueError("buffer distance must be finite")
        return _c.buffer(
            self, distance, quad_segs, cap_style=cap_style,
            join_style=join_style, mitre_limit=mitre_limit,
            single_sided=single_sided,
        )

    sugar = {
        "buffer": _oo_buffer,
        "simplify": lambda self, tol, preserve_topology=True: _c.simplify(self, tol, preserve_topology),
        "intersects": lambda self, other: _p.intersects(self, other),
        "contains": lambda self, other: _p.contains(self, other),
        "within": lambda self, other: _p.within(self, other),
        "touches": lambda self, other: _p.touches(self, other),
        "crosses": lambda self, other: _p.crosses(self, other),
        "overlaps": lambda self, other: _p.overlaps(self, other),
        "covers": lambda self, other: _p.covers(self, other),
        "disjoint": lambda self, other: _p.disjoint(self, other),
        "equals": lambda self, other: _p.equals(self, other),
        "relate": lambda self, other: _p.relate(self, other),
        "distance": lambda self, other: _m.distance(self, other),
        "intersection": lambda self, other, **kw: _s.intersection(self, other),
        "union": lambda self, other, **kw: _s.union(self, other),
        "difference": lambda self, other, **kw: _s.difference(self, other),
        "symmetric_difference": lambda self, other, **kw: _s.symmetric_difference(self, other),
        "__and__": lambda self, other: _s.intersection(self, other),
        "__or__": lambda self, other: _s.union(self, other),
        "__sub__": lambda self, other: _s.difference(self, other),
        "__xor__": lambda self, other: _s.symmetric_difference(self, other),
    }
    for name, fn in sugar.items():
        if not hasattr(Geom, name) or name.startswith("__"):
            setattr(Geom, name, fn)
    if not hasattr(Geom, "wkt"):
        Geom.wkt = property(lambda self: _to_wkt(self))
    if not hasattr(Geom, "convex_hull_geom"):
        Geom.envelope_geom = property(lambda self: _c.envelope(self))


_install_oo()


# ------------------------------------------------ shapely.ops-level sugar
# (reference shapely/ops.py:95-670 — thin aliases over the engine kernels)
from engine.geo.errors import (  # noqa: F401
    GEOSException, ShapelyError, UnsupportedGEOSVersionError, DimensionError,
    TopologicalError, ShapelyDeprecationWarning, EmptyPartError,
    GeometryTypeError,
)


Geometry = Geom  # re-bound to the non-callable base class at module end


def _ops_transform(func, geom):
    """shapely.ops.transform (ops.py:216) — apply func to all
    coordinates; accepts both vectorized f(xs, ys[, zs]) and per-point
    f(x, y[, z]) callables; deprecated in 2.2."""
    import warnings as _w

    _w.warn(
        "The 'ops.transform()' function is deprecated. "
        "Use 'transform()' or 'transform_coordseq()' instead.",
        ShapelyDeprecationWarning, stacklevel=2,
    )

    def _func_wrapped(*args):
        coords = [
            tuple(x.tolist()) if isinstance(x, np.ndarray) else x.item()
            for x in args
        ]
        try:
            return func(*coords)
        except TypeError:
            return list(zip(*[func(*c) for c in zip(*coords)]))

    try:
        return transform_coordseq(
            geom, _func_wrapped, include_z=None, interleaved=False
        )
    except TypeError as e:
        raise GeometryTypeError(str(e))


def linemerge(lines, directed=False):
    """shapely.ops.linemerge (ops.py:95): merge connected lines from a
    MultiLineString / sequence of LineStrings."""
    if isinstance(lines, Geom):
        src = lines
    else:
        parts = [ls if isinstance(ls, Geom) else LineString(ls) for ls in lines]
        src = Geom(GeomType.MULTILINESTRING, parts=parts)
    return line_merge(src, directed=directed)


def orient(geom, sign=1.0):
    """shapely.ops.orient (ops.py:664): sign >= 0 -> CCW exteriors."""
    return orient_polygons(geom, exterior_cw=sign < 0)


def triangulate(geom, tolerance=0.0, edges=False):
    """shapely.ops.triangulate (ops.py:133): returns a LIST of triangles
    (or edge LineStrings)."""
    gc = delaunay_triangles(geom, tolerance, only_edges=edges)
    return list(get_parts(gc))


def voronoi_diagram(geom, envelope=None, tolerance=0.0, edges=False):
    """shapely.ops.voronoi_diagram (ops.py:152) — GEOSException becomes
    ValueError; a non-collection result is wrapped in a collection."""
    try:
        result = voronoi_polygons(
            geom, tolerance=tolerance, extend_to=envelope, only_edges=edges)
    except GEOSException as err:
        errstr = ("Could not create Voronoi Diagram with the specified "
                  f"inputs ({err!s}).")
        if tolerance:
            errstr += " Try running again with default tolerance value."
        raise ValueError(errstr) from err
    if result.type_id != GeomType.GEOMETRYCOLLECTION:
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=[result])
    return result


def validate(geom):
    """shapely.ops.validate (ops.py:211): the validity explanation."""
    return is_valid_reason(geom)


class PreparedGeometry:
    """shapely.prepared.PreparedGeometry (prepared.py:8): predicate
    delegation after prepare() — the engine's prepared cache makes the
    repeated-predicate path fast."""

    def __init__(self, context):
        if isinstance(context, PreparedGeometry):
            context = context.context
        self.context = context
        prepare(self.context)
        self.prepared = True

    def __repr__(self):
        return f"<PreparedGeometry {self.context!r}>"


def _install_prepared_predicates():
    import engine.geo.predicates as _p

    for name in ("contains", "contains_properly", "covers", "crosses",
                 "disjoint", "intersects", "overlaps", "touches", "within"):
        fn = getattr(_p, name)
        setattr(PreparedGeometry, name,
                (lambda f: lambda self, other: bool(f(self.context, other)))(fn))


_install_prepared_predicates()


def prep(ob):
    """shapely.prepared.prep (prepared.py:72)."""
    return PreparedGeometry(ob)


def assert_geometries_equal(x, y, tolerance=1e-7, equal_none=True,
                            equal_nan=True, normalize=False, err_msg="",
                            verbose=True):
    """shapely.testing.assert_geometries_equal (testing.py): elementwise
    equals_exact + coordinate-dimension check; None equals None."""
    xs = np.atleast_1d(np.asarray(x, dtype=object))
    ys = np.atleast_1d(np.asarray(y, dtype=object))
    xs, ys = np.broadcast_arrays(xs, ys)
    from engine.geo.constructive import normalize as _norm

    for i, (a, b) in enumerate(zip(xs.ravel(), ys.ravel())):
        if a is None or b is None:
            if not (equal_none and a is None and b is None):
                raise AssertionError(f"{err_msg} element {i}: {a!r} != {b!r}")
            continue
        if normalize:
            a, b = _norm(a), _norm(b)
        if get_coordinate_dimension(a) != get_coordinate_dimension(b):
            raise AssertionError(
                f"{err_msg} element {i}: coordinate dimension "
                f"{get_coordinate_dimension(a)} != {get_coordinate_dimension(b)}"
            )
        ok = bool(equals_exact(a, b, tolerance=tolerance))
        if not ok and equal_nan:
            ca = get_coordinates(a, include_z=True)
            cb = get_coordinates(b, include_z=True)
            ok = (ca.shape == cb.shape and bool(
                np.all((ca == cb) | (np.isnan(ca) & np.isnan(cb)))
            ) and get_type_id(a) == get_type_id(b))
        if not ok:
            raise AssertionError(f"{err_msg} element {i}: {a!r} != {b!r}")


# ---------------------------------------- submodule-style namespaces
# (reference shapely.wkt / shapely.wkb / shapely.ops / shapely.prepared /
#  shapely.testing module surfaces, exposed as attribute namespaces)
import types as _types


def _ns(name, **attrs):
    m = _types.ModuleType(f"engine.compat.{name}")
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _wkt_dumps(ob, trim=False, rounding_precision=-1, **kw):
    """shapely.wkt.dumps (wkt.py:42) — full-precision fixed by default."""
    return to_wkt(ob, rounding_precision=rounding_precision, trim=trim, **kw)


wkt = _ns(
    "wkt",
    loads=from_wkt,
    dumps=_wkt_dumps,
    load=lambda fp: from_wkt(fp.read()),
    dump=lambda ob, fp, **kw: fp.write(_wkt_dumps(ob, **kw)),
)
def _wkb_dumps(ob, hex=False, srid=None, **kw):
    """shapely.wkb.dumps (wkb.py:36) — srid / big_endian translation."""
    if srid is not None:
        ob = set_srid(ob, int(srid))
        kw["include_srid"] = True
        kw.setdefault("flavor", "extended")
    if "big_endian" in kw:
        kw["byte_order"] = 0 if kw.pop("big_endian") else 1
    return to_wkb(ob, hex=hex, **kw)


wkb = _ns(
    "wkb",
    loads=lambda data, hex=False: from_wkb(data),
    dumps=_wkb_dumps,
    load=lambda fp, hex=False: from_wkb(fp.read()),
    dump=lambda ob, fp, hex=False, **kw: fp.write(_wkb_dumps(ob, hex=hex, **kw)),
)
def _ops_shared_paths(g1, g2):
    """shapely.ops.shared_paths (ops.py:287) — non-lineal inputs raise
    GeometryTypeError."""
    if not (isinstance(g1, Geom)
            and g1.type_id in (GeomType.LINESTRING, GeomType.LINEARRING)):
        raise GeometryTypeError("First geometry must be a LineString")
    if not (isinstance(g2, Geom)
            and g2.type_id in (GeomType.LINESTRING, GeomType.LINEARRING)):
        raise GeometryTypeError("Second geometry must be a LineString")
    return shared_paths(g1, g2)


ops = _ns(
    "ops",
    clip_by_rect=clip_by_rect, linemerge=linemerge,
    nearest_points=nearest_points, orient=orient, polygonize=polygonize,
    polygonize_full=polygonize_full, shared_paths=_ops_shared_paths, snap=snap,
    split=split, substring=substring, transform=_ops_transform,
    triangulate=triangulate, unary_union=unary_union, validate=validate,
    voronoi_diagram=voronoi_diagram,
)
prepared = _ns("prepared", prep=prep, PreparedGeometry=PreparedGeometry)
testing = _ns("testing", assert_geometries_equal=assert_geometries_equal)


# ------------------------------------------- shapely.geometry.geo surface
def _tupled(x):
    if isinstance(x, list):
        return tuple(_tupled(v) for v in x)
    return x


def _ring_tuples(arr, width):
    return tuple(tuple(float(v) for v in row[:width]) for row in arr)


def mapping(ob):
    """shapely.geometry.mapping (geometry/geo.py:121): GeoJSON-like dict
    with the per-type container shapes of the reference geometry classes
    (tuples; MultiPolygon coordinates is a LIST; z included)."""
    if not isinstance(ob, Geom) and hasattr(ob, "__geo_interface__"):
        return ob.__geo_interface__
    g = ob
    t = g.type_id
    w = 3 if g.has_z else 2

    def poly_coords(p):
        return tuple(_ring_tuples(r, w) for r in p.rings)

    if t == GeomType.POINT:
        c = _ring_tuples(g.xys, w)
        return {"type": "Point", "coordinates": c[0] if c else ()}
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return {"type": "LineString", "coordinates": _ring_tuples(g.xys, w)}
    if t == GeomType.POLYGON:
        return {"type": "Polygon", "coordinates": poly_coords(g)}
    if t == GeomType.MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": tuple(_ring_tuples(p.xys, w)[0]
                                     for p in g.parts if not p.is_empty)}
    if t == GeomType.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": tuple(_ring_tuples(p.xys, w) for p in g.parts)}
    if t == GeomType.MULTIPOLYGON:
        # multipolygon.py:93 — the reference property builds a LIST here
        return {"type": "MultiPolygon",
                "coordinates": [poly_coords(p) for p in g.parts]}
    return {"type": "GeometryCollection",
            "geometries": [mapping(p) for p in g.parts]}


def _is_coordinates_empty(coordinates):
    """geometry/geo.py:15 — coordinates (or all nested subsets) empty."""
    if coordinates is None:
        return True
    if isinstance(coordinates, (list, tuple, np.ndarray)):
        if len(coordinates) == 0:
            return True
        return all(map(_is_coordinates_empty, coordinates))
    return False


_EMPTY_SHAPE = {
    "point": lambda: Point(), "multipoint": lambda: MultiPoint(),
    "linestring": lambda: LineString(),
    "multilinestring": lambda: MultiLineString(),
    "polygon": lambda: Polygon(), "multipolygon": lambda: MultiPolygon(),
    "linearring": lambda: LinearRing(),
}


def _delist(x):
    if isinstance(x, np.ndarray):
        return [_delist(v) for v in x.tolist()] if x.ndim else x.item()
    if isinstance(x, (list, tuple)):
        return [_delist(v) for v in x]
    return float(x) if isinstance(x, (np.floating, np.integer)) else x


def shape(context):
    """shapely.geometry.shape (geometry/geo.py:54): GeoJSON-like dict /
    __geo_interface__ object -> engine geometry (via the class
    constructors, so Z coordinates survive)."""
    ob = context.__geo_interface__ if hasattr(context, "__geo_interface__") else context
    if isinstance(ob, Geom):
        return ob
    geom_type = ob.get("type", "").lower()
    if geom_type == "feature":
        ob = ob["geometry"]
        geom_type = ob.get("type", "").lower()
    if "coordinates" in ob and _is_coordinates_empty(ob["coordinates"]):
        if geom_type in _EMPTY_SHAPE:
            return _EMPTY_SHAPE[geom_type]()
        raise GeometryTypeError(f"Unknown geometry type: {geom_type!r}")
    if geom_type == "point":
        return Point(ob["coordinates"])
    if geom_type == "linestring":
        return LineString(ob["coordinates"])
    if geom_type == "linearring":
        return LinearRing(ob["coordinates"])
    if geom_type == "polygon":
        return Polygon(ob["coordinates"][0], ob["coordinates"][1:])
    if geom_type == "multipoint":
        return MultiPoint(ob["coordinates"])
    if geom_type == "multilinestring":
        return MultiLineString(ob["coordinates"])
    if geom_type == "multipolygon":
        return MultiPolygon([[c[0], list(c[1:])] for c in ob["coordinates"]])
    if geom_type == "geometrycollection":
        return GeometryCollection([shape(g) for g in ob.get("geometries", [])])
    raise GeometryTypeError(f"Unknown geometry type: {geom_type!r}")


Geom.__geo_interface__ = property(lambda self: mapping(self))


class CollectionOperator:
    """shapely.ops.CollectionOperator (ops.py:44): adapter-accepting
    polygonize/polygonize_full/linemerge/unary_union over sequences of
    geometries, coordinate lists, or __geo_interface__ objects."""

    def shapeup(self, ob):
        if isinstance(ob, Geom):
            return ob
        try:
            return shape(ob)
        except (ValueError, AttributeError, KeyError, TypeError):
            return LineString(ob)

    def _lines(self, lines):
        source = getattr(lines, "geoms", None) or lines
        try:
            source = iter(source)
        except TypeError:
            source = [source]
        return [self.shapeup(line) for line in source]

    def polygonize(self, lines):
        """Polygons from a source of lines — returns the collection's
        geoms (reference ops.py:56 yields, we return the list)."""
        return list(get_parts(polygonize(self._lines(lines))))

    def polygonize_full(self, lines):
        return polygonize_full(self._lines(lines))

    def linemerge(self, lines, directed=False):
        return linemerge(lines, directed=directed)

    def unary_union(self, geoms):
        if isinstance(geoms, Geom):
            return unary_union(geoms)
        return union_all(list(geoms))


operator = CollectionOperator()
ops.operator = operator
ops.CollectionOperator = CollectionOperator
# reference ops.py:109-112 — module-level names are the adapter's bound
# methods, so ops.polygonize(seq-of-adaptables) yields polygons
ops.polygonize = operator.polygonize
ops.polygonize_full = operator.polygonize_full
ops.linemerge = operator.linemerge
ops.unary_union = operator.unary_union


from engine.geo.geom import CoordinateSequence  # noqa: F401  (reference coords surface)


# --------------------------------- OO properties (reference base.py surface)
def _install_oo_properties():
    from engine.geo import constructive as _c
    from engine.geo import coordinates as _co
    from engine.geo import linear as _lin
    from engine.geo import measure as _m
    from engine.geo import predicates as _p
    from engine.geo.wkb import to_wkb as _to_wkb

    _GEOM_TYPE_NAMES = {
        GeomType.POINT: "Point", GeomType.LINESTRING: "LineString",
        GeomType.LINEARRING: "LinearRing", GeomType.POLYGON: "Polygon",
        GeomType.MULTIPOINT: "MultiPoint",
        GeomType.MULTILINESTRING: "MultiLineString",
        GeomType.MULTIPOLYGON: "MultiPolygon",
        GeomType.GEOMETRYCOLLECTION: "GeometryCollection",
    }

    def _coord0(self, i, name):
        # DimensionError at call time (class defined later in this module)
        if self.type_id != GeomType.POINT or _p.is_empty(self):
            raise ValueError(f"no .{name} on {self!r}")
        if i == 2 and not self.has_z:
            raise DimensionError(f"This point has no {name} coordinate.")
        if i == 3 or (i == 2 and name == "m"):
            if not self.has_m:
                raise DimensionError(f"This point has no {name} coordinate.")
            c = _co.get_coordinates(self, include_z=self.has_z, include_m=True)
            return float(c[0, -1])
        c = _co.get_coordinates(self, include_z=bool(self.has_z))
        return float(c[0, i])

    props = {
        "geom_type": lambda self: _GEOM_TYPE_NAMES[GeomType(self.type_id)],
        "x": lambda self: _coord0(self, 0, "x"),
        "y": lambda self: _coord0(self, 1, "y"),
        "z": lambda self: _coord0(self, 2, "z"),
        "m": lambda self: _coord0(self, 3, "m"),
        # reference polygon.py: the empty polygon's exterior is an
        # empty LinearRing, not None
        "exterior": lambda self: (
            Geom.empty(GeomType.LINEARRING)
            if self.type_id == GeomType.POLYGON and self.is_empty
            else _co.get_exterior_ring(self)
        ),
        "_ndim": lambda self: 3 if self.has_z else 2,
        "interiors": lambda self: [
            _co.get_interior_ring(self, i)
            for i in range(int(_co.get_num_interior_rings(self)))
        ],
        "geoms": lambda self: _geoms_of(self),
        "is_valid": lambda self: bool(_p.is_valid(self)),
        "is_simple": lambda self: bool(_p.is_simple(self)),
        "is_ring": lambda self: bool(_p.is_ring(self)),
        "is_closed": lambda self: bool(_p.is_closed(self)),
        "is_ccw": lambda self: bool(_p.is_ccw(self)),
        "wkb": lambda self: _to_wkb(self),
        "wkb_hex": lambda self: _to_wkb(self, hex=True),
        "convex_hull": lambda self: _c.convex_hull(self),
        "envelope": lambda self: _c.envelope(self),
        "boundary": lambda self: _c.boundary(self),
        "minimum_rotated_rectangle": lambda self: _c.oriented_envelope(self),
        "oriented_envelope": lambda self: _c.oriented_envelope(self),
        "minimum_clearance": lambda self: float(_m.minimum_clearance(self)),
    }
    for name, fn in props.items():
        if not hasattr(Geom, name):
            setattr(Geom, name, property(fn))

    methods = {
        "representative_point": lambda self: _c.point_on_surface(self),
        "point_on_surface": lambda self: _c.point_on_surface(self),
        "interpolate": lambda self, distance, normalized=False:
            _lin.line_interpolate_point(self, distance, normalized),
        "project": lambda self, other, normalized=False:
            _lin.line_locate_point(self, other, normalized),
        "normalize": lambda self: _c.normalize(self),
        "segmentize": lambda self, max_segment_length:
            _c.segmentize(self, max_segment_length),
        "reverse": lambda self: _c.reverse(self),
        "hausdorff_distance": lambda self, other:
            _m.hausdorff_distance(self, other),
        "dwithin": lambda self, other, distance:
            bool(_p.dwithin(self, other, distance)),
        "equals_exact": lambda self, other, tolerance=0.0:
            bool(_p.equals_exact(self, other, tolerance)),
        "covered_by": lambda self, other: bool(_p.covered_by(self, other)),
        "relate_pattern": lambda self, other, pattern:
            bool(_p.relate_pattern(self, other, pattern)),
        "line_interpolate_point": lambda self, distance, normalized=False:
            _lin.line_interpolate_point(self, distance, normalized),
        "line_locate_point": lambda self, other, normalized=False:
            _lin.line_locate_point(self, other, normalized),
    }
    for name, fn in methods.items():
        if not hasattr(Geom, name):
            setattr(Geom, name, fn)


_install_oo_properties()


# ------------------------------------------------- SVG surface (base.py:284,
# point.py:123, linestring.py:86, polygon.py:281, multi*.py, base.py:1149)
def _svg(self, scale_factor=1.0, fill_color=None, opacity=None,
         stroke_color=None, color=None):
    col = next((c for c in (fill_color, stroke_color, color) if c is not None),
               None)
    if self.is_empty:
        return "<g />"
    if col is None:
        col = "#66cc99" if self.is_valid else "#ff3333"
    t = self.type_id
    if t == GeomType.POINT:
        op = 0.6 if opacity is None else opacity
        return (
            f'<circle cx="{self.x}" cy="{self.y}" r="{3.0 * scale_factor}" '
            f'stroke="#555555" stroke-width="{1.0 * scale_factor}" '
            f'fill="{col}" opacity="{op}" />'
        )
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        op = 0.8 if opacity is None else opacity
        pnts = " ".join("{},{}".format(*c) for c in self.coords)
        return (
            f'<polyline fill="none" stroke="{col}" '
            f'stroke-width="{2.0 * scale_factor}" '
            f'points="{pnts}" opacity="{op}" />'
        )
    if t == GeomType.POLYGON:
        op = 0.6 if opacity is None else opacity
        ring_coords = [["{},{}".format(*c) for c in self.exterior.coords]] + [
            ["{},{}".format(*c) for c in hole.coords] for hole in self.interiors
        ]
        path = " ".join(
            "M {} L {} z".format(cs[0], " L ".join(cs[1:])) for cs in ring_coords
        )
        return (
            f'<path fill-rule="evenodd" fill="{col}" stroke="#555555" '
            f'stroke-width="{2.0 * scale_factor}" opacity="{op}" d="{path}" />'
        )
    # multiparts: group of member elements (GC members take only color)
    if t == GeomType.GEOMETRYCOLLECTION:
        inner = "".join(p.svg(scale_factor, col) for p in self.geoms)
    else:
        inner = "".join(p.svg(scale_factor, col, opacity) for p in self.geoms)
    return "<g>" + inner + "</g>"


def _repr_svg(self):
    """base.py:288 — SVG document for notebook display."""
    svg_top = (
        '<svg xmlns="http://www.w3.org/2000/svg" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" '
    )
    if self.is_empty:
        return svg_top + "/>"
    xmin, ymin, xmax, ymax = self.bounds
    if xmin == xmax and ymin == ymax:
        xmin, ymin, xmax, ymax = xmin - 1.0, ymin - 1.0, xmax + 1.0, ymax + 1.0
    else:
        expand_amount = max(xmax - xmin, ymax - ymin) * 0.04
        xmin -= expand_amount
        ymin -= expand_amount
        xmax += expand_amount
        ymax += expand_amount
    dx, dy = xmax - xmin, ymax - ymin
    width = min(max(100.0, dx), 300)
    height = min(max(100.0, dy), 300)
    try:
        scale_factor = max(dx, dy) / max(width, height)
    except ZeroDivisionError:
        scale_factor = 1.0
    view_box = f"{xmin} {ymin} {dx} {dy}"
    transform = f"matrix(1,0,0,-1,0,{ymax + ymin})"
    return (
        f'{svg_top}width="{width}" height="{height}" viewBox="{view_box}" '
        'preserveAspectRatio="xMinYMin meet">'
        f'<g transform="{transform}">{self.svg(scale_factor)}</g></svg>'
    )


Geom.svg = _svg
Geom._repr_svg_ = _repr_svg


# ------------------------------------------------- shapely.errors surface
def setup_signal_checks(interval=10000):
    """Reference errors.py:8 — installs GEOS interrupt checks; this
    engine has no C extension to interrupt, so it is a no-op."""


errors = _ns(
    "errors",
    ShapelyError=ShapelyError, GEOSException=GEOSException,
    UnsupportedGEOSVersionError=UnsupportedGEOSVersionError,
    DimensionError=DimensionError, TopologicalError=TopologicalError,
    ShapelyDeprecationWarning=ShapelyDeprecationWarning,
    EmptyPartError=EmptyPartError, GeometryTypeError=GeometryTypeError,
    setup_signal_checks=setup_signal_checks,
)


def _speedups_noop():
    """Reference speedups.py:24,33 — deprecated toggles, warn-and-ignore."""
    import warnings

    warnings.warn(
        "This function has no longer any effect, and will be removed in a "
        "future release.", FutureWarning, stacklevel=2,
    )


speedups = _ns(
    "speedups",
    available=True, enabled=True,
    enable=_speedups_noop, disable=_speedups_noop,
)


# reference geometry/base.py CAP_STYLE / JOIN_STYLE compat enums
CAP_STYLE = BufferCapStyle
JOIN_STYLE = BufferJoinStyle

geometry = _ns(
    "geometry",
    Point=Point, LineString=LineString, LinearRing=LinearRing,
    Polygon=Polygon, MultiPoint=MultiPoint, MultiLineString=MultiLineString,
    MultiPolygon=MultiPolygon, GeometryCollection=GeometryCollection,
    box=box, shape=shape, mapping=mapping, CAP_STYLE=CAP_STYLE,
    JOIN_STYLE=JOIN_STYLE,
)


# ------------------- legacy shapely.vectorized / shapely.algorithms
def _vectorized_contains(geometry, x, y):
    """Reference vectorized/__init__.py:24 — boolean array preserving
    the input arrays' memory order (ufunc behavior)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.asarray(contains_xy(geometry, x, y))
    if (x.ndim > 1 and x.flags["F_CONTIGUOUS"]
            and not x.flags["C_CONTIGUOUS"]):
        out = np.asfortranarray(out)
    return out


def _vectorized_touches(geometry, x, y):
    """Reference vectorized/__init__.py:58."""
    xs = np.asarray(x, dtype=np.float64).ravel()
    ys = np.asarray(y, dtype=np.float64).ravel()
    out = np.array([bool(touches(geometry, Point(xi, yi)))
                    for xi, yi in zip(xs, ys)])
    return out.reshape(np.asarray(x).shape)


def signed_area(ring):
    """Reference algorithms/cga.py:8 — shoelace signed area of a ring
    (positive = CCW)."""
    c = get_coordinates(ring)
    xs, ys = c[:, 0], c[:, 1]
    return float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]) / 2.0)


def polylabel(polygon, tolerance=1.0):
    """Reference algorithms/polylabel.py:7 — pole of inaccessibility =
    center of the maximum inscribed circle."""
    from engine.geo.ops import maximum_inscribed_circle

    line = maximum_inscribed_circle(polygon, tolerance)
    c = get_coordinates(line)
    return Point(c[0, 0], c[0, 1])


vectorized = _ns("vectorized", contains=_vectorized_contains,
                 touches=_vectorized_touches)
algorithms = _ns(
    "algorithms",
    cga=_ns("algorithms.cga", signed_area=signed_area),
    polylabel=_ns("algorithms.polylabel", polylabel=polylabel),
)


# ----------------------------------------------- version / geos metadata
# Feature-parity declaration: no GEOS is linked — the engine's from-
# scratch kernels target GEOS 3.12 semantics (reference geos.py surface;
# version gates in user code resolve as if that GEOS were present).
__version__ = "2.0-rayengine"
geos_version = (3, 13, 0)
geos_version_string = "3.13.0"
geos_capi_version = (1, 19, 2)
geos_capi_version_string = "3.13.0-CAPI-1.19.2"


def _plotting_stub(*a, **kw):
    raise ImportError(
        "shapely.plotting requires matplotlib, which is not available "
        "in this environment"
    )


plotting = _ns(
    "plotting",
    plot_polygon=_plotting_stub, plot_line=_plotting_stub,
    plot_points=_plotting_stub, patch_from_polygon=_plotting_stub,
)


# ----------------------------------------------- coords .xy (coords.py)
def _xy(self):
    """Reference coords.py CoordinateSequence.xy / base.py .xy — separate
    x and y arrays of the geometry's own vertices (point/line/ring)."""
    import array as _array

    c = get_coordinates(self)
    return (_array.array("d", c[:, 0].tolist()),
            _array.array("d", c[:, 1].tolist()))


if not hasattr(Geom, "xy"):
    Geom.xy = property(_xy)


# ------------------------------------- remaining reference submodule
# surfaces (shapely.<mod> import style), mapped onto the engine modules
import engine.geo.affinity as affinity  # noqa: F401,E402
import engine.geo.coordinates as coordinates  # noqa: F401,E402
import engine.geo.creation as creation  # noqa: F401,E402
import engine.geo.constructive as constructive  # noqa: F401,E402
import engine.geo.predicates as predicates  # noqa: F401,E402
import engine.geo.set_operations as set_operations  # noqa: F401,E402

from engine.geo.geom import CoordinateSequence  # noqa: F401,E402

coords = _ns("coords", CoordinateSequence=CoordinateSequence)
strtree = _ns("strtree", STRtree=STRtree)
validation = _ns(
    "validation", explain_validity=explain_validity, make_valid=make_valid
)
measurement = _ns(
    "measurement",
    area=area, bounds=bounds, distance=distance, length=length,
    hausdorff_distance=hausdorff_distance, frechet_distance=frechet_distance,
    minimum_clearance=minimum_clearance,
    minimum_bounding_radius=minimum_bounding_radius, total_bounds=total_bounds,
)
linear = _ns(
    "linear",
    line_interpolate_point=line_interpolate_point,
    line_locate_point=line_locate_point, line_merge=line_merge,
    shared_paths=shared_paths, shortest_line=shortest_line,
)
io = _ns(
    "io",
    from_wkt=from_wkt, to_wkt=to_wkt, from_wkb=from_wkb, to_wkb=to_wkb,
    from_geojson=from_geojson, to_geojson=to_geojson,
    from_ragged_array=from_ragged_array, to_ragged_array=to_ragged_array,
)
coverage = _ns(
    "coverage",
    coverage_is_valid=coverage_is_valid,
    coverage_invalid_edges=coverage_invalid_edges,
    coverage_simplify=coverage_simplify,
)
geos = _ns(
    "geos",
    geos_version=geos_version, geos_version_string=geos_version_string,
    geos_capi_version=geos_capi_version,
    geos_capi_version_string=geos_capi_version_string,
)

# shapely.lib surface (reference C-extension module; user code and the
# reference test-suite reach into it for the Geometry type, version
# tuples, and the scalar-optimized predicate variants — here the
# vectorized kernels serve both forms).
lib = _ns(
    "lib",
    Geometry=Geom, GEOSException=GEOSException, ShapelyError=ShapelyError,
    geos_version=geos_version, geos_version_string=geos_version_string,
    geos_capi_version=geos_capi_version,
    geos_capi_version_string=geos_capi_version_string,
    registry=[None, Geom],
    _setup_signal_checks=lambda interval, thread_ident: None,
)
def _as_py_scalar(f):
    """The reference lib's *_scalar fast paths return plain Python bools
    (tests assert ``is True``); coerce numpy bool scalars accordingly."""
    import functools

    @functools.wraps(f)
    def wrapped(*a, **kw):
        r = f(*a, **kw)
        return bool(r) if isinstance(r, np.bool_) else r

    return wrapped


for _fn_name in (
    "contains_xy", "intersects_xy", "dwithin", "is_geometry", "is_missing",
    "is_valid_input", "is_prepared", "prepare", "destroy_prepared",
    "shortest_line", "equals_exact",
):
    _f = globals().get(_fn_name)
    if _f is not None:
        setattr(lib, _fn_name, _f)
        setattr(lib, _fn_name + "_scalar", _as_py_scalar(_f))
for _fn_name in ("set_precision", "oriented_envelope", "coverage_invalid_edges"):
    _f = globals().get(_fn_name)
    if _f is not None:
        setattr(lib, _fn_name, _f)
del _fn_name, _f
lib.hausdorff_distance_densify = lambda a, b, densify: hausdorff_distance(
    a, b, densify=densify
)
lib.hausdorff_distance_densify_scalar = lib.hausdorff_distance_densify
lib.frechet_distance_densify = lambda a, b, densify: frechet_distance(
    a, b, densify=densify
)
lib.frechet_distance_densify_scalar = lib.frechet_distance_densify


def _identity_decorator(*dargs, **dkw):
    """Reference decorators.py surface: version gates / GIL toggles are
    no-ops here (no GEOS, no C extension)."""
    if len(dargs) == 1 and callable(dargs[0]) and not dkw:
        return dargs[0]

    def wrap(fn):
        return fn

    return wrap


import engine.geo.decorators as decorators  # noqa: F401,E402

# shapely.geometry.base surface (BaseGeometry isinstance checks in user code)
def dump_coords(geom):
    """geometry/base.py:56 — nested coordinate dump in packing order."""
    if not isinstance(geom, Geom):
        raise ValueError(
            "Must be instance of a geometry class; found "
            + geom.__class__.__name__
        )
    t = geom.geom_type
    if t in ("Point", "LineString", "LinearRing"):
        return geom.coords[:]
    if t == "Polygon":
        return geom.exterior.coords[:] + [
            i.coords[:] for i in geom.interiors
        ]
    return [dump_coords(part) for part in geom.geoms]


geometry.base = _ns(
    "geometry.base",
    BaseGeometry=Geom, BaseMultipartGeometry=Geom,
    CAP_STYLE=BufferCapStyle, JOIN_STYLE=BufferJoinStyle,
    dump_coords=dump_coords,
)
# per-type geometry submodules (reference `from shapely.geometry.polygon
# import orient` style imports)
geometry.polygon = _ns(
    "geometry.polygon",
    Polygon=Polygon, LinearRing=LinearRing, orient=orient,
    signed_area=signed_area,
)
geometry.point = _ns("geometry.point", Point=Point)
geometry.linestring = _ns("geometry.linestring", LineString=LineString)
geometry.multipoint = _ns("geometry.multipoint", MultiPoint=MultiPoint)
geometry.multilinestring = _ns(
    "geometry.multilinestring", MultiLineString=MultiLineString
)
geometry.multipolygon = _ns("geometry.multipolygon", MultiPolygon=MultiPolygon)
geometry.collection = _ns(
    "geometry.collection", GeometryCollection=GeometryCollection
)
geometry.geo = _ns(
    "geometry.geo", shape=shape, mapping=mapping, box=box,
    _is_coordinates_empty=_is_coordinates_empty,
)


# ------------------- ufunc-parity wrappers (constructive surface)
# Arrays map elementwise, None propagates, NaN numeric parameters give
# None (reference C-kernel behavior).  Engine-internal code keeps using
# the raw kernels in engine.geo.* — this layer is the public surface.
from engine.geo import _uapi as _ua  # noqa: E402

for _n in (
    "boundary", "centroid", "convex_hull", "concave_hull", "envelope",
    "extract_unique_points", "minimum_clearance_line", "minimum_width",
    "node", "normalize", "point_on_surface",
    "constrained_delaunay_triangles", "oriented_envelope",
    "minimum_bounding_circle", "make_valid", "build_area", "reverse",
    "orient_polygons", "remove_repeated_points", "clip_by_rect",
    "maximum_inscribed_circle", "force_2d", "force_3d",
):
    globals()[_n] = _ua.vec1(globals()[_n])
minimum_rotated_rectangle = oriented_envelope
for _n, _params in (
    ("buffer", [(1, "distance")]),
    ("offset_curve", [(1, "distance")]),
    ("simplify", [(1, "tolerance")]),
    ("segmentize", [(1, "max_segment_length")]),
    ("delaunay_triangles", [(1, "tolerance")]),
    ("voronoi_polygons", [(1, "tolerance")]),
    ("concave_hull", [(1, "ratio")]),
):
    globals()[_n] = _ua.bcast_param(
        _ua.nan_none(_ua.vec1(globals()[_n]), _params),
        _params[0][0], _params[0][1],
    )
del _n, _params


_snap_raw = snap


def snap(geometry, reference, tolerance):
    """ops.py snap with ufunc parity: NaN tolerance → None."""
    try:
        if np.isscalar(tolerance) and np.isnan(float(tolerance)):
            if geometry is None or isinstance(geometry, Geom):
                return None
            return np.full(np.asarray(geometry, dtype=object).shape, None,
                           dtype=object)
    except (TypeError, ValueError):
        pass
    return _snap_raw(geometry, reference, tolerance)


# Namespace modules built above captured pre-wrap callables; re-point the
# few affected names so `shapely.validation.make_valid is shapely.make_valid`
# etc. hold like the reference's aliasing.
def _validation_make_valid(ob):
    """shapely.validation.make_valid (validation.py:30): identity for
    already-valid input, else the GEOS MakeValid repair."""
    if is_valid(ob):
        return ob
    return make_valid(ob)


validation.make_valid = _validation_make_valid
ops.clip_by_rect = clip_by_rect
ops.snap = snap
lib.oriented_envelope = oriented_envelope


# --------------------------- final OO method surface (geometry/base.py)
# Installed LAST so every method delegates to the module-level callables
# above (array arguments, python-scalar returns, grid_size) with the
# reference's positional-argument deprecations.
def _install_oo_final():
    import engine.geo.decorators as _dec

    _mod = globals()

    def _dp(names):
        return lambda f: _dec.deprecate_positional(names)(f)

    @_dp(["cap_style", "join_style", "mitre_limit", "single_sided"])
    def buffer(self, distance, quad_segs=16, cap_style="round",
               join_style="round", mitre_limit=5.0, single_sided=False,
               **kwargs):
        import warnings as _w

        quadsegs = kwargs.pop("quadsegs", None)
        if quadsegs is not None:
            _w.warn("The `quadsegs` argument is deprecated. Use `quad_segs` "
                    "instead.", FutureWarning, stacklevel=2)
            quad_segs = quadsegs
        resolution = kwargs.pop("resolution", None)
        if resolution is not None:
            _w.warn("The 'resolution' argument is deprecated. Use "
                    "'quad_segs' instead", DeprecationWarning, stacklevel=2)
            quad_segs = resolution
        if kwargs:
            raise TypeError("buffer() got an unexpected keyword argument "
                            f"'{list(kwargs)[0]}'")
        if mitre_limit == 0.0:
            raise ValueError(
                "Cannot compute offset from zero-length line segment")
        if not np.isfinite(distance).all():
            raise ValueError("buffer distance must be finite")
        return _mod["buffer"](
            self, distance, quad_segs=quad_segs, cap_style=cap_style,
            join_style=join_style, mitre_limit=mitre_limit,
            single_sided=single_sided,
        )

    @_dp(["preserve_topology"])
    def simplify(self, tolerance, preserve_topology=True):
        return _mod["simplify"](
            self, tolerance, preserve_topology=preserve_topology)

    def segmentize(self, max_segment_length):
        return _mod["segmentize"](self, max_segment_length)

    def _unpack(result):
        """geometry/base.py _maybe_unpack: numpy 0-d / scalar → python
        scalar; arrays pass through."""
        if isinstance(result, np.generic):
            return result.item()
        if isinstance(result, np.ndarray) and result.ndim == 0:
            return result.item()
        return result

    def _pred(name):
        def method(self, other, **kw):
            return _unpack(_mod[name](self, other, **kw))

        method.__name__ = name
        return method

    @_dp(["normalized"])
    def line_locate_point(self, other, normalized=False):
        return _unpack(_mod["line_locate_point"](
            self, other, normalized=normalized))

    @_dp(["normalized"])
    def project(self, other, normalized=False):
        return _unpack(_mod["line_locate_point"](
            self, other, normalized=normalized))

    @_dp(["normalized"])
    def line_interpolate_point(self, distance, normalized=False):
        return _mod["line_interpolate_point"](
            self, distance, normalized=normalized)

    @_dp(["normalized"])
    def interpolate(self, distance, normalized=False):
        return _mod["line_interpolate_point"](
            self, distance, normalized=normalized)

    def dwithin(self, other, distance):
        return _unpack(_mod["dwithin"](self, other, distance))

    def equals_exact(self, other, tolerance=0.0, normalize=False):
        return _unpack(_mod["equals_exact"](
            self, other, tolerance=tolerance, normalize=normalize))

    def relate_pattern(self, other, pattern):
        return _unpack(_mod["relate_pattern"](self, other, pattern))

    @_dp(["quad_segs", "join_style", "mitre_limit"])
    def offset_curve(self, distance, quad_segs=16, join_style="round",
                     mitre_limit=5.0):
        if not np.isfinite(distance).all():
            raise ValueError("offset_curve distance must be finite")
        return _mod["offset_curve"](
            self, distance, quad_segs=quad_segs, join_style=join_style,
            mitre_limit=mitre_limit)

    def parallel_offset(self, distance, side="right", resolution=16,
                        join_style="round", mitre_limit=5.0):
        """linestring.py:185 — deprecated offset_curve alias (side
        keyword instead of signed distance)."""
        if side == "right":
            distance = distance * -1
        return offset_curve(self, distance, quad_segs=resolution,
                            join_style=join_style, mitre_limit=mitre_limit)

    def hausdorff_distance(self, other, densify=None):
        if densify is None:
            return _unpack(_mod["hausdorff_distance"](self, other))
        return _unpack(_mod["hausdorff_distance"](self, other, densify=densify))

    methods = {
        "buffer": buffer, "simplify": simplify, "segmentize": segmentize,
        "line_locate_point": line_locate_point, "project": project,
        "line_interpolate_point": line_interpolate_point,
        "interpolate": interpolate, "dwithin": dwithin,
        "equals_exact": equals_exact, "relate_pattern": relate_pattern,
        "hausdorff_distance": hausdorff_distance,
        "offset_curve": offset_curve,
        "parallel_offset": parallel_offset,
    }
    # set-op methods get grid_size + positional deprecation (rename
    # BEFORE decorating so the warning text carries the method name)
    for name in ("intersection", "union", "difference",
                 "symmetric_difference"):
        def _raw(self, other, grid_size=None, _name=name):
            return _mod[_name](self, other, grid_size=grid_size)

        _raw.__name__ = name
        methods[name] = _dec.deprecate_positional(["grid_size"])(_raw)
    for name in ("intersects", "contains", "contains_properly", "within",
                 "touches", "crosses", "overlaps", "covers", "covered_by",
                 "disjoint", "equals", "distance"):
        methods[name] = _pred(name)
    for name, fn in methods.items():
        setattr(Geom, name, fn)

    import re as _re

    _FMT_RE = _re.compile(r"(?:0?\.(?P<prec>[0-9]+))?(?P<fmt_code>[fFgGxX]?)")

    def _format(self, format_spec):
        """geometry/base.py:126 __format__ — WKT with precision control,
        x/X hex WKB."""
        if not format_spec:
            return _mod["to_wkt"](self, rounding_precision=-1)
        if format_spec == "x":
            return _mod["to_wkb"](self, hex=True).lower()
        if format_spec == "X":
            return _mod["to_wkb"](self, hex=True)
        match = _FMT_RE.fullmatch(format_spec)
        if match is None:
            raise ValueError(f"invalid format specifier: {format_spec}")
        prec, fmt_code = match.groups()
        prec = int(prec) if prec else -1
        if not fmt_code:
            fmt_code = "g"
        if fmt_code in ("x", "X"):
            raise ValueError("hex representation does not specify precision")
        res = _mod["to_wkt"](self, rounding_precision=prec,
                             trim=fmt_code in ("g", "G"))
        return res.upper() if fmt_code.isupper() else res

    Geom.__format__ = _format
    # base.py wkt property / str(): FULL precision (GEOS trim, -1)
    Geom.wkt = property(
        lambda self: _mod["to_wkt"](self, rounding_precision=-1))
    Geom.__str__ = lambda self: _mod["to_wkt"](self, rounding_precision=-1)

    # reference deprecated aliases (geometry/base.py geometryType/type)
    def _geometry_type_deprecated(self):
        import warnings as _w

        _w.warn(
            "The 'GeometryType()' method is deprecated, and will be removed "
            "in the future. You can use the 'geom_type' attribute instead.",
            ShapelyDeprecationWarning, stacklevel=2,
        )
        return self.geom_type

    Geom.geometryType = _geometry_type_deprecated
    Geom.type = property(lambda self: _geometry_type_deprecated(self))

    # immutability: only dataclass fields and engine-internal metadata
    # slots (underscore-prefixed) may be assigned (src/pygeom.c objects
    # reject arbitrary attributes)
    _fields = {"type_id", "xys", "rings", "parts", "has_z", "has_m"}

    def _guarded_setattr(self, name, value):
        if name in _fields or name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{name}'")

    Geom.__setattr__ = _guarded_setattr


_install_oo_final()


class Geometry(metaclass=_GeomTypeMeta):
    """shapely.Geometry base type: isinstance matches every engine
    geometry; direct instantiation is rejected (src/pygeom.c)."""

    _type_ids = tuple(GeomType)

    def __new__(cls, *args, **kwargs):
        raise TypeError(
            "Directly calling the base class 'Geometry' is not possible; "
            "use a subclass or shapely.from_wkt/from_wkb instead."
        )


class BaseGeometry(Geometry):
    """geometry/base.py:103 — deprecated direct construction returns
    GEOMETRYCOLLECTION EMPTY with a FutureWarning."""

    def __new__(cls, *args, **kwargs):
        import warnings as _w

        _w.warn(
            "Directly calling the base class 'BaseGeometry()' is "
            "deprecated, and will raise an error in the future. To create "
            "an empty geometry, use one of the subclasses instead, for "
            "example 'GeometryCollection()'.",
            ShapelyDeprecationWarning, stacklevel=2,
        )
        return from_wkt("GEOMETRYCOLLECTION EMPTY")


geometry.base.BaseGeometry = BaseGeometry
geometry.base.BaseMultipartGeometry = BaseGeometry


class EmptyGeometry:
    """geometry/base.py:1214 — deprecated empty-geometry constructor."""

    def __new__(cls):
        import warnings as _w

        _w.warn(
            "The 'EmptyGeometry()' constructor to create an empty geometry "
            "is deprecated, and will raise an error in the future. Use one "
            "of the geometry subclasses instead, for example "
            "'GeometryCollection()'.",
            ShapelyDeprecationWarning, stacklevel=2,
        )
        return from_wkt("GEOMETRYCOLLECTION EMPTY")


geometry.base.EmptyGeometry = EmptyGeometry
