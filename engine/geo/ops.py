"""shapely.ops equivalents + remaining structural accessors.

split (ops.py:311-506: polygon-by-line via boundary∪splitter →
polygonize → representative-point filter :320-332; line-by-line via
noding), nearest_points (ops.py), transform (ops.py:216 — delegates to
coordinates.transform), plus _geometry.py accessors: get_point:400,
get_num_points:445, get_geometry:595, get_segments:1020,
set_precision:868 / get_precision:824, force_2d:952 (identity — the
engine is 2-D throughout, geometry/base.py:1-7).
"""

from __future__ import annotations

import numpy as np

from engine.geo import core, predicates
from engine.geo.coordinates import transform  # noqa: F401  (ops.transform)
from engine.geo.geom import Geom, GeomType
from engine.geo.linear import substring  # noqa: F401


def _split_polygon_with_line(poly: Geom, splitter: Geom) -> list:
    """ops.py:313 — polygonize(boundary ∪ splitter), keep faces whose
    representative point lies in the original polygon."""
    from engine.geo.constructive import boundary
    from engine.geo.errors import GeometryTypeError
    from engine.geo.linework import polygonize_noded

    if splitter.type_id not in (GeomType.LINESTRING,
                                GeomType.MULTILINESTRING):
        raise GeometryTypeError(
            "Second argument must be a (Multi)LineString")
    faces = polygonize_noded([boundary(poly), splitter])
    return [p for p in faces.parts
            if predicates.contains(poly, _rep_point(p))]


def _split_line_with_line(line: Geom, splitter: Geom) -> list:
    """ops.py:335 — DE-9IM gated cut at every interior intersection
    point; linear overlap raises ValueError."""
    from engine.geo.constructive import boundary
    from engine.geo.relate import Decomp

    if splitter.type_id in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        splitter = boundary(splitter)
    relation = predicates.relate(splitter, line)
    if relation[0] == "1":
        raise ValueError(
            "Input geometry segment overlaps with the splitter.")
    if not (relation[0] == "0" or relation[3] == "0"):
        return [line]
    d_split = Decomp(splitter)
    c = line.xys[:, :2]
    out_parts = []
    cur = [c[0]]
    for i in range(len(c) - 1):
        p, q = c[i], c[i + 1]
        cuts = (core.seg_cut_params(p, q, d_split.segs)
                if len(d_split.segs) else np.empty(0))
        for tcut in np.unique(cuts):
            if tcut <= 1e-12 or tcut >= 1 - 1e-12:
                continue
            pt = p + tcut * (q - p)
            cur.append(pt)
            out_parts.append(np.vstack(cur))
            cur = [pt]
        cur.append(q)
        # a splitter endpoint or vertex exactly ON this vertex also cuts
        if i + 1 < len(c) - 1:
            vx, vy = q
            hit = core.on_segment(
                vx, vy, d_split.segs[:, 0], d_split.segs[:, 1],
                d_split.segs[:, 2], d_split.segs[:, 3],
            ) if len(d_split.segs) else np.zeros(0, dtype=bool)
            if len(hit) and bool(np.any(hit)):
                out_parts.append(np.vstack(cur))
                cur = [q]
    out_parts.append(np.vstack(cur))
    parts = [Geom.linestring(seg) for seg in out_parts if len(seg) >= 2]
    return parts if parts else [line]


def _split_line_with_point(line: Geom, splitter: Geom) -> list:
    """ops.py:369 — exact interior-point split via linear referencing."""
    if not predicates.relate_pattern(line, splitter, "0********"):
        return [line]
    c = line.xys[:, :2]
    if (c[0] == splitter.xys[0, :2]).all():
        # closed ring: the relate test does not behave as desired
        return [line]
    from engine.geo.linear import line_locate_point

    distance_on_line = float(line_locate_point(line, splitter))
    current = 0.0
    for i in range(len(c) - 1):
        seg = float(np.hypot(*(c[i] - c[i + 1])))
        current += seg
        if distance_on_line == current:
            return [Geom.linestring(c[: i + 2].copy()),
                    Geom.linestring(c[i + 1:].copy())]
        if distance_on_line < current:
            pt = splitter.xys[0, :2]
            return [
                Geom.linestring(np.vstack([c[: i + 1], pt])),
                Geom.linestring(np.vstack([pt, c[i + 1:]])),
            ]
    return [line]


_SPLIT_TYPE_NAMES = {
    GeomType.POINT: "Point", GeomType.LINESTRING: "LineString",
    GeomType.LINEARRING: "LinearRing", GeomType.POLYGON: "Polygon",
    GeomType.MULTIPOINT: "MultiPoint",
    GeomType.MULTILINESTRING: "MultiLineString",
    GeomType.MULTIPOLYGON: "MultiPolygon",
    GeomType.GEOMETRYCOLLECTION: "GeometryCollection",
}


def split(geometry: Geom, splitter: Geom) -> Geom:
    """ops.py:311 SplitOp.split — GEOMETRYCOLLECTION of the parts;
    reference dispatch incl. multi-part recursion and typed errors."""
    from engine.geo.errors import GeometryTypeError

    t = geometry.type_id
    if t in (GeomType.MULTILINESTRING, GeomType.MULTIPOLYGON):
        parts = [p for part in geometry.parts
                 for p in split(part, splitter).parts]
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=parts)
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        st = splitter.type_id
        if st in (GeomType.LINESTRING, GeomType.MULTILINESTRING,
                  GeomType.POLYGON, GeomType.MULTIPOLYGON):
            out = _split_line_with_line(geometry, splitter)
        elif st == GeomType.POINT:
            out = _split_line_with_point(geometry, splitter)
        elif st == GeomType.MULTIPOINT:
            out = [geometry]
            for pt in splitter.parts:
                out = [seg for chunk in out if not chunk.is_empty
                       for seg in _split_line_with_point(chunk, pt)]
        else:
            raise GeometryTypeError(
                f"Splitting a LineString with a {_SPLIT_TYPE_NAMES[splitter.type_id]} is "
                "not supported"
            )
    elif t == GeomType.POLYGON:
        if splitter.type_id in (GeomType.LINESTRING,
                                GeomType.MULTILINESTRING):
            out = _split_polygon_with_line(geometry, splitter)
        else:
            raise GeometryTypeError(
                f"Splitting a Polygon with a {_SPLIT_TYPE_NAMES[splitter.type_id]} is not "
                "supported"
            )
    else:
        raise GeometryTypeError(
            f"Splitting {_SPLIT_TYPE_NAMES[geometry.type_id]} geometry is not supported"
        )
    return Geom(GeomType.GEOMETRYCOLLECTION, parts=list(out))


def _rep_point(p: Geom) -> Geom:
    x, y = p._representative_xy()
    return Geom.point(x, y)


def nearest_points(a: Geom, b: Geom) -> tuple[Geom, Geom]:
    """ops.py nearest_points — endpoints of the shortest connecting line."""
    from engine.geo.linear import shortest_line

    line = shortest_line(a, b)
    if line is None:
        raise ValueError("nearest_points on None")
    return (
        Geom.point(line.xys[0, 0], line.xys[0, 1]),
        Geom.point(line.xys[1, 0], line.xys[1, 1]),
    )


# ------------------------------------------------------ structural accessors
def _broadcast_geom_index(one, geometry, index):
    """Ufunc-style broadcast of (geometry, integer index) pairs — the
    reference accessors accept ranges/arrays for either argument."""
    g_scalar = isinstance(geometry, Geom) or geometry is None
    i_scalar = np.isscalar(index) and not isinstance(index, range)
    if g_scalar and i_scalar:
        return one(geometry, index)
    if g_scalar:
        gg = np.empty((), dtype=object)
        gg[()] = geometry
    else:
        gg = np.asarray(geometry, dtype=object)
    ii = np.asarray(
        list(index) if isinstance(index, range) else index, dtype=np.int64
    )
    gg, ii = np.broadcast_arrays(gg, ii)
    out = np.empty(gg.shape, dtype=object)
    for idx in np.ndindex(gg.shape):
        out[idx] = one(gg[idx], ii[idx])
    return out


def get_point(line, index):
    """_geometry.py:400 — nth vertex of a linestring (None out of range)."""

    def one(g, i):
        if g is None or g.type_id not in (GeomType.LINESTRING, GeomType.LINEARRING):
            return None
        i = int(i)
        n = len(g.xys)
        if i < -n or i >= n:
            return None
        return Geom.point(g.xys[i, 0], g.xys[i, 1])

    return _broadcast_geom_index(one, line, index)


def get_num_points(line):
    """_geometry.py:445 — vertex count of linestrings (0 otherwise)."""

    def one(g):
        if g is None or g.type_id not in (GeomType.LINESTRING, GeomType.LINEARRING):
            return 0
        return len(g.xys)

    if isinstance(line, Geom) or line is None:
        return one(line)
    return np.array([one(g) for g in line], dtype=np.int64)


def get_geometry(geometry, index):
    """_geometry.py:595 — nth part of a collection (the geometry itself
    for simple types at index 0/-1)."""

    _MULTI = (GeomType.MULTIPOINT, GeomType.MULTILINESTRING,
              GeomType.MULTIPOLYGON, GeomType.GEOMETRYCOLLECTION)

    def one(g, i):
        if g is None:
            return None
        i = int(i)
        parts = g.parts if g.type_id in _MULTI else [g]
        n = len(parts)
        if i < -n or i >= n:
            return None
        return parts[i]

    return _broadcast_geom_index(one, geometry, index)


def get_segments(geometry, *, include_z: bool = False,
                 return_index: bool = False):
    """_geometry.py:1020 (new in 2.2) — per-segment two-point
    linestrings of LineString/LinearRing inputs ONLY (Multi* and other
    types raise, GEOS parity); include_z pads NaN z for 2-D inputs."""
    from engine.geo.coordinates import _explode_input

    geoms = _explode_input(geometry, "get_segments")
    segs = []
    idx = []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        if g.type_id not in (GeomType.LINESTRING, GeomType.LINEARRING):
            raise ValueError(
                f"Geometry type is not supported: {g.type_id.name}"
            )
        c = g.xys
        if len(c) < 2:
            continue
        if include_z:
            block = np.full((len(c), 3), np.nan)
            block[:, :2] = c[:, :2]
            if g.has_z and c.shape[1] > 2:
                block[:, 2] = c[:, 2]
        else:
            block = c[:, :2]
        for k in range(len(block) - 1):
            segs.append(Geom.linestring(block[k:k + 2].copy()))
            idx.append(i)
    out = np.array(segs, dtype=object)
    if return_index:
        return out, np.array(idx, dtype=np.int64)
    return out


def _map_blocks(g, fn, hz, hm):
    """Rebuild a geometry with ``fn`` applied to every coord block."""
    t = g.type_id
    if t in (GeomType.POINT, GeomType.LINESTRING, GeomType.LINEARRING):
        return Geom(t, xys=fn(g.xys, g), has_z=hz, has_m=hm)
    if t == GeomType.POLYGON:
        return Geom(t, rings=[fn(r, g) for r in g.rings], has_z=hz, has_m=hm)
    return Geom(t, parts=[_map_blocks(p, fn, hz, hm) for p in g.parts],
                has_z=hz, has_m=hm)


def force_2d(geometry):
    """_geometry.py:952 — drop Z/M coordinates."""

    def one(g):
        if g is None:
            return None
        if not (g.has_z or g.has_m):
            return g
        return _map_blocks(g, lambda c, _g: np.ascontiguousarray(c[:, :2]),
                           False, False)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def force_3d(geometry, z: float = 0.0):
    """_geometry.py:982 — 2-D geometries get the provided Z; existing Z
    is unchanged.  NaN z is rejected like the reference."""
    if np.isnan(z):
        raise ValueError("It is not allowed to set the Z coordinate to NaN.")

    def one(g):
        if g is None:
            return None
        if g.has_z:
            return g

        def widen(c, gg):
            out = np.empty((len(c), 3 + int(gg.has_m)))
            out[:, :2] = c[:, :2]
            out[:, 2] = z
            if gg.has_m:
                out[:, 3] = c[:, 2]  # XYM column shifts to the M slot
            return out

        return _map_blocks(g, widen, True, g.has_m)

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def set_precision(geometry, grid_size: float, mode: str = "valid_output"):
    """_geometry.py:868 — snap coordinates to the grid.

    Collapse rules per GEOS GeometryPrecisionReducer:
    - valid_output (default): collapsed lines/rings/polygons become the
      EMPTY geometry of their type; self-intersections introduced by
      snapping are re-noded into valid polygons.
    - pointwise: coordinates snapped in place, nothing removed.
    - keep_collapsed: collapsed linestrings keep their snapped (equal)
      endpoints; a collapsed ring degrades to a 3-point LINESTRING
      (GEOS ticket 1135); collapsed polygons become EMPTY.
    NaN grid_size returns None.
    """
    if mode not in ("valid_output", "pointwise", "keep_collapsed"):
        raise ValueError(f"Invalid mode: {mode!r}")

    def snap_block(c):
        return np.round(np.asarray(c, dtype=np.float64) / grid_size) * grid_size

    def dedup(c):
        if len(c) == 0:
            return c
        keep = np.ones(len(c), dtype=bool)
        keep[1:] = ~np.all(c[1:, :2] == c[:-1, :2], axis=1)
        return c[keep]

    def one_line(g):
        c = dedup(snap_block(g.xys[:, :2]))
        if len(c) < 2:  # collapsed
            if mode == "keep_collapsed":
                p = snap_block(g.xys[:1, :2])
                return Geom(GeomType.LINESTRING,
                            xys=np.repeat(p, 2, axis=0))
            return Geom.empty(GeomType.LINESTRING)
        return Geom(GeomType.LINESTRING, xys=c)

    def one_ring(g):
        c = dedup(snap_block(g.xys[:, :2]))
        if len(c) < 4:  # collapsed (closure included)
            if mode == "keep_collapsed":
                p = snap_block(g.xys[:1, :2])
                return Geom(GeomType.LINESTRING,
                            xys=np.repeat(p, 3, axis=0))
            return Geom.empty(GeomType.LINEARRING)
        return Geom(GeomType.LINEARRING, xys=c)

    def one_poly(g):
        rings = []
        for k, r in enumerate(g.rings):
            c = dedup(snap_block(r[:, :2]))
            if len(c) < 4 or abs(core.ring_signed_area(c)) == 0:
                if k == 0:
                    return Geom.empty(GeomType.POLYGON)
                continue  # collapsed hole dropped
            rings.append(c)
        out = Geom(GeomType.POLYGON, rings=rings)
        # snapping can introduce self-intersections; re-node for a
        # valid result (both valid_output and keep_collapsed)
        from engine.geo.predicates import is_valid
        from engine.geo.validation import make_valid

        try:
            if not is_valid(out):
                fixed = make_valid(out)
                if fixed is not None:
                    return fixed
        except Exception:
            pass
        return out

    def one(g):
        if g is None:
            return None
        if np.isnan(grid_size):
            return None
        if grid_size == 0:
            return g
        if mode == "pointwise":
            from engine.geo.coordinates import get_coordinates, set_coordinates

            c = get_coordinates(g)
            out = set_coordinates(g, snap_block(c), _keep_dims=True)
        elif g.is_empty:
            out = g
        elif g.type_id == GeomType.LINESTRING:
            out = one_line(g)
        elif g.type_id == GeomType.LINEARRING:
            out = one_ring(g)
        elif g.type_id == GeomType.POLYGON:
            out = one_poly(g)
        elif g.parts:
            parts = [one(p) for p in g.parts]
            parts = [p for p in parts if p is not None]
            out = Geom(g.type_id, parts=parts) if parts else Geom.empty(g.type_id)
        else:  # POINT
            from engine.geo.coordinates import get_coordinates, set_coordinates

            c = get_coordinates(g)
            out = set_coordinates(g, snap_block(c), _keep_dims=True)
        out._precision = grid_size  # noqa: SLF001 (engine-side metadata)
        return out

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)


def get_precision(geometry):
    """_geometry.py:824."""

    def one(g):
        if g is None:
            return np.nan
        return float(getattr(g, "_precision", 0.0))

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry])


def maximum_inscribed_circle(geometry, tolerance: float | None = None):
    """constructive.py:1473 — two-point LINESTRING (center → nearest
    boundary point).  Grid-refinement search (GEOS uses the same
    successive-refinement idea); tolerance defaults to diameter/1000.
    GEOS-parity errors: non-polygonal input and empty input raise
    GEOSException; negative tolerance raises ValueError."""
    from engine.geo.errors import GEOSException
    from engine.geo.relate import Decomp

    g = geometry
    if g is None:
        return None
    if tolerance is not None and np.isscalar(tolerance) and tolerance < 0:
        raise ValueError("'tolerance' should be positive")
    if g.type_id not in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
        raise GEOSException(
            "IllegalArgumentException: Input geometry must be a Polygon or "
            "MultiPolygon"
        )
    if g.is_empty:
        raise GEOSException(
            "IllegalArgumentException: Empty input geometry is not supported"
        )
    d = Decomp(g)
    segs = d.segs
    b = g.bounds
    tol = tolerance or max(b[2] - b[0], b[3] - b[1]) / 1000.0

    def signed_dist(xs, ys):
        """Distance to the boundary, NEGATIVE outside the polygon
        (GEOS MaximumInscribedCircle::distanceToBoundary)."""
        xs = np.atleast_1d(np.asarray(xs, dtype=float))
        ys = np.atleast_1d(np.asarray(ys, dtype=float))
        d2 = core.point_seg_dist2(
            xs[:, None], ys[:, None],
            segs[None, :, 0], segs[None, :, 1], segs[None, :, 2], segs[None, :, 3],
        ).min(axis=1)
        dist = np.sqrt(d2)
        inside = np.array([
            any(core.point_in_rings(x, y, p) == 2 for p in d.polys)
            for x, y in zip(xs, ys)
        ])
        return np.where(inside, dist, -dist)

    # GEOS 3.12+ branch-and-bound: ONE initial cell at the envelope
    # centre with half-side max(w,h)/2, priority queue ordered by the
    # cell's maximum potential distance (d + h*sqrt2), split-by-4 until
    # no cell can beat the incumbent by more than tolerance.
    import heapq
    import math

    SQRT2 = math.sqrt(2.0)
    cx0, cy0 = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
    h0 = max(b[2] - b[0], b[3] - b[1]) / 2.0
    # incumbent: the interior point (GEOS createInteriorPointCell)
    ix, iy = g._representative_xy()
    cx, cy, r = ix, iy, float(signed_dist(ix, iy)[0])
    heap: list = []
    counter = 0
    d0 = float(signed_dist(cx0, cy0)[0])
    heapq.heappush(heap, (-(d0 + h0 * SQRT2), counter, cx0, cy0, h0, d0))
    diam = math.hypot(b[2] - b[0], b[3] - b[1])
    factor = max(1, int(math.log(diam / tol))) if diam > 0 and tol > 0 else 1
    max_iter = 2000 + 2000 * factor
    it = 0
    while heap and it < max_iter:
        negmax, _cnt, x, y, h, dist = heapq.heappop(heap)
        if dist > r:
            cx, cy, r = x, y, dist
        if (-negmax) - r > tol:  # may contain a better centre → split
            it += 1
            h2 = h / 2.0
            child_x = np.array([x - h2, x + h2, x - h2, x + h2])
            child_y = np.array([y - h2, y - h2, y + h2, y + h2])
            dd = signed_dist(child_x, child_y)
            for k in range(4):
                counter += 1
                heapq.heappush(
                    heap,
                    (-(dd[k] + h2 * SQRT2), counter,
                     float(child_x[k]), float(child_y[k]), h2, float(dd[k])),
                )
    # nearest boundary point from the center
    d2 = core.point_seg_dist2(cx, cy, segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3])
    k = int(np.argmin(d2))
    a, bseg = segs[k, :2], segs[k, 2:]
    ab = bseg - a
    t = float(np.clip(((np.array([cx, cy]) - a) @ ab) / max(ab @ ab, 1e-300), 0, 1))
    nb = a + t * ab
    return Geom.linestring(np.array([[cx, cy], nb]))
