"""Validation (reference shapely/validation.py + constructive make_valid).

explain_validity:9 → human-readable reason ("Valid Geometry" or the
problem + location, GEOS message format); make_valid (reference
constructive.py:680) → repaired geometry.  Both GEOS methods are
implemented over the engine's own noding/polygonize machinery:

- 'linework': node every ring into pieces, polygonize the arrangement,
  keep faces whose representative point has ODD ray-crossing parity
  against the original rings (the even-odd strategy, :685-689);
  left-over pieces (collapsed / dangling linework) come back as lines.
- 'structure': repair each ring independently (faces of its own
  arrangement), shells bound area and holes subtract (:690-694);
  collapsed rings are kept as lines when ``keep_collapsed``.
"""

from __future__ import annotations

import numpy as np

from engine.geo import predicates
from engine.geo.constructive import orient_polygons, remove_repeated_points
from engine.geo.geom import Geom, GeomType


def explain_validity(geometry) -> str:
    """validation.py:9 — 'Valid Geometry' or reason[location]."""
    if geometry is None:
        return "Null geometry"
    reason = predicates.is_valid_reason(geometry)
    return reason if reason is not None else "Valid Geometry"


def _odd_parity(rings: list[np.ndarray], x: float, y: float) -> bool:
    """Even-odd ray crossing count of (x, y) against a set of rings."""
    cnt = 0
    for r in rings:
        if len(r) < 4:
            continue
        ax, ay = r[:-1, 0], r[:-1, 1]
        bx, by = r[1:, 0], r[1:, 1]
        cond = (ay > y) != (by > y)
        if cond.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = ax[cond] + (y - ay[cond]) * (bx[cond] - ax[cond]) / (
                    by[cond] - ay[cond]
                )
            cnt += int((xi > x).sum())
    return cnt % 2 == 1


def _faces_even_odd(rings: list[np.ndarray]):
    """Polygonize the rings' noded arrangement; return (kept faces,
    leftover line pieces).  Faces kept by even-odd parity vs ``rings``."""
    from engine.geo.linework import polygonize_full_noded

    lines = [Geom.linestring(r) for r in rings if len(r) >= 2]
    if not lines:
        return [], []
    polys, cuts, dangles, _invalid = polygonize_full_noded(lines)
    faces = []
    for f in polys.parts:
        px, py = f._representative_xy()
        if _odd_parity(rings, px, py):
            faces.append(f)
    leftover = list(cuts.parts) + list(dangles.parts)
    return faces, leftover


def _areal(faces: list[Geom]) -> Geom:
    if not faces:
        return Geom.empty(GeomType.POLYGON)
    if len(faces) == 1:
        return faces[0]
    return Geom(GeomType.MULTIPOLYGON, parts=faces)


def _lineal(lines: list[Geom]) -> Geom:
    if not lines:
        return Geom.empty(GeomType.MULTILINESTRING)
    if len(lines) == 1:
        return lines[0]
    return Geom(GeomType.MULTILINESTRING, parts=lines)


def _repair_linework(g: Geom) -> Geom:
    rings = [np.asarray(r) for rr in g.polygon_parts() for r in rr]
    faces, leftover = _faces_even_odd(rings)
    if faces and leftover:
        return Geom(GeomType.GEOMETRYCOLLECTION, parts=faces + leftover)
    if faces:
        return _areal(faces)
    return _lineal(leftover)


def _repair_structure(g: Geom, keep_collapsed: bool) -> Geom:
    shells: list[Geom] = []
    holes: list[Geom] = []
    collapsed: list[np.ndarray] = []
    for rr in g.polygon_parts():
        for i, r in enumerate(rr):
            faces, _ = _faces_even_odd([np.asarray(r)])
            if not faces:
                collapsed.append(np.asarray(r))
                continue
            (shells if i == 0 else holes).extend(faces)
    if not shells:
        if keep_collapsed and collapsed:
            return _lineal([Geom.linestring(r) for r in collapsed])
        return Geom.empty(GeomType.POLYGON)
    area = _areal(shells)
    if holes:
        from engine.geo.set_operations import difference

        area = difference(area, _areal(holes))
    if keep_collapsed and collapsed:
        return Geom(
            GeomType.GEOMETRYCOLLECTION,
            parts=[area] + [Geom.linestring(r) for r in collapsed],
        )
    return area


def _copy_geom(g: Geom) -> Geom:
    if g.parts:
        return Geom(g.type_id, parts=[_copy_geom(p) for p in g.parts],
                    has_z=g.has_z, has_m=g.has_m)
    if g.rings:
        return Geom(g.type_id, rings=[r.copy() for r in g.rings],
                    has_z=g.has_z, has_m=g.has_m)
    return Geom(g.type_id, xys=g.xys.copy(), has_z=g.has_z, has_m=g.has_m)


def make_valid(geometry, method: str = "linework", keep_collapsed: bool = True):
    """validation.py:30 / constructive.py:680 — both GEOS methods."""
    if not np.isscalar(method):
        raise TypeError("method only accepts scalar values")
    if not np.isscalar(keep_collapsed):
        raise TypeError("keep_collapsed only accepts scalar values")
    if method == "linework":
        if not keep_collapsed:
            raise ValueError(
                "The 'linework' method does not support 'keep_collapsed=False'"
            )
    elif method != "structure":
        raise ValueError(f"Unknown method: {method}")

    def one(g):
        if g is None:
            return None
        if predicates.is_valid(g):
            # constructive.py:680 (top-level) returns a NEW geometry even
            # when already valid; the shapely.validation.make_valid
            # wrapper adds the identity shortcut (validation.py:53)
            return _copy_geom(g)
        t = g.type_id
        if t in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
            # cheap repairs first: close rings, drop repeats, reorient
            def closed(poly):
                rings = []
                for r in poly.rings:
                    rr = r
                    if len(rr) and not np.array_equal(rr[0], rr[-1]):
                        rr = np.vstack([rr, rr[:1]])
                    rings.append(rr)
                return Geom(GeomType.POLYGON, rings=rings)

            if t == GeomType.POLYGON:
                fixed = closed(g)
            else:
                fixed = Geom(t, parts=[closed(p) for p in g.parts])
            fixed = orient_polygons(remove_repeated_points(fixed, 0.0))
            if predicates.is_valid(fixed):
                return fixed
            if method == "structure":
                return _repair_structure(fixed, keep_collapsed)
            return _repair_linework(fixed)
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)
