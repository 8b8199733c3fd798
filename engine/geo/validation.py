"""Validation (reference shapely/validation.py + constructive make_valid).

explain_validity:9 → human-readable reason ("Valid Geometry" or the
problem + location, GEOS message format); make_valid:30 → repaired
geometry for the repairable classes: unclosed rings (close), repeated
points (drop), inverted rings (reorient).  Self-intersecting shells
(bowties) need a full noding pass — out of round-1 scope, raises
NotImplementedError with that rationale.
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


def make_valid(geometry, method: str = "linework", keep_collapsed: bool = True):
    """validation.py:30 / constructive.py:680."""

    def one(g):
        if g is None:
            return None
        if predicates.is_valid(g):
            return g
        t = g.type_id
        if t == GeomType.POLYGON:
            # close rings, drop duplicate consecutive points, reorient
            rings = []
            for r in g.rings:
                rr = r
                if len(rr) and not np.array_equal(rr[0], rr[-1]):
                    rr = np.vstack([rr, rr[:1]])
                rings.append(rr)
            fixed = orient_polygons(
                remove_repeated_points(Geom(GeomType.POLYGON, rings=rings), 0.0)
            )
            if predicates.is_valid(fixed):
                return fixed
            raise NotImplementedError(
                "make_valid: self-intersection repair (noding/build-area) "
                "is out of round-1 scope"
            )
        if g.parts:
            return Geom(t, parts=[one(p) for p in g.parts])
        return g

    if isinstance(geometry, Geom) or geometry is None:
        return one(geometry)
    return np.array([one(g) for g in geometry], dtype=object)
