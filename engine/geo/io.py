"""Serialization surface mirroring shapely/io.py: WKT, WKB, GeoJSON.

WKT lives in engine.geo.geom (from_wkt/to_wkt), WKB in engine.geo.wkb;
GeoJSON here (reference io.py:206 `to_geojson`, :362 `from_geojson`,
C kernels ufuncs.c:2116,2198).  GeometryCollections with empty members
and Feature objects follow the reference's scope: geometry (+ the
geometry member of a Feature) only.
"""

from __future__ import annotations

import json

import numpy as np

from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt  # noqa: F401
from engine.geo.wkb import from_wkb, to_wkb  # noqa: F401

_GJ_NAME = {
    GeomType.POINT: "Point",
    GeomType.LINESTRING: "LineString",
    GeomType.LINEARRING: "LineString",  # GeoJSON has no ring type
    GeomType.POLYGON: "Polygon",
    GeomType.MULTIPOINT: "MultiPoint",
    GeomType.MULTILINESTRING: "MultiLineString",
    GeomType.MULTIPOLYGON: "MultiPolygon",
    GeomType.GEOMETRYCOLLECTION: "GeometryCollection",
}
_GJ_TYPE = {
    "Point": GeomType.POINT,
    "LineString": GeomType.LINESTRING,
    "Polygon": GeomType.POLYGON,
    "MultiPoint": GeomType.MULTIPOINT,
    "MultiLineString": GeomType.MULTILINESTRING,
    "MultiPolygon": GeomType.MULTIPOLYGON,
    "GeometryCollection": GeomType.GEOMETRYCOLLECTION,
}


def _num(v: float):
    return int(v) if float(v).is_integer() and abs(v) < 1e15 else float(v)


def _coords_json(c: np.ndarray):
    return [[_num(x), _num(y)] for x, y in c]


def _geom_to_obj(g: Geom) -> dict:
    t = g.type_id
    if t == GeomType.POINT:
        if g.is_empty:
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": [_num(g.xys[0, 0]), _num(g.xys[0, 1])]}
    if t in (GeomType.LINESTRING, GeomType.LINEARRING):
        return {"type": "LineString", "coordinates": _coords_json(g.xys)}
    if t == GeomType.POLYGON:
        return {"type": "Polygon", "coordinates": [_coords_json(r) for r in g.rings]}
    if t == GeomType.GEOMETRYCOLLECTION:
        return {
            "type": "GeometryCollection",
            "geometries": [_geom_to_obj(p) for p in g.parts],
        }
    name = _GJ_NAME[t]
    if t == GeomType.MULTIPOINT:
        coords = [[_num(p.xys[0, 0]), _num(p.xys[0, 1])] for p in g.parts if not p.is_empty]
    elif t == GeomType.MULTILINESTRING:
        coords = [_coords_json(p.xys) for p in g.parts]
    else:
        coords = [[_coords_json(r) for r in p.rings] for p in g.parts]
    return {"type": name, "coordinates": coords}


def _obj_to_geom(o: dict) -> Geom:
    if o.get("type") == "Feature":
        return _obj_to_geom(o["geometry"])
    t = _GJ_TYPE[o["type"]]
    if t == GeomType.GEOMETRYCOLLECTION:
        parts = [_obj_to_geom(p) for p in o.get("geometries", [])]
        return Geom(t, parts=parts) if parts else Geom.empty(t)
    c = o.get("coordinates", [])
    if t == GeomType.POINT:
        if not c:
            return Geom.empty(t)
        return Geom.point(float(c[0]), float(c[1]))
    if t == GeomType.LINESTRING:
        if not c:
            return Geom.empty(t)
        return Geom.linestring(np.asarray(c, dtype=np.float64)[:, :2])
    if t == GeomType.POLYGON:
        if not c:
            return Geom.empty(t)
        return Geom.polygon(
            np.asarray(c[0], dtype=np.float64)[:, :2],
            [np.asarray(r, dtype=np.float64)[:, :2] for r in c[1:]],
        )
    if not c:
        return Geom.empty(t)
    member = {
        GeomType.MULTIPOINT: GeomType.POINT,
        GeomType.MULTILINESTRING: GeomType.LINESTRING,
        GeomType.MULTIPOLYGON: GeomType.POLYGON,
    }[t]

    def sub(v):
        if not len(v):
            return Geom.empty(member)
        if member == GeomType.POINT:
            return Geom.point(float(v[0]), float(v[1]))
        if member == GeomType.LINESTRING:
            return Geom.linestring(np.asarray(v, dtype=np.float64)[:, :2])
        return Geom.polygon(
            np.asarray(v[0], dtype=np.float64)[:, :2],
            [np.asarray(r, dtype=np.float64)[:, :2] for r in v[1:]],
        )

    return Geom(t, parts=[sub(v) for v in c])


def to_geojson(geometry, indent: int | None = None):
    """Geometry (or array) → GeoJSON string (io.py:206).  Compact
    separators without indent, ``", "``/``": "`` with (GEOS writer)."""
    separators = (",", ":") if indent is None else (",", ": ")

    def enc(g):
        if g is None:
            return None
        if not isinstance(g, Geom):
            raise TypeError(f"Expected a Geometry, got {type(g).__name__}")
        return json.dumps(_geom_to_obj(g), indent=indent,
                          separators=separators)

    if isinstance(geometry, Geom) or geometry is None:
        return enc(geometry)
    if not isinstance(geometry, (list, tuple, np.ndarray)):
        return enc(geometry)
    return np.array([enc(g) for g in geometry], dtype=object)


def from_geojson(geometry, on_invalid: str = "raise"):
    """GeoJSON string (or array) → geometry (io.py:362).  A
    FeatureCollection becomes a GEOMETRYCOLLECTION of the feature
    geometries (GEOS reader behavior)."""
    if on_invalid not in ("raise", "warn", "ignore"):
        raise ValueError(
            f"{on_invalid!r} is not a valid option for on_invalid: must be "
            "one of 'raise', 'warn' or 'ignore'"
        )

    def dec(s):
        if s is None:
            return None
        if isinstance(s, bytes):
            s = s.decode("utf-8")
        if not isinstance(s, str):
            raise TypeError(
                f"Expected bytes or string, got {type(s).__name__}"
            )
        from engine.geo.errors import GEOSException

        try:
            try:
                o = json.loads(s)
            except json.JSONDecodeError as e:
                raise GEOSException(f"Error parsing JSON: {e}") from e
            if isinstance(o, dict) and "type" not in o:
                raise GEOSException("ParseException: key 'type' not found")
            if isinstance(o, dict) and "type" in o:
                if o["type"] not in _GJ_TYPE and o["type"] not in (
                    "Feature", "FeatureCollection"
                ):
                    raise GEOSException(
                        f"Unknown geometry type {o['type']!r}"
                    )
                if o.get("type") in _GJ_TYPE and o.get("coordinates") is None \
                        and o["type"] != "GeometryCollection":
                    raise GEOSException(
                        "ParseException: type must be array, but is null"
                    )
            if isinstance(o, dict) and o.get("type") == "FeatureCollection":
                parts = [
                    _obj_to_geom(f["geometry"]) for f in o.get("features", [])
                ]
                return Geom(
                    GeomType.GEOMETRYCOLLECTION, parts=parts,
                    has_z=any(p.has_z for p in parts),
                    has_m=any(p.has_m for p in parts),
                ) if parts else Geom.empty(GeomType.GEOMETRYCOLLECTION)
            return _obj_to_geom(o)
        except Exception as e:
            if on_invalid == "raise":
                raise
            if on_invalid == "warn":
                import warnings

                warnings.warn(
                    f"Invalid GeoJSON: {e}", RuntimeWarning, stacklevel=3
                )
            return None

    if isinstance(geometry, (str, bytes)) or geometry is None:
        return dec(geometry)
    if not isinstance(geometry, (list, tuple, np.ndarray)):
        return dec(geometry)  # raises the TypeError with the right name
    return np.array([dec(s) for s in geometry], dtype=object)
