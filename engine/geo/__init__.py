"""Pure-numpy geometry kernels (no ray / no GEOS).

Layout convention everywhere: coordinates are float64 ``(n, 2)`` arrays;
collections are ragged arrays = flat coords + int offset arrays, exactly
the Arrow list layout the reference emits from
``shapely/_ragged_array.py:159`` (``to_ragged_array``).

Module map mirrors the reference's package layout (SURVEY.md §2):
geom (WKT + scalar type), wkb, io (GeoJSON), predicates, relate,
strtree, prepared, ragged, cells, measure, constructive, coordinates,
creation, affinity, linear, set_operations.
"""

from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt  # noqa: F401
from engine.geo.wkb import from_wkb, to_wkb  # noqa: F401
