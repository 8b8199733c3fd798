"""Pure-numpy geometry kernels (no ray / no GEOS).

Layout convention everywhere: coordinates are float64 ``(n, 2)`` arrays;
collections are ragged arrays = flat coords + int offset arrays, exactly
the Arrow list layout the reference emits from
``shapely/_ragged_array.py:159`` (``to_ragged_array``).
"""

from engine.geo.geom import Geom, GeomType, from_wkt, to_wkt  # noqa: F401
