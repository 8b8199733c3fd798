"""Exception hierarchy (reference shapely/errors.py:1-60 + lib.GEOSException).

Lives in engine.geo so kernel modules can raise the user-facing types
without importing the compat facade (which imports them back).
"""


class GEOSException(Exception):
    """Reference shapely.lib.GEOSException — raised by GEOS; this engine
    raises it from the same user-facing failure points (invalid WKB/WKT,
    impossible overlays, malformed DE-9IM patterns)."""


class ShapelyError(GEOSException):
    """Reference errors.py:31 — base error (subclasses GEOSException
    there too)."""


class UnsupportedGEOSVersionError(ShapelyError):
    pass


class DimensionError(ShapelyError):
    pass


class TopologicalError(ShapelyError):
    pass


class ShapelyDeprecationWarning(FutureWarning):
    pass


class EmptyPartError(ShapelyError):
    pass


class GeometryTypeError(ShapelyError):
    pass
