"""Affine transforms (reference shapely/affinity.py, 266 LoC, pure
Python algorithm — docstring :14-49 gives the exact equations).

2-D: x' = a·x + b·y + xoff ;  y' = d·x + e·y + yoff
3-D adds the c/f/g/h/i coefficients and zoff (matrix of 12).
"""

from __future__ import annotations

import numpy as np

from engine.geo.coordinates import transform
from engine.geo.geom import Geom
from engine.geo.measure import bounds


def interpret_origin(geom, origin, ndim):
    """affinity.py:93 — 'center' (2-D bbox midpoint), 'centroid', a
    Point, or an (x, y[, z]) tuple; padded/truncated to ndim."""
    if isinstance(origin, str) and origin == "center":
        g = geom if isinstance(geom, Geom) else geom[0]
        b = np.atleast_2d(np.asarray(bounds(g), dtype=float))[0]
        origin = ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
    elif isinstance(origin, str) and origin == "centroid":
        g = geom if isinstance(geom, Geom) else geom[0]
        c = g.centroid
        origin = (float(c.xys[0, 0]), float(c.xys[0, 1]))
    elif isinstance(origin, str):
        raise ValueError(f"'origin' keyword {origin!r} is not recognized")
    elif isinstance(origin, Geom):
        if origin.geom_type != "Point":
            raise ValueError("'origin' geometry must be a Point")
        origin = tuple(origin.coords[0])
    origin = tuple(float(v) for v in origin)
    if len(origin) not in (2, 3):
        raise ValueError(
            "Expected number of items in 'origin' to be either 2 or 3")
    if ndim == 2:
        return origin[:2]
    return origin + (0.0,) if len(origin) == 2 else origin


# engine-internal alias kept for callers of the old private name
def _interpret_origin(geometry, origin):
    return interpret_origin(geometry, origin, 2)


def affine_transform(geom, matrix):
    """affinity.py:12 — matrix of 6 ([a, b, d, e, xoff, yoff]) or 12
    ([a, b, c, d, e, f, g, h, i, xoff, yoff, zoff])."""
    matrix = [float(v) for v in matrix]

    def one(geom):
        if len(matrix) == 6:
            ndim = 2
            a, b, d, e, xoff, yoff = matrix
            if geom.has_z:
                ndim = 3
                i = 1.0
                c = f = g = h = zoff = 0.0
        elif len(matrix) == 12:
            ndim = 3
            a, b, c, d, e, f, g, h, i, xoff, yoff, zoff = matrix
            if not geom.has_z:
                ndim = 2
        else:
            raise ValueError("'matrix' expects either 6 or 12 coefficients")

        def _affine_coords(coords):
            # affinity.py:72 — manual expansion (matmul is not robust
            # for mixed-magnitude coefficients)
            if ndim == 2:
                x, y = coords.T
                return np.stack([a * x + b * y + xoff,
                                 d * x + e * y + yoff]).T
            x, y, z = coords.T
            return np.stack([a * x + b * y + c * z + xoff,
                             d * x + e * y + f * z + yoff,
                             g * x + h * y + i * z + zoff]).T

        return transform(geom, _affine_coords, include_z=ndim == 3)

    if isinstance(geom, Geom):
        return one(geom)
    if geom is None:
        # affinity.py accesses geom.has_z unconditionally (legacy
        # test_affinity.py:22 expects AttributeError for None)
        raise AttributeError("'NoneType' object has no attribute 'has_z'")
    return np.array([one(g) for g in np.asarray(geom, dtype=object)],
                    dtype=object)


def translate(geom, xoff: float = 0.0, yoff: float = 0.0,
              zoff: float = 0.0):
    """affinity.py:247."""
    return affine_transform(
        geom, [1, 0, 0, 0, 1, 0, 0, 0, 1, xoff, yoff, zoff])


def rotate(geom, angle, origin="center", use_radians: bool = False):
    """affinity.py:126 — CCW rotation about origin."""
    if isinstance(geom, Geom) and geom.is_empty:
        return geom
    th = float(angle) if use_radians else np.radians(float(angle))
    x0, y0, _z0 = interpret_origin(geom, origin, 3)
    cosp, sinp = np.cos(th), np.sin(th)
    return affine_transform(
        geom,
        [cosp, -sinp, 0.0,
         sinp, cosp, 0.0,
         0.0, 0.0, 1.0,
         x0 - x0 * cosp + y0 * sinp, y0 - x0 * sinp - y0 * cosp, 0.0],
    )


def scale(geom, xfact: float = 1.0, yfact: float = 1.0,
          zfact: float = 1.0, origin="center"):
    """affinity.py:169."""
    if isinstance(geom, Geom) and geom.is_empty:
        return geom
    x0, y0, z0 = interpret_origin(geom, origin, 3)
    return affine_transform(
        geom,
        [xfact, 0.0, 0.0,
         0.0, yfact, 0.0,
         0.0, 0.0, zfact,
         x0 - x0 * xfact, y0 - y0 * yfact, z0 - z0 * zfact],
    )


def skew(geom, xs: float = 0.0, ys: float = 0.0, origin="center",
         use_radians: bool = False):
    """affinity.py:204 — shear by angles along x/y."""
    if isinstance(geom, Geom) and geom.is_empty:
        return geom
    xs = float(xs) if use_radians else np.radians(float(xs))
    ys = float(ys) if use_radians else np.radians(float(ys))
    x0, y0, _z0 = interpret_origin(geom, origin, 3)
    tx, ty = np.tan(xs), np.tan(ys)
    return affine_transform(
        geom,
        [1.0, tx, 0.0,
         ty, 1.0, 0.0,
         0.0, 0.0, 1.0,
         -y0 * tx, -x0 * ty, 0.0],
    )
