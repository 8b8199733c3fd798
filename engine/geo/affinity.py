"""Affine transforms (reference shapely/affinity.py, 266 LoC, pure
Python algorithm — docstring :14-49 gives the exact equations).

x' = a·x + b·y + xoff ;  y' = d·x + e·y + yoff
"""

from __future__ import annotations

import numpy as np

from engine.geo.coordinates import get_coordinates, transform
from engine.geo.geom import Geom
from engine.geo.measure import bounds


def _interpret_origin(geometry, origin) -> tuple[float, float]:
    """affinity.py:93 — 'center' (bbox midpoint), 'centroid', a Point,
    or an (x, y) tuple."""
    if origin == "center":
        b = bounds(geometry)
        b = np.atleast_2d(b)[0]
        return ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
    if origin == "centroid":
        g = geometry if isinstance(geometry, Geom) else geometry[0]
        c = g.centroid
        return (float(c.xys[0, 0]), float(c.xys[0, 1]))
    if isinstance(origin, Geom):
        return (float(origin.xys[0, 0]), float(origin.xys[0, 1]))
    return (float(origin[0]), float(origin[1]))


def affine_transform(geometry, matrix):
    """affinity.py:12 — matrix = [a, b, d, e, xoff, yoff] (2-D)."""
    a, b, d, e, xoff, yoff = (float(v) for v in matrix)
    m = np.array([[a, b], [d, e]])
    off = np.array([xoff, yoff])
    return transform(geometry, lambda c: c @ m.T + off)


def translate(geometry, xoff: float = 0.0, yoff: float = 0.0, zoff: float = 0.0):
    """affinity.py:247."""
    return affine_transform(geometry, [1, 0, 0, 1, xoff, yoff])


def rotate(geometry, angle, origin="center", use_radians: bool = False):
    """affinity.py:126 — CCW rotation about origin."""
    th = float(angle) if use_radians else np.radians(float(angle))
    cx, cy = _interpret_origin(geometry, origin)
    cos, sin = np.cos(th), np.sin(th)
    return affine_transform(
        geometry,
        [cos, -sin, sin, cos, cx - cx * cos + cy * sin, cy - cx * sin - cy * cos],
    )


def scale(geometry, xfact: float = 1.0, yfact: float = 1.0, zfact: float = 1.0,
          origin="center"):
    """affinity.py:169."""
    cx, cy = _interpret_origin(geometry, origin)
    return affine_transform(
        geometry, [xfact, 0, 0, yfact, cx - cx * xfact, cy - cy * yfact]
    )


def skew(geometry, xs: float = 0.0, ys: float = 0.0, origin="center",
         use_radians: bool = False):
    """affinity.py:204 — shear by angles along x/y."""
    xs = float(xs) if use_radians else np.radians(float(xs))
    ys = float(ys) if use_radians else np.radians(float(ys))
    cx, cy = _interpret_origin(geometry, origin)
    tx, ty = np.tan(xs), np.tan(ys)
    return affine_transform(geometry, [1, tx, ty, 1, -tx * cy, -ty * cx])
